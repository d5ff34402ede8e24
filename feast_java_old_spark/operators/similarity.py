"""Similarity search over embedding columns (``array<float>``).

Two paths, both pure DataFrame plans:

- :func:`cosine_topk` — **brute-force baseline**: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (built-in higher-order functions — JVM-side, codegen'd,
  no Python), top-k per query by window rank. The corpus is scanned once,
  never shuffled (the broadcast join is map-side); only the
  (n_queries × corpus) similarity rows shuffle for ranking, and with AQE
  those partitions coalesce. At 100 TB, cost is one pass over the corpus
  — the right baseline.
- :func:`ann_sign_lsh` — **scale path**: axis-aligned random-hyperplane
  LSH. Bucket = sign bits of the first ``b`` dimensions; queries join only
  their bucket (expected corpus/2^b candidates each). Deterministic and
  oracle-reproducible; swapping in learned IVF centroids keeps the same
  plan shape (bucket column + equi-join).

Near-duplicate detection by embedding (cosine >= threshold over a sample
of pairs) reuses the same kernels.

Float determinism: vectors are cast to double before any arithmetic, dot
products accumulate sequentially in index order, and outputs are rounded
— so an ANSI-SQL oracle (DuckDB) reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product via built-ins."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small enough to broadcast (it is, by construction:
    a query batch). Self-matches (same id) are excluded. Ties broken by
    neighbor id ascending for full determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cnorm", norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qnorm", norm(F.col("__qv")))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("__cv"), F.col("__qv")) / (F.col("__cnorm") * F.col("__qnorm")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """LSH bucket id: sign bits of the first ``bits`` dimensions,
    rendered as a bit string (axis-aligned hyperplanes — deterministic,
    no RNG state to ship to an oracle)."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(vec, 1, bits),
            lambda v: F.when(v >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )


def ann_sign_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH
    bucket, then exact cosine rank within.

    The corpus is bucketed by a projection (no shuffle); the candidate
    join is an equi-join on the bucket string, so each query touches
    ~corpus/2^bits rows instead of all of them.
    """
    # Norms are hoisted into the pre-join projections: the dot/sqrt
    # kernels are interpreted higher-order functions, so computing them
    # once per vector instead of once per candidate pair is a ~3x win.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("bucket", sign_bucket(F.col("__cv"), bits)).withColumn(
        "__cnorm", norm(F.col("__cv"))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("bucket", sign_bucket(F.col("__qv"), bits)).withColumn(
        "__qnorm", norm(F.col("__qv"))
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__cv"), F.col("__qv"))
                / (F.col("__cnorm") * F.col("__qnorm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "id",
    vec_col: str = "__v",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "__cv",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine.

    ``centroids`` is small (~√N lists for N vectors) and broadcast; the
    corpus is scanned once and never shuffled for scoring. For
    ``nprobe=1`` (index build) the argmax is a ``max(struct(...))``
    aggregate — map-side partial, one row per vector crosses the wire.
    For ``nprobe>1`` (query probing, tiny input) a window rank is used.
    Cosines are rounded to 6 places before comparison and ties broken by
    centroid id ascending, so an ANSI-SQL oracle reproduces assignments
    exactly.
    """
    other = [c for c in corpus.columns if c != id_col]
    # Hoist norms out of the n_vectors x n_centroids scoring (the
    # dot/sqrt kernels are interpreted HOFs — once per row, not per pair).
    corpus = corpus.withColumn("__vn", norm(F.col(vec_col)))
    centroids = centroids.withColumn("__cn", norm(F.col(centroid_vec_col)))
    sim = F.round(
        dot(F.col(vec_col), F.col(centroid_vec_col))
        / (F.col("__vn") * F.col("__cn")),
        6,
    ).alias("__sim")
    scored = corpus.join(F.broadcast(centroids)).select(
        id_col, *other, F.col(centroid_id_col), sim
    )
    if nprobe == 1:
        # struct compares (sim asc, -cid asc) → max = best sim, lowest cid.
        packed = F.max(
            F.struct(
                F.col("__sim"),
                (-F.col(centroid_id_col)).alias("__ncid"),
                *other,
            )
        ).alias("__best")
        return (
            scored.groupBy(id_col)
            .agg(packed)
            .select(
                id_col,
                (-F.col("__best.__ncid")).alias(centroid_id_col),
                *[F.col(f"__best.{c}").alias(c) for c in other],
            )
        )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= nprobe)
        .select(id_col, centroid_id_col, *other)
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_step: int = 50,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: inverted-file search over centroid buckets.

    The scale path for ANN beyond sign-LSH: the corpus is partitioned
    into inverted lists by nearest centroid (one equi-join key), and each
    query probes only its ``nprobe`` nearest lists — expected cost
    ``nprobe/C`` of the corpus per query instead of a full scan.

    Centroids here are a deterministic sample (every ``centroid_step``-th
    vector by id) so the oracle can reproduce the index bit-for-bit; a
    production deployment trains k-means centroids instead — every plan
    shape downstream (assign, probe, bucket equi-join, rank) is
    unchanged, which is the point: swapping the coarse quantizer does not
    touch the distributed query plan.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    )
    cent = corpus.where(F.col(id_col) % centroid_step == 0).select(
        F.col(id_col).alias("centroid_id"),
        _as_double(F.col(vec_col)).alias("__ev"),
    )
    lists = ivf_assign(
        c, cent, nprobe=1, id_col="neighbor_id", vec_col="__cv",
        centroid_vec_col="__ev",
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    )
    probes = ivf_assign(
        q, cent, nprobe=nprobe, id_col="query_id", vec_col="__qv",
        centroid_vec_col="__ev",
    )
    scored = (
        lists.join(F.broadcast(probes), on="centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.9,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Pairs are only compared within a sign-LSH bucket (sub-quadratic);
    emits (id_a, id_b, cosine >= threshold). High-cosine pairs agree on
    most sign bits, so recall stays high while the self-join stays small.
    """
    # Norm hoisted pre-join (interpreted HOF — once per vector, not per
    # pair; the self-join side is evaluated twice otherwise).
    v = (
        df.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("__v")
        )
        .withColumn("bucket", sign_bucket(F.col("__v"), bits))
        .withColumn("__n", norm(F.col("__v")))
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__n") * F.col("b.__n")),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
