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

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feast_java_old_spark.sources.tables import arrow_local_frame


def _half_away(np, x):
    """Round to the nearest integer, ties AWAY from zero — matches Spark
    ``F.round(x, 0)`` and DuckDB ``round(x)`` (both HALF_UP in BigDecimal
    terms) on exact binary ties.  ``np.round`` is IEEE half-to-even,
    which silently splits the Arrow kernels from their expression twins /
    DuckDB oracles whenever a value lands exactly on a tie boundary
    (ADVICE r4).  Caveat: for tie-ADJACENT doubles (values within 1 ulp
    of x.5 that are not exactly representable) ``abs(x)+0.5`` can round
    up in double arithmetic where BigDecimal HALF_UP would not, so this
    is tie-exact, not bit-identical across the whole double range; the
    kernels only rely on it after 6-dp quantization of well-separated
    scores, where the twins agree empirically (hash-matched oracles)."""
    return np.copysign(np.floor(np.abs(x) + 0.5), x)


def _q6(np, x):
    """6-dp quantization matching ``F.round(x, 6)`` exactly (see
    :func:`_half_away`)."""
    return _half_away(np, x * 1e6) / 1e6


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
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
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


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the k
    most-similar corpus vectors with a *different* label — the training
    pairs a contrastive/embedding model actually learns from.

    Same plan as :func:`cosine_topk` (one corpus scan, broadcast query
    batch, norms hoisted) with the label-mismatch predicate fused into
    the join condition, so disqualified pairs are dropped before the
    cosine is computed. The per-query top-k window shuffles only
    surviving (query, neighbor, cosine) rows.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cnorm", norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(label_col).alias("__qlabel"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qnorm", norm(F.col("__qv")))
    scored = c.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("neighbor_label") != F.col("__qlabel")),
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.round(
            dot(F.col("__cv"), F.col("__qv"))
            / (F.col("__cnorm") * F.col("__qnorm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "neighbor_label", "cosine")
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


def suggest_bits(corpus_rows: int, target_bucket_rows: int = 1024) -> int:
    """Bits needed so expected sign-LSH bucket occupancy stays bounded.

    Expected occupancy is ``corpus_rows / 2**bits`` (sign bits of
    isotropic embeddings are ~uniform); within-bucket work is quadratic
    in occupancy for pairwise ops (:func:`embedding_near_dups`) and
    linear for query probes (:func:`ann_sign_lsh`). ``bits`` must grow
    with ``log2(corpus)`` — a constant default that is fine at 500
    vectors is a scan at 100 TB. Recall lost to more bits is bought back
    with more ``tables`` (OR-amplification), not fewer bits.

    Integer-exact (``ceil(log2(ceil(n/target)))`` via bit_length, no
    float log), so a SQL oracle can reproduce it from ``count(*)``
    without 1-ulp ceil hazards near power-of-two boundaries.
    """
    if corpus_rows <= target_bucket_rows:
        return 1
    m = -(-corpus_rows // target_bucket_rows)  # ceil(n / target)
    return max(1, (m - 1).bit_length())


def ann_sign_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-LSH
    bucket(s), then exact cosine rank within.

    The corpus is bucketed by a projection (no shuffle); the candidate
    join is an equi-join on the bucket string, so each query touches
    ~corpus/2^bits rows instead of all of them.

    ``tables`` > 1 enables **multi-table OR-amplification** — table ``t``
    uses the sign bits of dimensions ``[t*bits, (t+1)*bits)``; a
    candidate matches if it shares *any* table's bucket. Recall for a
    neighbor at angle θ is ``1 - (1 - p^bits)^tables`` with
    ``p = 1 - θ/π`` — single-table sign-LSH has low recall for
    moderate-cosine neighbors (measured 3% at bits=6 on the sf0.01
    embeddings vs 91% at bits=4, tables=16; see
    ``tests/test_similarity.py`` recall gate). Candidate cost per query
    is ``tables * corpus/2^bits`` id-pairs; vectors are joined back
    *after* pair dedup, so the corpus vectors are never replicated per
    table. Requires ``bits * tables <= dim``.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    if tables > 1:
        return _ann_sign_lsh_multi(
            corpus, queries, k, bits, tables, id_col, vec_col, query_id_col
        )
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


def _table_bucket(vec: Column, bits: int, table: Column) -> Column:
    """Bucket string for multi-table LSH: sign bits of the ``bits``-wide
    dimension slice starting at ``table * bits`` (1-based slice)."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(vec, table * bits + 1, bits),
            lambda v: F.when(v >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )


def _ann_sign_lsh_multi(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    bits: int,
    tables: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Multi-table sign-LSH: one (table, bucket) equi-join over exploded
    bucket keys — candidates are (query, neighbor) **id pairs only** until
    after dedup, so vectors cross the wire once per candidate, not once
    per (table, candidate)."""
    t = F.explode(F.sequence(F.lit(0), F.lit(tables - 1))).alias("t")
    c_keys = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).select("neighbor_id", t, "__cv").select(
        "neighbor_id", "t", _table_bucket(F.col("__cv"), bits, F.col("t")).alias("bucket")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qnorm", norm(F.col("__qv")))
    q_keys = q.select("query_id", "__qv").select(
        "query_id", t, "__qv"
    ).select("query_id", "t", _table_bucket(F.col("__qv"), bits, F.col("t")).alias("bucket"))
    cand = (
        c_keys.join(F.broadcast(q_keys), on=["t", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cnorm", norm(F.col("__cv")))
    scored = (
        cand.join(c_vecs, on="neighbor_id")
        .join(F.broadcast(q.select("query_id", "__qv", "__qnorm")), on="query_id")
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
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
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


def embedding_outliers(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    norm_lo: float = 0.01,
    norm_hi: float = 0.99,
    center_frac: float = 0.05,
) -> DataFrame:
    """Embedding sanity screen with two signals:

    - **norm band**: L2 norm outside the corpus [norm_lo, norm_hi]
      percentile band — near-zero or exploded norms are encoder
      failures (vacuous on pre-normalized corpora, cheap to keep);
    - **off-manifold tail**: cosine to the corpus mean vector below the
      ``center_frac`` percentile — the far-from-everything samples that
      poison k-means seeding and ANN recall measurements.

    Plan: one projection computes norms; the corpus centroid is ``dim``
    ``avg`` aggregates (a 1-row result, broadcast back); thresholds are
    one exact-percentile aggregate over the scored rows (another 1-row
    broadcast). ``F.percentile`` (exact, linear interpolation) ==
    DuckDB ``quantile_cont``. No shuffle ever carries the vectors.

    Returns ``(id, norm, center_cos, outlier)`` for every vector.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    df = df.where(F.col(vec_col).isNotNull())
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    cent = v.agg(
        F.array(*[F.avg(F.col("__v")[i]) for i in range(dim)]).alias("__c")
    )
    scored = (
        v.crossJoin(F.broadcast(cent))
        .select(
            id_col,
            F.round(norm(F.col("__v")), 6).alias("norm"),
            F.round(
                dot(F.col("__v"), F.col("__c"))
                / (norm(F.col("__v")) * norm(F.col("__c"))),
                6,
            ).alias("center_cos"),
        )
    )
    # r16: the two norm percentiles come from ONE array-argument
    # Percentile (one value-multiset buffer instead of two; identical
    # interpolation — guide §1.2 per-task work). center_cos is a
    # different input column, so it keeps its own aggregate.
    bounds = scored.agg(
        F.percentile(
            F.col("norm"), F.array(F.lit(norm_lo), F.lit(norm_hi))
        ).alias("__nb"),
        F.percentile(F.col("center_cos"), F.lit(center_frac)).alias("__clo"),
    ).select(
        F.element_at("__nb", 1).alias("__nlo"),
        F.element_at("__nb", 2).alias("__nhi"),
        "__clo",
    )
    return scored.crossJoin(F.broadcast(bounds)).select(
        id_col,
        "norm",
        "center_cos",
        (
            (F.col("norm") < F.col("__nlo"))
            | (F.col("norm") > F.col("__nhi"))
            | (F.col("center_cos") < F.col("__clo"))
        ).alias("outlier"),
    )


def kmeans_step(
    corpus: DataFrame,
    centroids: DataFrame,
    dim: int,
    id_col: str = "id",
    vec_col: str = "__v",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "__cv",
    kernel: str = "arrow",
) -> DataFrame:
    """One Lloyd iteration of spherical k-means: assign every vector to
    its nearest centroid by cosine (:func:`ivf_assign` — broadcast
    centroids, map-side ``max(struct)`` argmax, one row per vector
    crosses the wire), then recompute each centroid as the element-wise
    mean of its members.

    Assignment strategy: the centroid table is k×dim doubles — driver
    material by definition (k ~ √N lists) — so it is collected and the
    argmax runs map-side against the literal centroids: no exchange
    ever carries a vector. (The :func:`ivf_assign` join form finalizes
    its ``max(struct)`` after an exchange keyed by vector id — a
    full-corpus shuffle of vectors that this path avoids entirely.)

    Two interchangeable assignment kernels (identical output, proven by
    the shared-oracle gate twin):

    - ``"expr"`` (opt-in oracle twin): one cosine column per centroid
      (``zip_with`` + ``aggregate`` fold) and a ``greatest(struct)``
      argmax. Pure
      column expressions, but Spark evaluates higher-order array
      functions INTERPRETED (not whole-stage codegen) — measured ~10x
      slower than the Arrow kernel at k=100, d=64, and the k·d literal
      tree also costs analyzer time. (An unrolled ``v[0]*c0 + …``
      codegen form was measured 4-6x slower still — the 6400-term
      method trips janino's limits and falls back to interpretation
      with a bigger tree.)
    - ``"arrow"`` (DEFAULT — the production kernel, ~10x faster
      measured): ``mapInPandas`` assignment — each Arrow batch is one
      BLAS matmul ``M @ C.T`` + row argmax (NumPy ``argmax`` takes the
      FIRST maximum, and centroids are sorted ascending, so ties break
      to the lowest centroid id exactly like the expr form). This is
      the 100 TB kernel: per-batch cost is a dense GEMM instead of
      k·d interpreted lambda steps per row. Cosines round to 6 places
      BEFORE the argmax in both kernels, so the blocked-vs-sequential
      float summation difference (last-ulp) is quantized away —
      measured bit-identical outputs at every SF.

    The mean is then ``dim`` plain ``avg(vec[i])`` aggregates —
    fixed-width codegen with map-side partial aggregation, so the only
    shuffle carries one partial-sum row per (centroid, map partition).
    Iterating this function trains the IVF coarse quantizer
    (:func:`ann_ivf`) in-engine; swapping trained centroids into the
    index changes no plan. Cosines and components are rounded to 6
    places for engine-portable comparison; ties break toward the lowest
    centroid id, matching :func:`ivf_assign`.

    Returns ``(centroid_id, n_members, centroid)``.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    import math

    if kernel not in ("expr", "arrow"):
        raise ValueError(f"unknown kmeans_step kernel {kernel!r}")
    cents = [
        (int(r[0]), list(r[1]))
        for r in centroids.select(centroid_id_col, centroid_vec_col).collect()
    ]
    cents.sort()  # ascending centroid id: first-max argmax == lowest-id ties
    if kernel == "arrow":
        import numpy as np

        cids = [c[0] for c in cents]
        C = np.array([c[1] for c in cents], dtype=np.float64)
        cn = np.sqrt((C * C).sum(axis=1))

        def assign(batches):
            for pdf in batches:
                M = np.stack(pdf[vec_col].to_numpy())
                vn = np.sqrt((M * M).sum(axis=1))
                sims = _q6(np, (M @ C.T) / (vn[:, None] * cn[None, :]))
                best = sims.argmax(axis=1)
                out = pdf[[id_col, vec_col]].copy()
                # vector rides through the kernel so the means need no
                # join back — still no exchange carrying a vector
                out["centroid_id"] = [cids[i] for i in best]
                yield out

        assigned = corpus.select(id_col, vec_col).mapInPandas(
            assign,
            schema=f"{id_col} long, {vec_col} array<double>, centroid_id long",
        )
        return assigned.groupBy(F.col("centroid_id").alias(centroid_id_col)).agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.array(
                *[F.round(F.avg(F.col(vec_col)[i]), 6) for i in range(dim)]
            ).alias("centroid"),
        )
    # Two-phase on purpose (the lang_id pattern): materialize each
    # per-centroid cosine as a real column first — an inline fold-left
    # when-chain over the dot() expressions triples the tree per
    # centroid (3^k nodes) and OOMs the analyzer by k=10.
    v = corpus.withColumn("__vn", norm(F.col(vec_col)))
    sim_cols = {}
    for cid, cvec in cents:
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        cn = math.sqrt(sum(float(x) * float(x) for x in cvec))
        sim_cols[cid] = F.round(
            dot(F.col(vec_col), carr) / (F.col("__vn") * F.lit(cn)), 6
        ).alias(f"__s_{cid}")
    scored = v.select("*", *sim_cols.values())
    # struct comparison is lexicographic, so greatest((sim, -cid)) is
    # max-by-sim with ties to the lowest centroid id — one expression.
    cands = [
        F.struct(F.col(f"__s_{cid}").alias("s"), F.lit(-cid).alias("n"))
        for cid, _ in cents
    ]
    best = F.greatest(*cands) if len(cands) > 1 else cands[0]
    assigned = scored.withColumn(
        centroid_id_col, (-best["n"]).cast("long")
    )
    return assigned.groupBy(centroid_id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.array(
            *[F.round(F.avg(F.col(vec_col)[i]), 6) for i in range(dim)]
        ).alias("centroid"),
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
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
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
    corpus_rows: int | None = None,
    max_bucket_rows: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Pairs are only compared within a sign-LSH bucket (sub-quadratic);
    emits (id_a, id_b, cosine >= threshold). High-cosine pairs agree on
    most sign bits, so recall stays high while the self-join stays small.

    Within-bucket work is quadratic in occupancy (expected
    ``corpus/2^bits`` rows → ``occ²/2`` pairs per bucket), so ``bits``
    must scale with ``log2(corpus)`` — see :func:`suggest_bits`. Pass
    ``corpus_rows`` (a known row count; no extra job is run) to get a
    warning when expected occupancy exceeds ``max_bucket_rows``.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    df = df.where(F.col(vec_col).isNotNull())
    if corpus_rows is not None:
        occ = corpus_rows / (1 << bits)
        if occ > max_bucket_rows:
            warnings.warn(
                f"embedding_near_dups: expected bucket occupancy "
                f"{occ:.0f} rows > {max_bucket_rows} at bits={bits}; "
                f"use bits>={suggest_bits(corpus_rows, max_bucket_rows)} "
                f"to bound within-bucket quadratic work",
                RuntimeWarning,
                stacklevel=2,
            )
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


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors via Arrow-batched BLAS matmul — the
    throughput kernel for the same semantics as :func:`cosine_topk`.

    The SQL kernel's dot product is an interpreted higher-order function
    (~µs per pair); this one ships each corpus partition to Python as
    Arrow batches and scores it as one ``(batch × dim) @ (dim × q)``
    numpy matmul (BLAS), then keeps the per-batch top-k per query —
    ``num_batches × q × k`` candidate rows total — and ranks globally
    with a window. Per-batch top-k is lossless for global top-k (any
    global winner is a batch winner). Measured ~7× warm over the HOF
    kernel at 100k×64 vectors / 25 queries (0.6 s vs 4.1 s, local[8]),
    and the gap widens with query count (the matmul amortizes); use it
    when exact brute force is required at scale and `ann_*` recall is
    not enough.

    ``queries`` is collected to the driver (it is a small query batch by
    contract — same assumption as the broadcast in :func:`cosine_topk`)
    and closed over by the kernel; the corpus streams through Arrow
    without ever shuffling. Results are rounded to 6 places like every
    other similarity kernel; float64 summation order differs from the
    sequential HOF accumulate, so ulp-level differences can flip
    boundary ties — rank ties still break by neighbor id.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, cosine double"
        )
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.asarray([r["__qv"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            C = np.asarray(list(pdf["__cv"]), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (batch, q)
            S[ids[:, None] == q_ids[None, :]] = -np.inf  # self-matches
            kk = min(k, len(ids))
            # per-query top-kk within the batch (lossless for global top-k)
            top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, q)
            out_q, out_n, out_c = [], [], []
            for j in range(S.shape[1]):
                rows = top[:, j]
                keep = S[rows, j] > -np.inf
                out_q.extend([q_ids[j]] * int(keep.sum()))
                out_n.extend(ids[rows[keep]])
                out_c.extend(_q6(np, S[rows[keep], j]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    pool_kernel: str = "arrow",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (λ = 1/2): greedily
    re-rank each query's relevance pool so every pick balances
    closeness to the query against redundancy with already-picked
    results — the standard diversity re-ranker for retrieval-augmented
    sampling and eval-set construction.

    Two stages, each scale-shaped:

    1. Pool: exact brute-force cosine (broadcast/closure query batch,
       corpus never shuffles) keeps ``pool`` candidates per query — the
       only stage that touches the corpus. ``pool_kernel`` picks
       :func:`cosine_topk_arrow` (BLAS matmul — default, ~7× warm) or
       the ``"expr"`` :func:`cosine_topk`; both round to 6 places
       before ranking, so pools — and MMR output — are identical.
    2. Greedy MMR: per-query state is ``pool × pool`` similarities
       (bounded, tiny), so the iteration runs in ONE Arrow-batched
       ``applyInPandas`` over query groups — never a cross-corpus op.

    Determinism contract (hash-matched against an UNROLLED k-layer SQL
    oracle): relevance and pairwise similarities are quantized to
    integer micro-units (``round(cos × 1e6)``), and with λ = 1/2 the
    MMR objective ``λ·rel − (1−λ)·max_sim`` scales to the pure INTEGER
    score ``rel_micro − maxsim_micro`` — no float rounding can diverge
    between engines; ties break by neighbor id ascending. Emits
    ``(query_id, mmr_rank, neighbor_id, mmr_score_2x_micro)``.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    import numpy as np
    import pandas as pd

    pool_fn = cosine_topk_arrow if pool_kernel == "arrow" else cosine_topk
    if pool_kernel not in ("arrow", "expr"):
        raise ValueError(f"unknown mmr pool kernel {pool_kernel!r}")
    pool_df = pool_fn(
        corpus, queries, k=pool, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine") * 1e6, 0).cast("long").alias("rel_micro"),
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    )
    # pool is (queries × pool) rows — broadcast it into the corpus join
    # so candidate vectors attach without shuffling the corpus
    cand = F.broadcast(pool_df).join(vecs, "neighbor_id")

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        rel = pdf["rel_micro"].to_numpy(dtype=np.int64)
        C = np.asarray(list(pdf["__cv"]), dtype=np.float64)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        S = _half_away(np, (Cn @ Cn.T) * 1e6).astype(np.int64)
        # order by id so argmax tie-breaks resolve to the smallest id
        order = np.argsort(ids)
        ids, rel, S = ids[order], rel[order], S[np.ix_(order, order)]
        n = len(ids)
        # maxsim over the EMPTY selected set is 0 by convention (first
        # pick is pure relevance); thereafter it is the true max over
        # picks — which can be NEGATIVE (anti-correlated vectors), so
        # it must not be floored at 0
        maxsim = None
        avail = np.ones(n, dtype=bool)
        out = []
        for step in range(1, min(k, n) + 1):
            score = rel.copy() if maxsim is None else rel - maxsim
            score[~avail] = np.iinfo(np.int64).min
            j = int(np.argmax(score))  # first (smallest-id) max wins
            out.append((qid, step, int(ids[j]), int(score[j])))
            avail[j] = False
            col = S[:, j]
            maxsim = col.copy() if maxsim is None else np.maximum(maxsim, col)
        return pd.DataFrame(
            out,
            columns=["query_id", "mmr_rank", "neighbor_id", "mmr_score_2x_micro"],
        )

    return cand.groupBy("query_id").applyInPandas(
        greedy,
        schema="query_id long, mmr_rank int, neighbor_id long, "
        "mmr_score_2x_micro long",
    )


def random_projection(
    df: DataFrame,
    dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss sign random projection: ``dim``-d vectors
    compress to ``out_dim`` dimensions via a deterministic ±1 matrix —
    the standard pre-reduction before LSH/clustering at scale (JL:
    pairwise distances preserved within ε for out_dim = O(log n / ε²);
    Achlioptas 2001 shows ±1 entries suffice).

    The projection matrix is never materialized per row: it is an
    ``out_dim × dim`` sign table (engine-reproducible md5 parity — the
    simhash convention) BROADCAST into the exploded coordinate stream;
    each output coordinate is one map-side-combined aggregate over
    (vec, out-dim) groups. Coordinates are micro-quantized to integers
    BEFORE the sum, so the aggregate is exact integer math — no float
    summation order anywhere — and only (vec, j, partial-sum) scalars
    shuffle, never vectors.

    Emits ``(id, j, value_micro)`` rows — ``Σ_d sign(j,d)·v_d /
    √out_dim`` in INTEGER micro-units (the Achlioptas scaling: each
    projected coordinate is a ±1-weighted sum with variance ‖v‖², so
    dividing by √out_dim makes ``E[‖Pv‖²] = ‖v‖²`` — norms and pairwise
    distances are preserved in expectation; a √dim divisor would shrink
    all distances by √(out_dim/dim), caught by the norm-ratio test).
    Determinism: dividing the exact integer sum by √out_dim and
    rounding to a whole micro lands on exactly-representable halves
    (never the inexact .5e-6 decimal boundary where Spark's
    BigDecimal HALF_UP and DuckDB's double round diverge — observed a
    1-micro split on this exact corpus with a fractional output).
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    df = df.where(F.col(vec_col).isNotNull())
    import math

    spark = df.sparkSession
    signs = [
        (j, d, 1 if int(_md5_hex(f"{j}:{d}")[0], 16) >= 8 else -1)
        for j in range(out_dim)
        for d in range(dim)
    ]
    sign_df = arrow_local_frame(spark, signs, "j long, d long, sign long")
    coords = df.select(
        F.col(id_col),
        F.posexplode(_as_double(F.col(vec_col))).alias("d", "__x"),
    ).select(
        id_col,
        "d",
        F.round(F.col("__x") * 1e6, 0).cast("long").alias("__xm"),
    )
    scale = math.sqrt(out_dim)
    return (
        coords.join(F.broadcast(sign_df), "d")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("sign") * F.col("__xm")).alias("__s"))
        .select(
            id_col,
            "j",
            F.round(F.col("__s") / F.lit(scale), 0)
            .cast("long")
            .alias("value_micro"),
        )
    )


def _md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def mean_pool(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of vectors per group — chunk→document embedding
    pooling, class prototypes, or one k-means centroid-update step.

    Plan shape (the scale-correct one for wide groups): ``posexplode`` to
    (group, dim, value) rows → hash aggregate with map-side partial
    sum/count → in-order reassembly via ``array_sort(collect_list(
    struct(dim, mean)))``. Only (group, dim) scalars shuffle — never whole
    vectors — and no per-group state exceeds dim rows. A ``collect_list``
    -of-vectors + HOF fold would hold entire groups in aggregate state;
    this never does.

    Returns (group_col, embedding array<double>, n_vectors).
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    df = df.where(F.col(vec_col).isNotNull())
    ex = df.select(
        F.col(group_col),
        F.posexplode(_as_double(F.col(vec_col))).alias("__dim", "__val"),
    )
    per_dim = ex.groupBy(group_col, "__dim").agg(
        F.round(F.avg("__val"), 6).alias("__mean"),
        F.count(F.lit(1)).alias("__n"),
    )
    return per_dim.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__dim", "__mean"))),
            lambda s: s["__mean"],
        ).alias(vec_col),
        # max, not first: with ragged vector lengths per-dim counts can
        # differ and first() would be pick-order-dependent
        F.max("__n").alias("n_vectors"),
    )


def semdedup(
    df: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): within each
    embedding cluster, drop every vector whose cosine to a *higher-ranked*
    cluster member exceeds ``threshold``; rank is cosine-to-centroid
    descending (ties to the lower id), so the kept set is deterministic
    and prototype-like members win.

    The published algorithm is exactly this shape: pairwise similarity is
    computed only WITHIN clusters, so the cost is Σ|cluster|² — the
    clustering (k ≈ √N lists, trained with :func:`kmeans_step`) is what
    keeps it sub-quadratic at 100 TB; the pair join is a bucketed
    equi-join on the cluster id, shuffle-partitionable and
    AQE-skew-handled, never all-pairs. Centroids come from
    :func:`mean_pool` (only (group, dim) scalars shuffle), and the
    centroid table broadcasts back for the cosine-to-centroid projection.

    Returns (id, cluster, cos_centroid, kept).
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    df = df.where(F.col(vec_col).isNotNull())
    cents = mean_pool(df, cluster_col, vec_col).select(
        F.col(cluster_col), F.col(vec_col).alias("__c")
    )
    v = df.select(
        F.col(cluster_col),
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__v"),
    ).join(F.broadcast(cents), on=cluster_col)
    scored = v.withColumn(
        "cos_centroid", F.round(cosine(F.col("__v"), F.col("__c")), 6)
    ).drop("__c")
    from pyspark.sql.window import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col("cos_centroid").desc(), F.col(id_col).asc()
    )
    # The ranked frame feeds both pair sides and the final kept-join;
    # materialize it once so the centroid pool + window don't execute
    # three times. localCheckpoint (not persist): CacheManager pins a
    # persisted frame until an explicit unpersist nobody here can issue
    # after the caller's action — a storage leak across long sessions —
    # while localCheckpoint blocks are reclaimed by the ContextCleaner
    # as soon as the returned frame is unreachable.
    ranked = scored.withColumn("__rk", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    # The pair join's cost is quadratic CPU within each cluster while its
    # BYTES are tiny (one vector row per member), so AQE's byte-based
    # partition coalescing packs the whole join into 1-3 tasks and
    # serializes the Σ|cluster|² cosine work (measured: a 3.1 s
    # single-task stage at sf0.1 with 31 cores idle; guide §2.5 — AQE
    # cannot see CPU density). An EXPLICIT partition count on both sides
    # is exempt from coalescing and the join reuses the co-partitioning,
    # so the exchange count is unchanged — only its width. Width = the
    # session's configured shuffle width (scale-adaptive: production
    # sessions size spark.sql.shuffle.partitions to the cluster).
    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    a = ranked.repartition(width, F.col(cluster_col)).select(
        F.col(cluster_col).alias("__cl"),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("__va"),
        F.col("__rk").alias("__rka"),
    )
    b = ranked.repartition(width, F.col(cluster_col)).select(
        F.col(cluster_col).alias("__cl"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("__vb"),
        F.col("__rk").alias("__rkb"),
    )
    dropped = (
        a.join(b, on="__cl")
        .where(
            (F.col("__rka") < F.col("__rkb"))
            & (F.round(cosine(F.col("__va"), F.col("__vb")), 6) >= threshold)
        )
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return (
        ranked.join(
            dropped.withColumn("__drop", F.lit(True)), on=id_col, how="left"
        )
        .select(
            id_col,
            F.col(cluster_col),
            "cos_centroid",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space splits into
    ``m`` subspaces of ``dim/m`` dimensions; each subspace gets
    ``codes`` centroids. Returned as a plain Python list
    ``[m][codes][dim/m]`` — m·codes·(dim/m) = dim·codes doubles, driver
    material by definition (the PQ codebook of a billion-vector index
    is a few KB; that is the point of PQ).

    Seeding is deterministic (the ``codes`` lowest-id vectors'
    subvectors, one TakeOrdered job) so any engine reproduces it;
    refine the codebooks in-engine by running :func:`kmeans_step`
    per subspace over ``F.slice`` projections if recall needs it —
    the encode/search plans don't change.
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    w = dim // m
    seed = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(codes)
        .collect()
    )
    if len(seed) < codes:
        raise ValueError(f"corpus has {len(seed)} rows < codes={codes}")
    return [
        [[float(x) for x in r[1][s * w : (s + 1) * w]] for r in seed]
        for s in range(m)
    ]


def _sq_dot(a: list[float], b: list[float]) -> float:
    """Sequential-order dot product — matches the engines' fold order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """PQ encoding: each vector compresses to ``m`` small code ids —
    at m=8, codes=16 that is 8 nibbles (4 bytes) per vector instead of
    256 bytes of float32, the 64x compression that lets a 100 TB
    embedding corpus fit a memory-speed ANN index.

    Per subspace the nearest codeword by squared L2 — computed as
    ``dot(sv,sv) - 2*dot(sv,c) + dot(c,c)`` (the expansion every engine
    can reproduce term-for-term), rounded to 6 places, ties to the
    lowest code id. Output is EXPLODED ``(id, subspace, code)`` scalar
    rows; assignment never shuffles a vector in either kernel.

    Kernels (identical output, same argument as :func:`kmeans_step` —
    the 6-place rounding before the argmin absorbs blocked-vs-
    sequential float summation):

    - ``"arrow"`` (default): one ``mapInPandas`` pass; per batch each
      subspace is a GEMM ``M_s @ C_s.T`` + row argmin (NumPy first-min
      == lowest code on ties). m·codes HOF evaluations per row become
      m dense matmuls per batch.
    - ``"expr"``: pure column expressions with ``least(struct)``
      argmin — no Python at all, but Spark evaluates the higher-order
      ``aggregate``/``zip_with`` dot products interpreted (measured
      ~7 s vs ~0.5 s at 2000 rows × 128 codewords).
    """
    # NULL-vector contract (r9): a NULL embedding is not a point in the
    # space — filter at entry so rankings never carry NULL scores, Arrow
    # kernels never receive None arrays, and the SQL oracles can mirror
    # the behavior (DuckDB's list_inner_product errors on NULL input).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    m = len(codebooks)
    codes = len(codebooks[0])
    w = len(codebooks[0][0])
    if kernel not in ("expr", "arrow"):
        raise ValueError(f"unknown pq_encode kernel {kernel!r}")
    v = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    if kernel == "arrow":
        import numpy as np

        C = [np.array(cb, dtype=np.float64) for cb in codebooks]
        c2 = [(c * c).sum(axis=1) for c in C]

        def encode(batches):
            import pandas as pd

            for pdf in batches:
                M = np.stack(pdf["__v"].to_numpy())
                n = len(pdf)
                ids = pdf[id_col].to_numpy()
                out_id, out_s, out_c = [], [], []
                for s in range(m):
                    Ms = M[:, s * w : (s + 1) * w]
                    sv2 = (Ms * Ms).sum(axis=1)
                    d2 = _q6(
                        np, sv2[:, None] - 2 * (Ms @ C[s].T) + c2[s][None, :]
                    )
                    best = d2.argmin(axis=1)  # first min -> lowest code
                    out_id.append(ids)
                    out_s.append(np.full(n, s, dtype=np.int64))
                    out_c.append(best.astype(np.int64))
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(out_id),
                        "subspace": np.concatenate(out_s),
                        "code": np.concatenate(out_c),
                    }
                )

        return v.mapInPandas(
            encode, schema=f"{id_col} long, subspace long, code long"
        )
    per_sub = []
    for s in range(m):
        sv = F.slice(F.col("__v"), s * w + 1, w)
        sv2 = dot(sv, sv)
        cands = []
        for ci, cvec in enumerate(codebooks[s]):
            carr = F.array(*[F.lit(x) for x in cvec])
            c2 = _sq_dot(cvec, cvec)
            d2 = F.round(sv2 - 2 * dot(sv, carr) + F.lit(c2), 6)
            cands.append(
                F.struct(d2.alias("d"), F.lit(ci).cast("long").alias("c"))
            )
        best = F.least(*cands) if codes > 1 else cands[0]
        per_sub.append(
            F.struct(
                F.lit(s).cast("long").alias("subspace"),
                best["c"].alias("code"),
            )
        )
    return (
        v.select(id_col, F.explode(F.array(*per_sub)).alias("__sc"))
        .select(id_col, F.col("__sc.subspace"), F.col("__sc.code"))
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (ADC, Jégou et al.
    2011): per query, a lookup table of squared distances from each
    query SUBvector to every codeword (m·codes doubles — driver
    material), then each corpus vector's approximate distance is just
    ``m`` table lookups summed — the scan touches only the tiny code
    columns, never a float vector.

    Table entries are micro-quantized (half-up to integer micro-units)
    BEFORE the cross-subspace sum, so scores are exact integers and the
    ranking is engine-reproducible. Plan: the |queries|·m·codes-row LUT
    BROADCASTS into one hash join against the code rows, ONE
    map-side-combined aggregate sums the m lookups per (query, vector),
    and one window takes each query's top-k — one plan regardless of
    query count (an inlined-literal LUT per query would grow the plan
    with the batch and fall out of codegen).

    Returns ``(query_id, vec_id, adc_micro)``: the k nearest per query,
    ties to the lowest id.
    """
    import math

    m = len(codebooks)
    w = len(codebooks[0][0])
    # Per-(query, subspace, codeword) distance table as a BROADCAST
    # DataFrame — |queries|·m·codes rows of driver material. The earlier
    # form inlined each query's table as a giant literal array probed
    # with element_at: one aggregate expression per query meant plan
    # size (and per-query re-analysis) grew with the query batch, and a
    # multi-thousand-literal expression tree falls out of codegen. The
    # join form is ONE plan for any query count: code rows hash-join the
    # broadcast LUT, then a single map-side-combined aggregate sums the
    # m lookups per (query, vector).
    lut_rows = []
    for qid, qv in queries:
        for s in range(m):
            qs = [float(x) for x in qv[s * w : (s + 1) * w]]
            q2 = _sq_dot(qs, qs)
            for ci, cvec in enumerate(codebooks[s]):
                d2 = round(q2 - 2 * _sq_dot(qs, cvec) + _sq_dot(cvec, cvec), 6)
                lut_rows.append(
                    (int(qid), s, ci, int(math.floor(d2 * 1_000_000 + 0.5)))
                )
    lut = arrow_local_frame(
        codes_df.sparkSession,
        lut_rows,
        "query_id long, subspace long, code long, d2_micro long",
    )
    scored = (
        codes_df.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d2_micro").alias("adc_micro"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("adc_micro", id_col)
    return (
        scored.withColumn("__rn", F.row_number().over(w_rank))
        .where(F.col("__rn") <= k)
        .select("query_id", id_col, "adc_micro")
    )


def kmeans_train(
    corpus: DataFrame,
    k: int,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "id",
    vec_col: str = "__v",
    kernel: str = "arrow",
) -> DataFrame:
    """Full spherical k-means training: deterministic seed (the ``k``
    lowest-id vectors, one TakeOrdered) + ``iters`` Lloyd iterations of
    :func:`kmeans_step` — the complete in-engine trainer for the IVF
    coarse quantizer (:func:`ann_ivf`) and the SemDeDup clustering.

    Lineage is CUT every iteration for free: :func:`kmeans_step`
    collects its centroid table to the driver (k·dim doubles — driver
    material by definition) and re-embeds it as literals, so iteration
    N+1's plan contains constants, not iteration N's DAG — no
    checkpointing needed, no lineage blow-up, and each iteration is
    exactly one corpus pass. Empty clusters drop out (the standard
    Lloyd treatment), so the returned centroid count may be < k.

    Returns the final step's ``(centroid_id, n_members, centroid)``.
    """
    # NULL-vector contract (r9): seeds and iterations skip NULL vectors
    # (kmeans_step filters its corpus; the seed TakeOrdered must match,
    # or a NULL seed becomes a None centroid the kernels choke on).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    cent = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("__cv"),
        )
    )
    step = None
    for _ in range(iters):
        step = kmeans_step(
            corpus,
            cent,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            kernel=kernel,
        )
        cent = step.select(
            "centroid_id", F.col("centroid").alias("__cv")
        )
    return step


def ann_ivf_pq(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_lists: int = 20,
    nprobe: int = 4,
    m: int = 8,
    codes: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. 2011) — the
    billion-vector index composition: an inverted file over coarse
    centroids bounds which vectors a query touches, and residual
    product quantization bounds what each touched vector COSTS
    (m code lookups, no float vector ever read at query time).

    Index layout per vector: ``(list_id, m nibble codes)`` — the codes
    quantize the RESIDUAL ``v/|v| − centroid`` (residuals are what PQ
    must encode once a coarse quantizer exists; encoding raw vectors
    would spend the codebook re-describing list structure). Vectors are
    L2-normalized first so ADC's squared-L2 ranking equals the cosine
    ranking every other ANN operator here uses.

    Build plan: ONE ``mapInPandas`` pass — per Arrow batch, coarse
    assignment is a GEMM + argmax, residuals a subtraction, and each
    subspace's code a small GEMM + argmin (the :func:`kmeans_step` /
    :func:`pq_encode` Arrow-kernel pattern); the emitted index rows are
    (id, list_id, subspace, code) scalars. No exchange carries a
    vector. Query plan: the query batch is small by contract, so probe
    selection and the per-(query, probed-list) residual lookup tables
    are driver material, shipped as ONE broadcast LUT frame; the hash
    join against it IS the list pruning (an index row only meets
    queries that probed its list — the IVF point), followed by one
    map-side-combined aggregate and one per-query top-k window — a
    single plan for any query-batch size.

    Coarse centroids and residual codebooks are TRAINED deterministically
    (driver-side NumPy k-means over a fixed lowest-id sample — a few
    hundred rows, driver material); :func:`kmeans_train` output drops in
    for cluster-scale training without changing any plan. ``rerank`` > 0
    adds the standard IVF-PQ finishing stage: the ADC scan produces a
    ``rerank``-deep shortlist per query and ONLY those vectors are
    fetched (broadcast semi-join against the corpus scan) for exact
    cosine scoring — compressed index for the search, float vectors
    touched for k' rows per query only.

    Returns ``(query_id, neighbor_id, adc_micro)`` ascending approximate
    distance (ties to the lowest id, self-matches excluded), or with
    ``rerank``: ``(query_id, rank, neighbor_id, cosine)``.
    """
    import math

    import numpy as np

    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    w = dim // m
    train_n = max(n_lists + codes, min(512, 4 * codes + n_lists))
    # NULL-vector contract (r9): NULL embeddings are not index points —
    # filter before seeding/encoding (a None seed row crashes np.array).
    corpus = corpus.where(F.col(vec_col).isNotNull())
    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(train_n).collect()
    )
    if len(seed_rows) < n_lists + codes:
        raise ValueError(
            f"corpus has {len(seed_rows)} rows < {n_lists + codes}"
        )
    S = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)
    S = S / np.linalg.norm(S, axis=1, keepdims=True)

    def _np_kmeans(X: "np.ndarray", kk: int) -> "np.ndarray":
        # deterministic driver-side Lloyd (the training sample is a few
        # hundred rows by construction): first-kk seed, 10 rounds
        cb = X[:kk].copy()
        for _ in range(10):
            d2 = ((X[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            asg = d2.argmin(axis=1)
            for ci in range(kk):
                members = X[asg == ci]
                if len(members):
                    cb[ci] = members.mean(axis=0)
        return cb

    # Trained coarse centroids: lowest-id seeds alone measured a 0.56
    # recall CEILING at nprobe=4/20 (lists don't align with clusters);
    # driver-side k-means over the sample lifts the ceiling to ~1.0 at
    # nprobe=n_lists and the same plan serves either.
    C = _np_kmeans(S, n_lists)
    # Residual codebooks: per-subspace k-means over the sample's
    # residuals. Untrained codebooks are useless (16 arbitrary residuals
    # as codewords measured recall@5 = 0.16 vs ~0.5 trained).
    seed_asg = _q6(np, S @ C.T).argmax(axis=1)
    R = S - C[seed_asg]
    CB = [
        np.ascontiguousarray(_np_kmeans(R[:, s * w : (s + 1) * w], codes))
        for s in range(m)
    ]
    cb2 = [(cb * cb).sum(axis=1) for cb in CB]

    def build(batches):
        import pandas as pd

        for pdf in batches:
            M = np.stack(pdf["__v"].to_numpy())
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            lists = _q6(np, M @ C.T).argmax(axis=1)
            res = M - C[lists]
            n = len(pdf)
            ids = pdf[id_col].to_numpy()
            out_id, out_l, out_s, out_c = [], [], [], []
            for s in range(m):
                Rs = res[:, s * w : (s + 1) * w]
                d2 = _q6(
                    np,
                    (Rs * Rs).sum(axis=1)[:, None]
                    - 2 * (Rs @ CB[s].T)
                    + cb2[s][None, :],
                )
                out_id.append(ids)
                out_l.append(lists.astype(np.int64))
                out_s.append(np.full(n, s, dtype=np.int64))
                out_c.append(d2.argmin(axis=1).astype(np.int64))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_id),
                    "list_id": np.concatenate(out_l),
                    "subspace": np.concatenate(out_s),
                    "code": np.concatenate(out_c),
                }
            )

    index = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).mapInPandas(
        build,
        schema=f"{id_col} long, list_id long, subspace long, code long",
    )
    # Per-(query, probed list, subspace, codeword) residual distance
    # table as ONE broadcast DataFrame (|queries|·nprobe·m·codes rows of
    # driver material). The join IS the probe pruning: an index row only
    # scores against queries that probed its list. The earlier per-query
    # form (literal-array LUT + element_at, one aggregate per query)
    # re-executed the whole index build per query and grew the plan with
    # the batch; this is one plan — one mapInPandas index pass, one
    # broadcast hash join, one map-side-combined aggregate, one window.
    spark = corpus.sparkSession
    lut_rows = []
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        q = q / np.linalg.norm(q)
        probed = np.argsort(-_q6(np, q @ C.T))[:nprobe]
        for li in probed:
            qr = q - C[li]
            for s in range(m):
                qs = qr[s * w : (s + 1) * w]
                d2 = (qs * qs).sum() - 2 * (CB[s] @ qs) + cb2[s]
                for ci, x in enumerate(_q6(np, d2)):
                    lut_rows.append(
                        (
                            int(qid),
                            int(li),
                            s,
                            ci,
                            int(math.floor(float(x) * 1_000_000 + 0.5)),
                        )
                    )
    lut = arrow_local_frame(
        spark,
        lut_rows,
        "query_id long, list_id long, subspace long, code long, d2_micro long",
    )
    scored = (
        index.join(F.broadcast(lut), ["list_id", "subspace", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("d2_micro").alias("adc_micro"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        "adc_micro", F.col(id_col).asc()
    )
    out = (
        scored.withColumn("__rn", F.row_number().over(w_short))
        .where(F.col("__rn") <= max(k, rerank))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adc_micro"
        )
    )
    if not rerank:
        return out
    # Exact rerank of the ADC shortlist — the standard IVF-PQ finish:
    # the compressed scan produced `rerank` candidates per query; only
    # THOSE vectors are fetched (inner BHJ of the corpus scan against
    # the broadcast shortlist — the retrieval.py online-lookup shape)
    # and scored with exact cosine. ADC quantization noise caps
    # recall@5 around ~0.5 here; reranking restores the coarse-probe
    # ceiling (measured 0.72 at nprobe=8/20).
    qdf = arrow_local_frame(
        spark,
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "query_id long, __qv array<double>",
    )
    cand = out.select("query_id", "neighbor_id")
    fetched = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__nv"),
    ).join(F.broadcast(cand), "neighbor_id")
    exact = fetched.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__nv"), F.col("__qv")), 6).alias("cosine"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
