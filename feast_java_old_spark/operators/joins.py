"""Skew-resistant join strategies.

Hot keys are the classic 100 TB join failure: a shuffle hash/sort-merge
join sends every row of a key to one reducer, so one celebrity user or
one default-valued key turns a 1000-executor join into a single-task
straggler (the ``key_skew_stats`` diagnostic in ``operators/text.py``
measures exactly this). AQE's skew-join splitting handles *sort-merge*
skew adaptively when partition sizes trip its thresholds; salting is the
deterministic, strategy-independent form — and the only option when the
skewed side must join a non-broadcastable dimension.

:func:`skew_join` implements classic salt-and-replicate: the fact side
gets a deterministic salt in ``[0, salt)`` derived by hashing its
payload columns (a pure row function — stable under task retry, no
``rand()``); the dimension side is replicated ``salt`` times via
``explode(sequence(...))``. The join key becomes (keys…, salt), so each
hot key fans out over ``salt`` reducers. Join results are provably
identical to the unsalted join: every fact row meets every dimension row
of its key exactly once (the dimension copy carrying that row's salt).

Cost model: dimension shuffle volume grows ``salt``×; fact volume is
unchanged. Use for inner/left joins of a skewed fact against a
moderate-size dimension that exceeds the broadcast threshold. (For
dimensions that *do* fit in memory, ``F.broadcast`` — used throughout
``operators/retrieval.py`` — is strictly better: no shuffle at all.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with hot-key salting.

    ``how`` may be ``inner`` or ``left`` (outer semantics on the fact
    side are preserved: a fact row's single salt value always has a
    matching dimension replica when the key exists at all).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return fact_salted.join(dim_salted, on=[*on, "__salt"], how=how).drop(
        "__salt"
    )


def char_qgrams(col: Column, q: int = 3) -> Column:
    """Distinct character q-grams of a string — built-in ``transform``
    over an index sequence with ``Column.substr`` (no UDF); the blocking
    key generator for fuzzy matching.

    Strings shorter than ``q`` (and NULLs) yield an EMPTY array: without
    the guard, ``sequence(1, length-(q-1))`` has start > stop and Spark
    defaults to step −1, producing a descending index list and spurious
    truncated/empty grams — which both corrupts the candidate set (an
    empty-gram blocking key pairs every short string) and diverges from
    the oracle's ``range()``, which yields no grams there."""
    idx = F.sequence(F.lit(1), F.length(col) - (q - 1))
    grams = F.array_distinct(
        F.transform(idx, lambda i: col.substr(i, F.lit(q)))
    )
    return F.when(F.length(col) >= q, grams).otherwise(
        F.array().cast("array<string>")
    )


def sorted_neighborhood_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    window: int = 5,
    max_distance: int = 2,
    block_chars: int = 3,
) -> DataFrame:
    """Entity resolution by (blocked) sorted neighborhood — the other
    classic blocking strategy next to :func:`fuzzy_match`'s q-gram
    blocking: records sort by the match key and only pairs within
    ``window`` sorted positions are compared. Typo'd twins sort
    adjacently, so a tiny window finds them with O(n·w) comparisons.

    Distributed form: a GLOBAL sort rank would funnel the corpus
    through one task, so the neighborhood runs WITHIN ``block_chars``-
    prefix blocks (partitioned windows — blocks sort in parallel; the
    classic multi-pass remedy for cross-block misses is re-running
    with a second key, e.g. reversed names). Candidate generation is
    ``window`` LEAD columns over the sorted block — a pure window pass,
    O(n·window) by CONSTRUCTION with no self-join anywhere: even a
    degenerate block key (every row one block — e.g. a constant name
    prefix) costs one linear sorted pass, where a (block, rank-offset)
    self-join would go quadratic per block (measured 56 s vs 1 s at
    sf0.1 on exactly that degenerate case). Levenshtein runs only on
    the exploded neighbor pairs.

    Returns ``(id_a, id_b, name_a, name_b, distance)`` — same contract
    as :func:`fuzzy_match`, different recall profile (misses pairs
    whose first ``block_chars`` differ; finds prefix-sharing pairs
    whose grams were all stop-grams).
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.substring(F.col(name_col), 1, block_chars).alias("__blk"),
    )
    w = Window.partitionBy("__blk").orderBy(F.col("name").asc(), F.col("id").asc())
    if window <= 0:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, name_a string, name_b string, distance int"
        )
    # lead() is a window expression — computed in its own projection,
    # THEN exploded (a generator cannot host window expressions)
    with_leads = base.select(
        "id",
        "name",
        *[
            F.lead(
                F.struct(F.col("id").alias("id"), F.col("name").alias("name")),
                i,
            )
            .over(w)
            .alias(f"__l{i}")
            for i in range(1, window + 1)
        ],
    )
    leads = with_leads.select(
        "id",
        "name",
        F.explode(
            F.array(*[F.col(f"__l{i}") for i in range(1, window + 1)])
        ).alias("nb"),
    ).where(F.col("nb").isNotNull())
    cand = leads.select(
        F.least(F.col("id"), F.col("nb.id")).alias("id_a"),
        F.greatest(F.col("id"), F.col("nb.id")).alias("id_b"),
        F.when(F.col("id") < F.col("nb.id"), F.col("name"))
        .otherwise(F.col("nb.name"))
        .alias("name_a"),
        F.when(F.col("id") < F.col("nb.id"), F.col("nb.name"))
        .otherwise(F.col("name"))
        .alias("name_b"),
    )
    return cand.withColumn(
        "distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
    ).where(F.col("distance") <= max_distance)


def fuzzy_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    q: int = 3,
    max_df: int = 50,
    max_distance: int = 2,
) -> DataFrame:
    """Entity resolution by blocked fuzzy string matching: candidate
    pairs share at least one *discriminative* character q-gram (grams
    occurring in more than ``max_df`` records are stop-grams — shared
    prefixes like "Customer#" — and are dropped, the standard blocking
    trick), then verified with exact Levenshtein distance ≤
    ``max_distance``. Both stages are deterministic, so the oracle
    reproduces the identical candidate set.

    Plan shape: the gram explode is a pure projection; the stop-gram
    filter is one map-side-combined aggregate joined back on the gram;
    candidate generation is a gram-keyed self-join bounded by
    Σ df² over KEPT grams — sub-quadratic by the ``max_df`` cap, never
    all-pairs; Levenshtein (JVM built-in) runs only on the candidate
    pairs.

    Returns ``(id_a, id_b, name_a, name_b, distance)``.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    ex = base.select(
        "id", "name", F.explode(char_qgrams(F.col("name"), q)).alias("gram")
    )
    dfreq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    kept = ex.join(dfreq.where(F.col("__df") <= max_df), on="gram")
    a = kept.select(
        "gram", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = kept.select(
        "gram", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    cand = (
        a.join(b, on="gram")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return cand.withColumn(
        "distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
    ).where(F.col("distance") <= max_distance)
