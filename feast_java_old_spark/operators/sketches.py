"""Mergeable sketches: approximate distinct counts and quantiles.

At 100 TB, exact ``COUNT(DISTINCT)`` over a high-cardinality column is a
full shuffle of every distinct value; exact percentiles are a global
sort. The sketch forms bound both to kilobytes per group: Spark 4 ships
Apache DataSketches HLL (``hll_sketch_agg`` / ``hll_union_agg``) whose
binary sketches are *mergeable* — partial sketches computed per
shard/day/partition union into the exact same estimate as one pass over
the whole data, which is what makes incremental corpus statistics
possible (sketch each new day, union with history; never re-scan).

Estimates are deterministic for a given input multiset (the sketch hash
is seeded), so tests assert exact equality between merged-shard and
whole-corpus paths — but they are NOT reproducible by other engines
(DuckDB's approx_count_distinct uses a different HLL), so the driver
gate for these is rows-only by design (the oracle-equivalence rule
exempts sketch internals; error-bound and merge tests live in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL distinct estimate (±~1.6% at lgK=12, ~4 KB/group).
    One aggregate-sized shuffle: partial sketches merge map-side."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col), F.lit(lgk))).alias(
            f"approx_distinct_{col}"
        )
    )


def distinct_sketches(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-group binary HLL sketches — the mergeable partial form to
    persist alongside shard/day outputs (union later instead of
    re-scanning)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("hll_sketch")
    )


def merge_distinct_sketches(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Union persisted partial sketches (e.g. per-day) into per-group
    estimates: the incremental path — cost is sketch-count, not
    data-size."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll_sketch"))).alias(
            "approx_distinct"
        )
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate percentiles (Greenwald-Khanna via
    ``percentile_approx``): rank error <= 1/accuracy, partials merge
    map-side — the scale substitute for the exact sort-based
    ``a6_percentiles`` query."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(F.col(col), probabilities, accuracy).alias(
            "quantiles"
        )
    )


def _cms_col_hash(digest, row_idx: int, width: int):
    """Row-``row_idx`` CMS column index: the ``row_idx``-th disjoint
    28-bit slice of ONE md5 digest of the value, mod width. md5 output
    bits are independent, so disjoint slices give the pairwise-
    independent hash family CMS needs at 1/depth the digest cost of
    hashing ``"{row}:{value}"`` per row (measured ~2.5x the whole
    build). Identical in SQL as
    ``('0x' || substr(md5(v), 1 + 7*row, 7))::BIGINT % width`` —
    the cross-engine-reproducible hash family used throughout
    (see dedup.shingle_base_hash). Caps depth at 4 (4 x 7 hex chars
    fit one digest)."""
    return (
        F.conv(F.substring(digest, 1 + 7 * row_idx, 7), 16, 10).cast("long")
        % F.lit(width)
    )


def count_min_cells(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a column's frequency distribution as
    ``(row_idx, col_idx, cnt)`` cell rows — the mergeable partial form:
    shard sketches SUM cell-wise into the corpus sketch (same guarantee
    as HLL union), so incremental "token/URL/key frequency over a
    growing corpus" never re-scans history.

    One explode (``depth`` rows per input row, computed map-side) and
    one map-side-combined aggregate; the shuffle carries at most
    ``partitions × depth × width`` partial cells regardless of input
    size or cardinality — the 100 TB substitute for an exact
    ``GROUP BY value`` whose distinct-value shuffle won't bound.
    Estimate error: overcount ≤ e·n/width with prob ≥ 1 − e^−depth.
    """
    if depth > 4:
        raise ValueError("depth > 4 exceeds the 28-bit slices of one md5")
    digest = F.md5(F.col(col).cast("string"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row_idx"),
                _cms_col_hash(digest, i, width).alias("col_idx"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(rows).alias("rc"))
        .groupBy(F.col("rc.row_idx").alias("row_idx"), F.col("rc.col_idx").alias("col_idx"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    cells: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: per probe value, ``min`` over the
    ``depth`` cells it hashes to. The sketch is ≤ depth × width rows —
    broadcast — so estimation is a map-side join + a probe-sized
    aggregate: no shuffle of anything data-sized."""
    digest = F.md5(F.col(col).cast("string"))
    hashed = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row_idx"),
                        _cms_col_hash(digest, i, width).alias("col_idx"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(col, F.col("rc.row_idx").alias("row_idx"), F.col("rc.col_idx").alias("col_idx"))
    return (
        hashed.join(F.broadcast(cells), ["row_idx", "col_idx"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def cms_join_size(
    cells_a: DataFrame, cells_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join output-size estimate from two count-min sketches — the
    AMS/CMS inner-product estimator: ``|A ⋈ B| = Σ_v f_A(v)·f_B(v)``,
    estimated as ``min over rows r of Σ_c A[r,c]·B[r,c]`` (each row's
    cell product over-counts by hash collisions only, so the min is an
    upper-bound estimate within ε·‖f_A‖₁‖f_B‖₁).

    This is how a planner sizes a join (and detects a skew blow-up)
    WITHOUT scanning either input: the sketches are ≤ depth×width rows
    each, persisted and mergeable, so the estimate is a kilobyte-sized
    join + aggregate. Returns one row ``(est_pairs)``.
    """
    a = cells_a.select("row_idx", "col_idx", F.col("cnt").alias("__ca"))
    b = cells_b.select("row_idx", "col_idx", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["row_idx", "col_idx"])
        .groupBy("row_idx")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_row.agg(F.min("__ip").alias("est_pairs"))


def _bloom_pos_array(col: str, k: int, bits: int, family: str):
    """The ``k`` Bloom bit positions of ``col`` as one array column.
    Values are cast to string first so build and probe sides agree even
    when their key column types differ (int vs bigint)."""
    if family == "md5":
        if k > 4:
            raise ValueError("k > 4 exceeds the 28-bit slices of one md5")
        digest = F.md5(F.col(col).cast("string"))
        return F.array(*[_cms_col_hash(digest, i, bits) for i in range(k)])
    if family == "xxhash":
        s = F.col(col).cast("string")
        return F.array(
            *[F.pmod(F.xxhash64(s, F.lit(i)), F.lit(bits)) for i in range(k)]
        )
    raise ValueError(f"unknown bloom hash family {family!r}")


def bloom_build(
    df: DataFrame, col: str, k: int = 4, bits: int = 4096,
    family: str = "md5",
) -> DataFrame:
    """Bloom filter of a key set as its SET-BIT rows ``(bit_pos)`` —
    the distributed representation: shard filters union (distinct) into
    the corpus filter, and at ≤ ``bits`` rows the whole filter
    broadcasts. The 100 TB use is JOIN PRUNING: before shuffling a huge
    fact table against a filtered dim, probe the dim's Bloom filter
    map-side and drop the (typically vast) majority of fact rows that
    cannot match — Spark's own runtime row-level filtering does exactly
    this, and this operator is the explicit, persistable form.

    Hash family (``family="md5"``, default): the ``k`` disjoint 28-bit
    md5 slices (engine-reproducible — see :func:`_cms_col_hash`),
    ``k ≤ 4``. One digest per row; the aggregate is a map-side-combined
    distinct bounded by ``bits``. ``family="xxhash"`` switches to
    seeded ``xxhash64`` — ~4× cheaper (native codegen long hash, no
    hex-string conv) and unbounded ``k``, but NOT reproducible in SQL
    engines: use it when no oracle needs to replay the positions, e.g.
    :func:`bloom_prune`, whose oracle is the unpruned join itself.
    """
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.explode(_bloom_pos_array(col, k, bits, family)).alias(
                "bit_pos"
            )
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, col: str, k: int = 4, bits: int = 4096
) -> DataFrame:
    """Probe values against a Bloom filter: ``maybe_present`` iff all
    ``k`` bit positions are set. No false negatives ever; false
    positives at the classic ``(1 - e^{-kn/bits})^k`` rate. The filter
    broadcasts; probing is a map-side join + a probe-sized aggregate.
    """
    digest = F.md5(F.col(col).cast("string"))
    pos = F.array(*[_cms_col_hash(digest, i, bits) for i in range(k)])
    # Hash the DISTINCT probe keys, not the raw probe rows: a value that
    # appears m times would otherwise contribute m*k matched rows and
    # fail the == k test — a false NEGATIVE, which a Bloom filter must
    # never produce (the join-pruning use case probes repeating fact
    # keys).  With one exploded array per distinct value, count == k
    # holds exactly when every position is set, even if two of the k
    # hashes collide on the same bit (both exploded rows match it).
    probe_keys = probes.select(col).distinct()
    hashed = probe_keys.select(F.col(col), F.explode(pos).alias("bit_pos"))
    hits = (
        hashed.join(F.broadcast(bloom), "bit_pos")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        probe_keys
        .join(hits, col, "left")
        .select(
            F.col(col),
            (F.coalesce("__hits", F.lit(0)) == k).alias("maybe_present"),
        )
    )


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    k: int = 4,
    bits: int = 4096,
) -> DataFrame:
    """Map-side Bloom prune of ``fact`` against ``dim``'s join-key set:
    returns the fact rows that MIGHT match (a superset of the true
    matches — no false negatives, FPs at the classic Bloom rate).

    The filter's set-bit rows pack into ONE dense ``array<long>`` word
    row (``bits/64`` longs — 2 MB at 2^24 bits) that broadcasts, and
    each probe is ``element_at`` (constant-time on arrays) + an AND
    mask — NOT an ``array_contains`` scan of the set-bit list, which
    would be O(set bits) per row. Everything stays lazy — no driver
    collect. The 100 TB case is a big-big join where the dim side is
    filtered to a sliver: a billion-key dim can't broadcast as a hash
    set, but its fixed-size bitmap can, so the fact's non-matching
    majority never reaches the exchange.

    Plan shape detail: Catalyst folds the probe predicate into the
    single-row BroadcastNestedLoopJoin's condition, and BNLJ conditions
    are evaluated INTERPRETED — so the hash computation is projected
    fact-side FIRST (whole-stage codegen); only the trivial
    ``element_at(mask, wi) & bit`` residual lands in the join
    condition. Folding the full probe into the condition instead
    re-evaluates k interpreted hashes per fact row (measured ~4× the
    whole prune at sf0.1). The hash family is seeded ``xxhash64``, not
    the engine-reproducible md5 slices: no oracle ever replays these
    positions (the oracle is the UNPRUNED join), and native long
    hashing is ~4× cheaper than md5+hex-conv per probe.
    """
    nwords = (bits + 63) // 64
    words = (
        bloom_build(dim, on, k=k, bits=bits, family="xxhash")
        .groupBy(F.floor(F.col("bit_pos") / 64).cast("int").alias("__wi"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("bit_pos") % 64).cast("int"),
                )
            ).alias("__w")
        )
    )
    # Densify (__wi, __w) into ONE positional array<long> row.  The
    # obvious map_from_entries + element_at(map, i) per index is a TRAP:
    # Spark map lookup is a linear scan, so the fill is O(nwords²)
    # interpreted (measured 18 s at 2^20 bits).  Instead union a zero
    # row for EVERY word index (bit_or identity), so after the word
    # aggregate the collect_list is gap-free and sort_array + a field
    # extract lays the words out positionally in O(n log n).
    zeros = dim.sparkSession.range(nwords).select(
        F.col("id").cast("int").alias("__wi"),
        F.lit(0).cast("long").alias("__w"),
    )
    mask = (
        words.unionByName(zeros)
        .groupBy("__wi")
        .agg(F.bit_or("__w").alias("__w"))
        .agg(
            F.sort_array(F.collect_list(F.struct("__wi", "__w"))).alias("__s")
        )
        .select(
            F.transform(F.col("__s"), lambda x: x["__w"]).alias("__mask")
        )
    )
    key = F.col(on).cast("string")
    wi_cols = [f"__bp_wi{i}" for i in range(k)]
    bit_cols = [f"__bp_bit{i}" for i in range(k)]
    staged = fact.where(F.col(on).isNotNull())
    pos_exprs = {}
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(bits))
        pos_exprs[wi_cols[i]] = F.floor(pos / 64).cast("int") + 1
        pos_exprs[bit_cols[i]] = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
    staged = staged.withColumns(pos_exprs)
    probe = F.lit(True)
    for i in range(k):
        word = F.element_at(F.col("__mask"), F.col(wi_cols[i]))
        probe = probe & (word.bitwiseAND(F.col(bit_cols[i])) != 0)
    return (
        staged.crossJoin(F.broadcast(mask))
        .where(probe)
        .drop("__mask", *wi_cols, *bit_cols)
    )


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    k: int = 4,
    bits: int = 4096,
    how: str = "inner",
) -> DataFrame:
    """Bloom-pruned join: :func:`bloom_prune` ``fact`` against ``dim``'s
    keys BEFORE the join, then join exactly. False positives survive the
    prune but die in the exact join, and a Bloom filter has no false
    negatives — so the result is row-identical to
    ``fact.join(dim, on, how)`` for inner/semi joins, while the shuffle
    (or the broadcast-probe stream) carries only the fact rows that
    might match. This is the explicit, persistable form of Spark's
    runtime row-level filtering
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`).
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            "bloom pruning preserves semantics only for inner/semi joins"
        )
    return bloom_prune(fact, dim, on, k=k, bits=bits).join(dim, on, how)


def _misra_gries_batches(col: str, m: int):
    """mapInPandas kernel: fold each partition's Arrow batches through
    one Misra-Gries summary of at most ``m`` counters, emitting the
    surviving (item, weight) rows when the partition ends."""

    def fold(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf.groupby(col, sort=False, dropna=True)[col].count().items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < m:
                    counters[v] = c
                else:
                    # decrement-all by the smallest count we absorb
                    dec = min(c, min(counters.values()))
                    counters = {
                        k: n - dec for k, n in counters.items() if n > dec
                    }
                    if c > dec:
                        counters[v] = c - dec
        yield pd.DataFrame(
            {col: list(counters.keys()), "__w": list(counters.values())}
        )

    return fold


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    m: int = 256,
) -> DataFrame:
    """Top-k most frequent values with EXACT counts, at bounded memory:
    a per-partition Misra-Gries pass (``m`` counters of state, Arrow
    batched — never a per-partition distinct) nominates candidates,
    then one conditional aggregate recounts ONLY the candidates
    exactly, and the top-k of those is returned.

    Guarantee: any value with global frequency > n/(m+1) must exceed
    its share in at least one partition and therefore survives that
    partition's summary — so with ``m`` sized such that the true k-th
    heavy hitter clears n/(m+1), the result equals the exact
    ``GROUP BY`` top-k while shuffling at most ``partitions × m``
    candidate rows plus one aggregate. This is the 100 TB shape for
    "top URLs / top tokens / hottest keys" where the exact two-level
    aggregate's (partition, value) explosion won't fit.
    """
    from pyspark.sql import functions as F

    src = df.select(col).where(F.col(col).isNotNull())
    schema = f"`{col}` {src.schema[col].dataType.simpleString()}, __w long"
    cand = (
        src.mapInPandas(_misra_gries_batches(col, m), schema=schema)
        .groupBy(col)
        .agg(F.sum("__w").alias("__w"))
        .select(col)
    )
    exact = (
        src.join(F.broadcast(cand), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.orderBy(F.desc("cnt"), col).limit(k)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """K-Minimum-Values distinct sketch per group (Bar-Yossef et al.
    2002; the theta-sketch family's core): the ``k`` smallest
    ``xxhash64`` values of the group's distinct keys. ``k`` longs per
    group — mergeable by "union then keep k smallest", the property
    :func:`kmv_overlap_pairs` exploits for set operations that plain
    HLL (:func:`approx_distinct`) cannot answer.

    One distinct-aggregate + one per-group window (rows = distinct keys
    per group); deterministic — same keys, same sketch, any engine.
    """
    from pyspark.sql.window import Window

    h = df.select(
        F.col(group_col).alias("g"), F.xxhash64(key_col).alias("__h")
    ).dropDuplicates(["g", "__h"])
    w = Window.partitionBy("g").orderBy("__h")
    return (
        h.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .select("g", "__h", "__r")
    )


def _kmv_unit(h) -> "F.Column":
    """Map a signed xxhash64 uniformly onto (0, 1): (h + 2^63 + 1)/2^64."""
    return (h / F.lit(2.0**64)) + F.lit(0.5 + 1.0 / 2.0**64)


def kmv_overlap_pairs(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 256,
    eager: bool = True,
) -> DataFrame:
    """Estimated set overlap for EVERY pair of groups from their KMV
    sketches — |A∪B|, Jaccard, |A∩B| — without touching the raw data
    again: the union sketch is the k smallest of the two sketches
    merged, ĵ = fraction of union-sketch members present in BOTH input
    sketches, |A∪B| ≈ (k−1)/u₍ₖ₎ (exact count when the union carries
    fewer than k hashes), |A∩B| ≈ ĵ·|A∪B|.

    Everything downstream of the sketch is sketch-sized: pair
    enumeration and the membership joins touch k rows per (pair, side).
    At 100 TB the raw data is scanned ONCE (sketch build); a 10 000-
    group overlap matrix is then pure sketch algebra. Standard error
    ~1/√(k−2) on the union size and ~√(j(1−j)/k) on Jaccard; the gate
    keeps the exact twin (``segment_overlap``) as the oracle-bearing
    query and contract tests bound the error.

    The sketch frame is persisted for its three consumers (union build
    + two membership joins). ``eager=True`` (default) materializes the
    pair-count-sized result (``localCheckpoint``) and UNPERSISTS the
    sketch before returning — no storage-memory leak per call.
    ``eager=False`` keeps the plan lazy (for ``.explain`` / plan
    audits) and leaves the persisted sketch to the caller's cache
    management (the ``simhash_candidates`` checkpoint-flag lesson).
    """
    from pyspark.sql.window import Window

    sk = kmv_sketch(df, key_col, group_col, k).persist()
    groups = sk.select("g").distinct()
    pairs = (
        groups.alias("x")
        .crossJoin(groups.alias("y"))
        .where(F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"))
    )
    a = sk.select(F.col("g").alias("ga"), "__h")
    b = sk.select(F.col("g").alias("gb"), "__h")
    merged = (
        pairs.join(a, "ga").select("ga", "gb", "__h")
        .unionByName(pairs.join(b, "gb").select("ga", "gb", "__h"))
        .dropDuplicates(["ga", "gb", "__h"])
    )
    w = Window.partitionBy("ga", "gb").orderBy("__h")
    union_k = merged.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= k
    )
    amem = sk.select(
        F.col("g").alias("__ag"), F.col("__h").alias("__ha")
    )
    bmem = sk.select(
        F.col("g").alias("__bg"), F.col("__h").alias("__hb")
    )
    flagged = (
        union_k.join(
            amem,
            (F.col("ga") == F.col("__ag")) & (F.col("__h") == F.col("__ha")),
            "left",
        )
        .drop("__ag")
        .join(
            bmem,
            (F.col("gb") == F.col("__bg")) & (F.col("__h") == F.col("__hb")),
            "left",
        )
        .drop("__bg")
    )
    agg = flagged.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("__ku"),
        F.sum(
            (F.col("__ha").isNotNull() & F.col("__hb").isNotNull()).cast(
                "long"
            )
        ).alias("__nboth"),
        F.max(F.when(F.col("__r") == k, _kmv_unit(F.col("__h")))).alias(
            "__uk"
        ),
    )
    est_union = F.when(
        F.col("__ku") < k, F.col("__ku").cast("double")
    ).otherwise((k - 1) / F.col("__uk"))
    j_hat = F.col("__nboth") / F.col("__ku")
    out = agg.select(
        F.col("ga").alias("type_a"),
        F.col("gb").alias("type_b"),
        F.round(est_union, 1).alias("est_union"),
        F.round(j_hat, 6).alias("est_jaccard"),
        F.round(est_union * j_hat, 1).alias("est_both"),
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        sk.unpersist()
    return out
