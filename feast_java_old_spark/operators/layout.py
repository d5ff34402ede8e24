"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional file skipping.

At 100 TB the scan you avoid is worth more than the scan you speed up:
parquet readers prune row groups/files whose column min/max stats miss
the predicate, but a table sorted by one column interleaves the others
randomly — a filter on the second column prunes nothing. Z-ordering
interleaves the bits of several columns into one sort key, so a range
partition on the key makes every output file a compact hyper-rectangle
in ALL the z-ordered dimensions at once — min/max stats stay tight for
each of them, and point/range predicates on any z-dimension skip most
files. (The same layout trick ships in Delta/Iceberg ``OPTIMIZE
ZORDER BY``; this is the engine-native form.)

Everything here is integer Column arithmetic (shifts/masks folded over
a ``sequence``) — JVM-side, portable to the DuckDB oracle bit-for-bit —
plus one ``repartitionByRange`` (a range exchange with sampled
boundaries; the only shuffle) and a within-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``d`` non-negative integer columns, ``bits``
    low bits each, into one BIGINT: output bit ``i*d + j`` is bit ``i``
    of column ``j``. Pure shift/mask fold — no UDF. ``d * bits`` must
    stay < 63.
    """
    d = len(cols)
    if d * bits >= 63:
        raise ValueError(f"{d} cols x {bits} bits overflows a signed 64-bit key")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            # static unroll: literal shift amounts keep every term a
            # plain codegen expression (no interpreted HOF in the key)
            z = z + F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * d + j
            )
    return z


def zorder_scale(col: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Affine-scale a numeric column into ``[0, 2^bits)`` given its
    min/max (broadcast scalars): the quantization step before
    interleaving. Degenerate (constant) columns map to 0.
    """
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (top + 1)).cast("long"), top.cast("long"))


# xy→d tables per `bits`, driver-computed once per process: a pure
# function of `bits` (like ann_eval's gain table), never of data. 4^bits
# longs — 64k entries at the default 8 bits, ~1.5 MB broadcast.
_HILBERT_TABLE_MAX_BITS = 10
_HILBERT_TABLES: dict[int, list[int]] = {}


def _hilbert_table(bits: int) -> list[int]:
    """``d`` for every (x, y) in [0, 2^bits)², indexed ``y * n + x`` —
    the same public-domain quadrant-fold recurrence the expression form
    unrolls (verified element-for-element against it)."""
    tab = _HILBERT_TABLES.get(bits)
    if tab is None:
        n = 1 << bits
        tab = [0] * (n * n)
        for y in range(n):
            base = y * n
            for x in range(n):
                xx, yy, d, s = x, y, 0, n >> 1
                while s > 0:
                    rx = 1 if xx & s else 0
                    ry = 1 if yy & s else 0
                    d += s * s * ((3 * rx) ^ ry)
                    if ry == 0:
                        if rx == 1:
                            xx, yy = s - 1 - xx, s - 1 - yy
                        xx, yy = yy, xx
                    s >>= 1
                tab[base + x] = d
        _HILBERT_TABLES[bits] = tab
    return tab


def _hilbert_key_lookup(
    df: DataFrame, x_col: str, y_col: str, bits: int, out_col: str
) -> DataFrame:
    """Broadcast-join form of :func:`hilbert_key` (r16): the per-bit
    CASE recurrence costs ~0.6 s of driver-side tree building + analysis
    PER CALL (the x/y references triple the tree every step) and an
    8-step interpreted chain per row at execution; for the bit widths
    the layout queries use, the whole transform is a 4^bits-entry pure
    lookup — one ~1.5 MB broadcast hash join, no expression tree at
    all. Same values by construction (the table is generated from the
    identical recurrence and verified against the expression form in
    tests)."""
    import pyarrow as pa

    spark = df.sparkSession
    n = 1 << bits
    tab = _hilbert_table(bits)
    lut = spark.createDataFrame(
        pa.table(
            {
                "__hk_xy": pa.array(range(n * n), type=pa.int64()),
                "__hk_d": pa.array(tab, type=pa.int64()),
            }
        )
    )
    keep = df.columns
    keyed = df.withColumn(
        "__hk_xy",
        F.col(y_col).cast("long") * F.lit(n) + F.col(x_col).cast("long"),
    )
    return (
        keyed.join(F.broadcast(lut), "__hk_xy", "left")
        .select(*keep, F.col("__hk_d").alias(out_col))
    )


def hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hkey",
    barrier_every: int = 3,
) -> DataFrame:
    """2-D HILBERT curve index of two pre-scaled ``[0, 2^bits)`` integer
    columns — the better-locality alternative to the Morton key
    (:func:`interleave_bits`): consecutive Hilbert indices are always
    edge-adjacent cells (unit Manhattan step, the property the contract
    test brute-forces), while a Z-curve jumps a half-grid at every
    quadrant seam. Fewer seams ⇒ range scans over the sort key touch
    fewer files for the same 2-D selection box.

    Standard bitwise xy→d transform (the public-domain quadrant-fold
    recurrence, cf. Hamilton's compact Hilbert indices): per output bit
    level, accumulate ``s²·quadrant`` and rotate/reflect the frame —
    ``bits`` unrolled steps of plain shift/mask/CASE arithmetic, no
    UDF. Takes and returns a DataFrame (not a Column) because each
    step's (x, y) reference the previous step's ~3 times: after
    CollapseProject re-inlining, a pure-Column form would grow ~3^bits
    expression nodes; every ``barrier_every`` steps the running columns
    are materialized behind an ``explode(array(struct(…)))`` barrier
    (projections do not collapse across a Generate), pinning plan size
    linear in ``bits``.
    """
    if bits <= _HILBERT_TABLE_MAX_BITS:
        return _hilbert_key_lookup(df, x_col, y_col, bits, out_col)
    n = 1 << bits
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    d = F.lit(0).cast("long")
    keep = df.columns
    for step, k in enumerate(range(bits - 1, -1, -1), start=1):
        s = 1 << k
        rx = F.shiftright(x, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, k).bitwiseAND(F.lit(1))
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 1, 2)
            .otherwise(3)
        )
        d = d + F.lit(s * s).cast("long") * quad
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        ).otherwise(y)
        x, y = nx, ny
        if step % barrier_every == 0 and k > 0:
            df = df.select(
                *keep,
                x.alias("__hx"),
                y.alias("__hy"),
                d.alias("__hd"),
            )
            df = df.select(
                F.explode(F.array(F.struct(*df.columns))).alias("r")
            ).select("r.*")
            x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
    return df.select(*keep, d.alias(out_col))


def layout_hilbert(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int = 32,
) -> DataFrame:
    """:func:`layout_zorder` with the Hilbert key: min/max-scale the two
    dimensions (one broadcast aggregate), index, range-partition and
    sort on the index. Same plan shape — one tiny aggregate, one range
    exchange, one within-partition sort — with strictly better
    file-box locality on 2-D selections."""
    if len(cols) != 2:
        raise ValueError("layout_hilbert is 2-D; use layout_zorder for d≠2")
    cx, cy = cols
    mm = df.agg(
        F.min(cx).alias("__lo_x"), F.max(cx).alias("__hi_x"),
        F.min(cy).alias("__lo_y"), F.max(cy).alias("__hi_y"),
    )
    scaled = df.crossJoin(F.broadcast(mm)).select(
        *df.columns,
        zorder_scale(
            F.col(cx), F.col("__lo_x"), F.col("__hi_x"), bits
        ).alias("__sx"),
        zorder_scale(
            F.col(cy), F.col("__lo_y"), F.col("__hi_y"), bits
        ).alias("__sy"),
    )
    keyed = hilbert_key(scaled, "__sx", "__sy", bits, out_col="__h")
    return (
        keyed.drop("__sx", "__sy")
        .repartitionByRange(num_files, F.col("__h"))
        .sortWithinPartitions("__h")
    )


def layout_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_files: int = 32,
) -> DataFrame:
    """Rewrite ``df`` into ``num_files`` range partitions ordered by the
    Z-value of ``cols`` (each min/max-scaled to ``bits`` bits first).
    Write the result with ``.write.parquet`` and every file is a tight
    hyper-rectangle in all ``cols`` — multi-dimensional file skipping.

    Plan: one tiny min/max aggregate (1 row, broadcast), one range
    exchange (sampled boundaries — the single data shuffle), one
    within-partition sort. Stats collection never rescans: min/max ride
    the same broadcast join.
    """
    mm = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    scaled = df.crossJoin(F.broadcast(mm))
    z = interleave_bits(
        [
            zorder_scale(
                F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
            )
            for c in cols
        ],
        bits,
    )
    return (
        scaled.withColumn("__z", z)
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
    )


def compaction_plan(
    files: DataFrame,
    size_col: str = "size_bytes",
    order_col: str = "path",
    part_cols: list[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner (the Delta/Iceberg ``OPTIMIZE``
    bin-packing step, engine-native): assign every input file to an
    output bin of ~``target_bytes`` so a rewrite pass can coalesce the
    long tail of tiny files that otherwise dominates task-scheduling and
    footer-read overhead at 100 TB (a day of streaming ingest easily
    leaves millions of KB-sized files; scan cost becomes per-FILE, not
    per-byte).

    The rule is cumulative-offset binning per table partition: files
    sorted (size DESC, then ``order_col`` for determinism) are assigned
    ``bin_id = floor(bytes_before / target_bytes)``. Unlike greedy
    first-fit — whose bin boundaries depend on every prior decision and
    therefore can't be expressed as a window — this is one
    ``sum() OVER (ORDER BY ...)`` with bins overflowing ``target_bytes``
    by at most one file; size-descending order keeps that overflow to
    the smallest files' scale. Returns the input plus
    ``(bin_id, bin_bytes, bin_files)``.

    Scale shape: this is a PLANNER over file *metadata* rows (~100
    bytes each), never data — one shuffle keyed by the table partition
    columns, one in-partition sort; 10M files of metadata is ~1 GB in
    one partition's task, far below executor memory, and real tables
    spread it across their partition keys. The rewrite itself is the
    caller's ``repartition(bins)``-style pass reading the plan.
    """
    parts = part_cols or []
    w = Window.partitionBy(*parts).orderBy(
        F.col(size_col).desc(), F.col(order_col)
    )
    before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    planned = files.withColumn(
        "bin_id", F.floor(before / F.lit(target_bytes)).cast("long")
    )
    wb = Window.partitionBy(*(parts + ["bin_id"]))
    return planned.withColumn(
        "bin_bytes", F.sum(size_col).over(wb).cast("long")
    ).withColumn("bin_files", F.count(F.lit(1)).over(wb).cast("long"))


def cumulative_offsets(
    totals: DataFrame,
    bucket_col: str,
    total_col: str,
    out_col: str = "__off",
    descending: bool = False,
) -> DataFrame:
    """Exclusive prefix sum over a per-bucket TOTALS frame — the shared
    offset step of every distributed prefix-sum operator in the repo
    (:func:`global_sort_ranks`, ``text.sequence_pack``,
    ``curation.token_budget_select``): a single-partition window over
    ≤ ``buckets`` rows (metadata, not data — never a driver collect,
    never the full table through one task). The first bucket's empty
    frame coalesces to offset 0. ``descending=True`` walks buckets
    best-first (the token-budget order)."""
    order = (
        F.col(bucket_col).desc() if descending else F.col(bucket_col).asc()
    )
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    return totals.select(
        bucket_col,
        F.coalesce(F.sum(total_col).over(w), F.lit(0)).alias(out_col),
    )


def global_sort_ranks(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: list[str] | None = None,
    buckets: int = 64,
    rank_name: str = "global_rank",
) -> DataFrame:
    """Contiguous global row numbers 1..N in ``(order_col,
    *tiebreak_cols)`` ascending order WITHOUT a single-partition sort —
    the scale-correct form of ``row_number() OVER (ORDER BY ...)``,
    which Spark executes as an Exchange to ONE partition holding the
    entire table (the classic global-window trap; fine at 60k rows,
    fatal at 100 TB).

    Decomposition: a global rank is (rows in all lower value-ranges) +
    (rank within my range).  So:

    1. ``percentile_approx`` boundaries of ``order_col`` (one aggregate;
       ``buckets-1`` doubles collected — bounded driver material, the
       kmeans-centroid precedent);
    2. bucket assignment as a chained-comparison codegen expression
       (``Σ_i v > b_i`` — a pure function of the VALUE, so equal keys
       can never straddle a bucket and determinism survives recompute,
       unlike ``repartitionByRange``'s sampled, job-local boundaries);
    3. per-bucket counts → cumulative offsets: a window over ≤
       ``buckets`` rows (the only single-partition exchange — metadata,
       not data);
    4. offsets broadcast-joined back; ``row_number`` over a window
       PARTITIONED by bucket (each partition sorts only its slice);
       rank = offset + in-bucket row number.

    NULL order values rank first (bucket 0 + Spark's asc-nulls-first),
    matching ``NULLS FIRST`` semantics.  Skewed boundaries collapse to
    fewer distinct buckets (duplicates are dropped); correctness never
    depends on balance — only parallelism does.  Three passes over the
    input (boundaries, counts, rank) — at 100 TB persist the input or
    accept the rescans; each pass is a scan + map-side work only.
    """
    ties = tiebreak_cols or []
    fracs = [i / buckets for i in range(1, buckets)]
    bnds_row = df.agg(
        F.percentile_approx(order_col, fracs, 10_000).alias("b")
    ).collect()[0].b
    bnds = sorted({float(b) for b in (bnds_row or []) if b is not None})
    v = F.col(order_col)
    bucket = F.lit(0)
    for b in bnds:
        bucket = bucket + F.when(v > F.lit(b), 1).otherwise(0)
    bucket = F.when(v.isNull(), F.lit(0)).otherwise(bucket).cast("int")
    with_b = df.withColumn("__bkt", bucket)
    counts = with_b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
    offsets = cumulative_offsets(counts, "__bkt", "__n")
    w_rank = Window.partitionBy("__bkt").orderBy(
        F.col(order_col).asc(), *[F.col(c).asc() for c in ties]
    )
    return (
        with_b.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            rank_name,
            (F.col("__off") + F.row_number().over(w_rank)).cast("long"),
        )
        .drop("__bkt", "__off")
    )


def zone_map_stats(
    df: DataFrame,
    file_col: str,
    stat_cols: list[str],
) -> DataFrame:
    """Per-file zone maps — the parquet footer min/max/null-count stats
    table, engine-native: one row per pseudo-file with
    ``(n_rows, min_<c>, max_<c>, nulls_<c>)`` per tracked column.

    This is what a table format's metadata layer (Delta/Iceberg
    manifests, parquet row-group footers) materializes; computing it in
    the engine lets layout decisions be AUDITED: the zone maps under a
    candidate layout quantify exactly how many files a predicate would
    skip BEFORE rewriting 100 TB.  One map-side-combined aggregate
    keyed by the file id; stats rows are metadata-sized (files × cols),
    never data.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return df.groupBy(F.col(file_col).alias("file_id")).agg(*aggs)


def zone_map_prune(
    stats: DataFrame,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Files that MIGHT contain rows with ``lo <= col <= hi``: a file
    survives iff its ``[min, max]`` interval overlaps the predicate's —
    the row-group skipping rule every parquet reader applies.  SUPERSET
    guarantee: a file holding a matching row always survives (no false
    skips); files of only-NULL values carry NULL min/max and are kept
    (NULL-safe conservatism, like the readers).  Selectivity depends
    entirely on layout: range-clustered files prune to ~the predicate's
    value fraction, hash/random layouts prune nothing — measuring that
    difference is the point of auditing layouts through
    :func:`zone_map_stats` before a rewrite.
    """
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (
            F.col(f"max_{col}").isNull() | (F.col(f"max_{col}") >= F.lit(lo))
        )
    if hi is not None:
        cond = cond & (
            F.col(f"min_{col}").isNull() | (F.col(f"min_{col}") <= F.lit(hi))
        )
    return stats.where(cond)
