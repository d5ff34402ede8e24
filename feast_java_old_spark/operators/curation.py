"""Corpus-curation operators for training-data assembly.

Beyond the reference's feature-store surface (per the build brief): the
operations a 100 TB pretraining pipeline runs between "raw corpus" and
"training shards" that are not dedup/similarity (those live in
``dedup.py`` / ``similarity.py``):

- **decontamination** — remove/flag training documents that share n-grams
  with an evaluation benchmark (the GPT-3/PaLM-style 13-gram overlap
  rule, parameterized);
- **deterministic corpus shuffle** — a reproducible pseudo-random
  permutation into fixed shards for training-order randomization;
- **normalization + blocklist** — whitespace canonicalization,
  adjacent-duplicate-token collapse, C4-style bad-word flagging;
- **temperature-weighted domain mixing** — per-stratum sampling rates
  ``∝ count^alpha`` (the multilingual/domain mixing rule), applied as a
  deterministic hash filter.

Everything is built-in-expression only (JVM codegen, no UDFs) and every
operator has a term-for-term DuckDB oracle in ``__spark_entry__.py``.

Scale notes per operator are in the docstrings; the common theme: the
only shuffles are per-stratum/per-doc aggregates over *reduced* rows
(matched shingles, per-source counts), never the text itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feast_java_old_spark.operators.dedup import exploded_shingles
from feast_java_old_spark.operators.text import hash_fraction

__all__ = [
    "benchmark_ngrams",
    "decontaminate",
    "corpus_shuffle",
    "corpus_split",
    "dsir_weights",
    "normalize_text",
    "per_stratum_topk",
    "temperature_mix",
    "upsample",
]


def benchmark_ngrams(
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct n-gram set of an evaluation/benchmark corpus — the
    contamination reference. Benchmarks are tiny relative to training
    corpora (MBs vs TBs), so the result is broadcastable by design."""
    return (
        exploded_shingles(bench, text_col=text_col, id_col=id_col, n=n)
        .select("shingle")
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_ngrams: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per training document, count distinct
    n-grams that also occur in the benchmark set and flag documents with
    ``>= min_hits`` overlapping n-grams (GPT-3 appendix-C shape; n and
    the hit threshold are the knobs).

    Plan shape: the benchmark n-gram set (tiny) is broadcast; corpus
    shingles stream through the broadcast inner join WITHOUT per-doc
    pre-dedup — the distinct-count happens after the join, where only
    *matched* shingles survive, so the wide aggregate is sized by the
    contamination overlap, not the corpus. A left join back to the doc-id
    universe reports clean documents as ``n_hits = 0``. The corpus text
    itself never shuffles; at 100 TB the moving data is (doc_id, matched
    shingle) pairs only.

    ``broadcast_ngrams=False`` drops the broadcast hint for oversized
    benchmark sets and lets AQE pick the join strategy.

    Returns ``(doc_id, n_hits, contaminated)`` for every input document.
    """
    grams = benchmark_ngrams(bench, text_col=text_col, id_col=id_col, n=n)
    if broadcast_ngrams:
        grams = F.broadcast(grams)
    corpus_sh = exploded_shingles(
        df, text_col=text_col, id_col=id_col, n=n, distinct=False
    )
    hits = (
        corpus_sh.join(grams, on="shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )
    universe = df.select(F.col(id_col).alias("doc_id"))
    return universe.join(hits, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )


def shuffle_key(id_col: Column, seed: int) -> Column:
    """Deterministic per-row shuffle key: md5 of ``"<id>:<seed>"``.
    Changing the seed produces an independent permutation; the key is a
    pure function of (id, seed) — reproducible on any cluster size."""
    return F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))


def corpus_shuffle(
    df: DataFrame,
    n_shards: int = 64,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Assigns every document a ``(shard, pos)`` such that reading shards in
    order of ``pos`` yields a uniform pseudo-random permutation — the
    training-order randomization step, without ``rand()`` (whose
    evaluation is partitioning-dependent in Spark) and without a global
    sort: shard = 28-bit md5 bucket mod ``n_shards``; pos = rank of the
    md5 key *within* the shard. The per-shard window sorts run in
    parallel (one task per shard — size ``n_shards`` to ~executor count
    x4 at scale; each task sorts corpus/n_shards keys, spilling if
    needed). No stage ever orders the full corpus through one task,
    which is exactly what a naive ``Window.orderBy(key)`` row-numbering
    would do.

    Returns ``(id, shard, pos)``; writers typically follow with
    ``.repartition(n_shards, "shard")`` + partitioned write so each
    shard lands as one file set.
    """
    key = shuffle_key(F.col(id_col), seed)
    out = df.select(
        F.col(id_col),
        key.alias("__key"),
        (
            F.conv(F.substring(key, 1, 7), 16, 10).cast("long")
            % n_shards
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__key"), F.col(id_col))
    return out.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# C4-style bad-word blocklist stand-in. Real pipelines plug in the full
# list; the operator shape (array-overlap flag over normalized tokens)
# is what matters.
DEFAULT_BLOCKLIST: tuple[str, ...] = ("spam", "xxx", "clickbait")


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
) -> DataFrame:
    """Text normalization + blocklist screening as one codegen projection.

    - canonicalize: trim, lowercase, squeeze whitespace runs;
    - collapse adjacent duplicate tokens (``"the the the"`` → ``"the"``
      — the stutter artifact cheap scrapes are full of);
    - flag documents containing any blocklist token (C4 drops the whole
      document on a bad-word hit; we emit the flag so callers choose
      drop vs quarantine).

    Zero shuffles, zero UDFs: the whole operator is array built-ins over
    one pass of the text, so it rides along any scan at 100 TB.

    Returns ``(id, text, n_tokens_raw, n_tokens, blocked)`` where
    ``text`` is the normalized form.
    """
    squeezed = F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " ")
    # Two-phase on purpose: materialize the token array as a real column
    # before the index lambda references it — an inline `split` inside
    # the lambda is a *separate* expression instance from the filter's
    # input, and codegen CSE does not unify them.
    staged = df.select(F.col(id_col), F.split(squeezed, " ").alias("__toks"))
    toks = F.col("__toks")
    # element_at is 1-based, filter's index 0-based: element_at(toks, i)
    # is the *previous* token of the i-th (0-based) element.
    collapsed = F.filter(
        toks, lambda x, i: (i == 0) | (x != F.element_at(toks, i))
    )
    staged2 = staged.select(F.col(id_col), toks, collapsed.alias("__ct"))
    block_arr = F.array(*[F.lit(b) for b in blocklist])
    return staged2.select(
        F.col(id_col),
        F.array_join(F.col("__ct"), " ").alias("text"),
        F.size(toks).cast("long").alias("n_tokens_raw"),
        F.size(F.col("__ct")).cast("long").alias("n_tokens"),
        F.arrays_overlap(F.col("__ct"), block_arr).alias("blocked"),
    )


DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.9),
    ("val", 0.05),
    ("test", 0.05),
)


def corpus_split(
    df: DataFrame,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 fraction of the
    key is binned by cumulative split weights, in the given order.

    A pure projection (zero shuffles) and a pure function of the key:
    membership survives reruns, repartitioning, and incremental corpus
    growth — new documents land in splits at the configured rates while
    existing assignments never move (the property that keeps eval sets
    stable across corpus versions). Weights must sum to ~1; the last
    split absorbs rounding slack.

    Appends a ``split`` column.
    """
    weights = [w for _, w in splits]
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {sum(weights)}")
    frac = hash_fraction(F.col(key_col))
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        branch = F.when(frac < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(
            frac < F.lit(acc), F.lit(name)
        )
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def per_stratum_topk(
    df: DataFrame,
    score: Column,
    strata_col: str = "source",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k selection within each stratum by a score expression — the
    curriculum/quota primitive ("best k documents per domain").

    One hash exchange on the stratum key + per-stratum rank window; with
    #strata >> cores the windows are fully parallel, and no stage sees a
    global order. Skewed strata spill within their own task rather than
    serializing the job. Ties break by id ascending — deterministic.

    Returns ``(stratum, rank, id, score)``.
    """
    scored = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(id_col),
        F.round(score, 6).alias("score"),
    )
    w = Window.partitionBy("stratum").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "stratum", F.col("rank").cast("long").alias("rank"), id_col, "score"
        )
    )


def upsample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Duplication-based upsampling: emit each row ``rate(stratum)``
    times in expectation — the complement of
    :func:`~feast_java_old_spark.operators.text.stratified_sample` /
    :func:`temperature_mix`, whose keep-rates cap at 1. Rates above 1
    repeat small-domain rows (epoch-weighting for underrepresented
    sources); fractional parts are resolved deterministically by the
    md5 fraction of the key, so the output is bit-reproducible and a
    rate of 2.5 emits exactly 2 or 3 copies per row (3 iff
    ``hash_fraction(key) < 0.5``).

    A pure projection + generator (``explode(sequence(...))``): no
    shuffle, no RNG state; rows with an effective count of 0 disappear
    (a rate < 1 downsamples, consistent with ``stratified_sample``'s
    membership rule).

    Appends ``copy`` (1-based duplicate index).
    """
    rate = None
    for stratum, r in sorted(rates.items()):
        branch = F.when(F.col(strata_col) == stratum, F.lit(float(r)))
        rate = branch if rate is None else rate.when(
            F.col(strata_col) == stratum, F.lit(float(r))
        )
    rate = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    base = F.floor(rate).cast("long")
    extra = (hash_fraction(F.col(key_col)) < (rate - F.floor(rate))).cast(
        "long"
    )
    n = (base + extra).alias("__n")
    staged = df.withColumn("__n", n)
    copies = F.when(
        F.col("__n") > 0, F.sequence(F.lit(1).cast("long"), F.col("__n"))
    ).otherwise(F.array().cast("array<long>"))
    return staged.select(
        *[c for c in df.columns], F.explode(copies).alias("copy")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str = "source",
    alpha: float = 0.5,
    target_rows: int = 1000,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted domain mixing: per-stratum keep-rates
    ``p_s ∝ count_s^alpha`` (alpha<1 upweights small domains — the
    multilingual sampling rule), scaled so the expected sample size is
    ``target_rows``, capped at 1 (a stratum can't be upsampled past its
    size here; duplication-based upsampling is a separate op).

    Membership is the same deterministic md5 fraction as
    :func:`~feast_java_old_spark.operators.text.stratified_sample`, so
    mixes are bit-reproducible and monotone under rate changes. Plan
    shape: one tiny per-stratum count aggregate (rows = #strata), rates
    derived on that aggregate and broadcast-joined back; the corpus-side
    work is a scan + filter. Rates are rounded to 6 decimals before the
    comparison so the float is portable across engines.

    Returns the sampled rows as ``(key, stratum, rate)``.
    """
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    weighted = counts.select(
        "stratum", "cnt", F.pow(F.col("cnt").cast("double"), alpha).alias("w")
    )
    # wsum via an unpartitioned window over the *aggregated* counts (rows
    # = #strata, tiny by definition) — one corpus scan total, vs the
    # agg-and-cross-join form which re-scans the corpus for the sum.
    wsum = F.sum("w").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    rates = weighted.select(
        "stratum",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows)) * (F.col("w") / wsum) / F.col("cnt"),
            ),
            6,
        ).alias("rate"),
    )
    return (
        df.join(
            F.broadcast(rates), on=df[strata_col] == rates["stratum"]
        )
        .where(hash_fraction(F.col(key_col)) < F.col("rate"))
        .select(F.col(key_col), F.col("stratum"), F.col("rate"))
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    seed: int = 0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of ``k`` rows
    (probability proportional to ``weight_col``): quality-weighted
    corpus selection where a fixed-size budget should favor high-quality
    documents but still mix in the tail.

    Efraimidis-Spirakis A-ES exponential keys: each row draws
    ``e = -ln(u) / w`` with ``u ∈ (0, 1]`` a pure md5 function of
    (key, seed) — the k smallest ``e`` are exactly a weighted sample
    without replacement. No ``rand()`` (partitioning-dependent in
    Spark), so membership is bit-reproducible on any cluster size and
    changing ``seed`` redraws independently.

    Scale shape: one projection + distributed top-k
    (TakeOrderedAndProject — per-partition heaps of size k, no global
    sort). Rows with weight <= 0 never sample. ``es_key_micro`` is the
    integer-quantized selection key (portable to the SQL oracle).
    """
    # open-interval uniform: (28-bit md5 prefix + 1) / 2^28  ∈ (0, 1]
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ) / F.lit(float(1 << 28))
    es_key = -F.log(u) / F.col(weight_col).cast("double")
    # rank on the RAW double key (quantizing first would collapse ties
    # and break scale-invariance); emit the micro-quantized key only as
    # the portable output column
    return (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(key_col),
            F.col(weight_col).alias("weight"),
            es_key.alias("__es_key"),
        )
        .orderBy(F.col("__es_key"), F.col(key_col))
        .limit(k)
        .select(
            key_col,
            "weight",
            F.round(F.col("__es_key") * 1_000_000, 0)
            .cast("long")
            .alias("es_key_micro"),
        )
    )


def line_filter(
    df: DataFrame,
    delimiter: str = "\n",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    blocklist: tuple[str, ...] = (),
    min_kept_lines: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line-level boilerplate removal: split each document on
    ``delimiter`` (a literal string), keep only lines that (a) have at
    least ``min_words`` whitespace words, (b) end in terminal
    punctuation (``. ! ? "``) when ``require_terminal_punct``, and (c)
    contain no ``blocklist`` phrase (case-insensitive substring — the
    C4 "cookie/javascript/terms-of-use" rule); reassemble survivors and
    flag documents keeping fewer than ``min_kept_lines`` lines.

    Emits ``(id, text, n_lines, n_kept, kept)`` — ``text`` is the
    cleaned document.

    Plan shape: one codegen projection — split / ``filter`` /
    ``array_join`` are per-row array expressions, the text never
    explodes into per-line rows and nothing shuffles. The line
    *predicates* are Column lambdas, so custom rules compose without
    touching the plan.
    """
    import re as _re

    lines = F.split(F.col(text_col), _re.escape(delimiter))

    def keep(ln):
        ok = F.regexp_count(ln, F.lit(r"\S+")) >= F.lit(min_words)
        if require_terminal_punct:
            ok = ok & F.trim(ln).rlike('[.!?"]$')
        for phrase in blocklist:
            ok = ok & ~F.contains(F.lower(ln), F.lit(phrase.lower()))
        return ok

    kept_lines = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept_lines, delimiter).alias(text_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept"),
        (F.size(kept_lines) >= F.lit(min_kept_lines)).alias("kept"),
    )


def token_budget_select(
    df: DataFrame,
    order_col: str,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 100,
) -> DataFrame:
    """Fixed-token-budget corpus selection: walk documents in
    ``(order_col DESC, id)`` order (highest quality first) and keep them
    while the running token total stays within ``budget`` — the "best N
    tokens" selection every data-constrained training run makes.

    The running total is a **distributed prefix sum** over the quality
    order (the :func:`~feast_java_old_spark.operators.text.sequence_pack`
    pattern — a bare global ``Window.orderBy`` would funnel the corpus
    through ONE task): docs bucket by quantized ``order_col`` (bucket
    ranges are contiguous in the global order by construction), the
    tiny per-bucket subtotals prefix-sum through
    :func:`~feast_java_old_spark.operators.layout.cumulative_offsets`
    (a single-partition window over ≤ ``buckets`` metadata rows — the
    sum never leaves the cluster), offsets broadcast-join back, and the
    within-bucket running sum is a parallel window.

    Returns ``(id, n_tokens, cum_tokens, selected)`` — ``selected`` is
    the greedy prefix whose total ≤ budget. Oracle-equal to the flat
    global-window form.

    ``order_col`` must be NULL-free (a NULL has no defined place in the
    quality order — fail fast rather than select an arbitrary subset)
    but may have ANY numeric range: scores are min-max normalized
    before quantization, so the bucket-subtotal frame is always
    ≤ ``buckets``+1 rows — a wide-range raw score cannot blow it up.
    Normalization is order-preserving and equal scores stay equal, so
    the selected set is unchanged.
    """
    from pyspark.sql.window import Window

    from feast_java_old_spark.operators.text import tokens

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(order_col).alias("__q"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    bounds = base.agg(
        F.min("__q").alias("lo"),
        F.max("__q").alias("hi"),
        F.sum(F.col("__q").isNull().cast("long")).alias("n_null"),
    ).first()
    if bounds["n_null"]:
        raise ValueError(
            f"token_budget_select: order_col {order_col!r} has "
            f"{bounds['n_null']} NULLs — filter or impute them first"
        )
    lo = float(bounds["lo"]) if bounds["lo"] is not None else 0.0
    hi = float(bounds["hi"]) if bounds["hi"] is not None else 1.0
    span = (hi - lo) or 1.0
    base = base.withColumn(
        # bucket by quantized min-max-normalized quality: equal __q
        # always same bucket, so buckets are contiguous ranges of the
        # (__q DESC, id) order; normalization bounds the bucket count
        "__b",
        F.floor((F.col("__q") - F.lit(lo)) / F.lit(span) * buckets).cast(
            "long"
        ),
    )
    # Per-bucket totals → cumulative offsets DESC (best bucket first):
    # the shared layout.cumulative_offsets step — a single-partition
    # window over the TOTALS frame (≤ `buckets` rows, metadata not
    # data). The prefix sum never leaves the cluster.
    from feast_java_old_spark.operators.layout import cumulative_offsets

    off_df = cumulative_offsets(
        base.groupBy("__b").agg(F.sum("n_tokens").alias("__t")),
        "__b",
        "__t",
        descending=True,
    )
    w = Window.partitionBy("__b").orderBy(
        F.col("__q").desc(), F.col("doc_id").asc()
    )
    return (
        base.join(F.broadcast(off_df), on="__b")
        .withColumn("__cum", F.col("__off") + F.sum("n_tokens").over(w))
        .select(
            F.col("doc_id").alias(id_col),
            "n_tokens",
            F.col("__cum").alias("cum_tokens"),
            (F.col("__cum") <= budget).alias("selected"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Corpus snapshot delta — the bookkeeping an incremental ingest run
    needs between two crawls: per document id, whether it was ``added``,
    ``removed``, ``changed`` (same id, different content fingerprint) or
    ``unchanged``.

    One full-outer hash join on the id over (id, fingerprint)
    projections — the text itself reduces to its md5 at the scan, so the
    exchange carries two hashes per id, never documents. Downstream:
    ``changed`` + ``added`` ids feed reprocessing
    (:func:`~feast_java_old_spark.operators.features.scd2_history` keyed
    on the fingerprint gives the full version history); ``removed`` ids
    feed the GDPR/forget path.
    """
    from feast_java_old_spark.operators.text import fingerprint

    o = old.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(F.col(content_col)).alias("__fo"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(F.col(content_col)).alias("__fn"),
    )
    return o.join(n, on="doc_id", how="full_outer").select(
        "doc_id",
        F.when(F.col("__fo").isNull(), F.lit("added"))
        .when(F.col("__fn").isNull(), F.lit("removed"))
        .when(F.col("__fo") == F.col("__fn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def negative_samples(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    n_items: int,
    k: int = 4,
    seed: int = 0,
    item_base: int = 1,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive / link-
    prediction training: for every positive (user, item) pair, draw ``k``
    pseudo-random candidate items from ``[item_base, item_base+n_items)``
    via an md5 hash of (user, item, slot, seed), then flag accidental
    positives (candidates the user actually interacted with) with a
    broadcast-free anti-join marker — the standard loader practice is to
    filter or down-weight those, not to resample (a resample loop is
    neither bounded nor plan-friendly).

    Pure expression generation: ``explode(sequence(0, k-1))`` fans each
    positive into k slots, the candidate id is a hash projection, and the
    false-negative flag is a left-semi-style join against the positives
    keyed on (user, item) — one shuffle of (user, candidate) pairs.
    Fully reproducible on any cluster size / partitioning.

    Returns ``(user, pos_item, slot, neg_item, is_false_negative)``.
    """
    p = positives.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("pos_item")
    ).distinct()
    slots = p.select(
        "user",
        "pos_item",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    )
    key = F.md5(
        F.concat_ws(
            ":",
            F.col("user").cast("string"),
            F.col("pos_item").cast("string"),
            F.col("slot").cast("string"),
            F.lit(str(seed)),
        )
    )
    cand = slots.withColumn(
        "neg_item",
        (
            F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
            % n_items
            + item_base
        ),
    )
    seen = p.select(
        F.col("user"), F.col("pos_item").alias("neg_item")
    ).withColumn("__hit", F.lit(True))
    return (
        cand.join(seen, on=["user", "neg_item"], how="left")
        .select(
            "user",
            "pos_item",
            "slot",
            "neg_item",
            F.coalesce(F.col("__hit"), F.lit(False)).alias(
                "is_false_negative"
            ),
        )
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-dataset manifest: one row per shard with document count,
    token count, and a content hash over the shard's documents **in
    training order** — the dataset-card/versioning record a training run
    pins so the exact corpus is reproducible and verifiable (a re-export
    that changes any doc, order, or shard membership changes the hash).

    Built on :func:`corpus_shuffle`'s deterministic shard/pos
    assignment; the shard hash is md5 over the ordered per-doc
    fingerprints (``sort_array(collect_list(struct(pos, fp)))`` — the
    ordered-gather kernel, one shard-keyed aggregate; per-shard state is
    shard-sized, the same bound as the shard sort itself).

    Returns ``(shard, n_docs, n_tokens, content_hash)``.
    """
    from feast_java_old_spark.operators.text import fingerprint, tokens

    assigned = corpus_shuffle(df, n_shards=n_shards, seed=seed, id_col=id_col)
    docs = df.select(
        F.col(id_col),
        fingerprint(F.col(text_col)).alias("__fp"),
        F.size(tokens(F.col(text_col))).cast("long").alias("__nt"),
    )
    j = assigned.join(docs, on=id_col)
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("pos"), F.col("__fp")))
        ),
        lambda s: s["__fp"],
    )
    return j.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
        F.md5(F.concat_ws(",", ordered)).alias("content_hash"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic
    companion to the lexical n-gram :func:`decontaminate`: a paraphrased
    eval example shares no n-grams with its source but sits at cosine
    ≈ 1 in embedding space, so serious decontamination runs BOTH
    screens.

    Plan: the benchmark embedding set is small by definition (eval
    suites are thousands of rows) and BROADCASTS; the corpus streams
    through the join once, scoring cosine per (corpus, bench) pair in
    the map stage, and a corpus-keyed map-side-combined max-struct
    aggregate keeps each document's closest benchmark item. The corpus
    never shuffles vectors — only (id, best-match scalars) cross an
    exchange.

    Returns one row per corpus vector: ``(id, closest_bench_id,
    max_cos, contaminated)`` with ties on cosine broken by the lowest
    benchmark id.
    """
    from feast_java_old_spark.operators.similarity import _as_double, cosine

    # NULL-vector contract (r9, uniform with similarity.py): a NULL
    # embedding is not a point in the space — such corpus rows cannot
    # be screened and are dropped (run the lexical screen on them);
    # NULL bench rows constrain nothing.
    corpus = corpus.where(F.col(vec_col).isNotNull())
    bench = bench.where(F.col(vec_col).isNotNull())
    c = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__cv")
    )
    b = bench.select(
        F.col(bench_id_col).alias("__bid"),
        _as_double(F.col(vec_col)).alias("__bv"),
    )
    scored = c.join(F.broadcast(b)).select(
        id_col,
        "__bid",
        F.round(cosine(F.col("__cv"), F.col("__bv")), 6).alias("__cos"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("__cos"), (-F.col("__bid")).alias("__nb"))).alias(
            "__best"
        )
    )
    return best.select(
        id_col,
        (-F.col("__best.__nb")).cast("long").alias("closest_bench_id"),
        F.col("__best.__cos").alias("max_cos"),
        (F.col("__best.__cos") >= threshold).alias("contaminated"),
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023, arXiv:2302.03169): score every document by how much more
    likely its hashed n-gram features are under the TARGET distribution
    (rows where ``target`` is true — e.g. high-quality or in-domain
    text) than under the raw corpus — the importance weight a
    target-matched pretraining mixture resamples by.

    Estimator: word n-grams hash into ``buckets`` (28-bit md5 prefix
    mod buckets — the :func:`corpus_shuffle` portable-hash shape);
    bucket unigram distributions for target and raw corpus get add-k
    smoothing; a document's log-importance is
    ``Σ_b n_b(doc) · [ln P̂_target(b) − ln P̂_raw(b)]``.

    Determinism: each bucket's log-ratio is quantized to integer
    micro-units FIRST, so the per-document sum is exact integer
    arithmetic — no float-summation order anywhere (the two ``ln``
    calls happen once per bucket on identical doubles in any engine).

    Plan shape: ONE n-gram explode feeds ONE map-side-combined
    aggregate to per-(doc, target-flag, bucket) counts; the bucket
    totals (target and raw — at most ``buckets`` rows) are a SECOND
    aggregate OVER those counts, so the explode subtree appears once
    per branch with an identical exchange underneath and Catalyst
    collapses it to a ReusedExchange — the corpus is scanned and
    exploded exactly once. The bucket ratio table (≤ buckets rows)
    broadcasts back onto the doc-bucket counts. Nothing but
    (doc, bucket, count) rows ever shuffle, so cost is one corpus scan
    + aggregates — the same at 100 TB. Documents shorter than ``n``
    tokens have no features and are absent from the output (their
    importance is undefined).

    Returns ``(id, n_ngrams, dsir_micro)``; resample with
    :func:`weighted_sample` on ``exp(dsir_micro/1e6)`` or threshold on
    the score directly.
    """
    # posexplode + slice/concat_ws gram builder — fully codegen'd; the
    # higher-order transform(sequence, ...) form evaluates interpreted
    # per row (the exploded_shingles lesson, dedup.py:48) and measured
    # ~2x the whole query's runtime here
    ex = df.select(
        F.col(id_col),
        target.alias("__is_t"),
        F.split(F.lower(F.col(text_col)), " ").alias("__arr"),
    ).select(
        F.col(id_col),
        "__is_t",
        F.posexplode("__arr").alias("__pos", "__tok"),
        "__arr",
    )
    feats = ex.where(F.col("__pos") + n <= F.size("__arr")).select(
        F.col(id_col),
        "__is_t",
        F.concat_ws(" ", F.slice("__arr", F.col("__pos") + 1, n)).alias("__g"),
    ).withColumn(
        "__b",
        F.conv(F.substring(F.md5("__g"), 1, 7), 16, 10).cast("long")
        % buckets,
    )
    # the ONLY corpus-sized aggregate: per-(doc, flag, bucket) counts;
    # every bucket/total statistic derives from this table, so the
    # explode subtree + this exchange are shared (ReusedExchange)
    # between the ratio branch and the final join branch
    docb = feats.groupBy(id_col, "__is_t", "__b").agg(
        F.count(F.lit(1)).alias("__nb")
    )
    bucket = docb.groupBy("__b").agg(
        F.sum("__nb").alias("__cs"),
        F.sum(F.when(F.col("__is_t"), F.col("__nb")).otherwise(0)).alias(
            "__ct"
        ),
    )
    totals = bucket.agg(
        F.sum("__cs").cast("double").alias("__ts"),
        F.sum("__ct").cast("double").alias("__tt"),
    )
    kb = float(smoothing) * buckets
    ratio = (
        bucket.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.round(
                (
                    F.log(
                        (F.col("__ct") + F.lit(smoothing))
                        / (F.col("__tt") + F.lit(kb))
                    )
                    - F.log(
                        (F.col("__cs") + F.lit(smoothing))
                        / (F.col("__ts") + F.lit(kb))
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("__micro"),
        )
    )
    return (
        docb.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__nb").cast("long").alias("n_ngrams"),
            F.sum(F.col("__nb") * F.col("__micro")).cast("long").alias(
                "dsir_micro"
            ),
        )
    )

