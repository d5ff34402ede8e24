"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (per the build brief): language ID, quality
scoring, token counting, document fingerprinting — each expressed with
built-in ``pyspark.sql.functions`` only (JVM-side, whole-stage-codegen'd;
no Python in the per-row path), so they scale linearly with no shuffle:
every operator here is a pure projection over the documents table.

Determinism contract: every function is reproducible and expressible in
ANSI SQL (the DuckDB oracles in ``__spark_entry__.py`` mirror them
term-for-term).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the language-ID heuristic. Real
# pipelines plug in their own dictionaries; the operator shape (per-token
# dictionary hits, argmax with deterministic tie-break) is what matters.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "que"],
}

DEFAULT_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish token pattern: letter runs, single digits, single punctuation.
TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (split on single spaces,
    matching SQL ``string_split(lower(text), ' ')``)."""
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    """Regex token count with the BPE-ish pattern (F.regexp_count is
    JVM-side; no UDF)."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    Any rolling/content-defined hash slots in here; md5 keeps the oracle
    trivially portable.
    """
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(norm)


def text_stat_cols(text_col: str = "text") -> dict[str, Column]:
    """Quality-statistic expressions keyed by output name — exposed at
    the Column level so composed pipelines can evaluate them inside a
    single projection instead of joining DataFrames."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in DEFAULT_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_alnum_space = F.length(F.regexp_replace(F.lower(t), r"[^a-z0-9 ]", ""))
    punct_ratio = (n_chars - n_alnum_space) / n_chars
    avg_token_len = (n_chars - (n_tokens - F.lit(1))) / n_tokens
    stopword_ratio = n_stop / n_tokens
    # Monotone, bounded score: long-enough docs with some stopwords and
    # little punctuation score high.
    quality = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stopword_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(avg_token_len, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stopword_ratio, 6),
        "quality_score": F.round(quality, 6),
    }


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics + a composite quality score.

    All built-in expressions — one codegen stage, zero shuffles.
    """
    cols = text_stat_cols(text_col)
    return df.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def lang_score_cols(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit scores, Column-level."""
    toks = tokens(F.col(text_col))

    def hit_count(words: list[str]):
        arr = F.array(*[F.lit(s) for s in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    return {
        f"score_{lang}": hit_count(LANG_STOPWORDS[lang])
        for lang in sorted(LANG_STOPWORDS)
    }


def predicted_lang_col() -> Column:
    """Argmax language over already-materialized ``score_<lang>`` columns
    (two-phase on purpose: the score expressions are interpreted
    higher-order functions, which defeat codegen CSE — materialize them
    in a prior projection, then fold over plain column refs). Ties broken
    alphabetically: fold left, strictly-greater candidate wins — fully
    deterministic."""
    langs = sorted(LANG_STOPWORDS)
    best = F.struct(F.col(f"score_{langs[0]}").alias("s"), F.lit(langs[0]).alias("l"))
    for lang in langs[1:]:
        cand_s = F.col(f"score_{lang}")
        best = F.when(
            cand_s > best["s"], F.struct(cand_s.alias("s"), F.lit(lang).alias("l"))
        ).otherwise(best)
    return best["l"]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID.

    Per-language score = tokens found in that language's dictionary
    (duplicates count); prediction = argmax, ties broken alphabetically.
    """
    scores = lang_score_cols(text_col)
    scored = df.select("doc_id", *[c.alias(n) for n, c in scores.items()])
    return scored.select(
        "doc_id",
        *[F.col(n) for n in scores],
        predicted_lang_col().alias("predicted_lang"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Within-document repetition measures (Gopher-style quality rules).

    For each n in ``ns`` emits per-document:

    - ``top_{n}gram_frac`` — fraction of n-grams accounted for by the
      single most frequent n-gram (Gopher: "fraction of tokens in the
      most common n-gram");
    - ``dup_{n}gram_frac`` — fraction of n-grams whose n-gram occurs
      more than once in the document (Gopher: "fraction of tokens in
      duplicated n-grams").

    Plan shape (per n): scan → posexplode shingles (the text column is
    dropped at the explode, so only (doc_id, gram) rows ever shuffle) →
    two-level hash aggregate with map-side combine — gram-sized then
    doc-sized exchanges, both linear in corpus tokens. The per-n doc
    aggregates (1 row/doc) are then joined on doc_id; docs shorter than
    n tokens have NULL for that n's columns (left join from the doc
    universe, reproduced by the oracle).
    """
    from feast_java_old_spark.operators.dedup import exploded_shingles

    out = df.select(F.col(id_col).alias("doc_id"))
    for n in ns:
        sh = exploded_shingles(df, text_col=text_col, id_col=id_col, n=n)
        per_gram = sh.groupBy("doc_id", "shingle").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        agg = per_gram.groupBy("doc_id").agg(
            F.round(
                F.max("cnt").cast("double") / F.sum("cnt"), 6
            ).alias(f"top_{n}gram_frac"),
            F.round(
                F.sum(
                    F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("cnt"),
                6,
            ).alias(f"dup_{n}gram_frac"),
        )
        out = out.join(agg, on="doc_id", how="left")
    return out


def hash_fraction(col: Column) -> Column:
    """Deterministic uniform-[0,1) fraction from a column value: 28-bit
    md5 prefix / 2^28. Engine-portable (DuckDB:
    ``('0x' || substr(md5(v),1,7))::BIGINT / 268435456.0``) and stable
    across runs, partitionings, and cluster sizes — unlike
    ``rand(seed)``, which Spark evaluates per-partition."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast(
            "long"
        )
        / F.lit(float(1 << 28))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int | None = None,
) -> DataFrame:
    """Deterministic stratified sampling — the data-mixing primitive for
    training-corpus assembly (per-source/per-language/per-quality-band
    weights).

    A row is kept iff ``hash_fraction(key) < rate(stratum)``; membership
    is a pure function of the key, so resampling with a changed rate map
    keeps maximal overlap (raising a rate strictly grows the sample),
    mixes are reproducible bit-for-bit on any cluster, and the filter is
    a codegen projection — zero shuffles, pushdown-friendly.

    ``seed`` (optional) salts the hash (``"<key>:<seed>"``) for an
    INDEPENDENT redraw — e.g. disjoint ablation subsets at the same
    rates.  ``seed=None`` keeps the historical unsalted draw, so
    existing mixes (and the SQL oracle) are unchanged.  Within one
    seed, threshold draws stay nested and complements stay exactly
    disjoint.
    """
    key = F.col(key_col)
    if seed is not None:
        key = F.concat(key.cast("string"), F.lit(f":{seed}"))
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
    return df.where(hash_fraction(key) < rate)


def top_k_vocabulary(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Corpus-wide top-k token vocabulary by frequency.

    Two-phase: token explode → hash aggregate with map-side combine
    (shuffle carries one row per distinct token per map partition) →
    ``orderBy().limit(k)``, which Spark executes as a distributed
    ``TakeOrderedAndProject`` (per-partition top-k, then a k-row merge
    on the driver) — NOT a global window sort, which would funnel the
    whole vocabulary through one partition. Rank is attached afterwards
    over the k surviving rows only. Ties break lexicographically so the
    cut is deterministic. The vocabulary builder for tokenizer training /
    coverage checks.
    """
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    topk = counts.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(k)
    from pyspark.sql.window import Window as _W

    w = _W.orderBy(F.col("freq").desc(), F.col("token").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("long").alias("rank"), "token", "freq"
    )


def sequence_pack(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Sequence packing for LLM training: assign documents (in id order)
    to fixed-budget packs of ``seq_len`` tokens — each doc lands in the
    pack where its first token falls; docs are never split.

    The global running token count is a **distributed prefix sum** — the
    scale-correct form of a cumulative sum, because a bare
    ``Window.orderBy(id)`` (no partition key) funnels the entire corpus
    through ONE task:

    1. bucket docs by ``id div bucket_size``;
    2. per-bucket token subtotals (tiny aggregate: corpus/bucket_size
       rows) prefix-sum through a single-partition window over the
       TOTALS frame — metadata-sized, never leaves the cluster (the
       ``layout.global_sort_ranks`` offset pattern; a driver collect
       here would funnel millions of rows at 100 TB with a small
       ``bucket_size``);
    3. offsets broadcast-join back; a *within-bucket* window (partitioned
       by bucket — parallel) adds the local running sum.

    Returns (id, n_tokens, pack_id, pack_offset) where ``pack_offset``
    is the doc's starting token position within its pack. Deterministic
    and oracle-equal to a flat global cumsum.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        (F.col(id_col) / bucket_size).cast("long").alias("__b"),
    )
    from feast_java_old_spark.operators.layout import cumulative_offsets

    off_df = cumulative_offsets(
        base.groupBy("__b").agg(F.sum("n_tokens").alias("__t")), "__b", "__t"
    )
    w = Window.partitionBy("__b").orderBy("doc_id")
    out = (
        base.join(F.broadcast(off_df), on="__b")
        .withColumn(
            "__start",
            F.col("__off")
            + F.sum("n_tokens").over(w)
            - F.col("n_tokens"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "n_tokens",
            (F.col("__start") / seq_len).cast("long").alias("pack_id"),
            (F.col("__start") % seq_len).alias("pack_offset"),
        )
    )
    return out


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Unigram language-model scoring — the in-engine analog of CCNet's
    perplexity filter: per document, the mean log-probability of its
    tokens under the corpus's *own* unigram distribution. Low scores =
    rare-token-heavy documents (gibberish, boilerplate markup, wrong
    language); the score is the canonical cheap model-based quality
    signal before a real LM is involved.

    Two-phase plan: (1) the vocabulary aggregate (vocab-sized output,
    map-side combined); (2) token explode → vocabulary join →
    per-document mean re-aggregate, whose shuffle carries (doc, partial
    sum) rows only. The vocabulary of even a 100 TB corpus is bounded
    (~100M types) — broadcastable on real executors; set
    ``broadcast_vocab=False`` to let AQE shuffle-join instead.

    Returns ``(id, n_tokens, logprob)``; ``logprob`` is the mean natural
    log-probability, rounded to 6 for engine portability.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    tot = vocab.agg(F.sum("freq").alias("total"))
    v = vocab.crossJoin(F.broadcast(tot)).select(
        "token", (F.log(F.col("freq") / F.col("total"))).alias("__lp")
    )
    if broadcast_vocab:
        v = F.broadcast(v)
    return (
        toks.join(v, on="token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("__lp"), 6).alias("logprob"),
        )
    )


def logistic_quality_cols(
    weights: dict[str, float],
    bias: float = 0.0,
    text_col: str = "text",
) -> Column:
    """Model-based quality score: sigmoid(w · signals + b) over the
    :func:`text_stat_cols` signal vector — classifier inference as a
    pure codegen projection (the fasttext-style quality-filter shape:
    at 100 TB, scoring is a map-side expression, never a UDF or a
    service call; retraining changes only the literal weights).

    ``weights`` keys must be signal names from :func:`text_stat_cols`
    (e.g. ``n_tokens``, ``punct_ratio``, ``stopword_ratio``).
    """
    stats = text_stat_cols(text_col)
    unknown = set(weights) - set(stats)
    if unknown:
        raise KeyError(f"unknown quality signals: {sorted(unknown)}")
    z = F.lit(float(bias))
    for name in sorted(weights):
        z = z + stats[name].cast("double") * F.lit(float(weights[name]))
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (RAG / context-window prep):
    token windows of ``chunk_tokens`` every ``stride`` tokens
    (``stride < chunk_tokens`` ⇒ overlapping chunks), the final window
    clamped at the document end. A document with ``n`` tokens yields
    ``1 + ceil(max(n - chunk_tokens, 0) / stride)`` chunks; empty
    documents yield none.

    One codegen projection + generator — ``sequence`` builds the chunk
    indices, ``slice``/``array_join`` materialize each window from the
    token array; no shuffle at all, no Python. Output rows carry the
    chunk text, its md5 fingerprint (the dedup/join key downstream —
    ``chunk_dedup`` consumes exactly this shape), and token count.
    """
    from feast_java_old_spark.operators.search import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(float(stride))
    ).cast("long")
    chunked = (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .where(F.size("__toks") > 0)
    )
    window = F.slice(
        F.col("__toks"),
        F.col("chunk_idx") * stride + 1,
        chunk_tokens,
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        F.array_join(window, " ").alias("chunk_text"),
        F.md5(F.array_join(window, " ")).alias("chunk_fingerprint"),
        F.size(window).alias("n_tokens_chunk"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """One iteration of BPE tokenizer training: corpus-wide adjacent
    symbol-pair frequencies, returned as the ``top_n`` most frequent
    ``(left, right, pair_count)`` rows (ties break lexicographically) —
    the merge-selection step of Sennrich-style byte-pair encoding.

    Scale shape — the pair count runs over the VOCABULARY, not the
    corpus: tokens aggregate to ``(token, count)`` first (one
    aggregate-sized shuffle; map-side combined), and only distinct
    tokens — thousands of short strings, not terabytes of text — are
    exploded into character pairs weighted by token frequency. This is
    exactly how production BPE trainers scale, and it makes each later
    merge iteration priced on vocabulary size, not corpus size. The
    final top-n is a distributed ``TakeOrderedAndProject``, never a
    global sort.
    """
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tok_count"))
    )
    pairs = vocab.select(
        "tok_count",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1), "
                "i -> struct(substring(tok, i, 1) AS l, "
                "substring(tok, i + 1, 1) AS r))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("tok_count").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left", "right")
        .limit(top_n)
    )


def bpe_apply_merge(
    df: DataFrame,
    left: str,
    right: str,
    symbols_col: str = "symbols",
) -> DataFrame:
    """Apply one BPE merge to a symbol-sequence column
    (``array<string>``, e.g. a token split to characters): every
    adjacent ``left``,``right`` pair becomes the single merged symbol,
    scanning leftmost-first so overlaps resolve the way BPE training
    defines them (``a a a`` under merge ``a+a`` → ``aa a``, not
    ``a aa``). Pure ``aggregate``-fold projection — zero shuffle;
    alternate with :func:`bpe_pair_counts` to train a merge table.
    """
    merged = left + right
    fold = (
        "aggregate({col}, CAST(array() AS array<string>), (acc, x) -> "
        "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' "
        "AND x = '{r}' "
        "THEN concat(slice(acc, 1, size(acc) - 1), array('{m}')) "
        "ELSE concat(acc, array(x)) END)"
    ).format(col=symbols_col, l=left, r=right, m=merged)
    return df.withColumn(symbols_col, F.expr(fold))


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Frequency-ranked token vocabulary: ``(token, token_id)`` with
    id 1..vocab_size by descending count (ties lexicographic — fully
    deterministic). One aggregate-sized shuffle + a distributed top-k;
    the rank window runs over the top-k result only (vocab-sized, one
    partition is fine by construction).
    """
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(vocab_size)
    )
    w = Window.orderBy(F.desc("cnt"), "token")
    return counts.select(
        "token", F.row_number().over(w).cast("long").alias("token_id")
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = 0,
) -> DataFrame:
    """Token → id encoding against a broadcast vocabulary (the final
    tokenize step before training): emits ``(id, token_ids)`` with
    out-of-vocabulary tokens mapped to ``unk_id``, order preserved.

    Plan shape: posexplode (text drops at the explode), broadcast hash
    join against the vocab (no shuffle to look ids up), then ONE hash
    exchange on the doc id to reassemble —
    ``array_sort`` + ``transform`` restore token order from the carried
    position, so the aggregate needs no sort of its own.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__pos", "token"),
    ).where(F.length("token") > 0)
    joined = toks.join(F.broadcast(vocab), on="token", how="left").select(
        id_col,
        "__pos",
        F.coalesce(F.col("token_id"), F.lit(unk_id)).alias("__tid"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__tid")))
                ),
                lambda s: s["__tid"],
            ).alias("token_ids")
        )
        .select(id_col, "token_ids")
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 5,
    max_ratio: float = 0.5,
) -> DataFrame:
    """Corpus-level boilerplate detection (the RefinedWeb/Dolma cleaning
    step): an n-gram is *boilerplate* when it occurs in ≥ ``min_docs``
    distinct documents; a document is dropped when more than
    ``max_ratio`` of its distinct n-grams are boilerplate (navigation
    chrome, license headers, templated footers).

    Plan shape at 100 TB: per-doc distinct shingles explode shuffle-free
    (``dedup.exploded_shingles``), document frequency is one hash
    aggregate keyed by shingle (map-side combined — the shuffle carries
    (shingle, partial count), never text), the flag joins back to the
    pairs as a shuffled hash join on the same key, and the per-doc ratio
    is a conditional aggregate keyed by doc id. The boilerplate *set* is
    never collected or broadcast. A window-count over the shingle key
    would save the join (measured equal warm at sf0.1) but sorts each
    shingle group in ONE partition — a hot boilerplate shingle ("all
    rights reserved") is exactly the skewed key that breaks; the
    agg+join form map-side-combines the hot key and AQE splits the
    skewed join partition.
    """
    from feast_java_old_spark.operators.dedup import exploded_shingles

    sh = exploded_shingles(df, text_col, id_col, n=n, distinct=True)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    flagged = sh.join(dfreq, "shingle").withColumn(
        "__boiler", (F.col("__df") >= min_docs).cast("int")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("__boiler").alias("n_boiler"),
    )
    ratio = F.round(F.col("n_boiler") / F.col("n_ngrams"), 6)
    return per_doc.select(
        "doc_id",
        "n_ngrams",
        "n_boiler",
        ratio.alias("boiler_ratio"),
        (ratio <= max_ratio).alias("kept"),
    )


def novelty_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty — the inverse of
    :func:`boilerplate_ngrams`: the fraction of a document's distinct
    n-grams that occur in NO other document. High novelty = original
    content worth keeping/upsampling; near-zero novelty = templated or
    heavily duplicated text (a memorization-risk and curation-weighting
    signal used alongside dedup, which only removes whole near-dups).

    Same scale shape as the boilerplate screen: shuffle-free distinct-
    shingle explode, ONE map-side-combined document-frequency
    aggregate, a shuffled hash join back (AQE-skew-safe on hot
    shingles), one per-doc conditional aggregate — text never crosses
    an exchange. Emits ``(doc_id, n_ngrams, n_unique, novelty)``.
    """
    from feast_java_old_spark.operators.dedup import exploded_shingles

    sh = exploded_shingles(df, text_col, id_col, n=n, distinct=True)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    flagged = sh.join(dfreq, "shingle").withColumn(
        "__uniq", (F.col("__df") == 1).cast("int")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("__uniq").cast("long").alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_ngrams"), 6).alias("novelty"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Bigram language-model scoring with add-k smoothing — the next
    step up from :func:`unigram_logprob` (CCNet-style quality
    filtering): per document, the mean log of
    ``P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + k) / (c(w_{i-1}·) + k·V)``
    under the corpus's own counts.

    Plan shape: the bigram explode is the shuffle-free
    ``exploded_shingles`` kernel and the corpus-sized bigram stream is
    consumed exactly TWICE — once to build the bigram-count model (one
    map-side-combined aggregate) and once in the scoring join. The
    context counts and the second-token vocabulary size both derive from
    the *vocab-sized* model table (Σ counts grouped by first token;
    distinct second tokens), so no additional corpus pass exists. The
    per-token log-probability rides pre-joined on the model row
    (``broadcast_model=False`` → AQE shuffle join at 100 TB vocab), and
    the per-doc mean shuffles (doc, partial sum) rows only.

    Returns ``(doc_id, n_bigrams, logprob)`` rounded to 6.
    """
    from feast_java_old_spark.operators.dedup import exploded_shingles

    bi = exploded_shingles(df, text_col, id_col, n=2, distinct=False)
    model = bi.groupBy("shingle").agg(F.count(F.lit(1)).alias("__cb"))
    first = F.split_part(F.col("shingle"), F.lit(" "), F.lit(1))
    second = F.split_part(F.col("shingle"), F.lit(" "), F.lit(2))
    ctx = model.groupBy(first.alias("__ctx")).agg(
        F.sum("__cb").alias("__cc")
    )
    vsize = model.select(F.countDistinct(second).alias("__v"))
    scored_model = (
        model.join(ctx, first == F.col("__ctx"))
        .crossJoin(F.broadcast(vsize))
        .select(
            "shingle",
            F.log(
                (F.col("__cb") + F.lit(add_k))
                / (F.col("__cc") + F.lit(add_k) * F.col("__v"))
            ).alias("__lp"),
        )
    )
    if broadcast_model:
        scored_model = F.broadcast(scored_model)
    return (
        bi.join(scored_model, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias("logprob"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Collocation mining: top-k word bigrams by pointwise mutual
    information ``PMI = ln(N * c(ab) / (c(a·) * c(·b)))`` over the corpus
    (phrase detection for tokenizer/vocab construction, word2vec-style
    phrase merging).

    Plan shape: the bigram stream is the shuffle-free
    ``exploded_shingles`` kernel consumed ONCE into a map-side-combined
    bigram-count model; left/right unigram marginals and the corpus
    total all derive from that vocab-sized model table (no second corpus
    pass — the ``bigram_logprob`` lesson), joined back model-to-model.
    ``min_count`` filters rare-pair PMI noise before ranking; the top-k
    is a distributed ``TakeOrdered``.

    Returns ``(bigram, n_pair, n_left, n_right, pmi)`` rounded to 6,
    ordered by ``(pmi DESC, bigram)``.
    """
    from feast_java_old_spark.operators.dedup import exploded_shingles

    bi = exploded_shingles(df, text_col, id_col, n=2, distinct=False)
    model = bi.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_pair"))
    first = F.split_part(F.col("shingle"), F.lit(" "), F.lit(1))
    second = F.split_part(F.col("shingle"), F.lit(" "), F.lit(2))
    left = model.groupBy(first.alias("__l")).agg(
        F.sum("n_pair").alias("n_left")
    )
    right = model.groupBy(second.alias("__r")).agg(
        F.sum("n_pair").alias("n_right")
    )
    total = model.agg(F.sum("n_pair").alias("__n"))
    scored = (
        model.where(F.col("n_pair") >= min_count)
        .join(left, first == F.col("__l"))
        .join(right, second == F.col("__r"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("shingle").alias("bigram"),
            "n_pair",
            "n_left",
            "n_right",
            # double math BEFORE the multiply: N * c(ab) overflows int64
            # once corpus bigram counts pass ~2^31 each (a certainty at
            # 100 TB); matches the oracle's CAST(n AS DOUBLE) exactly
            F.round(
                F.log(
                    F.col("__n").cast("double")
                    * F.col("n_pair")
                    / (F.col("n_left").cast("double") * F.col("n_right"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), F.col("bigram").asc()).limit(k)


def length_bucket_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 8,
) -> DataFrame:
    """Length-bucketed batch assignment — the padding-efficiency trick
    every sequence-training loader uses: documents group into power-of-2
    length buckets (floor(log2(n_tokens))), and each bucket packs into
    fixed-size batches in id order, so a batch's members have within-2×
    lengths and padding waste is bounded.

    One exchange keyed by the bucket; the within-bucket rank windows run
    per bucket in parallel (the ``corpus_shuffle`` pattern — no global
    order, no single-task sort). Batch ids are globally unique via
    ``len_bucket << 40 | batch_in_bucket``: a 2^40 stride (~10^12
    batches/bucket ≈ 10^13 docs) cannot collide with the next bucket's
    id space at any realistic corpus size, unlike a 10^6 stride which
    overflows at ~8M docs per bucket. Returns
    ``(id, n_tokens, len_bucket, batch_id, pad_to)`` where ``pad_to`` is
    the bucket's max length — the padded width a dataloader would
    allocate.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn(
        "len_bucket",
        F.floor(F.log2(F.greatest(F.col("n_tokens"), F.lit(1)))).cast("long"),
    )
    w = Window.partitionBy("len_bucket").orderBy("doc_id")
    wb = Window.partitionBy("len_bucket")
    return base.select(
        "doc_id",
        "n_tokens",
        "len_bucket",
        (
            F.shiftleft(F.col("len_bucket"), 40)
            + ((F.row_number().over(w) - 1) / batch_size).cast("long")
        ).alias("batch_id"),
        F.max("n_tokens").over(wb).alias("pad_to"),
    )


def stupid_backoff_logprob(
    eval_df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    oov_k: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Trigram stupid-backoff LM scoring (Brants et al., EMNLP 2007) —
    the held-out completion of the :func:`unigram_logprob` /
    :func:`bigram_logprob` ladder: score ``eval_df`` documents under a
    reference model counted from ``train_df``, per trigram

    ``S(w3|w1 w2) = c(w1w2w3)/c(w1w2)``          if the trigram is seen,
    ``           = α · c(w2w3)/c(w2)``            else if the bigram is,
    ``           = α² · c(w3)/N``                 else if the word is,
    ``           = α² · k/N``                     for OOV words,

    in log domain, averaged per document. Unlike the add-k twins (which
    score a corpus on its own counts, so every n-gram is seen), the
    train/eval split makes the backoff branches real — this is the CCNet
    "perplexity under a reference LM" filter shape.

    Plan shape: every CASE branch is pre-resolved MODEL-SIDE on
    vocab-sized tables (trigram counts join their context-bigram counts,
    bigram counts join their first-word counts, word counts cross-join
    the single-row corpus total), so the corpus-sized eval trigram
    stream does exactly three left joins against scored vocab tables
    plus one broadcast single-row join for the OOV floor — no corpus
    re-scan per branch. ``broadcast_model=False`` switches the vocab
    joins to AQE shuffle joins for 100 TB vocabularies.

    Returns ``(doc_id, n_trigrams, logprob)`` rounded to 6.
    """
    from feast_java_old_spark.operators.dedup import exploded_shingles

    train = eval_df if train_df is None else train_df
    w1 = F.split_part(F.col("shingle"), F.lit(" "), F.lit(1))
    w2 = F.split_part(F.col("shingle"), F.lit(" "), F.lit(2))
    w3 = F.split_part(F.col("shingle"), F.lit(" "), F.lit(3))

    uni = (
        exploded_shingles(train, text_col, id_col, n=1)
        .groupBy(F.col("shingle").alias("__w"))
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    total = uni.agg(F.sum("__c1").cast("double").alias("__n"))
    bi = (
        exploded_shingles(train, text_col, id_col, n=2)
        .groupBy(F.col("shingle").alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c2"))
    )
    tri = (
        exploded_shingles(train, text_col, id_col, n=3)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__c3"))
    )

    b1 = F.split_part(F.col("__b"), F.lit(" "), F.lit(1))
    ctx12 = F.concat_ws(" ", w1, w2)
    # Seen-trigram branch: a trigram's context bigram always exists in the
    # same train corpus, so this inner join drops nothing.
    tri_scored = tri.join(bi, ctx12 == F.col("__b")).select(
        F.col("shingle").alias("__t3"),
        F.log(F.col("__c3") / F.col("__c2")).alias("__lp3"),
    )
    bi_scored = bi.join(uni, b1 == F.col("__w")).select(
        F.col("__b").alias("__b23"),
        F.log(F.lit(alpha) * F.col("__c2") / F.col("__c1")).alias("__lp2"),
    )
    uni_scored = uni.crossJoin(F.broadcast(total)).select(
        F.col("__w").alias("__w3"),
        F.log(F.lit(alpha * alpha) * F.col("__c1") / F.col("__n")).alias("__lp1"),
    )
    if broadcast_model:
        tri_scored = F.broadcast(tri_scored)
        bi_scored = F.broadcast(bi_scored)
        uni_scored = F.broadcast(uni_scored)

    ev = exploded_shingles(eval_df, text_col, id_col, n=3)
    scored = (
        ev.join(tri_scored, ev["shingle"] == F.col("__t3"), "left")
        .join(bi_scored, F.concat_ws(" ", w2, w3) == F.col("__b23"), "left")
        .join(uni_scored, w3 == F.col("__w3"), "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.coalesce(
                "__lp3",
                "__lp2",
                "__lp1",
                F.log(F.lit(alpha * alpha * oov_k) / F.col("__n")),
            ).alias("__lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.round(F.avg("__lp"), 6).alias("logprob"),
    )
