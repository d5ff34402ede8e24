"""Composed training-data pipelines.

The individual operators (dedup, text quality, language ID) are designed
as *projections and aggregates over the same scan* precisely so that
composing them doesn't multiply passes: a full clean-corpus pass — exact
dedup + quality filter + language filter — is **one scan and one
shuffle** at any scale, because every per-document signal is computed in
the projection and the dedup group-by carries the already-computed
signals through ``min(struct(...))`` instead of re-joining the corpus.

This is the batch shape of the standard LLM-pretraining data pipeline
(fingerprint → dedup → quality gate → language gate); near-duplicate
removal composes on top by anti-joining ``dedup.dedup_components`` group
non-representatives (an edges-sized join, still corpus-linear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_java_old_spark.operators import text


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.55,
    lang: str = "en",
) -> DataFrame:
    """Exact-dedup + quality + language gate in one scan, one shuffle.

    Dedup-then-filter semantics: the canonical copy (minimum id per
    normalized-content fingerprint) represents the group, then the
    quality/language gates judge the canonical copy. All quality signals
    ride through the group-by inside ``min(struct(id, signals...))`` —
    the text column itself never shuffles, and no join ever happens:
    stats, language scores, and the fingerprint are Column expressions
    evaluated in one projection over one ``FileScan``.
    """
    stats = text.text_stat_cols(text_col)
    scores = text.lang_score_cols(text_col)
    # phase 1: all per-doc signals in a single projection (one scan).
    proj = df.select(
        F.col(id_col),
        text.fingerprint(F.col(text_col)).alias("__fp"),
        stats["n_tokens"].alias("n_tokens"),
        stats["quality_score"].alias("quality_score"),
        *[c.alias(n) for n, c in scores.items()],
    )
    # phase 2: argmax over materialized score columns (CSE-safe).
    proj = proj.select(
        id_col,
        "__fp",
        "n_tokens",
        "quality_score",
        text.predicted_lang_col().alias("predicted_lang"),
    )
    canon = (
        proj.groupBy("__fp")
        .agg(
            F.min(
                F.struct(id_col, "n_tokens", "quality_score", "predicted_lang")
            ).alias("__c")
        )
        .select("__c.*")
    )
    return canon.where(
        (F.col("quality_score") >= min_quality)
        & (F.col("predicted_lang") == lang)
    ).select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score",
        "predicted_lang",
    )


def build_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.55,
    mix_rates: dict | None = None,
    chunk_tokens: int = 8,
    max_doc_freq: int = 1,
) -> DataFrame:
    """The end-to-end corpus-assembly pipeline, composed from the
    operator families: exact-dedup canonicalization → quality gate →
    language ID → PII scrub → cross-doc chunk dedup → deterministic
    per-language mixing sample.

    Returns (id, lang, quality_score, text, n_chunks, n_removed) for the
    sampled survivors, with ``text`` PII-scrubbed and corpus-duplicated
    chunks removed.

    Shuffle budget (the scale contract): one fingerprint-partitioned
    shuffle to pick canonical copies (the only time full documents cross
    the wire), then the chunk phase's token-sized aggregates/join (chunk
    rows, not documents), then pure projections — the mixing sample is a
    codegen filter. Quality/language signals are computed in the same
    projection as the fingerprint, so no extra pass and no joins for the
    gates.
    """
    from pyspark.sql.window import Window

    from feast_java_old_spark.operators import dedup, pii, text

    stats = text.text_stat_cols(text_col)
    scores = text.lang_score_cols(text_col)
    proj = df.select(
        F.col(id_col),
        F.col(text_col),
        text.fingerprint(F.col(text_col)).alias("__fp"),
        stats["quality_score"].alias("quality_score"),
        *[c.alias(n) for n, c in scores.items()],
    )
    proj = proj.select(
        id_col, text_col, "__fp", "quality_score",
        text.predicted_lang_col().alias("lang"),
    )
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    canon = (
        proj.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )
    gated = canon.where(F.col("quality_score") >= min_quality)
    scrubbed = gated.select(
        id_col, "lang", "quality_score",
        pii.scrubbed_text_col(text_col).alias(text_col),
    )
    # The chunk phase consumes this subtree twice (frequency aggregate +
    # join side) and the final rejoin a third time; without persist the
    # fingerprint window above would re-execute each time. MEMORY_AND_DISK
    # spills instead of OOMing on a real cluster.
    scrubbed = scrubbed.persist()
    chunked = dedup.chunk_dedup(
        scrubbed.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        chunk_tokens=chunk_tokens,
        max_doc_freq=max_doc_freq,
    )
    rejoined = chunked.join(
        scrubbed.select(id_col, "lang", "quality_score"), on=id_col
    )
    if mix_rates:
        rejoined = text.stratified_sample(
            rejoined, "lang", mix_rates, key_col=id_col
        )
    return rejoined.select(
        id_col, "lang", "quality_score", text_col, "n_chunks", "n_removed"
    )


def rejection_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.55,
    lang: str = "en",
) -> DataFrame:
    """Per-document LINEAGE of :func:`clean_corpus`: one verdict row for
    EVERY input document — ``kept``, or the first gate that rejected it
    (``duplicate`` ≻ ``low_quality`` ≻ ``wrong_lang``, the pipeline's
    evaluation order). The cleaned corpus hides why 80% of a crawl
    vanished; at 100 TB the rejection distribution IS the debugging
    surface (a lang-ID regression or a boilerplate surge shows up here
    first, and per-reason counts feed the curation dashboard).

    Same plan discipline as the pipeline itself: every signal is
    computed in ONE projection over ONE scan; the duplicate verdict
    needs each row to see its group's canonical id, so the dedup
    group-by becomes a row_number window over the same fingerprint key
    — still exactly one shuffle, and the text column never crosses it.
    """
    from pyspark.sql.window import Window

    stats = text.text_stat_cols(text_col)
    scores = text.lang_score_cols(text_col)
    proj = df.select(
        F.col(id_col),
        text.fingerprint(F.col(text_col)).alias("__fp"),
        stats["n_tokens"].alias("n_tokens"),
        stats["quality_score"].alias("quality_score"),
        *[c.alias(n) for n, c in scores.items()],
    ).select(
        id_col,
        "__fp",
        "n_tokens",
        "quality_score",
        text.predicted_lang_col().alias("predicted_lang"),
    )
    rn = F.row_number().over(
        Window.partitionBy("__fp").orderBy(F.col(id_col))
    )
    verdict = (
        F.when(rn > 1, F.lit("duplicate"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
        .when(F.col("predicted_lang") != lang, F.lit("wrong_lang"))
        .otherwise(F.lit("kept"))
    )
    return proj.select(
        F.col(id_col),
        verdict.alias("verdict"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score",
        "predicted_lang",
    )
