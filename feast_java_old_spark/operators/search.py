"""Corpus keyword search: BM25 ranking and per-document TF-IDF terms.

Training-data curation needs corpus-wide lexical search (find documents
matching audit terms, score topical relevance, surface each document's
characteristic vocabulary) — the lexical complement of the embedding
similarity operators in ``operators/similarity.py``.

Everything is built-in expressions (JVM-side, codegen): tokenization is
``split`` + ``filter``, postings come from ``posexplode``-free
``explode`` + two-level hash aggregation, and scores are arithmetic on
exact integer statistics (tf, df, doclen) so both this engine and the
SQL oracle compute bit-identical inputs; the only floating step is the
final ``idf``/score product, which is integer-quantized (micro-units)
before any cross-row sum — making results order-independent and
engine-portable.

Scale notes:
- The postings aggregate shuffles (doc, term, tf) rows — term-deduped
  per doc map-side, never raw text.
- BM25 filters postings to the query's terms BEFORE computing document
  frequencies, so the df aggregate and score join are query-sized, not
  vocabulary-sized; corpus-wide stats (N, total length) ride a 1-row
  broadcast. Per-query cost is O(matching postings), independent of
  vocabulary size.
- TF-IDF joins the postings to a vocabulary-sized df table on the term
  key — a shuffle equi-join on both sides (the term dictionary at 100 TB
  is itself large; no broadcast assumption) — then one per-doc rank
  window. Three shuffles total, all aggregate-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens (the shared corpus tokenizer:
    identical splitting is what makes tf/df exactly reproducible in any
    engine — ``[^a-z0-9]+`` on lowercased text, empties dropped)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def doc_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tf) postings via explode + hash aggregation; the
    shuffle carries term-frequency partials, never document text."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query terms.

    Lucene-style BM25 with the non-negative idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Per-term scores are quantized
    to integer micro-units *before* the per-document sum, so the ranking
    is deterministic (no float-summation order sensitivity) and the SQL
    oracle reproduces it exactly.

    Returns (doc, n_terms_matched, score_micro), ties broken by doc id.
    """
    post = doc_postings(df, id_col, text_col)
    dl = post.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qpost = post.where(F.col("term").isin(query_terms))
    dfreq = qpost.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    scored = (
        qpost.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    term_score = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") * F.col("n_docs") / F.col("total_len")
            )
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum(F.round(term_score * 1_000_000, 0).cast("long")).alias(
                "score_micro"
            ),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    n_per_doc: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Each document's ``n_per_doc`` highest-TF-IDF terms (its
    characteristic vocabulary; ``tf * ln(N/df)``, micro-quantized).

    Ties break by term text so the selection is total-ordered. Returns
    (doc, term, tf, tfidf_micro, term_rank).
    """
    post = doc_postings(df, id_col, text_col)
    stats = post.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        post.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "tfidf_micro",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")) * 1_000_000,
                0,
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_micro").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= n_per_doc)
        .select(id_col, "term", "tf", "tfidf_micro", "term_rank")
    )
