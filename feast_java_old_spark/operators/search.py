"""Corpus keyword search: BM25 ranking and per-document TF-IDF terms.

Training-data curation needs corpus-wide lexical search (find documents
matching audit terms, score topical relevance, surface each document's
characteristic vocabulary) — the lexical complement of the embedding
similarity operators in ``operators/similarity.py``.

Everything is built-in expressions (JVM-side, codegen): tokenization is
``split`` + ``filter``, postings come from ``explode`` + hash
aggregation, and scores are arithmetic on exact integer statistics
(tf, df, doclen) so both this engine and the SQL oracle compute
bit-identical inputs; the only floating step is the final ``idf``/score
product, which is integer-quantized (micro-units) before any cross-row
sum — making results order-independent and engine-portable.

Scale notes:
- :func:`bm25_topk` never joins per-document tables: the document
  length rides the postings aggregate as a grouping key (it is a pure
  projection, ``size(tokens)``, functionally dependent on the doc), the
  term filter sits BELOW the aggregate (Catalyst pushes it under the
  partial agg, so only query-term postings aggregate or shuffle), and
  corpus-wide stats (N, total length) are one cheap projection-only
  scan broadcast as a single row — precompute them once per corpus via
  :func:`corpus_stats` and pass them in to make a query cost
  O(matching postings) with a single corpus pass.
- :func:`tfidf_top_terms` needs the full vocabulary (df for every
  term), so its postings feed three consumers (scores, df, N); they are
  persisted (memory-and-disk) by default so the corpus is tokenized
  once, not three times. The df join is a shuffle equi-join on the term
  key (the vocabulary at 100 TB is itself large; no broadcast
  assumption), then one per-doc rank window.
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


def corpus_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """1-row (n_docs, total_len) over documents with at least one token
    — a projection-only scan (no explode, no shuffle beyond the final
    1-row combine). Persist the result once per corpus and hand it to
    every :func:`bm25_topk` call."""
    dl = F.size(tokens(F.col(text_col)))
    return df.select(dl.alias("__dl")).agg(
        F.count(F.when(F.col("__dl") > 0, F.lit(1))).alias("n_docs"),
        F.coalesce(F.sum("__dl"), F.lit(0)).alias("total_len"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query terms.

    Lucene-style BM25 with the non-negative idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Per-term scores are quantized
    to integer micro-units *before* the per-document sum, so the ranking
    is deterministic (no float-summation order sensitivity) and the SQL
    oracle reproduces it exactly.

    ``stats``: a precomputed :func:`corpus_stats` frame; when omitted it
    is derived here (one extra projection-only corpus scan).

    Returns (doc, n_terms_matched, score_micro), ties broken by doc id.
    """
    if stats is None:
        stats = corpus_stats(df, id_col, text_col)
    toks = tokens(F.col(text_col))
    # dl is a grouping key, not a join: functionally dependent on the
    # doc, computed in the same projection that feeds the explode
    qpost = (
        df.select(
            F.col(id_col),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .where(F.col("term").isin(query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df_t via a count window over the (query-sized) postings — one
    # shuffle on the term key, no separate aggregate branch that would
    # re-tokenize the corpus
    scored = qpost.withColumn(
        "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(stats))
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
    cache_postings: bool = True,
) -> DataFrame:
    """Each document's ``n_per_doc`` highest-TF-IDF terms (its
    characteristic vocabulary; ``tf * ln(N/df)``, micro-quantized).

    The postings feed three consumers (scoring rows, per-term df, the
    doc count), so with ``cache_postings`` (default) they are persisted
    memory-and-disk: one corpus tokenize instead of three. Postings are
    (doc, term, tf) rows — a fraction of corpus text — and spill cleanly;
    the caller may pass ``cache_postings=False`` to trade the extra
    scans for zero cache footprint.

    Ties break by term text so the selection is total-ordered. Returns
    (doc, term, tf, tfidf_micro, term_rank).
    """
    post = doc_postings(df, id_col, text_col)
    if cache_postings:
        from pyspark import StorageLevel

        post = post.persist(StorageLevel.MEMORY_AND_DISK)
    stats = post.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    # df_t via a count window over the term partition: one shuffle of
    # the postings replaces the aggregate-plus-equi-join (two shuffles
    # of the same rows) the CTE form would plan
    scored = (
        post.withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("term")))
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


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al. 2009) —
    the standard hybrid-retrieval combiner (lexical BM25 + embedding
    ANN, or relevance + quality): each list contributes
    ``1/(k + rank)`` for every document it ranked, summed across lists.
    The reference has no ranking layer at all; this is the engine
    extension that makes its search operators composable.

    Contributions are quantized to integer micro-units with ``floor``
    BEFORE the cross-list sum — ``floor`` (not ``round``) because
    ``1e6/(k+rank)`` can land exactly on .5 (e.g. k+rank = 128), where
    HALF_UP engines and ties-away engines already agree but float
    re-association wouldn't; floor is unambiguous in every engine, so
    the fused ranking is bit-reproducible by the SQL oracle.

    Plan shape: union of the (already tiny, top-k-bounded) ranked
    lists, ONE hash aggregate on the id — map-side combined, no join at
    all; cost is O(Σ list sizes) regardless of corpus size. Returns
    ``(id, n_lists, rrf_micro)``; order with
    ``(rrf_micro DESC, id)`` and limit at the call site.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = [
        r.select(
            F.col(id_col),
            F.floor(F.lit(1_000_000) / (F.lit(k) + F.col(rank_col)))
            .cast("long")
            .alias("__c"),
        )
        for r in rankings
    ]
    allc = contrib[0]
    for c in contrib[1:]:
        allc = allc.unionByName(c)
    return allc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum("__c").alias("rrf_micro"),
    )


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, pos, term) positional index rows — the persisted form that
    makes phrase and proximity queries joins instead of text scans.
    Shuffle-free projection (posexplode of the shared tokenizer)."""
    return df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase search via positional-index adjacency joins — the
    classic search-engine evaluation: term_i of the phrase must appear
    at ``start + i``, so each term's postings project their position
    back to the would-be start and the phrase is a k-way hash EQUI-join
    on ``(doc, start)``.

    Scale shape: postings are PRUNED to the phrase's terms before any
    join (the filter sits under the explode's projection, so only
    phrase-term rows ever materialize — at 100 TB with a persisted
    positional index this is k index lookups), and each join side is
    one term's postings. No window, no text re-scan, no regex over the
    corpus at query time.

    Emits ``(doc_id, n_matches, first_pos)`` per matching document.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    post = positional_postings(df, id_col, text_col).where(
        F.col("term").isin(list(phrase))
    )
    base = post.where(F.col("term") == phrase[0]).select(id_col, "pos")
    for i, t in enumerate(phrase[1:], start=1):
        nxt = post.where(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("pos")
        )
        base = base.join(nxt, [id_col, "pos"])
    return base.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR evaluation — the metric kernel for grading any
    retrieval path (ANN vs exact, BM25 vs hybrid) AT SCALE: one join of
    the result lists against the relevance judgments plus one per-query
    aggregate — never a per-query driver loop.

    ``results``: (query, doc, rank) ranked lists; ``qrels``: (query,
    doc) binary relevance. Emits the metric COMPONENTS as exact
    integers, so the output is engine-bit-exact with no float
    summation anywhere (position gains 1/log2(rank+1) are micro-
    quantized per RANK — a k-entry literal table — and DCG/ideal-DCG
    are integer sums of those):

    ``(query_id, n_rel, hits_at_k, first_rel_rank, dcg_micro,
    idcg_micro)`` → recall@k = hits/n_rel, RR = 1/first_rel_rank,
    nDCG@k = dcg_micro/idcg_micro; consumers divide (or feed a mean
    aggregate). Queries with no qrels are dropped (undefined metrics);
    queries with no relevant retrieved get first_rel_rank NULL and
    dcg 0.
    """
    import math

    gains = [0] + [
        int(math.floor(1e6 / math.log2(r + 1) + 0.5)) for r in range(1, k + 1)
    ]
    r = results.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).alias("rank"),
    )
    q = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.lit(1).alias("__rel"),
    ).distinct()
    nrel = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    idcg_table = [0]
    for i in range(1, k + 1):
        idcg_table.append(idcg_table[-1] + gains[i])
    gain_arr = F.array(*[F.lit(g).cast("long") for g in gains[1:]])
    joined = r.join(q, ["query_id", "doc_id"], "left").withColumn(
        "__gain",
        F.when(
            F.col("__rel").isNotNull(),
            F.element_at(gain_arr, F.col("rank").cast("int")),
        ).otherwise(F.lit(0).cast("long")),
    )
    idcg = F.element_at(
        F.array(*[F.lit(x).cast("long") for x in idcg_table[1:]]),
        F.least(F.col("n_rel"), F.lit(k)).cast("int"),
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.sum(F.coalesce("__rel", F.lit(0))).cast("long").alias("hits_at_k"),
            F.sum("__gain").alias("dcg_micro"),
            F.min(
                F.when(F.col("__rel").isNotNull(), F.col("rank"))
            ).cast("long").alias("first_rel_rank"),
        )
        .join(F.broadcast(nrel), "query_id")
        .select(
            "query_id",
            "n_rel",
            "hits_at_k",
            "first_rel_rank",
            "dcg_micro",
            idcg.alias("idcg_micro"),
        )
    )
