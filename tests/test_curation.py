"""Corpus-curation operator tests: decontamination, deterministic
shuffle/sharding, normalization + blocklist, temperature mixing, and
contrastive hard-negative mining."""

import pyspark.sql.functions as F
import pytest

from feast_java_old_spark.operators import curation, similarity
from feast_java_old_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


# ------------------------------------------------------------ decontaminate


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # 2 distinct benchmark 3-grams -> contaminated at min_hits=2
            (1, "xx the quick brown fox yy"),
            # exactly 1 overlapping 3-gram -> clean at min_hits=2
            (2, "aa bb the quick brown cc dd"),
            # no overlap
            (3, "completely unrelated text here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.decontaminate(corpus, bench, n=3, min_hits=2).collect()
    }
    assert out[1].contaminated and out[1].n_hits == 2
    assert not out[2].contaminated and out[2].n_hits == 1
    assert not out[3].contaminated and out[3].n_hits == 0


def test_decontaminate_reports_every_doc(docs):
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    out = curation.decontaminate(corpus, bench)
    assert out.count() == corpus.count()
    # a doc duplicated into the benchmark must be contaminated; the
    # synthetic corpus has heavy 3-gram overlap, so just sanity-check
    # both classes exist and n_hits is consistent with the flag
    rows = out.collect()
    assert all((r.n_hits >= 2) == r.contaminated for r in rows)


# ----------------------------------------------------------- corpus_shuffle


def test_corpus_shuffle_is_a_permutation(docs):
    n = docs.count()
    out = curation.corpus_shuffle(docs, n_shards=8, seed=42)
    rows = out.collect()
    assert len(rows) == n
    # every doc appears once; within a shard, pos is 1..shard_size
    assert len({r.doc_id for r in rows}) == n
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_corpus_shuffle_deterministic_and_seed_sensitive(docs):
    a1 = curation.corpus_shuffle(docs, n_shards=4, seed=7).collect()
    a2 = curation.corpus_shuffle(docs, n_shards=4, seed=7).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    b = {r.doc_id: (r.shard, r.pos) for r in curation.corpus_shuffle(docs, n_shards=4, seed=8).collect()}
    a = {r.doc_id: (r.shard, r.pos) for r in a1}
    assert any(a[d] != b[d] for d in a)  # different seed -> different permutation


# ----------------------------------------------------------- normalize_text


def test_normalize_text_collapses_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "  The the THE  quick   quick fox  "),
            (2, "clean text only"),
            (3, "some spam in here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.normalize_text(df).collect()}
    assert out[1].text == "the quick fox"
    assert out[1].n_tokens_raw == 6 and out[1].n_tokens == 3
    assert not out[1].blocked
    assert out[2].text == "clean text only" and not out[2].blocked
    assert out[3].blocked


def test_normalize_text_idempotent(docs):
    once = curation.normalize_text(docs)
    twice = curation.normalize_text(once)
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b


# ---------------------------------------------------------- temperature_mix


def test_temperature_mix_rates_and_determinism(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.temperature_mix(
        df, strata_col="source", alpha=0.5, target_rows=100
    )
    got = out.collect()
    rates = {r.stratum: r.rate for r in got}
    # alpha=0.5: w_big=20, w_small=5 -> p_big=0.8, p_small=0.2
    # rate_big = 100*0.8/400 = 0.2 ; rate_small = 100*0.2/25 = 0.8
    assert rates["big"] == pytest.approx(0.2, abs=1e-6)
    assert rates["small"] == pytest.approx(0.8, abs=1e-6)
    again = out.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_temperature_mix_alpha1_is_proportional(spark):
    rows = [(i, "a") for i in range(300)] + [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.temperature_mix(df, strata_col="source", alpha=1.0, target_rows=40)
    rates = {r.stratum: r.rate for r in out.collect()}
    # alpha=1 -> uniform keep-rate target/total across strata
    assert rates["a"] == pytest.approx(0.1, abs=1e-6)
    assert rates["b"] == pytest.approx(0.1, abs=1e-6)


# ----------------------------------------------------------- hard_negatives


def test_hard_negatives_labels_differ_and_rank_by_cosine(emb):
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    out = similarity.hard_negatives(emb, queries, k=5)
    rows = out.collect()
    qlabels = {r.query_id: r.label for r in queries.collect()}
    assert len(rows) == queries.count() * 5
    by_q = {}
    for r in rows:
        assert r.neighbor_label != qlabels[r.query_id]
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_hard_negatives_subset_of_unfiltered_candidates(emb):
    """Every hard negative must appear in the unrestricted neighbor list
    when k covers the label-filtered prefix."""
    queries = emb.where(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    hard = similarity.hard_negatives(emb, queries, k=3).collect()
    full = similarity.cosine_topk(
        emb, queries.select("query_id", "embedding"), k=100
    ).collect()
    full_set = {(r.query_id, r.neighbor_id) for r in full}
    assert all((r.query_id, r.neighbor_id) in full_set for r in hard)


# ------------------------------------------------------------- corpus_split


def test_corpus_split_deterministic_and_complete(docs):
    out = curation.corpus_split(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    again = {r.doc_id: r.split for r in curation.corpus_split(docs).collect()}
    assert all(again[r.doc_id] == r.split for r in rows)
    # train dominates at the 0.9 weight
    n_train = sum(1 for r in rows if r.split == "train")
    assert n_train / len(rows) > 0.8


def test_corpus_split_stable_under_growth(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in curation.corpus_split(small).collect()}
    b = {r.doc_id: r.split for r in curation.corpus_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())  # old docs never move


def test_corpus_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        curation.corpus_split(docs, splits=(("a", 0.5), ("b", 0.4)))


# ---------------------------------------------------------- per_stratum_topk


def test_per_stratum_topk_ranks_within_stratum(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 20.0),
         (4, "b", 5.0), (5, "b", 50.0)],
        "doc_id long, source string, s double",
    )
    out = curation.per_stratum_topk(df, score=F.col("s"), k=2).collect()
    got = {(r.stratum, r.rank): (r.doc_id, r.score) for r in out}
    assert got[("a", 1)] == (2, 30.0) and got[("a", 2)] == (3, 20.0)
    assert got[("b", 1)] == (5, 50.0) and got[("b", 2)] == (4, 5.0)
    assert len(out) == 4


# --------------------------------------------------------------- kmeans_step


def test_kmeans_step_reduces_distortion(emb):
    from feast_java_old_spark.operators.similarity import cosine, kmeans_step

    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    cent0 = v.where(F.col("id") % 50 == 0).select(
        F.col("id").alias("centroid_id"), F.col("__v").alias("__cv")
    )
    step1 = kmeans_step(v, cent0, dim=64)
    assert step1.count() <= cent0.count()
    assert step1.select(F.sum("n_members")).collect()[0][0] == v.count()

    def mean_best_cosine(cents):
        scored = v.crossJoin(F.broadcast(cents)).select(
            "id", cosine(F.col("__v"), F.col("__cv")).alias("c")
        )
        return (
            scored.groupBy("id").agg(F.max("c").alias("best"))
            .select(F.avg("best")).collect()[0][0]
        )

    before = mean_best_cosine(cent0)
    after = mean_best_cosine(
        step1.select("centroid_id", F.col("centroid").alias("__cv"))
    )
    # a Lloyd step must not make the assignment objective worse
    assert after >= before - 1e-9


def test_kmeans_step_kernels_identical(emb):
    """The Arrow/BLAS assignment kernel must reproduce the expression
    kernel bit-for-bit (cosines round to 6dp before the argmax, ties to
    the lowest centroid id in both)."""
    from feast_java_old_spark.operators.similarity import kmeans_step

    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    cent0 = v.orderBy("id").limit(20).select(
        F.col("id").alias("centroid_id"), F.col("__v").alias("__cv")
    )
    canon = lambda df: {  # noqa: E731
        r["centroid_id"]: (r["n_members"], tuple(r["centroid"]))
        for r in df.collect()
    }
    expr = canon(kmeans_step(v, cent0, dim=64, kernel="expr"))
    arrow = canon(kmeans_step(v, cent0, dim=64, kernel="arrow"))
    assert expr == arrow
    with pytest.raises(ValueError):
        kmeans_step(v, cent0, dim=64, kernel="nope")


# ----------------------------------------------------------- unigram_logprob


def test_unigram_logprob_rare_tokens_score_lower(spark):
    from feast_java_old_spark.operators.text import unigram_logprob

    rows = [(i, "common words repeated common words") for i in range(20)]
    rows.append((99, "zzyzx qwfp vexing rarities"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert len(out) == 21
    common_score = out[0].logprob
    assert out[99].logprob < common_score  # rare-token doc scores lower
    assert out[0].n_tokens == 5


def test_unigram_logprob_bounds(docs):
    from feast_java_old_spark.operators.text import unigram_logprob

    out = unigram_logprob(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r.logprob < 0 for r in rows)  # probabilities < 1


# ------------------------------------------------------- embedding_outliers


def test_embedding_outliers_flags_off_manifold_tail(emb):
    from feast_java_old_spark.operators.similarity import embedding_outliers

    out = embedding_outliers(emb, dim=64).collect()
    assert len(out) == emb.count()
    flagged = {r.vec_id for r in out if r.outlier}
    # the corpus is unit-normalized, so the norm band is vacuous; the
    # center-cos p5 tail must flag ~5% including the farthest vector
    assert 0.02 * len(out) <= len(flagged) <= 0.1 * len(out)
    by_cos = sorted(out, key=lambda r: r.center_cos)
    assert by_cos[0].vec_id in flagged
    assert by_cos[-1].vec_id not in flagged


def test_embedding_outliers_flags_planted_norm_outlier(spark):
    from feast_java_old_spark.operators.similarity import embedding_outliers

    import random

    rng = random.Random(0)
    rows = [(i, [rng.gauss(0.5, 0.05) for _ in range(4)]) for i in range(100)]
    rows.append((999, [100.0, 100.0, 100.0, 100.0]))  # exploded norm
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in embedding_outliers(df, dim=4).collect()}
    assert out[999].outlier


# ------------------------------------------------------------------ upsample


def test_upsample_copy_counts(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 100 else "small") for i in range(125)],
        "doc_id long, source string",
    )
    out = curation.upsample(df, "source", {"small": 3.0, "big": 1.0}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy)
    # integer rates are exact: 1 copy per big row, 3 per small row
    for d, copies in by_doc.items():
        expected = 3 if d >= 100 else 1
        assert sorted(copies) == list(range(1, expected + 1))


def test_upsample_fractional_rate_expectation_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "s") for i in range(1000)], "doc_id long, source string"
    )
    out = curation.upsample(df, "source", {"s": 2.5})
    n1 = out.count()
    # E[count] = 2500; md5 fraction is uniform, envelope +-5%
    assert 2375 <= n1 <= 2625
    assert out.count() == n1  # deterministic
    # rate < 1 downsamples, consistent with stratified_sample
    down = curation.upsample(df, "source", {"s": 0.3}).count()
    assert 230 <= down <= 370


def test_upsample_matches_stratified_sample_membership(spark, docs):
    from feast_java_old_spark.operators.text import stratified_sample

    rates = {"src0": 0.5}
    up = curation.upsample(docs, "source", rates, default_rate=0.0)
    strat = stratified_sample(
        docs.select("doc_id", "source"), "source", rates, default_rate=0.0
    )
    assert sorted(r.doc_id for r in up.collect()) == sorted(
        r.doc_id for r in strat.collect()
    )


# ------------------------------------------------------------ dsir_weights


def test_dsir_weights_favor_target_like_documents(spark):
    from feast_java_old_spark.operators.curation import dsir_weights

    target_rows = [(i, "alpha beta gamma delta " * 5, True) for i in range(10)]
    other_rows = [(100 + i, "omega psi chi phi " * 5, False) for i in range(10)]
    # a held-out doc written in the target's vocabulary, and one in the
    # other vocabulary — neither is marked target
    probe = [(200, "alpha beta gamma delta alpha beta", False),
             (201, "omega psi chi phi omega psi", False)]
    df = spark.createDataFrame(
        target_rows + other_rows + probe, "doc_id long, text string, is_t boolean"
    )
    out = {r.doc_id: r.dsir_micro for r in
           dsir_weights(df, target=F.col("is_t"), n=2).collect()}
    # target-like probe scores strictly higher than the off-target probe
    assert out[200] > 0 > out[201]
    assert len(out) == 22


def test_dsir_weights_short_docs_absent_and_deterministic(spark):
    from feast_java_old_spark.operators.curation import dsir_weights

    df = spark.createDataFrame(
        [(1, "one-token", True), (2, "two tokens here", False)],
        "doc_id long, text string, is_t boolean",
    )
    a = sorted(map(tuple, dsir_weights(df, target=F.col("is_t")).collect()))
    b = sorted(map(tuple, dsir_weights(df, target=F.col("is_t")).collect()))
    assert a == b
    ids = {t[0] for t in a}
    assert ids == {2}  # the 1-token doc has no bigrams -> no weight


def test_semantic_decontaminate_flags_paraphrase_twins(spark):
    """A corpus vector nearly parallel to a benchmark vector is flagged
    even with zero lexical overlap; orthogonal vectors are clean; ties
    break to the lowest benchmark id."""
    from feast_java_old_spark.operators.curation import semantic_decontaminate

    bench = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])],
        "bench_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.999, 0.0447, 0.0]),   # ~bench 10 (cos ~ 0.999)
            (2, [0.0, 0.0, 1.0]),        # orthogonal to both
            (3, [0.7071, 0.7071, 0.0]),  # equidistant: tie -> bench 10
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_decontaminate(corpus, bench, threshold=0.95).collect()
    }
    assert out[1].contaminated is True and out[1].closest_bench_id == 10
    assert out[1].max_cos > 0.99
    assert out[2].contaminated is False and out[2].max_cos == 0.0
    assert out[3].closest_bench_id == 10 and out[3].contaminated is False


# ------------------------------------------------- stupid_backoff_logprob


def test_stupid_backoff_all_four_branches_exact(spark):
    """Hand-computed corpus where each backoff branch fires: train
    'a b c a b d' gives c1={a:2,b:2,c:1,d:1}, N=6,
    c2={'a b':2,'b c':1,'c a':1,'b d':1}, all trigrams count 1."""
    import math

    from feast_java_old_spark.operators.text import stupid_backoff_logprob

    train = spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [
            (1, "a b c x"),    # seen trigram + full OOV
            (2, "c a b d"),    # two seen trigrams
            (3, "x b c q d"),  # bigram backoff + OOV + unigram backoff
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in stupid_backoff_logprob(ev, train).collect()}
    oov = math.log(0.4 * 0.4 * 0.5 / 6)
    want = {
        1: (2, (math.log(1 / 2) + oov) / 2),
        2: (2, (math.log(1 / 1) + math.log(1 / 2)) / 2),
        3: (3, (math.log(0.4 * 1 / 2) + oov + math.log(0.4 * 0.4 * 1 / 6)) / 3),
    }
    for d, (n, lp) in want.items():
        assert out[d].n_trigrams == n
        assert abs(out[d].logprob - round(lp, 6)) < 1e-9


def test_stupid_backoff_self_scored_and_short_docs(spark):
    """Default train = eval corpus: every trigram is seen, so scores
    are pure ML trigram logprobs (<= 0); docs under 3 tokens emit no
    trigram and drop out — same as the SQL oracle's group-by."""
    from feast_java_old_spark.operators.text import stupid_backoff_logprob

    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)]
        + [(9, "too short")],
        "doc_id long, text string",
    )
    rows = stupid_backoff_logprob(df).collect()
    ids = {r.doc_id for r in rows}
    assert ids == set(range(5))  # doc 9 has no trigram
    assert all(r.logprob <= 0 for r in rows)
    # five identical docs: trigram c3=5, context bigram c2=5 -> ML
    # probability 1 per trigram -> logprob exactly 0
    assert all(abs(r.logprob) < 1e-9 for r in rows)


# ---------------------------------------------------------- stratified_sample


def test_stratified_sample_deterministic_nested_and_seeded(spark):
    """Rerun -> identical membership; raising a stratum's rate only
    ADDS rows (threshold sampling is nested), so budget changes never
    churn the kept set; a seed produces an INDEPENDENT redraw while
    seed=None preserves the historical unsalted draw."""
    from feast_java_old_spark.operators.text import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(4000)],
        "doc_id long, lang string",
    )
    s1 = {r.doc_id for r in stratified_sample(df, "lang", {"a": 0.3, "b": 0.6}).collect()}
    s2 = {r.doc_id for r in stratified_sample(df, "lang", {"a": 0.3, "b": 0.6}).collect()}
    assert s1 == s2
    bigger = {r.doc_id for r in stratified_sample(df, "lang", {"a": 0.5, "b": 0.8}).collect()}
    assert s1 <= bigger
    seeded = {
        r.doc_id
        for r in stratified_sample(df, "lang", {"a": 0.3, "b": 0.6}, seed=7).collect()
    }
    assert seeded != s1  # independent permutation, same rates


def test_stratified_sample_fractions_and_defaults(spark):
    """Per-stratum kept fractions land near their targets (md5 is
    uniform); strata missing from the rate map drop entirely
    (default_rate=0); rate 1.0 keeps a stratum whole."""
    from feast_java_old_spark.operators.text import stratified_sample

    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3]) for i in range(9000)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, "lang", {"x": 0.25, "y": 1.0}).groupBy(
        "lang"
    ).count().collect()
    got = {r.lang: r["count"] for r in out}
    assert "z" not in got
    assert got["y"] == 3000
    assert abs(got["x"] - 750) < 90  # ~3 sigma of Binomial(3000, .25)
