"""Similarity-search operator tests on the synthetic embeddings table."""

import pyspark.sql.functions as F
import pytest

from feast_java_old_spark.operators import similarity
from feast_java_old_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_cosine_kernel_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>",
    )
    out = df.select(similarity.cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert out[0].c == pytest.approx(0.0)
    assert out[1].c == pytest.approx(1.0)


def test_topk_shape_and_order(emb, queries):
    k = 5
    out = similarity.cosine_topk(emb, queries, k=k).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, k + 1))
        sims = [r.cosine for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)


def test_self_similarity_excluded_but_top1_is_sane(emb):
    # query = corpus vector 0: its nearest neighbor must have cosine < 1,
    # and brute-force top-1 must dominate any other candidate.
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk(emb, q, k=1).collect()
    assert len(out) == 1 and out[0].cosine < 1.0


def test_ann_subset_of_bruteforce_universe(emb, queries):
    """ANN results are a (bucket-restricted) subset of valid neighbors and
    rank correctly within the bucket."""
    ann = similarity.ann_sign_lsh(emb, queries, k=3, bits=4).collect()
    assert len(ann) > 0
    for r in ann:
        assert r.neighbor_id != r.query_id
    # every ANN neighbor shares the query's 4-bit sign bucket
    buckets = {
        r.vec_id: r.bucket
        for r in emb.select(
            "vec_id", similarity.sign_bucket(F.col("embedding").cast("array<double>"), 4).alias("bucket")
        ).collect()
    }
    for r in ann:
        assert buckets[r.neighbor_id] == buckets[r.query_id]


def test_near_dups_threshold(emb):
    out = similarity.embedding_near_dups(emb, threshold=0.5, bits=4).collect()
    for r in out:
        assert r.cosine >= 0.5
        assert r.id_a < r.id_b


def test_ivf_assignment_is_nearest_centroid(emb):
    """Every vector's inverted-list assignment is its true argmax-cosine
    centroid (rounded, ties by lowest centroid id)."""
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("__cv"),
    )
    cent = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("__ev"),
    )
    assigned = {
        r.neighbor_id: r.centroid_id
        for r in similarity.ivf_assign(
            c, cent, nprobe=1, id_col="neighbor_id", vec_col="__cv",
            centroid_vec_col="__ev",
        ).collect()
    }
    # brute-force oracle via the exact scorer
    brute = (
        c.join(F.broadcast(cent))
        .select(
            "neighbor_id",
            "centroid_id",
            F.round(similarity.cosine(F.col("__cv"), F.col("__ev")), 6).alias("s"),
        )
        .collect()
    )
    best = {}
    for r in brute:
        cur = best.get(r.neighbor_id)
        if cur is None or (r.s, -r.centroid_id) > (cur[0], -cur[1]):
            best[r.neighbor_id] = (r.s, r.centroid_id)
    assert assigned == {k: v[1] for k, v in best.items()}


def test_ivf_topk_matches_bruteforce_within_probed_lists(emb, queries):
    """IVF results rank correctly and, with nprobe == n_centroids, equal
    the exact brute-force top-k (full-probe IVF degenerates to exact)."""
    n_cent = emb.where(F.col("vec_id") % 100 == 0).count()
    exact = similarity.cosine_topk(emb, queries, k=3).collect()
    full_probe = similarity.ann_ivf(
        emb, queries, k=3, centroid_step=100, nprobe=n_cent
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(((r.query_id, r.rank, r.neighbor_id) for r in full_probe)) == sorted(
        ((r.query_id, r.rank, r.neighbor_id) for r in exact)
    )


def test_ivf_partial_probe_is_subset_shape(emb, queries):
    out = similarity.ann_ivf(emb, queries, k=5, centroid_step=50, nprobe=2).collect()
    assert len(out) > 0
    for r in out:
        assert r.neighbor_id != r.query_id
        assert -1.0 <= r.cosine <= 1.0


# ---------------------------------------------------------------- recall


@pytest.fixture(scope="module")
def recall_queries(emb):
    # 25 queries for a stabler recall estimate than the 5 driver queries
    return emb.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _recall(approx_df, exact_pairs):
    approx = {(r.query_id, r.neighbor_id) for r in approx_df.collect()}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_ann_recall_floors(emb, recall_queries):
    """Quality gate for the ANN scale paths (VERDICT r1 item 7).

    Measured on the sf0.001/sf0.01 embeddings (same 500-vector table):
    single-table sign-LSH at bits=6 has recall@5 ≈ 0.03 — documented as
    a *bucket-restricted* candidate generator, not a recall path. The
    recall-bearing configurations and their measured values:

    - multi-table sign-LSH bits=4 tables=16: 0.91
    - multi-table sign-LSH bits=4 tables=8:  0.72
    - IVF centroid_step=50 nprobe=4:         0.57

    Floors below sit ~0.1 under measurement to absorb tie-order jitter,
    and fail loudly if a plan change quietly guts recall.
    """
    k = 5
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, recall_queries, k=k).collect()
    }
    r16 = _recall(
        similarity.ann_sign_lsh(emb, recall_queries, k=k, bits=4, tables=16),
        exact,
    )
    assert r16 >= 0.80, f"multi-table LSH recall@5 collapsed: {r16:.2f}"
    r8 = _recall(
        similarity.ann_sign_lsh(emb, recall_queries, k=k, bits=4, tables=8),
        exact,
    )
    assert r8 >= 0.60, f"multi-table LSH (L=8) recall@5 collapsed: {r8:.2f}"
    rivf = _recall(
        similarity.ann_ivf(
            emb, recall_queries, k=k, centroid_step=50, nprobe=4
        ),
        exact,
    )
    assert rivf >= 0.45, f"IVF recall@5 collapsed: {rivf:.2f}"


def test_multi_table_recall_dominates_single_table(emb, recall_queries):
    # OR-amplification must strictly help at equal bits
    k = 5
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, recall_queries, k=k).collect()
    }
    single = _recall(
        similarity.ann_sign_lsh(emb, recall_queries, k=k, bits=4, tables=1),
        exact,
    )
    multi = _recall(
        similarity.ann_sign_lsh(emb, recall_queries, k=k, bits=4, tables=8),
        exact,
    )
    assert multi > single


def test_suggest_bits_scaling():
    assert similarity.suggest_bits(500, 1024) == 1
    assert similarity.suggest_bits(1 << 20, 1024) == 10
    # 100 TB scale: ~1e11 vectors at 1k/bucket → 27 bits
    assert similarity.suggest_bits(10**11, 1024) == 27


def test_near_dups_occupancy_warning(emb):
    with pytest.warns(RuntimeWarning, match="bucket occupancy"):
        similarity.embedding_near_dups(
            emb, bits=2, corpus_rows=10**9, max_bucket_rows=10_000
        )


def test_arrow_kernel_matches_sql_kernel(emb, recall_queries):
    """cosine_topk_arrow (BLAS matmul) returns the identical ranked
    neighbor sets as the HOF kernel (round-6 cosines make ties stable)."""
    k = 5
    sql_out = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.cosine_topk(emb, recall_queries, k=k).collect()
    }
    arrow_out = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.cosine_topk_arrow(
            emb, recall_queries, k=k
        ).collect()
    }
    assert sql_out == arrow_out and len(sql_out) > 0


def test_arrow_kernel_empty_queries(emb, spark):
    empty = spark.createDataFrame([], "query_id long, embedding array<float>")
    assert similarity.cosine_topk_arrow(emb, empty).count() == 0


def test_mean_pool_exact_values(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0, 30.0]),
            ("a", [3.0, 4.0, -10.0]),
            ("b", [5.0, 6.0, 7.0]),
        ],
        "g string, embedding array<double>",
    )
    out = {r.g: r for r in similarity.mean_pool(df, "g").collect()}
    assert out["a"].embedding == [2.0, 3.0, 10.0] and out["a"].n_vectors == 2
    assert out["b"].embedding == [5.0, 6.0, 7.0] and out["b"].n_vectors == 1


# ------------------------------------------------------- product quantization


def test_pq_encode_matches_brute_force(spark):
    from feast_java_old_spark.operators.similarity import pq_encode, pq_train

    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cbs = pq_train(df, m=4, codes=8, dim=16)
    assert len(cbs) == 4 and len(cbs[0]) == 8 and len(cbs[0][0]) == 4
    got = {
        (r.vec_id, r.subspace): r.code
        for r in pq_encode(df, cbs).collect()
    }
    for vid, v in vecs:
        for s in range(4):
            sv = np.array(v[s * 4 : (s + 1) * 4])
            d2 = [
                round(float(((sv - np.array(c)) ** 2).sum()), 6)
                for c in cbs[s]
            ]
            want = int(np.argmin(d2))  # first min -> lowest code on ties
            assert got[(vid, s)] == want, (vid, s)


def test_pq_adc_ranks_by_reconstructed_distance(spark):
    from feast_java_old_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    import numpy as np

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cbs = pq_train(df, m=4, codes=8, dim=16)
    codes = pq_encode(df, cbs)
    queries = [(0, vecs[0][1]), (1, vecs[1][1])]
    out = pq_adc_topk(codes, cbs, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.adc_micro, r.vec_id))
    assert set(by_q) == {0, 1}
    for qid, rows in by_q.items():
        assert len(rows) == 5
        assert rows == sorted(rows)  # ascending distance, ties by id
        # a corpus vector quantizes near its own codes: the query itself
        # must appear in its top-5 by asymmetric distance
        assert qid in {vid for _, vid in rows}


def test_pq_encode_kernels_identical(spark):
    from feast_java_old_spark.operators.similarity import pq_encode, pq_train

    import numpy as np

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cbs = pq_train(df, m=4, codes=8, dim=16)
    a = sorted(map(tuple, pq_encode(df, cbs, kernel="expr").collect()))
    b = sorted(map(tuple, pq_encode(df, cbs, kernel="arrow").collect()))
    assert a == b
    with pytest.raises(ValueError):
        pq_encode(df, cbs, kernel="nope")


def test_pq_train_validates(spark):
    from feast_java_old_spark.operators.similarity import pq_train

    df = spark.createDataFrame(
        [(1, [0.0] * 16)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pq_train(df, m=5, codes=4, dim=16)  # dim not divisible
    with pytest.raises(ValueError):
        pq_train(df, m=4, codes=8, dim=16)  # fewer rows than codes


def test_ann_ivf_pq_recall_gate(spark, sf_dir):
    """IVF-PQ with exact rerank must recover >= 0.70 of the true
    cosine top-5 on the synthetic embeddings (measured 0.84 at
    nprobe=12/20, rerank=100 on both sf0.001 and sf0.01; the ADC-only
    path caps near ~0.5 from quantization noise — reranking is part of
    the operator's contract, exactly like production IVF-PQ
    deployments; floor sits ~0.1 under measurement like the other ANN
    recall gates)."""
    from feast_java_old_spark.operators.similarity import (
        ann_ivf_pq,
        cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (
        emb.where(F.col("vec_id") % 100 == 0)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    queries = [(int(r[0]), list(r[1])) for r in qrows]
    qdf = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, qdf, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_pq(
            emb, queries, k=5, n_lists=20, nprobe=12, rerank=100
        ).collect()
    }
    assert len(got & truth) / len(truth) >= 0.70


def test_ann_ivf_pq_adc_only_shape_and_validation(spark, sf_dir):
    from feast_java_old_spark.operators.similarity import ann_ivf_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = [
        (int(r[0]), list(r[1]))
        for r in emb.select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .limit(2)
        .collect()
    ]
    out = ann_ivf_pq(emb, queries, k=3, nprobe=4).collect()
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.adc_micro, r.neighbor_id))
    assert all(len(v) == 3 and v == sorted(v) for v in by_q.values())
    with pytest.raises(ValueError):
        ann_ivf_pq(emb, queries, m=5, dim=64)  # dim not divisible


def test_mmr_rerank_known_vectors(spark):
    """Hand-checkable 2-D MMR: query along e1; a (id 1) at 10deg is most
    relevant, b (id 2) at 15deg is redundant with a (5deg apart), c
    (id 3) at -30deg is diverse. Pure relevance ranks (a, b, c); MMR at
    lambda=1/2 picks a, then c — cos30 - cos40 = +99981 micro beats b's
    cos15 - cos5 = -30269 micro."""
    import math

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    corpus = spark.createDataFrame(
        [(1, v(10)), (2, v(15)), (3, v(-30))],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(10, [1.0, 0.0])], "query_id long, embedding array<double>")
    out = sorted(
        similarity.mmr_topk(corpus, q, k=3, pool=3).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.neighbor_id for r in out] == [1, 3, 2]
    # step1 = pure relevance micro-units: round(cos(10deg), 6) * 1e6
    assert out[0].mmr_score_2x_micro == 984808
    # step2: c = cos30 - cos40, step3: b = cos15 - cos5 (max sim is to a)
    assert out[1].mmr_score_2x_micro == 866025 - 766044
    assert out[2].mmr_score_2x_micro == 965926 - 996195


def test_mmr_negative_similarity_not_floored(spark):
    """Candidates anti-correlated with the first pick must get a score
    BONUS (rel - negative maxsim > rel); the floor-at-zero bug would
    rank them by rel alone."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),          # first pick
            (2, [-0.6, 0.8]),         # anti-correlated with 1: sim=-0.6
            (3, [0.0, 1.0]),          # orthogonal to 1: sim=0
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(10, [1.0, 0.0])], "query_id long, embedding array<double>")
    out = {r.mmr_rank: r for r in similarity.mmr_topk(corpus, q, k=2, pool=3).collect()}
    assert out[1].neighbor_id == 1
    # rel(2) = -0.6, maxsim = -0.6 -> score 0; rel(3) = 0, maxsim 0 -> 0;
    # tie at 0 -> smaller id 2 wins (only correct WITHOUT the 0-floor,
    # which would give 2 a score of -1.2e6 - floored maxsim 0)
    assert out[2].neighbor_id == 2
    assert out[2].mmr_score_2x_micro == 0


def test_random_projection_preserves_relative_distances(emb, spark):
    """JL sanity on the real corpus: projected pairwise distances
    correlate with original distances (sign-RP preserves geometry in
    expectation), and the output is deterministic integer micro-units."""
    import numpy as np

    rows = emb.limit(30).collect()
    ids = [r.vec_id for r in rows]
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    sub = emb.limit(30)
    out = similarity.random_projection(sub, dim=64, out_dim=32).collect()
    P = {}
    for r in out:
        P.setdefault(r.vec_id, {})[r.j] = r.value_micro / 1e6
    M = np.array([[P[i][j] for j in range(32)] for i in ids])
    # Achlioptas scaling preserves norms in expectation
    ratio = (np.linalg.norm(M, axis=1) ** 2) / (np.linalg.norm(V, axis=1) ** 2)
    assert 0.75 < ratio.mean() < 1.3, ratio.mean()
    orig, proj = [], []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            orig.append(np.linalg.norm(V[a] - V[b]))
            proj.append(np.linalg.norm(M[a] - M[b]))
    corr = np.corrcoef(orig, proj)[0, 1]
    # k=32 sign-RP on clustered synthetic data: measured 0.45; the floor
    # guards against sign-table or scaling regressions, not JL variance
    assert corr > 0.3, corr
    # deterministic across invocations
    out2 = similarity.random_projection(sub, dim=64, out_dim=32).collect()
    assert {(r.vec_id, r.j, r.value_micro) for r in out} == {
        (r.vec_id, r.j, r.value_micro) for r in out2
    }
