"""BM25 / TF-IDF search, weighted sampling, mergeable sketches."""

import math

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import search, sketches
from feast_java_old_spark.operators.curation import weighted_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "Apple banana apple!"),
        (2, "banana cherry"),
        (3, "cherry, cherry; cherry apple"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_postings_tokenize_and_tf(corpus):
    post = {
        (r.doc_id, r.term): r.tf for r in search.doc_postings(corpus).collect()
    }
    assert post[(1, "apple")] == 2 and post[(1, "banana")] == 1
    assert post[(3, "cherry")] == 3 and post[(3, "apple")] == 1
    assert len(post) == 6  # punctuation/case folded, empties dropped


def _bm25_expected(tf, df_t, dl, n_docs, total_len, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
    return idf * (tf * (k1 + 1.0)) / (
        tf + k1 * ((1.0 - b) + b * dl * n_docs / total_len)
    )


def test_bm25_topk_exact_scores(corpus):
    out = {
        r.doc_id: r
        for r in search.bm25_topk(corpus, ["apple", "cherry"], k=10).collect()
    }
    # N=3 docs, total_len=9; df(apple)=2, df(cherry)=2
    exp1 = round(_bm25_expected(2, 2, 3, 3, 9) * 1e6)
    exp3 = round(_bm25_expected(3, 2, 4, 3, 9) * 1e6) + round(
        _bm25_expected(1, 2, 4, 3, 9) * 1e6
    )
    exp2 = round(_bm25_expected(1, 2, 2, 3, 9) * 1e6)
    assert out[1].score_micro == exp1 and out[1].n_terms_matched == 1
    assert out[3].score_micro == exp3 and out[3].n_terms_matched == 2
    assert out[2].score_micro == exp2
    # doc 3 matches both terms and outranks all
    order = sorted(out.values(), key=lambda r: (-r.score_micro, r.doc_id))
    assert [r.doc_id for r in order][0] == 3


def test_bm25_topk_limits_and_ignores_absent_terms(corpus):
    out = search.bm25_topk(corpus, ["apple", "zzz"], k=1).collect()
    assert len(out) == 1
    assert out[0].doc_id == 1  # highest apple score; zzz matches nothing


def test_tfidf_top_terms_ranks_characteristic_vocab(corpus):
    out = search.tfidf_top_terms(corpus, n_per_doc=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # banana (df=2) and apple (df=2) tie in idf for doc 1; tf breaks it
    d1 = sorted(by_doc[1], key=lambda r: r.term_rank)
    assert d1[0].term == "apple" and d1[0].tf == 2
    assert d1[0].tfidf_micro == round(2 * math.log(3 / 2) * 1e6)
    # cherry dominates doc 3
    d3 = sorted(by_doc[3], key=lambda r: r.term_rank)
    assert d3[0].term == "cherry"
    assert all(len(v) <= 2 for v in by_doc.values())


# -------------------------------------------------------- weighted sample


def test_weighted_sample_deterministic_and_scale_invariant(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)], "doc_id long, w double"
    )
    a = [r.doc_id for r in weighted_sample(df, "w", k=20, seed=1).collect()]
    b = [r.doc_id for r in weighted_sample(df, "w", k=20, seed=1).collect()]
    assert a == b and len(a) == 20
    # A-ES keys scale by 1/c when all weights scale by c → same sample
    scaled = df.select("doc_id", (F.col("w") * 1000.0).alias("w"))
    c = [r.doc_id for r in weighted_sample(scaled, "w", k=20, seed=1).collect()]
    assert a == c
    # a different seed redraws
    d = [r.doc_id for r in weighted_sample(df, "w", k=20, seed=2).collect()]
    assert a != d


def test_weighted_sample_favors_heavy_rows_and_skips_nonpositive(spark):
    rows = [(i, 100.0 if i < 10 else 0.01) for i in range(100)]
    rows += [(900, 0.0), (901, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r.doc_id for r in weighted_sample(df, "w", k=12, seed=3).collect()}
    assert not got & {900, 901}
    # all ten heavy rows should make a 12-row sample (p ≈ 1)
    assert set(range(10)) <= got


# ---------------------------------------------------------------- sketches


def test_approx_distinct_error_bound(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_distinct_user_id
        for r in sketches.approx_distinct(
            events, ["event_type"], "user_id"
        ).collect()
    }
    for etype, n in exact.items():
        assert abs(approx[etype] - n) / n < 0.05, (etype, approx[etype], n)


def test_sketch_merge_equals_single_pass(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # shard by event_type, sketch each shard, union → same estimate as
    # one pass over everything (mergeability = the incremental path)
    shards = sketches.distinct_sketches(
        events, ["event_type"], "user_id"
    ).withColumn("g", F.lit(1))
    merged = sketches.merge_distinct_sketches(shards, ["g"]).collect()[0]
    direct = sketches.approx_distinct(
        events.withColumn("g", F.lit(1)), ["g"], "user_id"
    ).collect()[0]
    assert merged.approx_distinct == direct.approx_distinct_user_id


def test_approx_quantiles_rank_error(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sketches.approx_quantiles(
        events.withColumn("g", F.lit(1)), ["g"], "value", [0.5, 0.99]
    ).collect()[0].quantiles
    vals = sorted(r.value for r in events.select("value").collect())
    n = len(vals)
    for p, q in zip([0.5, 0.99], got):
        # rank of the returned value must be within 1% of the target rank
        import bisect

        lo = bisect.bisect_left(vals, q)
        hi = bisect.bisect_right(vals, q)
        target = p * n
        assert lo - 0.01 * n - 1 <= target <= hi + 0.01 * n + 1


# ---------------------------------------------------------- chunk_documents


def test_chunk_documents_overlap_and_clamp(spark):
    from feast_java_old_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),        # 5 tokens
            (2, "a b c"),            # exactly one window
            (3, "a b c d e f"),      # 6 tokens -> clamped last window
            (4, ""),                 # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(df, chunk_tokens=3, stride=2).collect():
        out.setdefault(r.doc_id, {})[r.chunk_idx] = r
    assert 4 not in out
    assert [out[1][i].chunk_text for i in sorted(out[1])] == ["a b c", "c d e"]
    assert list(out[2]) == [0] and out[2][0].chunk_text == "a b c"
    assert [out[3][i].chunk_text for i in sorted(out[3])] == [
        "a b c", "c d e", "e f",
    ]
    assert out[3][2].n_tokens_chunk == 2
    r = out[1][0]
    import hashlib
    assert r.chunk_fingerprint == hashlib.md5(b"a b c").hexdigest()


def test_heavy_hitters_exact_on_skewed_data(spark):
    from feast_java_old_spark.operators.sketches import heavy_hitters

    # zipf-ish: value v appears ~ N/v times; plus a uniform tail
    rows = [(v,) for v in range(1, 30) for _ in range(3000 // v)]
    rows += [(1000 + i % 500,) for i in range(2000)]
    df = spark.createDataFrame(rows, "item long").repartition(8)

    exact = (
        df.groupBy("item").count()
        .orderBy(F.desc("count"), "item").limit(10).collect()
    )
    got = heavy_hitters(df, "item", k=10, m=64).collect()
    assert [(r.item, r.cnt) for r in got] == [(r.item, r["count"]) for r in exact]


def test_heavy_hitters_small_m_still_finds_dominators(spark):
    from feast_java_old_spark.operators.sketches import heavy_hitters

    rows = [(1,)] * 5000 + [(2,)] * 3000 + [(i,) for i in range(10, 2000)]
    df = spark.createDataFrame(rows, "item long").repartition(4)
    got = heavy_hitters(df, "item", k=2, m=8).collect()
    assert [(r.item, r.cnt) for r in got] == [(1, 5000), (2, 3000)]


# ------------------------------------------------------------ RRF fusion


def test_rrf_fuse_exact_scores_and_single_list_docs(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank long")
    out = {
        r.doc_id: (r.n_lists, r.rrf_micro)
        for r in search.rrf_fuse([a, b], k=60).collect()
    }
    # floor(1e6/(60+rank)) per contribution, summed across lists
    assert out[1] == (1, 1_000_000 // 61)
    assert out[2] == (2, 1_000_000 // 62 + 1_000_000 // 61)
    assert out[3] == (1, 1_000_000 // 63)
    assert out[4] == (1, 1_000_000 // 62)


def test_rrf_fuse_floor_quantization_is_engine_unambiguous(spark):
    # k+rank = 128 → 1e6/128 = 7812.5 exactly: round() would sit on a
    # HALF_UP / banker's divergence; floor is 7812 everywhere.
    a = spark.createDataFrame([(1, 68)], "doc_id long, rank long")
    [r] = search.rrf_fuse([a], k=60).collect()
    assert r.rrf_micro == 7812
    with pytest.raises(ValueError):
        search.rrf_fuse([])


def test_count_min_overestimates_and_merges(spark):
    from feast_java_old_spark.operators import sketches

    rows = [(i % 7,) for i in range(700)] + [(99,)] * 5
    df = spark.createDataFrame(rows, "k long")
    cells = sketches.count_min_cells(df, "k", depth=4, width=64)
    probes = df.select("k").distinct()
    est = {
        r.k: r.est_cnt
        for r in sketches.count_min_estimate(cells, probes, "k", depth=4, width=64).collect()
    }
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k]  # CMS never undercounts
    # mergeability: shard cells sum cell-wise into the full-corpus cells
    # (deterministic value-based split; limit() would not be)
    h1 = sketches.count_min_cells(df.where(F.col("k") % 2 == 0), "k", depth=4, width=64)
    h2 = sketches.count_min_cells(df.where(F.col("k") % 2 != 0), "k", depth=4, width=64)
    merged = (
        h1.unionByName(h2)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.row_idx, r.col_idx): r.cnt for r in cells.collect()}
    got = {(r.row_idx, r.col_idx): r.cnt for r in merged.collect()}
    assert got == full


def test_bloom_no_false_negatives_and_merge(spark):
    from feast_java_old_spark.operators import sketches

    inserted = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bloom = sketches.bloom_build(inserted, "k", k=4, bits=1024)
    probes = spark.createDataFrame([(i,) for i in range(400)], "k long")
    out = {r.k: r.maybe_present for r in
           sketches.bloom_probe(bloom, probes, "k", k=4, bits=1024).collect()}
    # every inserted key MUST pass (no false negatives)
    assert all(out[i] for i in range(200))
    # at 200 keys / 1024 bits / k=4 the FP rate is ~8%; the uninserted
    # half must not ALL pass (the filter actually filters)
    fps = sum(1 for i in range(200, 400) if out[i])
    assert fps < 100
    # shard filters union (distinct) into the corpus filter
    b1 = sketches.bloom_build(inserted.where("k % 2 = 0"), "k", k=4, bits=1024)
    b2 = sketches.bloom_build(inserted.where("k % 2 != 0"), "k", k=4, bits=1024)
    merged = set(r.bit_pos for r in b1.unionByName(b2).distinct().collect())
    assert merged == set(r.bit_pos for r in bloom.collect())


def test_bloom_probe_duplicate_probe_rows(spark):
    """A probe value that repeats (the join-pruning case: fact keys
    repeat) must still report maybe_present — hashing raw probe rows
    instead of distinct keys made __hits = m*k and (m*k == k) false."""
    from feast_java_old_spark.operators import sketches

    inserted = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bloom = sketches.bloom_build(inserted, "k", k=4, bits=1024)
    probes = spark.createDataFrame(
        [(i,) for i in range(50) for _ in range(3)] + [(999,)], "k long"
    )
    out = {r.k: r.maybe_present for r in
           sketches.bloom_probe(bloom, probes, "k", k=4, bits=1024).collect()}
    assert len(out) == 51  # one row per distinct probe key
    assert all(out[i] for i in range(50))


def test_phrase_search_positions_and_multiterm(spark):
    df = spark.createDataFrame(
        [
            (1, "big data big data big"),     # "big data" at 0 and 2
            (2, "data big"),                   # reversed -> no match
            (3, "the big data stack"),         # at pos 1
            (4, "big, data!"),                 # punctuation split -> match
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in search.phrase_search(df, ["big", "data"]).collect()}
    assert out[1].n_matches == 2 and out[1].first_pos == 0
    assert 2 not in out
    assert out[3].n_matches == 1 and out[3].first_pos == 1
    assert out[4].n_matches == 1
    # three-term phrase
    out3 = {r.doc_id: r for r in
            search.phrase_search(df, ["big", "data", "stack"]).collect()}
    assert list(out3) == [3] and out3[3].first_pos == 1


def test_retrieval_metrics_hand_computed(spark):
    """2 queries, k=3: q1 retrieves rel at ranks 1,3 of 2 relevant
    (perfect RR, partial nDCG); q2 retrieves none of its 1 relevant."""
    import math

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 99)], "query_id long, neighbor_id long"
    )
    out = {r.query_id: r for r in search.retrieval_metrics(results, qrels, k=3).collect()}
    g = lambda r: int(math.floor(1e6 / math.log2(r + 1) + 0.5))  # noqa: E731
    assert out[1].n_rel == 2 and out[1].hits_at_k == 2
    assert out[1].first_rel_rank == 1
    assert out[1].dcg_micro == g(1) + g(3)
    assert out[1].idcg_micro == g(1) + g(2)  # 2 relevant -> ideal fills ranks 1,2
    assert out[2].hits_at_k == 0 and out[2].first_rel_rank is None
    assert out[2].dcg_micro == 0 and out[2].n_rel == 1


def test_cms_join_size_upper_bounds_exact(spark):
    from feast_java_old_spark.operators import sketches

    # skewed key frequencies: sum f^2 = 100^2 + 10^2 + 1 = 10101
    rows = [(1,)] * 100 + [(2,)] * 10 + [(3,)]
    df = spark.createDataFrame(rows, "k long")
    cells = sketches.count_min_cells(df, "k", depth=4, width=64)
    est = sketches.cms_join_size(cells, cells).collect()[0].est_pairs
    assert est >= 10101
    # few distinct keys, wide sketch -> collisions unlikely: est exact
    assert est <= 10101 * 1.2


def test_count_min_epsilon_bound_contract(spark):
    """CMS guarantee contract (Cormode–Muthukrishnan): with width w and
    depth d, every estimate overcounts by at most eps*N where
    eps = e/w, with probability >= 1 - e^-d. The corpus and hash
    functions are deterministic, so the bound is checked exactly: every
    probed key's overcount must sit within eps*N (d=4 -> failure mass
    e^-4 ~ 1.8%, and a deterministic pass stays a pass)."""
    from feast_java_old_spark.operators import sketches

    depth, width = 4, 256
    n = 1000
    rows = [(i,) for i in range(n)]
    df = spark.createDataFrame(rows, "k long")
    cells = sketches.count_min_cells(df, "k", depth=depth, width=width)
    probes = df.select("k").distinct()
    est = {
        r.k: r.est_cnt
        for r in sketches.count_min_estimate(
            cells, probes, "k", depth=depth, width=width
        ).collect()
    }
    eps_n = math.e * n / width  # ~10.6
    assert len(est) == n
    worst = max(e - 1 for e in est.values())
    assert worst <= eps_n, f"worst overcount {worst} > eps*N {eps_n:.1f}"
    # and the sketch is not vacuous: collisions exist at n >> width
    assert worst > 0


def test_bloom_fp_rate_formula_bound(spark):
    """Bloom FP-rate contract: with n inserted keys, m bits, k hashes,
    the expected false-positive rate is p = (1 - e^(-k*n/m))^k. The
    measured rate over a large uninserted probe set must sit within 2x
    of the formula (deterministic hashes + fixed probe set -> the
    assertion is stable), and must be nonzero — the filter is
    approximate by design, a 0% rate at n*k ~ m would mean the probe
    never touches set bits (broken hashing)."""
    from feast_java_old_spark.operators import sketches

    n, bits, k = 200, 1024, 4
    inserted = spark.createDataFrame([(i,) for i in range(n)], "k long")
    bloom = sketches.bloom_build(inserted, "k", k=k, bits=bits)
    n_probe = 2000
    probes = spark.createDataFrame(
        [(i,) for i in range(10_000, 10_000 + n_probe)], "k long"
    )
    out = sketches.bloom_probe(bloom, probes, "k", k=k, bits=bits)
    fps = sum(1 for r in out.collect() if r.maybe_present)
    p_theory = (1 - math.exp(-k * n / bits)) ** k  # ~0.0865
    rate = fps / n_probe
    assert 0 < rate < 2 * p_theory, (rate, p_theory)


# ---------------------------------------------------------- bloom_prune_join


def test_bloom_prune_join_row_identical_to_plain_join(spark):
    """The prune must be invisible: FPs die in the exact join, and a
    Bloom filter has no false negatives, so inner/semi results are
    row-identical to the unpruned join."""
    from feast_java_old_spark.operators import sketches

    fact = spark.createDataFrame(
        [(i % 300, i) for i in range(1200)], "k long, payload long"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 300, 7)], "k long, attr string"
    )
    for how in ("inner", "semi"):
        got = sorted(
            map(tuple, sketches.bloom_prune_join(
                fact, dim, "k", k=4, bits=1024, how=how).collect())
        )
        want = sorted(map(tuple, fact.join(dim, "k", how).collect()))
        assert got == want and len(got) > 0


def test_bloom_prune_join_word_boundaries_and_outer_rejected(spark):
    """bits=64 packs every position into ONE word and bits=128 into two
    — the element_at/shiftleft packing edge; a bit-packing off-by-one
    would drop true matches. Outer joins are rejected (pruned fact rows
    would lose their null-extended outputs)."""
    import pytest as _pytest

    from feast_java_old_spark.operators import sketches

    fact = spark.createDataFrame([(i,) for i in range(500)], "k long")
    dim = spark.createDataFrame([(i,) for i in range(0, 500, 3)], "k long")
    for bits in (64, 128):
        got = sorted(
            r.k for r in sketches.bloom_prune_join(
                fact, dim, "k", k=2, bits=bits).collect()
        )
        want = sorted(r.k for r in fact.join(dim, "k").collect())
        assert got == want
    with _pytest.raises(ValueError):
        sketches.bloom_prune_join(fact, dim, "k", how="left")


def test_bloom_prune_actually_prunes(spark):
    """On a fact whose keys are disjoint from the dim's, the pruned
    stream must shrink to roughly the Bloom FP rate — the operator's
    entire reason to exist; an always-true probe would still pass the
    row-identity tests."""
    from feast_java_old_spark.operators import sketches

    fact = spark.createDataFrame([(i,) for i in range(1000, 3000)], "k long")
    dim = spark.createDataFrame([(i,) for i in range(100)], "k long")
    kept = sketches.bloom_prune(fact, dim, "k", k=4, bits=4096).count()
    # n=100 keys in 4096 bits, k=4: FP rate ~ (1-e^{-400/4096})^4 ~ 8e-5;
    # allow two orders of magnitude slack — the point is "almost all cut"
    assert kept <= 40
    # every true match always survives the prune (superset property)
    overlap = spark.createDataFrame([(i,) for i in range(50, 150)], "k long")
    kept_keys = {
        r.k for r in sketches.bloom_prune(overlap, dim, "k", k=4,
                                          bits=4096).collect()
    }
    assert set(range(50, 100)) <= kept_keys


def test_kmv_overlap_error_bounds_and_exact_small_sets(spark):
    """KMV contract (Bar-Yossef et al.): union-size estimate within
    4σ = 4/sqrt(k-2) relative error, Jaccard within 4*sqrt(j(1-j)/k),
    and EXACT answers when the union fits inside the sketch (the
    small-set regime where (k-1)/u_k would be noise)."""
    from feast_java_old_spark.operators.sketches import kmv_overlap_pairs

    k = 256
    rows = []
    for v in range(2000):
        rows.append(("A", v))
    for v in range(1500, 3000):
        rows.append(("B", v))
    for v in range(10000, 10100):
        rows.append(("C", v))       # |C|=100: unions with C may be small
    for v in range(10000, 10050):
        rows.append(("D", v))       # C∪D = 100 < k -> exact path
    df = spark.createDataFrame(rows, "g string, k long")
    out = {
        (r.type_a, r.type_b): r
        for r in kmv_overlap_pairs(df, "k", "g", k=k).collect()
    }
    import math

    tol_u = 4 / math.sqrt(k - 2)
    ab = out[("A", "B")]
    assert abs(ab.est_union - 3000) / 3000 < tol_u
    j = 500 / 3000
    assert abs(ab.est_jaccard - j) < 4 * math.sqrt(j * (1 - j) / k)
    assert abs(ab.est_both - 500) / 500 < tol_u + 4 * math.sqrt(
        j * (1 - j) / k
    ) / j
    # disjoint pairs: exactly zero overlap estimated
    assert out[("A", "C")].est_jaccard == 0.0
    assert out[("A", "C")].est_both == 0.0
    # small-set regime: union smaller than k is counted EXACTLY
    cd = out[("C", "D")]
    assert cd.est_union == 100.0
    assert cd.est_jaccard == 0.5 and cd.est_both == 50.0
