"""Round-3 operators: EWMA fold, mergeable-rollup algebra, corpus
boilerplate screen, SemDeDup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import features, similarity, text


def _ts(day, h=0):
    return dt.datetime(2024, 1, day, h)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, _ts(1), 10, 1.0),
        (1, _ts(2), 11, 2.0),
        (1, _ts(3), 12, 4.0),
        (2, _ts(1), 20, 5.0),
        # same-ts tie for user 3 -> seq breaks it
        (3, _ts(1), 31, 1.0),
        (3, _ts(1), 30, 3.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_timestamp timestamp, event_id long, value double"
    )


def test_ewma_matches_python_fold(spark, events):
    out = {
        r.user_id: (r.n_events, r.ewma)
        for r in features.ewma_features(
            events, ["user_id"], "value", seq_col="event_id", alpha=0.25
        ).collect()
    }
    # user 1: fold over [1,2,4]: 1 -> .75*1+.25*2=1.25 -> .75*1.25+.25*4=1.9375
    assert out[1] == (3, 1.9375)
    # single event: ewma == value
    assert out[2] == (1, 5.0)
    # tie on ts ordered by event_id: [30:3.0, 31:1.0] -> .75*3+.25*1=2.5
    assert out[3] == (2, 2.5)


def test_merge_rollups_equals_full_rollup(spark, events):
    keys = ["user_id"]
    split = F.lit("2024-01-02").cast("timestamp")
    old = features.mergeable_rollup(
        events.where(F.col("event_timestamp") < split), keys, "value"
    )
    delta = features.mergeable_rollup(
        events.where(F.col("event_timestamp") >= split), keys, "value"
    )
    merged = features.merge_rollups(keys, old, delta)
    full = features.mergeable_rollup(events, keys, "value")
    m = {r.user_id: r.asDict() for r in merged.collect()}
    f = {r.user_id: r.asDict() for r in full.collect()}
    assert m == f
    # merge with an empty side is the identity
    empty = features.mergeable_rollup(
        events.where(F.lit(False)), keys, "value"
    )
    ident = {
        r.user_id: r.asDict()
        for r in features.merge_rollups(keys, full, empty).collect()
    }
    assert ident == f


def test_boilerplate_ngrams_flags_shared_trigrams(spark):
    # 3 docs share the trigram "a b c"; doc 3 is nothing but boilerplate
    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c p q r"),
            (3, "a b c"),
            (4, "unique words only here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.asDict()
        for r in text.boilerplate_ngrams(
            docs, min_docs=3, max_ratio=0.5
        ).collect()
    }
    assert out[3]["n_boiler"] == 1 and out[3]["n_ngrams"] == 1
    assert not out[3]["kept"]  # ratio 1.0
    assert out[1]["n_boiler"] == 1 and out[1]["kept"]  # 1/4 <= 0.5
    assert out[4]["n_boiler"] == 0 and out[4]["kept"]


def test_semdedup_drops_lower_ranked_near_dup(spark):
    # cluster 0: v1 == v2 (exact dup), v3 orthogonal; cluster 1: lone vec
    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0]),
        (3, 0, [0.0, 1.0, 0.0]),
        (4, 1, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {
        r.vec_id: r.kept
        for r in similarity.semdedup(emb, threshold=0.9).collect()
    }
    # v1 and v2 tie on cos-to-centroid; lower id ranks first and is kept
    assert out[1] is True
    assert out[2] is False
    assert out[3] is True
    assert out[4] is True


def test_pagerank_star_graph(spark):
    """Hub of a 3-leaf undirected star accumulates rank from all leaves."""
    from feast_java_old_spark.operators.graph import pagerank

    fwd = [(0, i) for i in (1, 2, 3)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], "src long, dst long"
    )
    out = {r.node: (r.pagerank, r.outdeg) for r in pagerank(edges, iterations=2).collect()}
    # leaves: outdeg 1; after it1 hub=0.15+0.85*3*(1/1)=2.7, leaf=0.15+0.85/3
    # after it2 leaf = 0.15+0.85*(2.7/3)=0.915, hub=0.15+0.85*3*0.433333333
    assert out[0][1] == 3 and out[1][1] == 1
    assert abs(out[1][0] - 0.915) < 1e-6
    assert abs(out[0][0] - (0.15 + 0.85 * 3 * round(0.15 + 0.85 / 3, 9))) < 1e-6


def test_triangle_count_known_graph(spark):
    """K4 on {0,1,2,3} (4 triangles, 3 per node) plus a pendant edge
    4-5 (triangle-free) and an isolated triangle {6,7,8}."""
    from feast_java_old_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = k4 + [(4, 5), (6, 7), (7, 8), (8, 6)]
    # feed duplicates + reversed orientations: operator must canonicalize
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "src long, dst long"
    )
    out = {r.node: (r.degree, r.triangles) for r in triangle_count(edges).collect()}
    assert all(out[n] == (3, 3) for n in range(4))
    assert out[4] == (1, 0) and out[5] == (1, 0)
    assert all(out[n] == (2, 1) for n in (6, 7, 8))


def test_incremental_dedup_flags_batch_matches(spark):
    """Batch doc 100 near-dups index doc 1 (one token changed of 12);
    batch doc 101 is novel. dup_of/best_jaccard/n_dups/is_new land."""
    from feast_java_old_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog near the river"
    index = spark.createDataFrame(
        [(1, base), (2, "completely different text about spark shuffles here today")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, base.replace("river", "creek")),
         (101, "unrelated novel content with no shared shingles at all whatsoever")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.incremental_dedup(index, batch, threshold=0.4).collect()
    }
    assert out[100].dup_of == 1 and out[100].is_new is False
    assert out[100].n_dups == 1 and out[100].best_jaccard >= 0.4
    assert out[101].dup_of is None and out[101].is_new is True
    assert out[101].n_dups == 0


def test_k_anonymity_classes(spark):
    from feast_java_old_spark.operators.pii import k_anonymity

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 2)] * 2, "seg string, band int"
    )
    out = {(r.seg, r.band): (r.class_size, r.anonymous)
           for r in k_anonymity(df, ["seg", "band"], k=5).collect()}
    assert out[("a", 1)] == (5, True)
    assert out[("b", 2)] == (2, False)


def test_bigram_logprob_known_corpus(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_bigrams, r.logprob)
           for r in text.bigram_logprob(docs, add_k=0.5).collect()}
    # corpus bigrams: doc1: "a b","b a","a b"; doc2: "a b"
    # c("a b")=3, c("b a")=1; ctx c(a.)=3, c(b.)=1; V(second tokens)={a,b}=2
    lp_ab = math.log((3 + 0.5) / (3 + 0.5 * 2))
    lp_ba = math.log((1 + 0.5) / (1 + 0.5 * 2))
    assert out[2] == (1, round(lp_ab, 6))
    assert out[1][0] == 3
    assert abs(out[1][1] - round((2 * lp_ab + lp_ba) / 3, 6)) < 1e-6


def test_scd2_join_picks_version_valid_at_fact_ts(spark):
    hist = spark.createDataFrame(
        [
            (1, "A", _ts(1), _ts(5), 1),
            (1, "B", _ts(5), None, 2),
        ],
        "user_id long, attr string, valid_from timestamp, "
        "valid_to timestamp, version long",
    )
    facts = spark.createDataFrame(
        [(1, _ts(2), 100), (1, _ts(5), 101), (1, _ts(9), 102),
         (2, _ts(3), 103)],
        "user_id long, event_timestamp timestamp, event_id long",
    )
    out = {
        r["event_id"]: (r["attr"], r["version"])
        for r in features.scd2_join(facts, hist, ["user_id"]).select(
            F.col("f.event_id").alias("event_id"), "h.attr", "h.version"
        ).collect()
    }
    assert out[100] == ("A", 1)
    assert out[101] == ("B", 2)  # boundary instant -> new version
    assert out[102] == ("B", 2)  # open-ended current
    assert 103 not in out  # no history for user 2 (inner join)


def test_token_budget_select_greedy_prefix(spark):
    from feast_java_old_spark.operators.curation import token_budget_select

    docs = spark.createDataFrame(
        [
            (1, "a b c", 0.9),   # 3 tokens, best
            (2, "d e", 0.5),     # 2 tokens
            (3, "f g h i", 0.1), # 4 tokens, worst
        ],
        "doc_id long, text string, q double",
    )
    out = {
        r.doc_id: (r.cum_tokens, r.selected)
        for r in token_budget_select(docs, "q", budget=5).collect()
    }
    assert out[1] == (3, True)
    assert out[2] == (5, True)
    assert out[3] == (9, False)


# ------------------------------------------------- plan-shape gates


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ewma_single_exchange_plan(spark, events):
    plan = _plan(
        features.ewma_features(events, ["user_id"], "value", seq_col="event_id")
    )
    # one entity-keyed exchange into the fold aggregate; no window sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_scd2_join_no_nested_loop(spark):
    hist = spark.createDataFrame(
        [(1, "A", _ts(1), None, 1)],
        "user_id long, attr string, valid_from timestamp, "
        "valid_to timestamp, version long",
    )
    facts = spark.createDataFrame(
        [(1, _ts(2), 100)],
        "user_id long, event_timestamp timestamp, event_id long",
    )
    plan = _plan(features.scd2_join(facts, hist, ["user_id"]))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_token_budget_no_global_window(spark):
    from feast_java_old_spark.operators.curation import token_budget_select

    docs = spark.createDataFrame(
        [(1, "a b", 0.5), (2, "c", 0.9)], "doc_id long, text string, q double"
    )
    plan = _plan(token_budget_select(docs, "q", budget=10))
    # the prefix sum must be per-bucket windows, never a global
    # single-partition sort (rangepartitioning with no partition key)
    assert "Exchange rangepartitioning" not in plan
    # r9: the cumulative-offsets step (layout.cumulative_offsets) runs a
    # single-partition window over the BUCKET-TOTALS frame — one
    # SinglePartition exchange of ≤ `buckets` aggregated rows (metadata,
    # the global_sort_ranks pattern), fed by a partial-combined
    # aggregate. It must be the only one, and it must sit ABOVE the
    # per-bucket aggregate (so no data row ever crosses it).
    assert plan.count("Exchange SinglePartition") == 1
    assert "partial_sum" in plan
    # the data-row running sum stays per-bucket (parallel)
    assert "windowspecdefinition(__b" in plan


def test_top_orders_takeordered_plan(spark, sf_dir):
    import __spark_entry__ as e

    plan = _plan(e.queries()["top_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # never a full global sort
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_snapshot_diff_statuses(spark):
    from feast_java_old_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed now"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_event_sequences_order_and_truncation(spark, events):
    out = {
        r.user_id: (r.n_events, r.sequence)
        for r in features.event_sequences(
            events.withColumn("it", F.col("event_id").cast("string")),
            ["user_id"], "it", seq_col="event_id", max_len=2,
        ).collect()
    }
    # user 1 has 3 events (ids 10,11,12 in ts order) -> last 2 kept
    assert out[1] == (3, ["11", "12"])
    # user 3 ties on ts -> event_id breaks order
    assert out[3] == (2, ["30", "31"])


def test_pmi_collocations_known_corpus(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "x y x y q"), (2, "x y p q")], "doc_id long, text string"
    )
    out = {r.bigram: (r.n_pair, r.pmi)
           for r in text.pmi_collocations(docs, min_count=2, k=10).collect()}
    # bigrams: doc1: "x y","y x","x y","y q"; doc2: "x y","y p","p q" -> N=7
    # c("x y")=3, left c(x .)=3, right c(. y)=3
    assert out == {"x y": (3, round(math.log(7 * 3 / (3 * 3)), 6))}


def test_length_bucket_batches(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "e f"), (4, "w x y z a b c d")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.len_bucket, r.batch_id, r.pad_to)
        for r in text.length_bucket_batches(docs, batch_size=2).collect()
    }
    # docs 1-3: 2 tokens -> bucket 1; batch size 2 -> ids 1,2 batch 0; 3 batch 1
    # batch_id stride is 2^40 per bucket (collision-free up to ~10^13
    # docs/bucket, unlike the old 10^6 stride which wrapped at ~8M)
    assert out[1] == (1, 1 << 40, 2)
    assert out[2] == (1, 1 << 40, 2)
    assert out[3] == (1, (1 << 40) + 1, 2)
    # doc 4: 8 tokens -> bucket 3, its own batch, pad_to 8
    assert out[4] == (3, 3 << 40, 8)


def test_negative_samples_deterministic_and_flags(spark):
    from feast_java_old_spark.operators.curation import negative_samples

    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "user long, item long"
    )
    a = negative_samples(pos, "user", "item", n_items=20, k=3, seed=1)
    b = negative_samples(pos, "user", "item", n_items=20, k=3, seed=1)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # fully deterministic
    assert len(ra) == 9  # 3 positives x k=3
    for user, pos_item, slot, neg, flag in ra:
        assert 1 <= neg <= 20
        interacted = {10, 11} if user == 1 else {10}
        assert flag == (neg in interacted)
    # a different seed draws a different candidate set
    c = sorted(map(tuple, negative_samples(
        pos, "user", "item", n_items=20, k=3, seed=2).collect()))
    assert c != ra


def test_session_cooccurrence_pairs(spark):
    from feast_java_old_spark.operators.windows import session_cooccurrence

    # user 1: session1 {A,B}, session2 {A,C} (90-min gap); user 2: {A,B}
    rows = [
        (1, _ts(1, 0), 1, "A"),
        (1, _ts(1, 0), 2, "B"),
        (1, _ts(1, 3), 3, "A"),
        (1, _ts(1, 3), 4, "C"),
        (2, _ts(1, 0), 5, "A"),
        (2, _ts(1, 0), 6, "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, item string"
    )
    out = {(r.item_a, r.item_b): r.n_sessions
           for r in session_cooccurrence(
               df, ["user_id"], "item", gap="30 minutes").collect()}
    assert out == {("A", "B"): 2, ("A", "C"): 1}


def test_fuzzy_match_blocking_and_verify(spark):
    from feast_java_old_spark.operators.joins import fuzzy_match

    df = spark.createDataFrame(
        [(1, "Acme Corp"), (2, "Acme Co"), (3, "Zenith Ltd"),
         (4, "Acme Corp")],
        "id long, name string",
    )
    out = {(r.id_a, r.id_b): r.distance
           for r in fuzzy_match(df, "id", "name", max_df=10,
                                max_distance=3).collect()}
    assert out[(1, 4)] == 0      # exact duplicate
    assert out[(1, 2)] == 2      # "rp" suffix delta
    assert (1, 3) not in out     # no shared gram, never a candidate
    # stop-gram cap: with max_df=1 every shared gram is dropped
    none = fuzzy_match(df, "id", "name", max_df=1, max_distance=3).count()
    assert none == 0


def test_dedup_keep_best_prefers_high_score(spark):
    from feast_java_old_spark.operators.dedup import dedup_keep_best

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)],
        "doc_id long, score double",
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, group_id long"
    )
    kept = {r.doc_id for r in dedup_keep_best(df, comp, "score").collect()}
    # group 1: docs 2 and 3 tie at 0.9 -> lower id 2 wins; group 4 alone
    assert kept == {2, 4}


def test_shard_manifest_detects_any_change(spark):
    from feast_java_old_spark.operators.curation import shard_manifest

    docs = spark.createDataFrame(
        [(i, f"doc number {i} words here") for i in range(20)],
        "doc_id long, text string",
    )
    base = {r.shard: (r.n_docs, r.n_tokens, r.content_hash)
            for r in shard_manifest(docs, n_shards=4, seed=1).collect()}
    again = {r.shard: (r.n_docs, r.n_tokens, r.content_hash)
             for r in shard_manifest(docs, n_shards=4, seed=1).collect()}
    assert base == again  # reproducible
    assert sum(v[0] for v in base.values()) == 20
    # mutate one doc -> exactly that doc's shard hash changes
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    after = {r.shard: r.content_hash
             for r in shard_manifest(mutated, n_shards=4, seed=1).collect()}
    diffs = [s for s in base if base[s][2] != after[s]]
    assert len(diffs) == 1


def test_sorted_neighborhood_finds_adjacent_typos(spark):
    """Typo'd twins sharing a prefix sort adjacently and are found; a
    pair farther apart than the window in sort order is not compared."""
    from feast_java_old_spark.operators.joins import sorted_neighborhood_match

    rows = [
        (1, "customer smith alpha"),
        (2, "customer smith alphb"),      # distance 1 from doc 1
        (3, "customer smith beta"),
        (4, "customer smith gamma"),
        (5, "different prefix entirely"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {(r.id_a, r.id_b): r.distance
           for r in sorted_neighborhood_match(
               df, "id", "name", window=2, max_distance=1, block_chars=8
           ).collect()}
    assert out == {(1, 2): 1}
    # window=0 edge -> no pairs at all
    none = sorted_neighborhood_match(
        df, "id", "name", window=0, max_distance=9, block_chars=8
    ).collect()
    assert none == []


# ---------------------------------------------------------- event_transitions


def test_event_transitions_fence_ties_and_row_conditional(spark):
    """Cross-user pairs must never form (the window partition fence);
    timestamp ties resolve by the tiebreak column deterministically;
    each prev_type's probabilities sum to 1."""
    import datetime as dt

    from feast_java_old_spark.operators.windows import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> c (plus a TIE at t0+1 between b(id2) and c(id3))
        (1, 1, "a", t0),
        (1, 2, "b", t0 + dt.timedelta(seconds=1)),
        (1, 3, "c", t0 + dt.timedelta(seconds=1)),
        # user 2: c alone — would chain c->a if the fence leaked
        (2, 4, "c", t0 + dt.timedelta(seconds=2)),
        (2, 5, "a", t0 + dt.timedelta(seconds=3)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {
        (r.prev_type, r.next_type): (r.n, r.prob)
        for r in event_transitions(df).collect()
    }
    # tie at +1s: id 2 (b) precedes id 3 (c) -> a->b, b->c; user 2: c->a
    assert got == {
        ("a", "b"): (1, 1.0),
        ("b", "c"): (1, 1.0),
        ("c", "a"): (1, 1.0),
    }
    # row-conditional: probs per prev_type sum to 1 on a bigger stream
    big = spark.createDataFrame(
        [(u, i, ["x", "y", "z"][(u * i) % 3], t0 + dt.timedelta(seconds=i))
         for u in range(1, 9) for i in range(1, 40)],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    from pyspark.sql import functions as F2

    sums = (
        event_transitions(big)
        .groupBy("prev_type")
        .agg(F2.round(F2.sum("prob"), 4).alias("s"))
        .collect()
    )
    assert all(abs(r.s - 1.0) < 5e-4 for r in sums)


def test_event_gaps_threshold_ties_and_per_key_fence(spark):
    """Gaps are exact integer microseconds; ties in ts order
    deterministically (0-gap, filtered); gaps never span users; the
    trailing open interval after a key's last event is excluded."""
    import datetime as dt

    from feast_java_old_spark.operators.features import event_gaps

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(hours=2)),     # 2h gap: below threshold
        (1, 3, t0 + dt.timedelta(hours=9)),     # 7h gap: reported
        (2, 4, t0 + dt.timedelta(days=3)),      # user fence: no 1->2 gap
        (2, 5, t0 + dt.timedelta(days=3)),      # exact tie: 0 gap
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = [
        (r.user_id, r.gap_us)
        for r in event_gaps(df, min_gap_secs=6 * 3600).collect()
    ]
    assert got == [(1, 7 * 3600 * 1_000_000)]


def test_last_touch_attribution_strict_precedence_and_lookback(spark):
    """The credited touch is the LATEST strictly-preceding eligible
    event: a touch sharing the conversion's timestamp credits only if
    it sorts first by the tiebreak; stale touches beyond the lookback
    yield NULLs (the row is kept); other users' touches never leak."""
    import datetime as dt

    from feast_java_old_spark.operators.windows import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "click", t0),
        (1, 2, "view", t0 + dt.timedelta(hours=1)),
        (1, 3, "purchase", t0 + dt.timedelta(hours=2)),   # -> view (id 2)
        (1, 4, "purchase", t0 + dt.timedelta(days=5)),    # stale -> NULL
        (2, 5, "click", t0 + dt.timedelta(hours=2)),      # other user
        (2, 6, "purchase", t0 + dt.timedelta(hours=2)),   # tie: click id 5
        (3, 7, "purchase", t0),                            # no touch ever
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {
        r.conversion_id: (r.touch_id, r.touch_type, r.touch_age_us)
        for r in last_touch_attribution(
            df, "purchase", ["click", "view"], lookback_secs=86400
        ).collect()
    }
    assert got[3] == (2, "view", 3600 * 1_000_000)
    assert got[4] == (None, None, None)
    assert got[6] == (5, "click", 0)  # same-ts touch, lower tiebreak
    assert got[7] == (None, None, None)
