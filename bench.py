#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced to full execution with a noop sink (no driver-side
collect cost, no result materialization skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "s1_scan_projection",
    "p5_type_conformance",
    "a1_latest_per_key",
    "a1_latest_window",
    "j1_entity_lookup",
    "j1_lookup_shuffle",
    "j2_compound_key",
    "j3_max_age",
    "historical_asof",
    "historical_asof_range",
    "historical_asof_bucketed",
    "historical_training_set",
    "a2_metrics_rollup",
    "a3_window_rollup",
    "a4_sliding_rollup",
    "sliding_distinct",
    "sliding_distinct_approx",
    "a5_sessions",
    "a6_percentiles",
    "feature_drift",
    "ks_drift",
    "cusum_alerts",
    "segment_overlap",
    "segment_overlap_kmv",
    "key_skew",
    "a7_rollup_revenue",
    "a8_cube_revenue",
    "tpch_q5",
    "tpch_q1",
    "tpch_q6",
    "tpch_q14",
    "tpch_q18",
    "dedup_exact",
    "doc_fingerprint",
    "token_count",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_prefix_filter",
    "dedup_containment",
    "dedup_verified",
    "dedup_incremental",
    "dedup_stats",
    "novelty_score",
    # r5: dedup_verified_simhash re-scoped to the Manku composition
    # (4x8 bands, hamming<=3, pigeonhole-complete recall) — 45s -> ~4s
    # at sf0.1, so it benches again. Its r1-r4 jaccard-0.4-recall form
    # was both unbenchable (~5M incidental candidates) and silently
    # 252/256 at sf0.1 (banding can't be recall-complete at that
    # distance); see the query docstring.
    "dedup_verified_simhash",
    "chunk_dedup",
    "dedup_crossmodal",
    "text_stats",
    "text_repetition",
    "pii_scrub",
    "stratified_sample",
    "vocab_topk",
    "corpus_rollup",
    "sequence_pack",
    "quality_classifier",
    "lang_id",
    "pipeline_clean_corpus",
    "rejection_report",
    "training_corpus",
    "similarity_topk",
    "mmr_rerank",
    "random_projection",
    "semantic_decontaminate",
    "ccnet_buckets",
    "ann_eval",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_multiprobe",
    "embedding_near_dups",
    "embedding_centroids",
    "pq_encode",
    "pq_adc",
    "kmeans_train",
    "ann_ivf_pq",
    "multimodal_decode",
    "multimodal_frames",
    "odfv_transform",
    "decontaminate",
    "dsir_weights",
    "corpus_shuffle",
    "shard_manifest",
    "text_normalize",
    "hard_negatives",
    "domain_mix",
    "corpus_split",
    "domain_topk",
    "kmeans_refine",
    "unigram_logprob",
    "embedding_outliers",
    "interval_join",
    "sessionize",
    "domain_upsample",
    "corpus_dedup_apply",
    "dedup_keep_best",
    "multi_window_features",
    "rolling_features",
    "feature_pivot",
    "asof_nearest",
    "bm25_search",
    "phrase_search",
    "rrf_fusion",
    "tfidf_terms",
    "weighted_sample",
    "skew_join",
    "sketch_distinct",
    "target_encode",
    "winsorize",
    "robust_outliers",
    "chunk_documents",
    "scd2_history",
    "quantile_bin",
    "quantile_bin_approx",
    "resample_ffill",
    "profile_columns",
    "profile_columns_approx",
    "bpe_pairs",
    "line_filter",
    "cdc_apply",
    "normalize_features",
    "funnel",
    "cohort_retention",
    "zorder_key",
    "hilbert_key",
    "curve_skip_audit",
    "scd2_snapshot",
    "token_encode",
    "heavy_hitters",
    "count_min",
    "bloom_filter",
    "cms_join_size",
    "ewma_features",
    "rollup_merge",
    "boilerplate",
    "semdedup",
    "pagerank",
    "triangle_count",
    "k_anonymity",
    "bigram_logprob",
    "top_orders",
    "scd2_join",
    "token_budget",
    "snapshot_diff",
    "user_sequences",
    "length_batches",
    "negative_samples",
    "session_cooccurrence",
    "fuzzy_match",
    "fuzzy_match_snm",
    "calendar_features",
    "pmi_collocations",
    # r6: the two non-stream registered queries that had no bench row
    # (VERDICT r5 #5) — iterative CC is where a perf surprise would hide.
    "dedup_components",
    # r7: schema-versioned materialize -> cross-epoch conformed serve.
    "schema_evolution",
    "schema_time_travel",
    # r7: ExactSubstr dedup (Lee et al. ACL 2022) — span discovery + apply.
    "substring_spans",
    "substring_dedup",
    # r7: small-file compaction planner.
    "compaction_plan",
    # r7: source-format round-trip + data-quality expectations suite.
    "source_formats",
    "expectations",
    # r7: held-out trigram stupid-backoff LM + Bloom-pruned join.
    "lm_backoff",
    "bloom_prune_join",
    # r7: in-engine distributed logistic-regression training.
    "logreg_quality",
    "linreg_orders",
    "weighted_quantiles",
    "store_vacuum",
    # r7: global ranks without a global sort; zone-map skip audit.
    "global_ranks",
    "zone_map_prune",
    # r7: join-shape breadth — semi (Q4), outer-distribution (Q13), anti (Q16).
    "tpch_q4",
    "tpch_q13",
    "tpch_q16",
    "tpch_q17",
    "tpch_q21",
    "tpch_q21_agg",
    "tpch_q22",
    "tpch_q15",
    "tpch_q11",
    # r9: the deepest decorrelation nest (IN > IN + correlated scalar agg).
    "tpch_q20",
    "grouping_sets_revenue",
    "not_in_semantics",
    # r7: per-user Markov transition matrix + feed-silence report.
    "event_transitions",
    "event_gaps",
    "attribution",
    # r9: audit-trail lineage of a register->materialize->serve session;
    # the Prometheus-parity metrics export of the same scenario.
    "audit_trail",
    "serving_metrics",
    "auth_audit",
    # r12: the serving REST controller scenario (late-r11 registration,
    # gate-fronted r12) joins the headline — NEW vs the frozen r11
    # baseline, so its first appearance has no prior to ratio against
    # and the headline total grows by its cost (noted in REGRESSION.md).
    "rest_online_features",
    # r13: the cross-process ODFV transformation service (Arrow IPC over
    # a real localhost socket from inside mapInPandas) — first
    # appearance, no prior; its in-process twin odfv_transform stays the
    # comparison floor.
    "odfv_transform_service",
    # r14: the client-SDK serving scenario (FeastClient over the
    # gRPC-over-HTTP socket, Rows with statuses) — first appearance, no
    # prior; rest_online_features is its flat-map REST twin and the
    # comparison floor.
    "sdk_online_features",
    # r15: compound-entity serve through the FeastClient
    # (ServingServiceBigTableIT:533-596 twin over the J2 env) — first
    # appearance, no prior; j2_compound_key is the direct-operator floor
    # plus the client/socket hop and the ~12k-row request round trip.
    "sdk_compound_entity",
    # r16: compound-entity serve through the proto-binary wire codec
    # (HttpJsonChannel codec='proto' + raw-socket negotiation probe) —
    # first appearance, no prior; sdk_compound_entity is its JSON-codec
    # twin and the comparison floor.
    "sdk_proto_entity",
]

# Queries whose ISOLATED fresh-JVM variance band exceeds 1.5x — for
# j2_compound_key three identical warm JVMs spanned 2.07–4.70 s (r14
# adjudication), a GC-sensitivity artifact of its 3 broadcasts + 10
# overlapping stages, not a plan property — so ONE in-suite shot cannot
# adjudicate a 2x flag (it flagged two rounds running on noise). These
# run N times in-suite; the headline carries the MEDIAN and all samples
# are recorded in BENCH_DETAIL under "median_samples". Median, not min:
# a best-of composite would mask a genuine regression whenever one
# sample got lucky (same reasoning as the warm-rerun rule below).
MEDIAN_OF = {
    "j2_compound_key": 3,
}

# Deliberate-ceiling twins: benched every run and recorded in
# BENCH_DETAIL under "tracked_ceilings", but EXCLUDED from the headline
# total — each tracks a documented worst-case evaluator (e.g.
# kmeans_refine_expr: the interpreted higher-order-function form whose
# production twin kmeans_refine runs the Arrow/BLAS kernel ~10x faster
# against the SAME oracle). The headline measures production plans;
# these measure the ceiling the production plans are compared against.
TRACKED_CEILINGS = [
    "kmeans_refine_expr",
]


def write_canonical_detail(detail: dict, repo: str | None = None) -> None:
    """Write BENCH_DETAIL.json PLUS its content fingerprint
    (BENCH_DETAIL.sha256). Only the canonical round-close writer
    (scripts/gen_scaling.py's best-of-2 composite) calls this — a plain
    `python bench.py` run overwrites only the JSON, so the fingerprint
    goes stale and :func:`freeze_baseline` refuses. That mechanizes the
    r13 freeze-ordering rule ("gen_scaling must be the LAST bench
    writer before the freeze"), which used to be convention only and
    cost one gen_scaling cycle when an out-of-order single shot
    clobbered the composite."""
    import hashlib

    repo = repo or os.path.dirname(os.path.abspath(__file__))
    data = json.dumps(detail, indent=1, sort_keys=True)
    with open(os.path.join(repo, "BENCH_DETAIL.json"), "w") as f:
        f.write(data)
    digest = hashlib.sha256(data.encode()).hexdigest()
    with open(os.path.join(repo, "BENCH_DETAIL.sha256"), "w") as f:
        f.write(digest + "\n")


def check_plans_fresh(repo: str | None = None) -> None:
    """Refuse (RuntimeError) if docs/PLANS.md's recorded generation sha
    is missing, not an ancestor of HEAD, or if anything under
    ``feast_java_old_spark/{operators,plans}`` differs from that sha
    (committed OR uncommitted) — a post-regen operator commit must not
    ship a stale plan audit silently (VERDICT r14 #2). The plan-audit
    twin of the BENCH_DETAIL fingerprint guard; called by
    :func:`freeze_baseline` whenever docs/PLANS.md exists."""
    import re
    import subprocess

    repo = repo or os.path.dirname(os.path.abspath(__file__))
    plans_path = os.path.join(repo, "docs", "PLANS.md")
    with open(plans_path) as f:
        header = f.read(2000)
    m = re.search(r"Generated at commit `([0-9a-f]{7,40})`", header)
    if not m:
        raise RuntimeError(
            "refusing: docs/PLANS.md records no generation sha — "
            "regenerate with scripts/gen_plans.py (it stamps HEAD)"
        )
    sha = m.group(1)

    def git(*args: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["git", "-C", repo, *args], capture_output=True, text=True
        )

    if git("merge-base", "--is-ancestor", sha, "HEAD").returncode != 0:
        raise RuntimeError(
            f"refusing: PLANS.md generation sha {sha[:12]} is not an "
            "ancestor of HEAD — the plan audit was generated on another "
            "line of history; re-run scripts/gen_plans.py"
        )
    plan_dirs = [
        "feast_java_old_spark/operators",
        "feast_java_old_spark/plans",
    ]
    diff = git("diff", "--name-only", sha, "--", *plan_dirs)
    untracked = git(
        "ls-files", "--others", "--exclude-standard", "--", *plan_dirs
    )
    for step, proc in (("git diff", diff), ("git ls-files", untracked)):
        # fail CLOSED: a failed git invocation (index.lock contention,
        # corrupt object, …) must block the freeze, not silently report
        # "nothing changed" — the guard exists to refuse on doubt.
        if proc.returncode != 0:
            raise RuntimeError(
                f"refusing: {step} failed during the PLANS.md freshness "
                f"check ({proc.stderr.strip() or 'no stderr'}) — cannot "
                "prove the plan audit is fresh"
            )
    changed = sorted(
        set(diff.stdout.splitlines()) | set(untracked.stdout.splitlines())
    )
    if changed:
        raise RuntimeError(
            "refusing: operator/plan sources changed since docs/PLANS.md "
            f"was generated at {sha[:12]} — re-run scripts/gen_plans.py "
            f"before freezing. Changed: {', '.join(changed)}"
        )


def freeze_baseline(repo: str | None = None) -> None:
    """Snapshot the current BENCH_DETAIL.json as the next round's
    adjudication baseline. Run EXACTLY ONCE per round, at round close,
    right after the final full bench run — mid-round regens must never
    touch BENCH_BASELINE.json (VERDICT r8 #1: a live-detail baseline
    ratchets intra-round and lets real drift cross rounds unflagged).

    Refuses (loudly) unless BENCH_DETAIL.json's bytes still match the
    fingerprint the canonical writer recorded — if any other writer
    touched the file since gen_scaling wrote the best-of-2 composite,
    freezing would snapshot a single shot as the round's baseline."""
    import hashlib

    repo = repo or os.path.dirname(os.path.abspath(__file__))
    # the plan-audit staleness guard rides the same close gate (only
    # where a plan audit exists — unit-test tmp repos have none)
    if os.path.exists(os.path.join(repo, "docs", "PLANS.md")):
        check_plans_fresh(repo)
    detail_path = os.path.join(repo, "BENCH_DETAIL.json")
    fp_path = os.path.join(repo, "BENCH_DETAIL.sha256")
    with open(detail_path) as f:
        data = f.read()
    if not os.path.exists(fp_path):
        raise RuntimeError(
            "refusing to freeze: no BENCH_DETAIL.sha256 fingerprint — "
            "run scripts/gen_scaling.py first (it writes the canonical "
            "best-of-2 BENCH_DETAIL plus its fingerprint)"
        )
    with open(fp_path) as f:
        recorded = f.read().strip()
    digest = hashlib.sha256(data.encode()).hexdigest()
    if digest != recorded:
        raise RuntimeError(
            "refusing to freeze: BENCH_DETAIL.json changed since "
            "gen_scaling wrote it (fingerprint mismatch) — another "
            "bench.py run clobbered the best-of-2 composite; re-run "
            "scripts/gen_scaling.py, then freeze"
        )
    detail = json.loads(data)
    with open(os.path.join(repo, "BENCH_BASELINE.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(
        f"froze baseline: {len(detail.get('queries', {}))} queries, "
        f"total {detail.get('value')}s at sf{detail.get('sf')}"
    )


def isolated_once(names: list[str]) -> None:
    """Adjudication mode: run ONLY the named queries, once each, in this
    fresh JVM (same session confs + warm-up as the full suite), and
    print one JSON line. Drive best-of-3 by invoking this three times
    in separate processes:  python bench.py --only q1 q2 ..."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()
    _warm(spark, sf_dir)
    import __spark_entry__ as e

    qs = e.queries()
    out = {}
    for name in names:
        runs = []
        for _ in range(2):  # cold (plan compile + codegen) then warm
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"cold": runs[0], "warm": runs[1]}
    print(json.dumps({"isolated": out}, separators=(",", ":")))


def _build_session():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from feast_java_old_spark.sources.tables import session_builder

    spark = session_builder(
        "bench",
        master=f"local[{cpus}]",
        **{
            "spark.sql.shuffle.partitions": str(max(int(cpus), 16)),
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "spark.ui.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
            # r16 (guide §5, "the driver should do almost no data work"):
            # one JVM runs ~190 multi-stage queries back to back, and the
            # driver accumulates ContextCleaner backlog (broadcast /
            # localCheckpoint blocks waiting on reference-queue GC) plus
            # retained SQL-execution state (plan graphs + metrics for
            # EVERY completed query; the SQL status store retains 1000
            # executions by default even with the UI off). Old-gen fill
            # from both caused transient suite-wide stalls (measured:
            # 10-20x single-query spikes; back-half A/B 376.6 s stock vs
            # 251.8 s with these three confs). Not a local[32]-only
            # tune: any long-lived driver running many short queries
            # (a serving driver, a notebook, a query service) has the
            # same retention/cleaner dynamics at any cluster size; the
            # interval is env-overridable for production sessions.
            "spark.cleaner.periodicGC.interval": os.environ.get(
                "SPARK_GRAFT_PERIODIC_GC", "15s"
            ),
            # r16: the periodic GC above is a driver System.gc() — by
            # default a stop-the-world FULL collection, which taxed every
            # short query ~0.3-0.5 s on this host (isolated A/B: tpch_q6
            # warm 1.09 s with STW full GCs vs 0.53 s without). G1's
            # ExplicitGCInvokesConcurrent turns System.gc() into a
            # concurrent cycle: reference processing still runs (the
            # ContextCleaner backlog still drains — the point of the
            # periodic GC), but the pause disappears. Env-overridable
            # like the interval.
            #
            # r17: ReservedCodeCacheSize=1g. ~190 distinct codegen'd
            # queries push thousands of hot generated methods through the
            # default 240 MB JIT code cache; once the sweeper starts
            # flushing (observed mid-suite: profiled-nmethods heap 80/118
            # MB, sweeper thread 11 s CPU), newly generated classes queue
            # behind it and CPU-dense stages run INTERPRETED — measured
            # as random 2-5x spikes concentrated on the shingle/array
            # dedup family and on end-of-suite reruns (whose recompiled
            # classes are new to the JIT). Full-suite A/B on one host
            # window: 265-340 s (4 runs, default) vs 214.6 s (1g). Not a
            # local[32] tune: any long-lived driver/executor JVM serving
            # many distinct queries has the same code-cache dynamics.
            "spark.driver.extraJavaOptions": os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:+ExplicitGCInvokesConcurrent"
                " -XX:ReservedCodeCacheSize=1g",
            ),
            # r16 (guide §1.2 driver-side cost): PySpark 4's per-API-call
            # call-site capture (spark.python.sql.dataFrameDebugging,
            # static conf, default true) walks the Python stack on EVERY
            # Column/DataFrame op — pure debugging metadata. Plan-heavy
            # queries build thousands of expression nodes per run
            # (interleaved in-JVM A/B, capture off vs on: logreg_quality
            # 5.70 vs 6.65 s, audit_trail 2.51 vs 2.85 s, dedup_incremental
            # 1.53 vs 1.90 s, curve_skip_audit 1.66 vs 1.87 s medians).
            # Driver-side Python cost is scale-independent — disabling a
            # debug feature is the production default, not a local tune.
            "spark.python.sql.dataFrameDebugging.enabled": os.environ.get(
                "SPARK_GRAFT_DF_DEBUGGING", "false"
            ),
            "spark.sql.ui.retainedExecutions": "50",
            "spark.ui.retainedJobs": "300",
            "spark.ui.retainedStages": "500",
        },
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark, sf_dir: str) -> None:
    # Warm the JVM (codegen, parquet footer caches, shuffle + broadcast
    # machinery) so the first timed queries don't absorb session fixed
    # costs — a 1-row read leaves the first real shuffle/join to pay
    # executor spin-up, which showed up as phantom "regressions" on
    # whichever queries ran first.
    from pyspark.sql import functions as _F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("events", "documents", "embeddings", "orders", "lineitem", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = ev.groupBy("user_id").agg(_F.count(_F.lit(1)).alias("n"))
    agg.join(
        _F.broadcast(agg.limit(100).withColumnRenamed("n", "m")), "user_id"
    ).write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    import __spark_entry__ as e

    spark = _build_session()
    _warm(spark, sf_dir)

    repo = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(repo, "BENCH_DETAIL.json")
    baseline_path = os.path.join(repo, "BENCH_BASELINE.json")
    # Prior ROUND's per-query numbers: the in-process adjudication
    # baseline for cold-plan flags. Read from BENCH_BASELINE.json — a
    # snapshot frozen exactly once per round close (`--freeze-baseline`),
    # never touched by mid-round regens. Reading the live
    # BENCH_DETAIL.json here (the pre-r9 behavior) meant every mid-round
    # rerun ratcheted the baseline, so a query could drift past the
    # flag threshold ACROSS the round without ever being adjudicated
    # (r8: j3_max_age 2.01x vs r7, never flagged — VERDICT r8 #1).
    prior: dict[str, float] = {}
    try:
        with open(baseline_path) as f:
            _pj = json.load(f)
        # Same-SF baselines only: gen_scaling.py runs this harness across
        # sf0.001/0.01/0.1 back-to-back, and a smaller-SF detail file
        # would flag every query at the next SF up.
        if _pj.get("sf") == sf:
            prior = _pj.get("queries", {}) or {}
    except Exception:
        pass

    def run_once(fn, name: str) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        elapsed = round(time.time() - t0, 3)
        # Queries that persist small reused frames (request sets, edge
        # lists, ranked frames) populate them during their own timed
        # execution; drop them afterwards so storage-memory pressure
        # doesn't tax LATER queries' GC (observed 2-3x single-shot
        # spikes on late-suite queries with ~100 accumulated frames).
        spark.catalog.clearCache()
        return elapsed

    qs = e.queries()
    timings: dict[str, float] = {}
    median_samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        n = MEDIAN_OF.get(name, 1)
        if n == 1:
            timings[name] = run_once(qs[name], name)
        else:
            samples = [run_once(qs[name], name) for _ in range(n)]
            median_samples[name] = samples
            timings[name] = sorted(samples)[n // 2]

    # Single-shot suite numbers swing ±20% (GC) and a cold plan can be
    # ~75% one-time codegen/plan cost (r6's historical_asof false flag:
    # 2.93 s in-suite vs 0.78 s isolated). Adjudicate in-process: any
    # query >1.5x its prior-round number is rerun, BOTH/ALL numbers are
    # recorded, and the headline carries the MEDIAN of {cold, warm1,
    # warm2} — a number one real run actually produced. (Not min(): a
    # best-of composite would mask a genuine regression whenever one of
    # the runs happened to be fast — ADVICE r7 bench.py:286. Not
    # "warm replaces cold" either, the r9–r16 form: this round's stall
    # diagnosis showed a single warm rerun can itself absorb a
    # multi-second host/JIT stall and REPLACE a healthy cold number —
    # driver r16 c8 run: dedup_simhash cold 3.09 s overwritten by a
    # 14.55 s rerun; entry r17 run: triangle_count cold 4.46 s
    # overwritten by an 18.58 s rerun. The median of three keeps the
    # steady-state-plan intent while a single stalled sample, in either
    # position, can no longer decide the number. Old numbers stay: the
    # reruns dict records every sample, and cold_total still sums the
    # first shots.)
    cold_total = round(sum(timings.values()), 3)
    reruns: dict[str, dict[str, float]] = {}
    for name, cold in list(timings.items()):
        if name in MEDIAN_OF:
            # already a median of N in-suite samples — a warm-rerun
            # override would silently discard the median; the samples
            # are in the detail for close-time adjudication.
            continue
        p = prior.get(name)
        # Floor at 0.3 s (was 1.0 s): the old floor permanently exempted
        # sub-second queries from adjudication — two drifted past 1.5x
        # unadjudicated by r9 close (VERDICT r9 finding #1). 0.3 s is
        # below the fresh-JVM fixed overhead of any headline query, so
        # no flag can now escape the rerun.
        if p and cold > 1.5 * p and cold > 0.3:
            warm = run_once(qs[name], name)
            warm2 = run_once(qs[name], name)
            reruns[name] = {
                "cold": cold,
                "warm": warm,
                "warm2": warm2,
                "prior_round": p,
            }
            timings[name] = sorted((cold, warm, warm2))[1]

    # Ceiling twins: timed after the headline pass (so they never tax
    # headline GC), recorded separately, excluded from the total.
    ceilings: dict[str, float] = {}
    for name in TRACKED_CEILINGS:
        if name in qs:
            ceilings[name] = run_once(qs[name], name)

    total = round(sum(timings.values()), 3)
    # The round driver records only the last ~2000 chars of stdout; the
    # full per-query dict (~110 queries) exceeds that and truncated the
    # r3 JSON line into an unparseable tail. Full detail goes to
    # BENCH_DETAIL.json (committed, next to this script); stdout gets a
    # ONE-LINE summary bounded well under the window: total + the 10
    # slowest queries + a pointer to the detail file.
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": cold_total,
        "reruns": reruns,
        "median_samples": median_samples,
        "tracked_ceilings": ceilings,
        "sf": sf,
        "cpus": int(cpus),
    }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "queries_truncated": True,
                "n_queries": len(timings),
                "n_reruns": len(reruns),
                "cold_total": cold_total,
                "queries_file": "BENCH_DETAIL.json",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--freeze-baseline":
        freeze_baseline()
    elif len(sys.argv) > 2 and sys.argv[1] == "--only":
        isolated_once(sys.argv[2:])
    else:
        main()
