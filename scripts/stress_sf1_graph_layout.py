"""sf1 stress (r12 verdict item 6): graph, search, layout, and
feature-engineering headline families at 10x the sf0.1 tables,
reporting per-family scale exponents — the last families whose
SCALING.md alphas stopped at sf0.1.

Unlike the dedup/similarity script (which recomposes operator calls),
this one stages the inflated tables as a TEMP SF-DIR and runs the
EXACT gate query functions (``q_pagerank`` etc.) against it — the
measured plan is byte-identical to the benched plan.

Inflation models a genuinely bigger corpus with replica-disjoint key
namespaces (key*mult + r), so structure scales linearly, never
quadratically:

- lineitem (pagerank, triangle_count): replica subgraphs are disjoint
  (part/supp/order keys all remapped) — 10x nodes AND 10x edges, same
  degree distribution; co-occurrence pairs can't cross replicas. The
  part-id ceiling stays far under PR_OFFSET (200k << 10M), so the
  part/supplier node namespaces never collide.
- documents (bm25_search, tfidf_terms, rrf_fusion, compaction_plan):
  VERBATIM text under fresh doc_ids — search work scales with the
  postings list (a real 10x corpus has 10x postings per term); these
  queries never join doc-to-doc, so verbatim text cannot create a
  pair explosion. compaction_plan keeps the same source partitions
  with 10x files each — the per-source cumulative window is the
  scale path under test.
- orders (zorder_key, hilbert_key): fresh order keys, same
  (custkey, orderdate) plane — the curve math is a projection; only
  row count grows.
- events (multi_window_features, rolling_features): disjoint user/event
  ids — 10x users, same per-key history depth, the linear-scale path
  window functions must hold on.

pagerank additionally gets a PER-ITERATION cost check: time 2-iter and
12-iter runs at each mult (warm, best-of-2); (t12 - t2)/10 isolates one
power-iteration (edge shuffle + dst aggregate) with enough spread to
clear JVM run-to-run noise, and its own scaling confirms the
per-iteration shuffle stays linear-or-better in edges, not just the
2-iter total.

Run on an IDLE machine: python scripts/stress_sf1_graph_layout.py
"""

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from feast_java_old_spark.sources.tables import session_builder  # noqa: E402

import __spark_entry__ as e  # noqa: E402

spark = session_builder(
    "sf1stress_graph_layout",
    master="local[32]",
    **{
        "spark.sql.shuffle.partitions": "64",
        "spark.ui.enabled": "false",
        "spark.driver.memory": "48g",
        "spark.sql.autoBroadcastJoinThreshold": "64MB",
    },
).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
MULTS = (1, 10)

# table -> columns remapped to key*mult + replica (disjoint namespaces)
REMAP = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "orders": ["o_orderkey"],
    "events": ["user_id", "event_id"],
}


def stage(mult: int) -> str:
    """Write the inflated tables into a temp sf-dir ({name}.parquet
    dirs, the load_table layout). Raw read/write — id columns remapped,
    everything else (incl. the physical ts type) verbatim."""
    out_dir = tempfile.mkdtemp(prefix=f"sf1_graft_x{mult}_")
    for name, keys in REMAP.items():
        df = spark.read.parquet(os.path.join(SF, f"{name}.parquet"))
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        )
        cols = [
            (F.col(c) * mult + F.col("__r")).alias(c) if c in keys else F.col(c)
            for c in df.columns
        ]
        rep.select(*cols).repartition(8 * mult).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    return out_dir


def run(name, thunk, results, mult):
    t0 = time.time()
    n = thunk().count()
    dt = round(time.time() - t0, 2)
    results.setdefault(name, {})[mult] = dt
    print(f"  {name}: {dt}s ({n} rows)", flush=True)
    return dt


def pagerank_iters(sf_dir: str, iterations: int):
    """q_pagerank's exact edge construction with a variable iteration
    count — for the per-iteration delta measurement."""
    from feast_java_old_spark.operators.graph import pagerank
    from feast_java_old_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + e.PR_OFFSET).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iterations=iterations)


QUERIES = [
    # graph
    "pagerank",
    "triangle_count",
    # search
    "bm25_search",
    "tfidf_terms",
    "rrf_fusion",
    # layout
    "zorder_key",
    "hilbert_key",
    "compaction_plan",
    # feature engineering
    "multi_window_features",
    "rolling_features",
]

results: dict[str, dict[int, float]] = {}
periter: dict[int, float] = {}
dirs = []
for mult in MULTS:
    sf_dir = stage(mult)
    dirs.append(sf_dir)
    nli = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    print(f"--- mult={mult}: staged {sf_dir} (lineitem={nli})", flush=True)
    qs = e.queries()
    for name in QUERIES:
        run(name, lambda q=qs[name]: q(spark, sf_dir), results, mult)
    # per-iteration pagerank cost: (t12 - t2) / 10, both WARM
    # best-of-2 — a cold short run pays plan/codegen warmup the longer
    # run then skips (which made a naive delta negative), and narrower
    # spreads (1 vs 3, 1 vs 5) left the delta under the several-second
    # JVM run-to-run noise. Ten iterations of spread put the slope well
    # above it.
    pagerank_iters(sf_dir, 2).count()  # warm-up, untimed
    t2 = min(
        run("pagerank_2iter", lambda: pagerank_iters(sf_dir, 2), results, mult)
        for _ in range(2)
    )
    t12 = min(
        run("pagerank_12iter", lambda: pagerank_iters(sf_dir, 12), results, mult)
        for _ in range(2)
    )
    periter[mult] = round((t12 - t2) / 10, 3)
    print(f"  pagerank per-iteration: {periter[mult]}s", flush=True)

print("\n=== alphas (runtime ~ data^alpha across 1x -> 10x) ===")
for name in QUERIES:
    t1, t10 = results[name][1], results[name][10]
    alpha = round(math.log(max(t10, 0.01) / max(t1, 0.01)) / math.log(10), 2)
    print(f"  {name}: {t1}s -> {t10}s  alpha={alpha}")
NOISE_FLOOR = 0.2  # below this the delta is scheduler jitter, not work
if periter[1] >= NOISE_FLOOR:
    a = round(math.log(max(periter[10], 0.01) / periter[1]) / math.log(10), 2)
    print(
        f"  pagerank_per_iteration: {periter[1]}s -> {periter[10]}s  alpha={a}"
    )
else:
    print(
        f"  pagerank_per_iteration: {periter[1]}s (below {NOISE_FLOOR}s noise "
        f"floor at 1x) -> {periter[10]}s at 10x — a 10x edge set costs "
        "<=10x per iteration iff the 10x value stays under "
        f"{NOISE_FLOOR * 10}s"
    )

for d in dirs:
    shutil.rmtree(d, ignore_errors=True)
