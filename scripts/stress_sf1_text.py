"""sf1 stress, text + pipeline family (late-r11 extension of
``stress_sf1.py``): the high-volume 100 TB text path — one-scan
projections (lang_id / text_stats / fingerprints), the composed
clean-corpus pipeline (one scan, one shuffle), vocabulary aggregation,
and sequence packing's distributed prefix sum — at 10× the bench SF.

Same inflation model as ``stress_sf1.py`` (disjoint token namespace per
replica, so vocab size and dup-group structure scale LINEARLY — a
verbatim replication would hold vocab constant and multiply dup-group
sizes, measuring a distribution change instead of a scale-up), same
thunk-timed protocol (construction inside the timer), same fixed 32/64
shuffle partitioning at 1× vs scaled partitions at 10×.

Expected shapes: the projections and clean_corpus ~linear (scan-bound);
top_k_vocabulary ~linear in corpus with a vocab-sized (here ~10×) agg
state; sequence_pack ~linear — its only serial step is the
bucket-subtotal prefix sum over corpus/bucket_size rows.

Run on an IDLE machine: python scripts/stress_sf1_text.py
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from feast_java_old_spark.sources.tables import (  # noqa: E402
    load_table,
    session_builder,
)
from feast_java_old_spark.operators import pipeline, text  # noqa: E402

import __spark_entry__ as e  # noqa: E402  (gate constants)

spark = session_builder(
    "sf1stress_text",
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


def inflate_docs(mult: int):
    docs = load_table(spark, SF, "documents")
    rep = docs.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    )
    toks = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            toks,
            lambda w: F.concat(w, F.lit("_"), F.col("__r").cast("string")),
        ),
        " ",
    )
    out = rep.select(
        (F.col("doc_id") * mult + F.col("__r")).alias("doc_id"),
        salted.alias("text"),
    )
    return out.repartition(32 * mult if mult > 1 else 8).localCheckpoint(
        eager=True
    )


def run(name, build, results, mult):
    t0 = time.time()
    df = build() if callable(build) else build
    n = df.count()
    dt = round(time.time() - t0, 2)
    results.setdefault(name, {})[mult] = dt
    print(f"  {name}: {dt}s ({n} rows)", flush=True)


results: dict[str, dict[int, float]] = {}
for mult in MULTS:
    docs = inflate_docs(mult)
    nd = docs.count()
    print(f"--- mult={mult}: docs={nd}", flush=True)

    run("lang_id", lambda: text.lang_id(docs), results, mult)
    run("text_stats", lambda: text.text_stats(docs), results, mult)
    run(
        "fingerprints",
        lambda: docs.select(
            "doc_id", text.fingerprint(F.col("text")).alias("fp")
        ),
        results,
        mult,
    )
    run(
        "clean_corpus",
        lambda: pipeline.clean_corpus(
            docs, min_quality=e.CLEAN_MIN_QUALITY, lang=e.CLEAN_LANG
        ),
        results,
        mult,
    )
    run(
        "vocab_topk",
        lambda: text.top_k_vocabulary(docs, k=e.VOCAB_K),
        results,
        mult,
    )
    run(
        "sequence_pack",
        lambda: text.sequence_pack(
            docs, seq_len=e.PACK_SEQ_LEN, bucket_size=e.PACK_BUCKET
        ),
        results,
        mult,
    )

print("\nalpha (t ~ corpus^alpha, 1x -> 10x):")
for name, by_mult in results.items():
    a = math.log(by_mult[10] / by_mult[1]) / math.log(10)
    print(f"  {name}: {by_mult[1]}s -> {by_mult[10]}s  alpha={a:.2f}")
