"""sf1 stress (r10 verdict item 7): run the dedup + similarity headline
families at 10x the sf0.1 corpus (50k docs / 20k embeddings — the sf1
size) and report per-family scale exponents, confirming the SCALING.md
alpha estimates and the dedup `_barrier` decision rule hold an order of
magnitude above the bench SF.

Inflation models a genuinely BIGGER corpus, not a duplicated one:

- documents: every replica r gets a DISJOINT token namespace
  (word -> word_r), so shingle equality is preserved bijectively WITHIN
  a replica (every true near-dup pair exists once per replica: pair
  structure scales exactly linearly) and is impossible ACROSS replicas
  (no quadratic dup groups — replicating text verbatim would multiply
  candidate pairs by mult^2 per group, a data-distribution change, not
  a scale-up). The 1x run applies the same transform (r=0 only) so the
  comparison is apples-to-apples.
- embeddings: replica vectors get deterministic per-dimension sin
  jitter (distinct vectors, same distribution); labels carried for
  semdedup's cluster structure.
- ANN/topk query COUNT is held fixed (vec_id % (100*mult) == 0, ~20
  queries) so alpha measures corpus scaling at constant query load —
  brute-force cosine should be ~linear per query, the bucketed paths
  sublinear.

Run on an IDLE machine: python scripts/stress_sf1.py
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
from feast_java_old_spark.operators import dedup, similarity  # noqa: E402

import __spark_entry__ as e  # noqa: E402  (gate constants)

spark = session_builder(
    "sf1stress",
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
    # one eager materialization so every family times its OWN plan, not
    # the shared inflation (and partition count scales with the corpus)
    return out.repartition(32 * mult if mult > 1 else 8).localCheckpoint(
        eager=True
    )


def inflate_emb(mult: int):
    emb = load_table(spark, SF, "embeddings")
    rep = emb.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    )
    vid = (F.col("vec_id") * mult + F.col("__r")).alias("vec_id")
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            + F.sin(
                F.col("vec_id") * 13.7 + i.cast("double") * 0.61 + F.col("__r")
            )
            * F.lit(0.05)
        ).cast("float"),
    )
    # disjoint label space per replica: a real 10x corpus has ~10x
    # clusters of bounded size, not 10x-bigger clusters (which would
    # make semdedup's within-cluster pairwise work a quadratic
    # inflation artifact, not a scale measurement)
    lbl = (F.col("label") * mult + F.col("__r")).alias("label")
    out = rep.select(vid, jitter.alias("embedding"), lbl)
    return out.repartition(8 * mult).localCheckpoint(eager=True)


def run(name, build, results, mult):
    """build is a THUNK: some operators (dedup_components' per-round
    eager checkpoints) execute at CONSTRUCTION, so the frame must be
    built inside the timed region or its cost lands outside the timer
    (r11 self-review finding on the first version of this script)."""
    t0 = time.time()
    df = build() if callable(build) else build
    n = df.count()
    dt = round(time.time() - t0, 2)
    results.setdefault(name, {})[mult] = dt
    print(f"  {name}: {dt}s ({n} rows)", flush=True)


results: dict[str, dict[int, float]] = {}
for mult in MULTS:
    docs = inflate_docs(mult)
    emb = inflate_emb(mult)
    nd, ne = docs.count(), emb.count()
    qmod = 100 * mult  # fixed ~20 queries at every mult
    queries = emb.where(F.col("vec_id") % qmod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    print(f"--- mult={mult}: docs={nd} embeddings={ne}", flush=True)

    # ---- dedup family (headliners from the gate)
    run("dedup_exact", dedup.dedup_exact(docs), results, mult)
    run(
        "minhash_lsh",
        dedup.minhash_lsh_candidates(
            docs, k=e.MINHASH_K, bands=e.MINHASH_BANDS, n=3
        ),
        results,
        mult,
    )
    cands = dedup.simhash_candidates(docs, max_hamming=e.SIMHASH_MAX_HAMMING)
    run(
        "verified_simhash",
        dedup.verify_candidate_pairs(
            docs, cands, n=3, threshold=e.VERIFY_THRESHOLD, strategy="sets"
        ),
        results,
        mult,
    )
    run(
        "prefix_filter",
        dedup.prefix_filter_pairs(docs, n=3, threshold=e.JACCARD_THRESHOLD),
        results,
        mult,
    )
    run(
        "dedup_components",
        lambda: dedup.dedup_components(
            dedup.minhash_lsh_candidates(
                docs, k=e.MINHASH_K, bands=e.MINHASH_BANDS, n=3
            ),
            docs.select("doc_id"),
        ),
        results,
        mult,
    )

    # ---- similarity family
    run(
        "cosine_topk",
        similarity.cosine_topk(emb, queries, k=e.TOPK_K),
        results,
        mult,
    )
    run(
        "ann_sign_lsh",
        similarity.ann_sign_lsh(emb, queries, k=e.ANN_K, bits=e.ANN_BITS),
        results,
        mult,
    )
    run(
        "ann_ivf",
        similarity.ann_ivf(
            emb,
            queries,
            k=e.ANN_K,
            centroid_step=e.IVF_STEP,
            nprobe=e.IVF_NPROBE,
        ),
        results,
        mult,
    )
    nbits = similarity.suggest_bits(ne, e.NEAR_DUP_TARGET_OCC)
    run(
        "embedding_near_dups",
        similarity.embedding_near_dups(
            emb, threshold=e.NEAR_DUP_THRESHOLD, bits=nbits, corpus_rows=ne
        ),
        results,
        mult,
    )
    run(
        "semdedup",
        similarity.semdedup(emb, threshold=e.SEMDEDUP_TAU),
        results,
        mult,
    )

    # ---- barrier decision rule at sf1 (aggregate-shaped frame,
    # 2 consumers): the r10 rule says the local checkpoint wins ~2x.
    if mult == MULTS[-1]:
        def consume2(df):
            t0 = time.time()
            for i in range(2):
                df.select(
                    F.sum(F.length(df.columns[1]).cast("long") + i)
                ).collect()
            return round(time.time() - t0, 2)

        lazy = consume2(dedup.simhash(docs))
        t0 = time.time()
        bar = dedup.simhash(docs).localCheckpoint(eager=True)
        mat = round(time.time() - t0, 2)
        barrier = round(mat + consume2(bar), 2)
        bar.unpersist()
        print(
            f"  barrier_rule(simhash,agg-shaped,2 consumers): "
            f"lazy={lazy}s barrier={barrier}s",
            flush=True,
        )

print("\n=== alpha (log10 t10/t1; 1.0 = linear) ===")
for name, r in results.items():
    a = math.log10(max(r[10], 0.05) / max(r[1], 0.05))
    print(f"{name}: t1={r[1]}s t10={r[10]}s alpha={a:.2f}")
