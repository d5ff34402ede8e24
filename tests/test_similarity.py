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
