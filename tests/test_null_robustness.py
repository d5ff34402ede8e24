"""NULL-contract robustness sweep.

The gate testdata carries no NULLs in `events.value` / `events.user_id`,
so an operator and its DuckDB oracle can silently disagree on NULL
handling and still hash-match every round (the r8 ADVICE `ks_drift`
finding, and the r9 sweep that caught `normalize_features` — Spark ASC
windows are NULLS FIRST while DuckDB is NULLS LAST — and
`heavy_hitters` — the oracle counted the NULL key group the operator
excludes). This test injects NULLs into a COPY of the events table
(≈3% NULL value, ≈2% NULL user_id) and re-runs the Spark-vs-DuckDB
comparison for the value/key-aggregating queries over it, so every
future operator's NULL contract is exercised, not just documented.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries over `events` whose semantics aggregate/order the injected
# columns. Streaming twins excluded (each is a ~10 s real run; their
# batch twins share the kernels).
NULL_SENSITIVE = [
    "feature_drift",
    "ks_drift",
    "cusum_alerts",
    "heavy_hitters",
    "count_min",
    "bloom_filter",
    "normalize_features",
    "robust_outliers",
    "winsorize",
    "a6_percentiles",
    "a2_metrics_rollup",
    "multi_window_features",
    "ewma_features",
    "quantile_bin",
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("sfnull")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT event_id,
                     CASE WHEN event_id % 47 = 0 THEN NULL
                          ELSE user_id END AS user_id,
                     event_type, ts,
                     CASE WHEN event_id % 31 = 0 THEN NULL
                          ELSE value END AS value,
                     * EXCLUDE (event_id, user_id, event_type, ts, value)
              FROM '{sf_dir}/events.parquet')
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_oracle_agreement_under_nulls(spark, null_sf_dir, name):
    import __spark_entry__ as e
    from scripts.check_correctness import (
        TABLES,
        kind_mismatches,
        value_hash,
    )

    sdf = e.queries()[name](spark, null_sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_sf_dir}/{t}.parquet'"
        )
    odf = con.sql(e.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert not kind_mismatches(sdf, odf), name
    assert value_hash(sdf) == value_hash(odf), (
        f"{name}: NULL-contract divergence between the operator and its "
        "oracle — align the oracle with the operator's documented NULL "
        "handling (see module docstring)"
    )


NULL_TEXT_SENSITIVE = [
    "dedup_exact",
    "doc_fingerprint",
    "token_count",
    "text_stats",
    "lang_id",
    "pii_scrub",
    "text_normalize",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "decontaminate",
    "token_budget",
    "sequence_pack",
]


@pytest.fixture(scope="module")
def null_doc_sf_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("sfnulldoc")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (CASE WHEN doc_id % 29 = 0 THEN NULL
                                     ELSE text END AS text)
              FROM '{sf_dir}/documents.parquet')
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", NULL_TEXT_SENSITIVE)
def test_oracle_agreement_under_null_text(spark, null_doc_sf_dir, name):
    """The r7 NULL-text contract (substring/text ops), exercised
    engine-vs-oracle over a documents table with ~4% NULL text."""
    import __spark_entry__ as e
    from scripts.check_correctness import (
        TABLES,
        kind_mismatches,
        value_hash,
    )

    sdf = e.queries()[name](spark, null_doc_sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{null_doc_sf_dir}/{t}.parquet'"
        )
    odf = con.sql(e.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert not kind_mismatches(sdf, odf), name
    assert value_hash(sdf) == value_hash(odf), name


# Embedding queries under the NULL-vector ingestion contract (r9): a
# NULL embedding is not a point in the space — every similarity/ANN/
# PQ/k-means operator filters NULL vectors at entry, so the oracle side
# expresses the contract ONCE, as a NULL-filtered embeddings view
# (DuckDB's list_inner_product cannot even evaluate a NULL list — the
# unfiltered oracles error, which is why the contract must live at
# ingestion).
NULL_VEC_SENSITIVE = [
    "similarity_topk",
    "hard_negatives",
    "embedding_near_dups",
    "embedding_outliers",
    "embedding_centroids",
    "semdedup",
    "semantic_decontaminate",
    "random_projection",
    "kmeans_refine",
    "pq_encode",
    "mmr_rerank",
    "similarity_ann_lsh",
]


@pytest.fixture(scope="module")
def null_vec_sf_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("sfnullvec")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (CASE WHEN vec_id % 37 = 0 THEN NULL
                                     ELSE embedding END AS embedding)
              FROM '{sf_dir}/embeddings.parquet')
        TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents"
    ).split():
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", NULL_VEC_SENSITIVE)
def test_oracle_agreement_under_null_vectors(spark, null_vec_sf_dir, name):
    import __spark_entry__ as e
    from scripts.check_correctness import (
        TABLES,
        kind_mismatches,
        value_hash,
    )

    sdf = e.queries()[name](spark, null_vec_sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        if t == "embeddings":
            con.execute(
                "CREATE VIEW embeddings AS SELECT * FROM "
                f"'{null_vec_sf_dir}/embeddings.parquet' "
                "WHERE embedding IS NOT NULL"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{null_vec_sf_dir}/{t}.parquet'"
            )
    odf = con.sql(e.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert not kind_mismatches(sdf, odf), name
    assert value_hash(sdf) == value_hash(odf), name
