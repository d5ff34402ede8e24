"""Global physical-plan contracts over every registered gate query.

The correctness gate proves VALUES; this sweep proves SHAPES — the
properties that decide whether a plan survives a 1000× scale-up. The
one contract no query may break: no `CartesianProduct` anywhere (an
unkeyed non-broadcast join is quadratic in data and cannot be saved by
AQE). 1-row-broadcast stat frames legitimately appear as
`BroadcastNestedLoopJoin`, so that operator is NOT banned globally —
but the big-fact-table queries assert it absent too.
"""

import pytest


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_in_any_registered_query(spark, sf_dir):
    import __spark_entry__ as e

    offenders = []
    for name, fn in e.queries().items():
        # streaming gates run a real query each (~10 s apiece) and end in
        # a memory-sink LogicalRDD whose upstream plan the batch twin
        # already covers; skip them here.
        if name.startswith("stream_"):
            continue
        df = fn(spark, sf_dir)
        if "CartesianProduct" in _plan(df):
            offenders.append(name)
    assert offenders == []


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q5",
        "tpch_q18",
        # the r8 decorrelation pack: Catalyst must compile the correlated
        # scalar subquery (q17) and EXISTS/NOT EXISTS (q21) to keyed
        # aggregate-join / semi / anti — a BNLJ here means decorrelation
        # fell back to per-row evaluation. (q22/q15/q11 carry deliberate
        # 1-row-broadcast scalar joins, covered by the global contract.)
        "tpch_q17",
        "tpch_q21",
        "tpch_q21_agg",
        # r9: the three-level Q20 nest (IN > IN + correlated scalar agg)
        # must also decorrelate to keyed joins end-to-end.
        "tpch_q20",
        "j1_entity_lookup",
        "j2_compound_key",
        # historical_asof is exempt: its request GRID is built as
        # distinct-keys × a literal timestamp list — a deliberate
        # tiny-side broadcast cross join, not a lost join key.
        "interval_join",
        "asof_nearest",
        "dedup_minhash_lsh",
        # similarity_ann_* are exempt: centroid assignment is corpus ×
        # broadcast k-row centroid table — a deliberate bounded fan-out,
        # not a lost key (probing itself is the bucket equi-join).
        "substring_spans",
        "substring_dedup",
    ],
)
def test_fact_table_paths_have_no_nested_loop_join(spark, sf_dir, name):
    """The hot fact-table queries must resolve every join to a keyed
    hash/sort-merge join — a nested-loop anywhere in these plans means a
    join key was lost (the r4 interval-join lesson: banded equi-joins,
    never BNLJ)."""
    import __spark_entry__ as e

    plan = _plan(e.queries()[name](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name,pushed_frag,max_read_cols",
    [
        # Q6: all four range predicates must reach the parquet footer,
        # and the scan must read exactly the 4 referenced columns.
        ("tpch_q6", "PushedFilters: [", 4),
        # S1: projection pruning — the events scan carries the 4
        # projected columns + the filter column, never the full row
        # (the props payload column must not be read).
        ("s1_scan_projection", "ReadSchema", 5),
    ],
)
def test_scan_bound_queries_push_and_prune(
    spark, sf_dir, name, pushed_frag, max_read_cols
):
    """The scan-bound contract: a filter that stays above the FileScan
    or a ReadSchema wider than the projection silently multiplies a
    100 TB scan. Checked on the live executed plan, not docs."""
    import re

    import __spark_entry__ as e

    plan = _plan(e.queries()[name](spark, sf_dir))
    assert pushed_frag in plan, name
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, name
    ncols = len([c for c in m.group(1).split(",") if c])
    assert ncols <= max_read_cols, (name, m.group(1))


@pytest.mark.parametrize(
    "name",
    ["j1_entity_lookup", "j2_compound_key", "j3_max_age"],
)
def test_serving_path_joins_all_broadcast(spark, sf_dir, name):
    """The serving contract: the entity/request side of an online
    lookup is never shuffled for the join — every join in the serving
    plan is a broadcast hash join (the request set is bounded by the
    serving protocol; a SortMergeJoin here would range-exchange the
    ONLINE table per request batch). The exchanges that remain belong
    to the latest-per-key reduction upstream, not the lookup."""
    import __spark_entry__ as e

    plan = _plan(e.queries()[name](spark, sf_dir))
    assert "SortMergeJoin" not in plan, name
    assert "BroadcastHashJoin" in plan, name


@pytest.mark.parametrize(
    "name",
    [
        # the TPC-H pack: every dimension side fits the broadcast
        # threshold at gate scale — a SortMergeJoin means a join lost
        # its equi-key or a broadcast was barred by a plan barrier.
        # (q21_agg is exempt: its fused twin joins lineitem against a
        # per-order aggregate OF lineitem — two fact-sized sides, SMJ
        # is the correct strategy. q11/q22/q15 carry deliberate
        # 1-row-scalar BNLJs, covered by the global cartesian ban.)
        "tpch_q1",
        "tpch_q4",
        "tpch_q5",
        "tpch_q6",
        "tpch_q13",
        "tpch_q14",
        "tpch_q16",
        "tpch_q17",
        "tpch_q18",
        "tpch_q20",
        "tpch_q22",
    ],
)
def test_tpch_small_sides_broadcast(spark, sf_dir, name):
    import __spark_entry__ as e

    plan = _plan(e.queries()[name](spark, sf_dir))
    assert "SortMergeJoin" not in plan, name
    if name not in ("tpch_q1", "tpch_q6"):  # single-table scans: no join
        assert "BroadcastHashJoin" in plan, name


@pytest.mark.parametrize(
    "name",
    [
        # pure projections: the whole operator must ride the scan —
        # ANY exchange multiplies a 100 TB pass.
        "text_normalize",
        "pii_scrub",
        "text_stats",
        "token_count",
        "doc_fingerprint",
        "lang_id",
        "p5_type_conformance",
        "calendar_features",
        "s1_scan_projection",
    ],
)
def test_scan_riding_projections_are_exchange_free(spark, sf_dir, name):
    import __spark_entry__ as e

    plan = _plan(e.queries()[name](spark, sf_dir))
    assert "Exchange" not in plan, name


@pytest.mark.parametrize("name", ["hilbert_key", "zorder_key"])
def test_curve_keys_shuffle_only_metadata(spark, sf_dir, name):
    """The space-filling-curve keys are projections plus ONE broadcast
    1-row min/max stats frame: the only exchanges allowed are the
    stats aggregate's SinglePartition collapse and its broadcast —
    never a hashpartitioning of the fact rows."""
    import re

    import __spark_entry__ as e

    plan = _plan(e.queries()[name](spark, sf_dir))
    kinds = re.findall(r"Exchange (\w+)|(BroadcastExchange)", plan)
    for hashkind, _bcast in kinds:
        assert hashkind in ("", "SinglePartition"), (name, hashkind)
