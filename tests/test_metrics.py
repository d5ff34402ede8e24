"""Serving-metrics parity tests (serving/util/Metrics.java +
OnlineServingServiceV2.populate*Metrics + GrpcMonitoringInterceptor)."""

import datetime as dt

import pytest

import feast_java_old_spark as fs
from feast_java_old_spark.plans.metrics import ServingMetrics
from feast_java_old_spark.registry.model import FileSource
from feast_java_old_spark.registry.registry import Registry


def _rows(statuses_list):
    return [{"fields": {}, "statuses": s} for s in statuses_list]


def test_counters_follow_reference_population_rules():
    m = ServingMetrics()
    refs = ["t1:f1", "t1:f2"]
    # 3 rows: f1 PRESENT/NOT_FOUND/OUTSIDE_MAX_AGE; f2 always NOT_FOUND
    m.observe_request(
        "default",
        refs,
        _rows(
            [
                {"t1:f1": "PRESENT", "t1:f2": "NOT_FOUND"},
                {"t1:f1": "NOT_FOUND", "t1:f2": "NOT_FOUND"},
                {"t1:f1": "OUTSIDE_MAX_AGE", "t1:f2": "NOT_FOUND"},
            ]
        ),
    )
    c = dict(m.counters)
    # +1 per requested feature ref per REQUEST (populateFeatureCountMetrics)
    assert c[("request_feature_count", "feature_name=t1:f1,project=default")] == 1
    assert c[("request_feature_count", "feature_name=t1:f2,project=default")] == 1
    # +1 per response ROW with that status (populateCountMetrics)
    assert c[("not_found_feature_count", "feature_name=t1:f1,project=default")] == 1
    assert c[("not_found_feature_count", "feature_name=t1:f2,project=default")] == 3
    assert c[("stale_feature_count", "feature_name=t1:f1,project=default")] == 1
    assert ("stale_feature_count", "feature_name=t1:f2,project=default") not in c
    assert c[("grpc_request_count", "method=getOnlineFeatures,status_code=OK")] == 1


def test_histograms_are_cumulative_prometheus_buckets():
    m = ServingMetrics()
    for n in (3, 7, 250):  # entity-row counts of three requests
        m.observe_request("default", ["t:f"], _rows([{}] * n))
    rows = {
        (r[0], r[1]): r[2]
        for r in m.as_rows()
        if r[0] == "request_entity_count_distribution_bucket"
        or r[0].startswith("request_entity_count_distribution_")
    }
    b = "request_entity_count_distribution_bucket"
    # buckets (1,2,5,10,20,50,100,200): 3≤5, 7≤10, 250 only ≤ +Inf
    assert rows[(b, "le=2,project=default")] == 0
    assert rows[(b, "le=5,project=default")] == 1
    assert rows[(b, "le=10,project=default")] == 2
    assert rows[(b, "le=200,project=default")] == 2
    assert rows[(b, "le=+Inf,project=default")] == 3
    assert rows[("request_entity_count_distribution_count", "project=default")] == 3
    assert rows[("request_entity_count_distribution_sum", "project=default")] == 260


def test_latency_excluded_from_deterministic_rows_present_in_exposition():
    m = ServingMetrics()
    m.observe_request(
        "default", ["t:f"], _rows([{}]), latency_s=0.042
    )
    assert not any(
        r[0].startswith("request_latency_seconds") for r in m.as_rows()
    )
    expo = m.exposition()
    assert 'feast_serving_request_latency_seconds_bucket{le="0.05"' in expo
    assert "feast_serving_request_latency_seconds_count" in expo
    # Prometheus text format requires DOUBLE-QUOTED label values — an
    # unquoted value fails the whole scrape.
    assert (
        'feast_serving_grpc_request_count{method="getOnlineFeatures",'
        'status_code="OK"} 1' in expo
    )
    assert 'project="default"' in expo
    # latency _sum stays fractional in the latency-inclusive export
    # (int() would floor every sub-second total to 0)
    rows = {
        (r[0], r[1]): r[2] for r in m.as_rows(include_latency=True)
    }
    key = "method=getOnlineFeatures,project=default"
    assert rows[("request_latency_seconds_sum", key)] == pytest.approx(0.042)


def test_feature_table_count_distribution_counts_distinct_tables():
    m = ServingMetrics()
    m.observe_request("default", ["t1:a", "t1:b", "t2:c"], _rows([{}]))
    rows = dict(
        ((r[0], r[1]), r[2])
        for r in m.as_rows()
        if r[0] == "request_feature_table_count_distribution_bucket"
    )
    # 2 distinct tables → le=1 misses, le=2 hits
    assert rows[("request_feature_table_count_distribution_bucket",
                 "le=1,project=default")] == 0
    assert rows[("request_feature_table_count_distribution_bucket",
                 "le=2,project=default")] == 1


def test_serve_logged_populates_metrics(spark, sf_dir, tmp_store):
    from feast_java_old_spark.operators import materialize
    from feast_java_old_spark.plans.serving_json import serve_logged

    reg = Registry()
    reg.apply_entity(fs.Entity("user_id", fs.ValueType.INT64))
    reg.apply_feature_table(
        fs.FeatureTable(
            name="user_events",
            entities=["user_id"],
            features=[fs.Feature("value", fs.ValueType.DOUBLE)],
            max_age_secs=7 * 86400,
            batch_source=FileSource(
                file_url=f"{sf_dir}/events.parquet",
                event_timestamp_column="ts",
            ),
        )
    )
    materialize(spark, reg, "user_events", tmp_store)
    m = ServingMetrics()
    serve_logged(
        spark,
        reg,
        [{"user_id": 1}, {"user_id": 999_999}],
        ["user_events:value"],
        metrics=m,
        store_path=tmp_store,
        request_ts=dt.datetime(2024, 1, 31),
    )
    c = dict(m.counters)
    assert c[
        ("not_found_feature_count",
         "feature_name=user_events:value,project=default")
    ] == 1
    assert (
        "stale_feature_count",
        "feature_name=user_events:value,project=default",
    ) not in c
    assert c[("grpc_request_count", "method=getOnlineFeatures,status_code=OK")] == 1
    # error paths increment the gRPC counter with the MAPPED code:
    # unknown feature table → NOT_FOUND (KeyError), malformed ref →
    # INVALID_ARGUMENT (ValidationError) — never conflated (a store
    # outage must not read as client error on a dashboard)
    with pytest.raises(KeyError):
        serve_logged(
            spark, reg, [{"user_id": 1}], ["no:such;ref!"],
            metrics=m, store_path=tmp_store,
        )
    with pytest.raises(ValueError):
        serve_logged(
            spark, reg, [{"user_id": 1}], ["not_a_ref"],
            metrics=m, store_path=tmp_store,
        )
    assert dict(m.counters)[
        ("grpc_request_count",
         "method=getOnlineFeatures,status_code=NOT_FOUND")
    ] == 1
    assert dict(m.counters)[
        ("grpc_request_count",
         "method=getOnlineFeatures,status_code=INVALID_ARGUMENT")
    ] == 1
    # dataframe export round-trips the rows
    df = m.as_dataframe(spark)
    assert df.columns == ["metric", "labels", "value"]
    assert df.count() == len(m.as_rows())


def test_histogram_properties_hypothesis():
    """Prometheus-semantics invariants for ANY observation sequence:
    bucket counts cumulative (monotone in le), +Inf bucket == _count ==
    n observations, _sum == total."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=500), max_size=30),
    )
    def check(obs):
        m = ServingMetrics()
        for n in obs:
            m.observe(
                "request_entity_count_distribution",
                {"project": "p"},
                float(n),
            )
        h = m.histograms["request_entity_count_distribution"]
        if not obs:
            assert not h.n
            return
        counts = h.counts["project=p"]
        assert all(a <= b for a, b in zip(counts, counts[1:]))
        assert counts[-1] == len(obs) == h.n["project=p"]
        assert h.sums["project=p"] == sum(obs)
        # cumulative le semantics against a brute-force recount
        for i, b in enumerate(h.buckets):
            assert counts[i] == sum(1 for v in obs if v <= b)

    check()


def test_latency_inclusive_dataframe_export(spark):
    m = ServingMetrics()
    m.observe_request("default", ["t:f"], _rows([{}]), latency_s=0.042)
    df = m.as_dataframe(spark, include_latency=True)
    assert dict(df.dtypes)["value"] == "double"
    got = {
        (r.metric, r.labels): r.value
        for r in df.collect()
        if r.metric == "request_latency_seconds_sum"
    }
    key = "method=getOnlineFeatures,project=default"
    assert got[("request_latency_seconds_sum", key)] == pytest.approx(0.042)


def test_exposition_family_metadata_and_float_le():
    """ADVICE r9 metrics.py:241 — the scrape body must render bucket
    bounds the way the reference's Java client does (doubleToGoString:
    ``le="1.0"``, never ``le="1"``) and carry # HELP/# TYPE lines per
    family (OpenMetrics-strict scrapers reject untyped series)."""
    m = ServingMetrics()
    m.observe_request(
        "default",
        ["driver_stats:rating"],
        [{"statuses": {"rating": "PRESENT"}}],
        latency_s=0.03,
    )
    expo = m.exposition()
    assert '_entity_count_distribution_bucket{le="1.0",project="default"}' in expo
    assert 'le="1"' not in expo.replace('le="1.0"', "")
    assert "# TYPE feast_serving_grpc_request_count counter" in expo
    assert "# HELP feast_serving_grpc_request_count" in expo
    assert (
        "# TYPE feast_serving_request_entity_count_distribution histogram"
        in expo
    )
    # HELP/TYPE precede the family's first sample line
    lines = expo.splitlines()
    first_sample = next(
        i for i, ln in enumerate(lines)
        if ln.startswith("feast_serving_grpc_request_count{")
    )
    assert lines[first_sample - 1].startswith(
        "# TYPE feast_serving_grpc_request_count"
    )


def test_bucket_label_merge_recanonicalizes():
    """ADVICE r9 metrics.py:213 — ``le`` must merge into the label dict
    and re-sort, not string-prefix; a histogram labeled with a key
    sorting BEFORE 'le' (e.g. ``feature_name``) must still produce a
    canonically sorted label key."""
    from feast_java_old_spark.plans.metrics import _Histogram, _merge_le

    assert _merge_le("project=default", "1") == "le=1,project=default"
    assert (
        _merge_le("feature_name=f1", "5") == "feature_name=f1,le=5"
    )  # 'feature_name' < 'le': the old string-prefix would invert this
    assert _merge_le("", "+Inf") == "le=+Inf"

    m = ServingMetrics()
    m.histograms["by_feature"] = _Histogram((1, 5))
    m.observe("by_feature", {"feature_name": "f1"}, 3.0)
    keys = {lb for mt, lb, _ in m.as_rows() if mt == "by_feature_bucket"}
    assert keys == {
        "feature_name=f1,le=1",
        "feature_name=f1,le=5",
        "feature_name=f1,le=+Inf",
    }


def test_entity_count_comes_from_request_not_response():
    """ADVICE r9 metrics.py:151 — the reference observes the REQUEST's
    entity-row count; a response that dropped rows must not skew the
    histogram when the caller passes the request count."""
    m = ServingMetrics()
    m.observe_request(
        "default",
        ["t:f"],
        [{"statuses": {"f": "PRESENT"}}],  # 1 response row
        entity_count=7,                     # 7 requested entity rows
    )
    rows = dict(
        ((mt, lb), v) for mt, lb, v in m.as_rows()
        if mt == "request_entity_count_distribution_bucket"
    )
    b = "request_entity_count_distribution_bucket"
    assert rows[(b, "le=5,project=default")] == 0
    assert rows[(b, "le=10,project=default")] == 1


def test_core_resource_gauges_follow_registry(tmp_path):
    """FeastResourceCollector.java:46-54 parity: gauges computed FROM
    the registry at collect time; feature-table count includes
    soft-deleted rows (JPA count() counts flagged rows too)."""
    from feast_java_old_spark.plans.metrics import (
        core_exposition,
        core_resource_rows,
    )
    from feast_java_old_spark.registry.model import Entity, Feature, FeatureTable, Store, ValueType

    reg = Registry()
    assert core_resource_rows(reg) == [
        ("feast_core_feature_set_total", "", 0),
        ("feast_core_store_total", "", 0),
    ]
    reg.apply_entity(Entity("driver", ValueType.INT64))
    src = FileSource(file_url="/tmp/x.parquet", event_timestamp_column="ts")
    reg.apply_feature_table(
        FeatureTable(
            "driver_stats", entities=["driver"],
            features=[Feature("rating", ValueType.DOUBLE)], batch_source=src,
        )
    )
    reg.update_store(Store("online", "REDIS"))
    assert core_resource_rows(reg) == [
        ("feast_core_feature_set_total", "", 1),
        ("feast_core_store_total", "", 1),
    ]
    # soft delete keeps the row (JPA semantics)
    reg.delete_feature_table("driver_stats")
    assert core_resource_rows(reg)[0][2] == 1
    expo = core_exposition(reg)
    assert "# TYPE feast_core_feature_set_total gauge" in expo
    assert "feast_core_feature_set_total 1.0" in expo
    assert "feast_core_store_total 1.0" in expo


def test_jvm_resource_rows_and_exposition_deterministic():
    """JVMResourceCollector.java:31-75 parity, deterministic half:
    three memory gauges + per-collector GC summary, driven by an
    injected FakeRuntimeSource (the same environment-bound split as
    the auth providers' clock injection). GC SECONDS are wall-clock →
    excluded from the deterministic rows by the
    request_latency_seconds precedent, but always present in the
    scrape exposition as the summary's _sum."""
    from feast_java_old_spark.plans.metrics import (
        FakeRuntimeSource,
        jvm_resource_exposition,
        jvm_resource_rows,
    )

    rt = FakeRuntimeSource(
        max_bytes=4294967296,
        total_bytes=1073741824,
        free_bytes=268435456,
        gcs=[
            ("G1 Young Generation", 10, 0.25),
            ("G1 Old Generation", 2, 0.05),
        ],
    )
    assert jvm_resource_rows(rt) == [
        ("feast_core_free_memory_bytes", "", 268435456),
        ("feast_core_gc_collection_seconds_count", "gc=G1 Old Generation", 2),
        (
            "feast_core_gc_collection_seconds_count",
            "gc=G1 Young Generation",
            10,
        ),
        ("feast_core_max_memory_bytes", "", 4294967296),
        ("feast_core_total_memory_bytes", "", 1073741824),
    ]
    rows = jvm_resource_rows(rt, include_gc_seconds=True)
    assert (
        "feast_core_gc_collection_seconds_sum",
        "gc=G1 Young Generation",
        0.25,
    ) in rows
    expo = jvm_resource_exposition(rt)
    assert "# TYPE feast_core_max_memory_bytes gauge" in expo
    assert "# TYPE feast_core_gc_collection_seconds summary" in expo
    assert (
        "# HELP feast_core_gc_collection_seconds "
        "Time spent in a given JVM garbage collector in seconds" in expo
    )
    assert "feast_core_max_memory_bytes 4294967296.0" in expo
    # summary samples: label values double-quoted, count + float sum
    assert (
        'feast_core_gc_collection_seconds_count{gc="G1 Young Generation"} 10'
        in expo
    )
    assert (
        'feast_core_gc_collection_seconds_sum{gc="G1 Young Generation"} 0.25'
        in expo
    )


def test_jvm_runtime_source_reads_live_driver_jvm(spark):
    """The live half: the Spark driver IS a JVM — JvmRuntimeSource
    reads the same Runtime / GarbageCollectorMXBean beans the
    reference collector samples, through py4j. Invariants only
    (values are wall-clock): max >= total >= free > 0, at least one
    named collector with non-negative count and seconds."""
    from feast_java_old_spark.plans.metrics import (
        JvmRuntimeSource,
        core_exposition,
        jvm_resource_rows,
    )

    rt = JvmRuntimeSource(spark)
    mem = rt.memory_bytes()
    assert mem["max"] >= mem["total"] >= mem["free"] > 0
    gcs = rt.gc_collectors()
    assert gcs, "a running JVM always exposes at least one GC bean"
    for name, count, secs in gcs:
        assert name and count >= 0 and secs >= 0.0
    rows = dict((m, v) for m, _l, v in jvm_resource_rows(rt) if _l == "")
    assert rows["feast_core_max_memory_bytes"] == mem["max"]
    # one-endpoint parity: core_exposition(registry, runtime_source)
    # carries BOTH core collectors' families, like the reference's
    # single CollectorRegistry endpoint.
    expo = core_exposition(Registry(), rt)
    assert "# TYPE feast_core_feature_set_total gauge" in expo
    assert "# TYPE feast_core_gc_collection_seconds summary" in expo


def test_core_grpc_metrics_histogram_and_exposition():
    """GrpcMetrics.java:21-28 + MonitoringInterceptor.java:33-55 — the
    core request-latency histogram: (service, method, status_code)
    labels, Java-client default buckets, cumulative bucket counts,
    observed on close for success AND failure statuses."""
    from feast_java_old_spark.plans.metrics import CoreGrpcMetrics

    m = CoreGrpcMetrics()
    m.observe_call("ApplyEntity", "OK", 0.03)
    m.observe_call("ApplyEntity", "OK", 0.2)
    m.observe_call("GetFeatureTable", "NOT_FOUND", 0.001)
    expo = m.exposition()
    assert "# HELP feast_core_request_latency_seconds Request latency in seconds" in expo
    assert "# TYPE feast_core_request_latency_seconds histogram" in expo
    ok = 'method="ApplyEntity",service="feast.core.CoreService",status_code="OK"'
    # cumulative: 0.03 lands in le=0.05 and every wider bucket; 0.2 only
    # from le=0.25 up -> le="0.05" counts 1, le="0.25" counts 2.
    assert f'feast_core_request_latency_seconds_bucket{{le="0.05",{ok}}} 1' in expo
    assert f'feast_core_request_latency_seconds_bucket{{le="0.25",{ok}}} 2' in expo
    assert f'feast_core_request_latency_seconds_count{{{ok}}} 2' in expo
    nf = 'method="GetFeatureTable",service="feast.core.CoreService",status_code="NOT_FOUND"'
    assert f'feast_core_request_latency_seconds_count{{{nf}}} 1' in expo


def test_core_service_observes_latency_per_call():
    """The CoreService controller is the interceptor site: one OK call
    and one failing call each land one observation with the call's
    FINAL gRPC status; core_exposition(grpc_metrics=...) exports the
    family through the one endpoint."""
    import pytest as _pytest

    from feast_java_old_spark.plans.metrics import (
        CoreGrpcMetrics,
        core_exposition,
    )
    from feast_java_old_spark.registry.core_service import CoreService
    from feast_java_old_spark.registry.model import Entity, ValueType

    m = CoreGrpcMetrics()
    svc = CoreService(Registry(), metrics=m)
    svc.apply_entity(Entity("driver", ValueType.INT64))
    with _pytest.raises(KeyError):
        svc.get_feature_table("nope")
    expo = core_exposition(svc.registry, grpc_metrics=m)
    assert 'method="ApplyEntity"' in expo and 'status_code="OK"' in expo
    assert 'method="GetFeatureTable"' in expo and 'status_code="NOT_FOUND"' in expo
    # the same body still carries the resource gauges (one endpoint).
    assert "# TYPE feast_core_feature_set_total gauge" in expo
