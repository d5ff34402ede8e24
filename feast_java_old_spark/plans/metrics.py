"""Serving-runtime metrics — the reference's Prometheus surface.

Parity target: ``serving/src/main/java/feast/serving/util/Metrics.java``
(all eight instruments, same names / subsystem / label sets / buckets)
and their population sites in ``OnlineServingServiceV2.java:380-427``:

- ``request_latency_seconds{method, project}`` histogram
  (``GrpcMonitoringInterceptor.java:51``);
- ``request_entity_count_distribution{project}`` histogram,
  buckets (1, 2, 5, 10, 20, 50, 100, 200);
- ``request_feature_count_distribution{project}`` histogram,
  buckets (1, 2, 5, 10, 15, 20, 30, 50);
- ``request_feature_table_count_distribution{project}`` histogram,
  buckets (1, 2, 5, 10, 20) — distinct feature TABLES per request;
- ``request_feature_count{project, feature_name}`` counter — +1 per
  requested feature ref per request;
- ``not_found_feature_count{project, feature_name}`` /
  ``stale_feature_count{project, feature_name}`` counters — +1 per
  RESPONSE ROW whose field status is NOT_FOUND / OUTSIDE_MAX_AGE
  (``populateCountMetrics``);
- ``grpc_request_count{method, status_code}`` counter
  (``GrpcMonitoringInterceptor.java:54``).

Spark-first re-expression: instruments accumulate in-process (the
serving driver is the process, exactly like the reference's singleton
registry) and export two ways — :meth:`ServingMetrics.exposition` (the
Prometheus text format, scrape-compatible) and
:meth:`ServingMetrics.as_dataframe` (one flat relation, so fleet-wide
metric rollups run on the same engine as the features). Histograms
follow Prometheus semantics: CUMULATIVE ``_bucket{le=...}`` counts plus
``_count`` and ``_sum`` series.

``request_latency_seconds`` is wall-clock and therefore excluded from
:meth:`as_rows`'s deterministic view (``include_latency=False``
default) — the correctness gate compares everything else value-for-
value against a SQL oracle; latency is scrape-only by nature.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Optional, Sequence

SUBSYSTEM = "feast_serving"

ENTITY_COUNT_BUCKETS = (1, 2, 5, 10, 20, 50, 100, 200)
FEATURE_COUNT_BUCKETS = (1, 2, 5, 10, 15, 20, 30, 50)
FEATURE_TABLE_COUNT_BUCKETS = (1, 2, 5, 10, 20)
# Prometheus client default buckets (Histogram.build() with no
# .buckets(...) — what requestLatency uses in the reference).
LATENCY_BUCKETS = (
    0.005, 0.01, 0.025, 0.05, 0.075, 0.1, 0.25, 0.5, 0.75,
    1.0, 2.5, 5.0, 7.5, 10.0,
)


def _labels_key(labels: dict[str, str]) -> str:
    """Canonical label string: sorted ``k=v`` joined by ``,`` — one
    deterministic flat column instead of a map (gate outputs must be
    scalar-sortable)."""
    return ",".join(f"{k}={labels[k]}" for k in sorted(labels))


def _merge_le(key: str, le: str) -> str:
    """Merge an ``le`` bucket boundary into an existing canonical label
    key and RE-canonicalize (sort by label name). String-prefixing
    ``le=...`` onto the key preserved sorted order only by luck —
    ``'le'`` happens to sort before every current label name
    (``method``/``project``) — and would silently break the canonical-
    label invariant for any future histogram labeled with a key sorting
    before ``'le'`` (e.g. ``feature_name``)."""
    labels = {"le": le}
    if key:
        for kv in key.split(","):
            k, _, v = kv.partition("=")
            labels[k] = v
    return _labels_key(labels)


# Prometheus family metadata for the text exposition: TYPE per family
# (OpenMetrics-strict scrapers reject untyped series) and a HELP line.
# Counter/histogram split mirrors Metrics.java's instrument kinds.
_FAMILY_META = {
    "request_feature_count": ("counter", "Count of feature requests"),
    "not_found_feature_count": (
        "counter",
        "Count of not found feature requests",
    ),
    "stale_feature_count": ("counter", "Count of stale feature requests"),
    "grpc_request_count": ("counter", "Number of gRPC requests served"),
    "request_latency_seconds": (
        "histogram",
        "Feast serving latency in seconds",
    ),
    "request_entity_count_distribution": (
        "histogram",
        "Number of entity rows per request",
    ),
    "request_feature_count_distribution": (
        "histogram",
        "Number of feature rows per request",
    ),
    "request_feature_table_count_distribution": (
        "histogram",
        "Number of feature tables per request",
    ),
}


def _prom_le(b) -> str:
    """Bucket boundary rendered the way the reference's Java Prometheus
    client does (``doubleToGoString``): always a float literal —
    ``le="1.0"``, never ``le="1"`` — so series labels match dashboards
    and recording rules built against the reference's exposition."""
    return str(float(b))


def _prom_labels(key: str) -> str:
    """Re-render a canonical ``k=v,k=v`` label key as the Prometheus
    TEXT-format label body — values must be double-quoted
    (``k="v",k="v"``) or the scrape parser rejects the whole exposition.
    Label values in this registry (projects, feature refs, methods,
    status codes, ``le`` boundaries) never contain ``,`` or ``=``."""
    if not key:
        return ""
    parts = []
    for kv in key.split(","):
        k, _, v = kv.partition("=")
        parts.append(f'{k}="{v}"')
    return ",".join(parts)


class _Histogram:
    def __init__(self, buckets: Sequence[float]):
        self.buckets = tuple(buckets)
        self.counts: dict[str, list[int]] = defaultdict(
            lambda: [0] * (len(self.buckets) + 1)
        )
        self.sums: dict[str, float] = defaultdict(float)
        self.n: dict[str, int] = defaultdict(int)

    def observe(self, labels: dict[str, str], value: float) -> None:
        key = _labels_key(labels)
        row = self.counts[key]
        for i, b in enumerate(self.buckets):
            if value <= b:
                row[i] += 1
        row[-1] += 1  # +Inf
        self.sums[key] += value
        self.n[key] += 1


CORE_SUBSYSTEM = "feast_core"

_CORE_GAUGE_META = {
    "feast_core_feature_set_total": (
        "gauge",
        "Total number of registered feature tables",
    ),
    "feast_core_store_total": ("gauge", "Total number of registered stores"),
}


def core_resource_rows(registry) -> list[tuple]:
    """Core resource gauges — parity with
    ``core/src/main/java/feast/core/metrics/collector/
    FeastResourceCollector.java:46-54``: ``feast_core_feature_set_total``
    (total registered feature tables) and ``feast_core_store_total``
    (total registered stores), computed FROM the registry at collect
    time (the reference is a custom Prometheus ``Collector`` reading
    repository counts per scrape, not an incremented counter).

    The reference's ``featureTableRepository.count()`` is a JPA row
    count, which includes soft-DELETED tables (deletion flips a column,
    the row stays) — matched here by counting every ``_tables`` entry
    across all projects. Returns the same flat ``(metric, labels,
    value)`` rows as :meth:`ServingMetrics.as_rows` so both surfaces
    union into one relation."""
    n_tables = len(registry._tables)
    n_stores = len(registry._stores)
    return [
        ("feast_core_feature_set_total", "", int(n_tables)),
        ("feast_core_store_total", "", int(n_stores)),
    ]


def core_resource_dataframe(spark, registry):
    """Gauge rows as a DataFrame (same schema as the deterministic
    :meth:`ServingMetrics.as_dataframe` export, union-compatible)."""
    from feast_java_old_spark.sources.tables import arrow_local_frame

    return arrow_local_frame(
        spark,
        core_resource_rows(registry),
        "metric string, labels string, value long",
    )


def core_exposition(registry, runtime_source=None, grpc_metrics=None) -> str:
    """Prometheus text exposition for the core gauges (the reference
    exports them through the same registry endpoint as the serving
    instruments, namespaced ``feast_core_*`` with no subsystem
    prefixing — the collector passes full metric names).

    The reference registers BOTH core collectors
    (``FeastResourceCollector`` and ``JVMResourceCollector``) in the
    one endpoint's registry — pass ``runtime_source`` (a
    :class:`JvmRuntimeSource` or fake) to append the JVM families and
    scrape the complete ``feast_core_*`` surface in one body."""
    lines = []
    for metric, _labels, v in core_resource_rows(registry):
        kind, help_text = _CORE_GAUGE_META[metric]
        lines.append(f"# HELP {metric} {help_text}")
        lines.append(f"# TYPE {metric} {kind}")
        lines.append(f"{metric} {float(v)}")
    body = "\n".join(lines) + "\n"
    if runtime_source is not None:
        body += jvm_resource_exposition(runtime_source)
    if grpc_metrics is not None:
        # MonitoringConfig.java registers the interceptor's histogram in
        # the same default registry the two collectors export through.
        body += grpc_metrics.exposition()
    return body


# io.prometheus.client.Histogram.build() defaults — GrpcMetrics.java
# registers feast_core_request_latency_seconds without custom buckets.
GRPC_DEFAULT_BUCKETS = (
    0.005, 0.01, 0.025, 0.05, 0.075, 0.1, 0.25, 0.5, 0.75,
    1.0, 2.5, 5.0, 7.5, 10.0,
)

CORE_GRPC_SERVICE = "feast.core.CoreService"


class CoreGrpcMetrics:
    """``GrpcMetrics.java:21-28`` + ``MonitoringInterceptor.java:33-55``:
    the core module's one gRPC instrument — a request-latency histogram
    labeled ``(service, method, status_code)``, observed when each call
    CLOSES (success and failure alike; the interceptor's
    ``SimpleForwardingServerCall.close`` fires on every status).

    The reference's interceptor derives service/method from the gRPC
    method descriptor; here the :class:`~feast_java_old_spark.registry.
    core_service.CoreService` controller passes its method name and the
    call's final gRPC status code."""

    NAME = "feast_core_request_latency_seconds"
    HELP = "Request latency in seconds"

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._h = _Histogram(GRPC_DEFAULT_BUCKETS)

    def observe_call(
        self,
        method: str,
        status_code: str,
        latency_s: float,
        service: str = CORE_GRPC_SERVICE,
    ) -> None:
        with self._lock:
            self._h.observe(
                {
                    "service": service,
                    "method": method,
                    "status_code": status_code,
                },
                latency_s,
            )

    def exposition(self) -> str:
        """Scrape-format body for the one family — full metric name (no
        subsystem prefixing, like the other ``feast_core_*`` families),
        Java-client float ``le`` labels, cumulative buckets."""
        lines = [
            f"# HELP {self.NAME} {self.HELP}",
            f"# TYPE {self.NAME} histogram",
        ]
        with self._lock:
            for key in sorted(self._h.n):
                pkey = _prom_labels(key)
                les = [_prom_le(b) for b in self._h.buckets] + ["+Inf"]
                for le, c in zip(les, self._h.counts[key]):
                    lbl = _prom_labels(_merge_le(key, le))
                    lines.append(f"{self.NAME}_bucket{{{lbl}}} {c}")
                lines.append(f"{self.NAME}_count{{{pkey}}} {self._h.n[key]}")
                lines.append(f"{self.NAME}_sum{{{pkey}}} {self._h.sums[key]}")
        return "\n".join(lines) + "\n"


_JVM_GAUGE_META = {
    "feast_core_max_memory_bytes": (
        "gauge",
        "Max amount of memory the Java virtual machine will attempt to use",
    ),
    "feast_core_total_memory_bytes": (
        "gauge",
        "Total amount of memory in the Java virtual machine",
    ),
    "feast_core_free_memory_bytes": (
        "gauge",
        "Total amount of free memory in the Java virtual machine",
    ),
    "feast_core_gc_collection_seconds": (
        "summary",
        "Time spent in a given JVM garbage collector in seconds",
    ),
}


class JvmRuntimeSource:
    """Live JVM readings — parity with ``core/src/main/java/feast/core/
    metrics/collector/JVMResourceCollector.java:31-75``.

    The serving driver here IS a JVM (Spark's driver process, reached
    through py4j), so this is a direct port, not an analog: the same
    ``Runtime`` memory readings and the same
    ``ManagementFactory.getGarbageCollectorMXBeans()`` summary the
    reference collector samples per scrape. Deterministic tests and the
    correctness gate inject :class:`FakeRuntimeSource` instead — the
    same environment-bound split as the authorization providers."""

    def __init__(self, spark) -> None:
        self._jvm = spark._jvm

    def memory_bytes(self) -> dict[str, int]:
        rt = self._jvm.java.lang.Runtime.getRuntime()
        return {
            "max": int(rt.maxMemory()),
            "total": int(rt.totalMemory()),
            "free": int(rt.freeMemory()),
        }

    def gc_collectors(self) -> list[tuple[str, int, float]]:
        """``(name, collection_count, collection_seconds)`` per
        collector — ``getCollectionTime()`` is milliseconds, divided by
        1000 exactly as ``JVMResourceCollector.collect`` does."""
        mf = self._jvm.java.lang.management.ManagementFactory
        out = []
        for gc in mf.getGarbageCollectorMXBeans():
            out.append(
                (
                    str(gc.getName()),
                    int(gc.getCollectionCount()),
                    float(gc.getCollectionTime()) / 1000.0,
                )
            )
        return out


class FakeRuntimeSource:
    """Injectable constant readings for deterministic tests/gates."""

    def __init__(
        self,
        max_bytes: int,
        total_bytes: int,
        free_bytes: int,
        gcs: Sequence[tuple[str, int, float]],
    ) -> None:
        self._mem = {
            "max": int(max_bytes),
            "total": int(total_bytes),
            "free": int(free_bytes),
        }
        self._gcs = [(str(n), int(c), float(s)) for n, c, s in gcs]

    def memory_bytes(self) -> dict[str, int]:
        return dict(self._mem)

    def gc_collectors(self) -> list[tuple[str, int, float]]:
        return list(self._gcs)


def jvm_resource_rows(
    runtime_source, include_gc_seconds: bool = False
) -> list[tuple]:
    """Flat ``(metric, labels, value)`` rows for the JVM collector —
    the three memory gauges plus per-collector GC counts.

    ``feast_core_gc_collection_seconds_sum`` is wall-clock and
    therefore EXCLUDED from the deterministic view by default — the
    same contract as ``request_latency_seconds`` in
    :meth:`ServingMetrics.as_rows`; the full summary (count + float
    seconds sum) always appears in :func:`jvm_resource_exposition`,
    the scrape-facing surface."""
    mem = runtime_source.memory_bytes()
    rows: list[tuple] = [
        ("feast_core_max_memory_bytes", "", int(mem["max"])),
        ("feast_core_total_memory_bytes", "", int(mem["total"])),
        ("feast_core_free_memory_bytes", "", int(mem["free"])),
    ]
    for name, count, secs in runtime_source.gc_collectors():
        rows.append(
            ("feast_core_gc_collection_seconds_count", f"gc={name}", int(count))
        )
        if include_gc_seconds:
            rows.append(
                ("feast_core_gc_collection_seconds_sum", f"gc={name}", float(secs))
            )
    return sorted(rows)


def jvm_resource_dataframe(spark, runtime_source):
    """Deterministic JVM gauge rows as a DataFrame — same
    ``(metric, labels, value long)`` schema as the other metric
    exports, so all three collector surfaces union into one relation."""
    from feast_java_old_spark.sources.tables import arrow_local_frame

    return arrow_local_frame(
        spark,
        jvm_resource_rows(runtime_source),
        "metric string, labels string, value long",
    )


def jvm_resource_exposition(runtime_source) -> str:
    """Prometheus text exposition for the JVM collector: three gauges
    plus the ``feast_core_gc_collection_seconds`` SUMMARY (per-``gc``
    ``_count``/``_sum`` sample pairs — ``SummaryMetricFamily.addMetric``
    emits exactly those two series per collector)."""
    mem = runtime_source.memory_bytes()
    lines = []
    for metric, v in (
        ("feast_core_max_memory_bytes", mem["max"]),
        ("feast_core_total_memory_bytes", mem["total"]),
        ("feast_core_free_memory_bytes", mem["free"]),
    ):
        kind, help_text = _JVM_GAUGE_META[metric]
        lines.append(f"# HELP {metric} {help_text}")
        lines.append(f"# TYPE {metric} {kind}")
        lines.append(f"{metric} {float(v)}")
    kind, help_text = _JVM_GAUGE_META["feast_core_gc_collection_seconds"]
    lines.append(f"# HELP feast_core_gc_collection_seconds {help_text}")
    lines.append(f"# TYPE feast_core_gc_collection_seconds {kind}")
    for name, count, secs in runtime_source.gc_collectors():
        lines.append(
            f'feast_core_gc_collection_seconds_count{{gc="{name}"}} {count}'
        )
        lines.append(
            f'feast_core_gc_collection_seconds_sum{{gc="{name}"}} {secs}'
        )
    return "\n".join(lines) + "\n"


class ServingMetrics:
    """In-process instrument registry (one per serving driver)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[tuple[str, str], int] = defaultdict(int)
        self.histograms: dict[str, _Histogram] = {
            "request_latency_seconds": _Histogram(LATENCY_BUCKETS),
            "request_entity_count_distribution": _Histogram(
                ENTITY_COUNT_BUCKETS
            ),
            "request_feature_count_distribution": _Histogram(
                FEATURE_COUNT_BUCKETS
            ),
            "request_feature_table_count_distribution": _Histogram(
                FEATURE_TABLE_COUNT_BUCKETS
            ),
        }

    # ------------------------------------------------------ instruments

    def inc(self, metric: str, labels: dict[str, str], by: int = 1) -> None:
        with self._lock:
            self.counters[(metric, _labels_key(labels))] += by

    def observe(
        self, metric: str, labels: dict[str, str], value: float
    ) -> None:
        with self._lock:
            self.histograms[metric].observe(labels, value)

    # ------------------------------------------------- the serving hook

    def observe_request(
        self,
        project: str,
        feature_refs: Sequence[str],
        response_rows: Sequence[dict],
        method: str = "getOnlineFeatures",
        status_code: str = "OK",
        latency_s: Optional[float] = None,
        entity_count: Optional[int] = None,
    ) -> None:
        """One ``getOnlineFeatures`` call → every instrument the
        reference populates (``populateHistogramMetrics`` +
        ``populateCountMetrics`` + ``populateFeatureCountMetrics`` +
        the gRPC interceptor pair).

        ``entity_count`` is the REQUEST's entity-row count — the value
        the reference observes (``populateHistogramMetrics`` reads
        ``request.getEntityRowsCount()``). Callers that know it
        (``serve_logged`` computes it as ``n_req``) must pass it;
        ``len(response_rows)`` is only a fallback, correct solely
        because today's serving path returns exactly one row per entity
        row — a path that drops or expands rows would silently skew the
        histogram."""
        refs = [str(r) for r in feature_refs]
        tables = {r.partition(":")[0] for r in refs}
        self.observe(
            "request_entity_count_distribution",
            {"project": project},
            float(
                entity_count
                if entity_count is not None
                else len(response_rows)
            ),
        )
        self.observe(
            "request_feature_count_distribution",
            {"project": project},
            float(len(refs)),
        )
        self.observe(
            "request_feature_table_count_distribution",
            {"project": project},
            float(len(tables)),
        )
        for ref in refs:
            self.inc(
                "request_feature_count",
                {"project": project, "feature_name": ref},
            )
        for row in response_rows:
            statuses = row.get("statuses", {})
            for ref in refs:
                bare = ref.partition(":")[2]
                st = statuses.get(ref, statuses.get(bare))
                if st == "NOT_FOUND":
                    self.inc(
                        "not_found_feature_count",
                        {"project": project, "feature_name": ref},
                    )
                elif st == "OUTSIDE_MAX_AGE":
                    self.inc(
                        "stale_feature_count",
                        {"project": project, "feature_name": ref},
                    )
        self.inc(
            "grpc_request_count",
            {"method": method, "status_code": status_code},
        )
        if latency_s is not None:
            self.observe(
                "request_latency_seconds",
                {"method": method, "project": project},
                float(latency_s),
            )

    # ------------------------------------------------------------ export

    def as_rows(self, include_latency: bool = False) -> list[tuple]:
        """Flat (metric, labels, value) rows. Histograms expand to
        Prometheus-semantic series: cumulative ``_bucket`` rows keyed
        by ``le``, plus ``_count`` and ``_sum``. ``_sum`` is emitted as
        an integer (every deterministic instrument observes integer
        values); latency is excluded unless asked for."""
        out: list[tuple] = []
        with self._lock:
            for (metric, labels), v in self.counters.items():
                out.append((metric, labels, int(v)))
            for name, h in self.histograms.items():
                latency = name == "request_latency_seconds"
                if latency and not include_latency:
                    continue
                for key in h.n:
                    # as_rows keeps the frozen-at-r9 `le=1` integer
                    # rendering (the gate's oracle VALUES rows hash
                    # against it); the Prometheus float form lives in
                    # exposition(), the only scrape-facing surface.
                    les = [str(b) for b in h.buckets] + ["+Inf"]
                    for le, c in zip(les, h.counts[key]):
                        out.append(
                            (f"{name}_bucket", _merge_le(key, le), int(c))
                        )
                    out.append((f"{name}_count", key, int(h.n[key])))
                    # latency sums are sub-second floats — int() would
                    # floor every total under 1s to 0 and corrupt
                    # mean = _sum/_count; the three deterministic
                    # request-shape histograms observe integers only.
                    s = h.sums[key]
                    out.append(
                        (f"{name}_sum", key, float(s) if latency else int(s))
                    )
        return sorted(out)

    def as_dataframe(self, spark, include_latency: bool = False):
        """``value`` stays BIGINT for the deterministic export (what
        the gate hashes); the latency-inclusive export carries a
        fractional ``_sum``, so it widens to DOUBLE — and every value
        is coerced to float for that schema (DoubleType rejects raw
        Python ints at createDataFrame)."""
        from feast_java_old_spark.sources.tables import arrow_local_frame

        rows = self.as_rows(include_latency=include_latency)
        if include_latency:
            rows = [(m, lb, float(v)) for m, lb, v in rows]
        return arrow_local_frame(
            spark,
            rows,
            "metric string, labels string, value "
            + ("double" if include_latency else "long"),
        )

    def exposition(self) -> str:
        """Prometheus text exposition (scrape format), full-precision
        sums and latency included — the ``/metrics`` endpoint body.

        Family metadata (``# HELP`` / ``# TYPE``) precedes each family's
        samples and bucket boundaries render as float literals
        (``le="1.0"``), both matching the reference's Java client
        output — dashboards and recording rules built against the
        reference's series carry over unchanged, and OpenMetrics-strict
        scrapers get typed series."""
        lines = []

        def _meta(metric: str) -> None:
            kind, help_text = _FAMILY_META.get(metric, ("untyped", metric))
            lines.append(f"# HELP {SUBSYSTEM}_{metric} {help_text}")
            lines.append(f"# TYPE {SUBSYSTEM}_{metric} {kind}")

        with self._lock:
            seen: set[str] = set()
            for (metric, labels), v in sorted(self.counters.items()):
                if metric not in seen:
                    seen.add(metric)
                    _meta(metric)
                lines.append(
                    f"{SUBSYSTEM}_{metric}{{{_prom_labels(labels)}}} {v}"
                )
            for name, h in sorted(self.histograms.items()):
                if not h.n:
                    continue
                _meta(name)
                for key in sorted(h.n):
                    pkey = _prom_labels(key)
                    les = [_prom_le(b) for b in h.buckets] + ["+Inf"]
                    for le, c in zip(les, h.counts[key]):
                        lbl = _prom_labels(_merge_le(key, le))
                        lines.append(
                            f"{SUBSYSTEM}_{name}_bucket{{{lbl}}} {c}"
                        )
                    lines.append(
                        f"{SUBSYSTEM}_{name}_count{{{pkey}}} {h.n[key]}"
                    )
                    lines.append(
                        f"{SUBSYSTEM}_{name}_sum{{{pkey}}} {h.sums[key]}"
                    )
        return "\n".join(lines) + "\n"
