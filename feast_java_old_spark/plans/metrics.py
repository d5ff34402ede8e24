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
    ) -> None:
        """One ``getOnlineFeatures`` call → every instrument the
        reference populates (``populateHistogramMetrics`` +
        ``populateCountMetrics`` + ``populateFeatureCountMetrics`` +
        the gRPC interceptor pair)."""
        refs = [str(r) for r in feature_refs]
        tables = {r.partition(":")[0] for r in refs}
        self.observe(
            "request_entity_count_distribution",
            {"project": project},
            float(len(response_rows)),
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
                    les = [str(b) for b in h.buckets] + ["+Inf"]
                    for le, c in zip(les, h.counts[key]):
                        lbl = f"le={le},{key}" if key else f"le={le}"
                        out.append((f"{name}_bucket", lbl, int(c)))
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
        rows = self.as_rows(include_latency=include_latency)
        if include_latency:
            rows = [(m, lb, float(v)) for m, lb, v in rows]
        return spark.createDataFrame(
            rows,
            "metric string, labels string, value "
            + ("double" if include_latency else "long"),
        )

    def exposition(self) -> str:
        """Prometheus text exposition (scrape format), full-precision
        sums and latency included — the ``/metrics`` endpoint body."""
        lines = []
        with self._lock:
            for (metric, labels), v in sorted(self.counters.items()):
                lines.append(
                    f"{SUBSYSTEM}_{metric}{{{_prom_labels(labels)}}} {v}"
                )
            for name, h in sorted(self.histograms.items()):
                for key in sorted(h.n):
                    pkey = _prom_labels(key)
                    les = [str(b) for b in h.buckets] + ["+Inf"]
                    for le, c in zip(les, h.counts[key]):
                        lbl = f'le="{le}",{pkey}' if pkey else f'le="{le}"'
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
