"""Bounded spec cache with periodic refresh (A4).

Parity target: ``serving/src/main/java/feast/serving/specs/
CachedSpecService.java:43,63-113`` — a serving-side LoadingCache over
feature-table specs, bounded at ``MAX_SPEC_COUNT = 1000`` entries, bulk
``populateCache()`` on a schedule (the reference default is 10 s via
``SpecServiceConfig``), with per-key load-on-miss between refreshes.

Spark-first re-expression: the serving "core" here is a file-backed
:class:`Registry`; instead of a gRPC re-fetch the refresh re-stats the
registry JSON and reloads only when its mtime changed. Reads between
refresh ticks may serve specs up to ``refresh_interval_secs`` stale —
exactly the reference's staleness contract.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import Callable, Optional

from feast_java_old_spark.registry.model import FeatureTable
from feast_java_old_spark.registry.registry import DEFAULT_PROJECT, Registry

MAX_SPEC_COUNT = 1000  # CachedSpecService.java:43


class CachedSpecService:
    """LRU-bounded feature-table spec cache over a :class:`Registry`.

    ``clock`` is injectable for deterministic tests; it must be a
    monotonic seconds counter.
    """

    def __init__(
        self,
        registry: Optional[Registry] = None,
        path: Optional[str] = None,
        max_spec_count: int = MAX_SPEC_COUNT,
        refresh_interval_secs: float = 10.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        if registry is None and path is None:
            raise ValueError("need a Registry or a registry file path")
        self._registry = registry if registry is not None else Registry(path)
        self._path = path if path is not None else self._registry.path
        self.max_spec_count = max_spec_count
        self.refresh_interval_secs = refresh_interval_secs
        self._clock = clock
        self._cache: OrderedDict[tuple[str, str], FeatureTable] = OrderedDict()
        self._last_refresh_check = clock()
        self._mtime = self._stat_mtime()
        self.refresh_count = 0

    # -------------------------------------------------------------- refresh

    def _stat_mtime(self) -> Optional[float]:
        if self._path and os.path.exists(self._path):
            return os.stat(self._path).st_mtime
        return None

    def _maybe_refresh(self) -> None:
        now = self._clock()
        if now - self._last_refresh_check < self.refresh_interval_secs:
            return
        self._last_refresh_check = now
        mtime = self._stat_mtime()
        if mtime is not None and mtime != self._mtime:
            self._mtime = mtime
            self._registry = Registry(self._path)
            self._cache.clear()
            self.refresh_count += 1

    def populate_cache(self) -> int:
        """Bulk preload (``CachedSpecService.populateCache:88-106``):
        invalidate everything and load every live table, newest-applied
        last so the LRU keeps the most recently listed under the bound.
        Returns the number of cached specs."""
        self._registry = Registry(self._path) if self._path else self._registry
        self._mtime = self._stat_mtime()
        self._last_refresh_check = self._clock()
        self._cache.clear()
        for project in [p.name for p in self._registry.list_projects()]:
            for t in self._registry.list_feature_tables(project):
                self._put((project, t.name), t)
        self.refresh_count += 1
        return len(self._cache)

    # ----------------------------------------------------------------- get

    def _put(self, key: tuple[str, str], spec: FeatureTable) -> None:
        self._cache[key] = spec
        self._cache.move_to_end(key)
        while len(self._cache) > self.max_spec_count:
            self._cache.popitem(last=False)

    def get_feature_table(
        self, name: str, project: str = DEFAULT_PROJECT
    ) -> FeatureTable:
        """Load-on-miss with LRU recency; raises KeyError for unknown or
        soft-deleted tables (same contract as :class:`Registry`)."""
        self._maybe_refresh()
        key = (project, name)
        spec = self._cache.get(key)
        if spec is not None:
            self._cache.move_to_end(key)
            return spec
        spec = self._registry.get_feature_table(name, project)
        self._put(key, spec)
        return spec

    # Delegate the rest of the read-side Registry surface so a
    # CachedSpecService can stand in for a Registry in retrieval paths
    # (get_online_features only calls get_feature_table at plan time).
    def __getattr__(self, item):
        return getattr(self._registry, item)

    def __len__(self) -> int:
        return len(self._cache)
