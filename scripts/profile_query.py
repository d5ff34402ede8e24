#!/usr/bin/env python
"""Per-stage profile of one or more bench queries (guide §1/§7).

Builds the SAME session the bench harness uses (plus the UI, so the
/api/v1 REST endpoints are live), warms the JVM exactly like bench.py,
then for each named query: clears the listener backlog, runs the query
into the noop sink, and dumps the completed stages' wall-clock,
task counts and shuffle bytes, plus the job list. Pure diagnostics —
never writes bench artifacts.

Usage: python scripts/profile_query.py q1 [q2 ...]
       SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as for bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import bench
    from feast_java_old_spark.sources.tables import session_builder

    spark = session_builder(
        "profile",
        master=f"local[{cpus}]",
        **{
            "spark.sql.shuffle.partitions": str(max(int(cpus), 16)),
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "spark.ui.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
        },
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm(spark, sf_dir)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    import __spark_entry__ as e

    qs = e.queries()
    for name in sys.argv[1:]:
        jobs_before = {j["jobId"] for j in _get(base, "/jobs")}
        stages_before = {
            (s["stageId"], s["attemptId"]) for s in _get(base, "/stages")
        }
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in _get(base, "/jobs") if j["jobId"] not in jobs_before]
        stages = [
            s
            for s in _get(base, "/stages")
            if (s["stageId"], s["attemptId"]) not in stages_before
        ]
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stages)} stages ===")
        tot_task_ms = 0
        rows = []
        for s in sorted(stages, key=lambda s: s["stageId"]):
            if s["status"] not in ("COMPLETE", "FAILED"):
                continue
            dur = (s.get("executorRunTime") or 0)
            tot_task_ms += dur
            sub = s.get("firstTaskLaunchedTime")
            comp = s.get("completionTime")
            wall_ms = ""
            if sub and comp:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    wall_ms = round(
                        (
                            datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                            - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                        ).total_seconds()
                        * 1000
                    )
                except Exception:
                    wall_ms = ""
            rows.append(
                (
                    s["stageId"],
                    wall_ms,
                    dur,
                    s["numCompleteTasks"],
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    (s.get("name") or "")[:70],
                )
            )
        print(f"{'stage':>5} {'wall_ms':>8} {'task_ms':>8} {'tasks':>5} "
              f"{'shufR':>9} {'shufW':>9}  name")
        for r in rows:
            print(f"{r[0]:>5} {str(r[1]):>8} {r[2]:>8} {r[3]:>5} "
                  f"{r[4]:>9} {r[5]:>9}  {r[6]}")
        print(f"total executorRunTime: {tot_task_ms} ms across "
              f"{len(rows)} completed stages; wall {wall:.3f}s")


if __name__ == "__main__":
    main()
