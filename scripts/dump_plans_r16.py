#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/r16/.

Usage: python scripts/dump_plans_r16.py before q1 [q2 ...]
       python scripts/dump_plans_r16.py after  q1 [q2 ...]

Writes plans/r16/<query>_<tag>.txt — the optimization-round evidence
files (the judge checks plan claims against these). Uses the same
session shape as bench.py. Pure diagnostics; never writes bench
artifacts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    spark = bench._build_session()
    import __spark_entry__ as e

    qs = e.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
