"""The round driver's environment, emulated exactly.

Round 1 shipped six red CORRECTNESS rows that all passed the local
checker — both root causes were local-vs-driver environment splits
(a session conf pre-set locally but absent in the driver's session; a
DuckDB HUGEINT→float64 conversion masked by the %.9g value hash).

This test closes the class: a SUBPROCESS (fresh JVM, so no conf leaks
from the test session) runs every ``queries()`` entry under a plain
default-conf SparkSession and compares against DuckDB with the strict
dtype-kind gate (``scripts/check_correctness.py --driver``).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.mark.slow
def test_all_queries_pass_under_driver_like_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "check_correctness.py"),
            "--driver",
            SF_DIR,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1200,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"driver-like gate failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "ALL PASS" in proc.stdout
