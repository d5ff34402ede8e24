"""Round-close tooling guards (no Spark needed).

The r13 close lost a gen_scaling cycle when a plain `python bench.py`
run clobbered the best-of-2 BENCH_DETAIL composite before the freeze
(docs/REGRESSION.md r13 "procedure note"). The ordering rule is now
mechanical: the canonical writer fingerprints what it wrote, and
freeze_baseline refuses on any mismatch.
"""

import json

import pytest

import bench


def _detail(total=1.23):
    return {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"q1": total},
        "best_of": 2,
    }


def test_freeze_accepts_untouched_canonical_detail(tmp_path):
    repo = str(tmp_path)
    bench.write_canonical_detail(_detail(), repo)
    bench.freeze_baseline(repo)
    frozen = json.loads((tmp_path / "BENCH_BASELINE.json").read_text())
    assert frozen["value"] == 1.23 and frozen["best_of"] == 2


def test_freeze_refuses_clobbered_detail(tmp_path):
    """The r13 incident, replayed: gen_scaling writes the composite,
    a later single-shot bench run overwrites BENCH_DETAIL.json (but
    not the fingerprint), freeze must refuse loudly."""
    repo = str(tmp_path)
    bench.write_canonical_detail(_detail(), repo)
    # a plain bench.py run writes only the JSON, like bench.py main()
    clobber = _detail(total=9.99)
    clobber.pop("best_of")
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps(clobber, indent=1, sort_keys=True)
    )
    with pytest.raises(RuntimeError, match="fingerprint mismatch"):
        bench.freeze_baseline(repo)
    assert not (tmp_path / "BENCH_BASELINE.json").exists()


def test_freeze_refuses_without_fingerprint(tmp_path):
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps(_detail(), indent=1, sort_keys=True)
    )
    with pytest.raises(RuntimeError, match="no BENCH_DETAIL.sha256"):
        bench.freeze_baseline(str(tmp_path))


def test_sdk_query_in_headline_and_gate_window_front():
    """The r14 budgeted registration: sdk_online_features leads the
    50-query gate window and joins the bench headline."""
    import __spark_entry__ as e

    names = list(e.queries().keys())
    window = names[:50]
    assert window[0] == "sdk_online_features"
    assert window[1:4] == ["weighted_sample", "skew_join", "ewma_features"]
    assert "sdk_online_features" in bench.HEADLINE
    assert "sdk_online_features" in e.oracle_sql()
