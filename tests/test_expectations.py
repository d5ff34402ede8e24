"""Deequ-style expectations suite: metric math, null/vacuous handling,
thresholds, referential integrity."""

import pytest
from pyspark.sql import functions as F

from feast_java_old_spark.operators import expectations as ex


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "AA-1"),
            (2, "b", 20.0, "BB-2"),
            (2, None, 300.0, "cc-3"),
            (4, "a", None, "DD-4"),
        ],
        "id long, cat string, val double, code string",
    )


def _by_check(rows):
    return {r.check: r for r in rows}


def test_row_local_metrics(tbl):
    out = _by_check(
        ex.run_checks(
            tbl,
            [
                ex.completeness("cat", threshold=0.8),
                ex.uniqueness("id"),
                ex.in_range("val", 0.0, 100.0, threshold=0.5),
                ex.accepted_values("cat", ["a", "b"]),
                ex.matches_regex("code", r"^[A-Z]{2}-[0-9]$", threshold=0.7),
            ],
        ).collect()
    )
    # 3 of 4 cat values non-null
    assert out["completeness(cat)"].metric == 0.75
    assert out["completeness(cat)"].passed == 0
    # 3 distinct ids over 4 rows
    assert out["uniqueness(id)"].metric == 0.75 and out["uniqueness(id)"].passed == 0
    # compliance among NON-NULL vals: 2/3 in [0,100]
    assert out["in_range(val)"].metric == round(2 / 3, 6)
    assert out["in_range(val)"].passed == 1
    # all non-null cats accepted
    assert out["accepted_values(cat)"].metric == 1.0
    # 3 of 4 codes match the anchored pattern
    assert out["matches_regex(code)"].metric == 0.75
    assert out["matches_regex(code)"].passed == 1


def test_empty_and_all_null_are_vacuous(spark):
    empty = spark.createDataFrame([], "id long, v double")
    out = _by_check(
        ex.run_checks(
            empty, [ex.completeness("v"), ex.in_range("v", 0, 1)]
        ).collect()
    )
    assert out["completeness(v)"].metric == 1.0
    assert out["in_range(v)"].metric == 1.0
    allnull = spark.createDataFrame([(1, None)], "id long, v double")
    out = _by_check(
        ex.run_checks(allnull, [ex.in_range("v", 0, 1)]).collect()
    )
    # range compliance is vacuous on all-null; completeness catches it
    assert out["in_range(v)"].metric == 1.0


def test_referential(spark, tbl):
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    out = ex.run_checks(
        tbl,
        [ex.referential("id", "dim", "k", threshold=0.8)],
        refs={"dim": dim},
    ).collect()
    r = out[0]
    # ids 1,2,2 hit; 4 missing -> 3/4
    assert r.metric == 0.75 and r.passed == 0
    assert r.check == "referential(id->dim.k)"
    with pytest.raises(KeyError):
        ex.run_checks(tbl, [ex.referential("id", "nope", "k")])


def test_declaration_order_and_mixed_suite(spark, tbl):
    dim = spark.createDataFrame([(1,), (2,), (4,)], "k long")
    rows = ex.run_checks(
        tbl,
        [ex.uniqueness("id", threshold=0.5), ex.referential("id", "dim", "k")],
        refs={"dim": dim},
    ).collect()
    # declaration order is recovered via the explicit ord column
    # (Spark does not guarantee union row order); labels == Check.name
    rows = sorted(rows, key=lambda r: r.ord)
    assert [(r.ord, r.check) for r in rows] == [
        (0, "uniqueness(id)"),
        (1, "referential(id->dim.k)"),
    ]
    assert rows[0].passed == 1 and rows[1].passed == 1


def test_unknown_kind_raises(tbl):
    with pytest.raises(ValueError):
        ex.run_checks(tbl, [ex.Check("bogus", "id")])


def test_run_checks_empty_rule_list_returns_empty_frame(spark):
    """Zero rules (e.g. a config-driven caller) must yield an EMPTY
    verdict frame with the documented schema, not None."""
    from feast_java_old_spark.operators.expectations import run_checks

    df = spark.range(5).selectExpr("id", "cast(id as double) v")
    out = run_checks(df, [])
    assert out.columns == [
        "ord", "check", "column", "metric", "threshold", "passed",
    ]
    assert out.count() == 0


def test_interleaved_referential_ord_recovers_declaration(spark, tbl):
    """Referential rules are physically unioned after every row-local
    rule; an interleaved declaration [local, referential, local] must
    still be recoverable as declared via ord (ADVICE r7
    expectations.py:113)."""
    dim = spark.createDataFrame([(1,), (2,), (4,)], "k long")
    rows = (
        ex.run_checks(
            tbl,
            [
                ex.completeness("id"),
                ex.referential("id", "dim", "k"),
                ex.uniqueness("id", threshold=0.5),
            ],
            refs={"dim": dim},
        )
        .orderBy("ord")
        .collect()
    )
    assert [r.check for r in rows] == [
        "completeness(id)",
        "referential(id->dim.k)",
        "uniqueness(id)",
    ]
