"""Data-quality expectations (a Deequ/Great-Expectations-style check
suite, engine-native) — the assertion layer on top of
:mod:`feast_java_old_spark.operators.profile`'s raw statistics.

The reference validates *specs* before registration
(``DataSourceValidator.java``, ``Matchers.java:25-95`` — name regexes,
type conformance); the data itself it trusts. At 100 TB that trust is
where training corpora rot, so this module turns declarative rules —
completeness, uniqueness, value ranges, accepted sets, regex formats,
referential integrity — into ONE measured verdict row per rule:
``(ord, check, column, metric, threshold, passed)``.

Scale shape: every row-local rule (completeness / range / accepted /
regex) folds into a single aggregate over a single scan — adding a rule
adds a projection expression, not a pass. Uniqueness rules join the same
aggregate as exact ``count(distinct)`` (Catalyst plans one Expand: rows
× (distinct-rules + 1), linear with map-side partials — the
:func:`profile_columns` trade-off, documented there). Referential rules
each add one distinct-build + left-anti-style join against their
dimension — broadcastable when the dimension is small, the usual case.
Nothing collects to the driver; the output is one row per rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative rule. ``kind`` ∈ {completeness, uniqueness,
    in_range, accepted_values, matches_regex, referential};
    ``threshold`` is the minimum metric for ``passed``. For row-local
    kinds the metric is compliance among NON-NULL values (null-ness is
    completeness's job, not every rule's); for referential it is the
    fraction of non-null keys present in the dimension."""

    kind: str
    column: str
    threshold: float = 1.0
    lo: Optional[float] = None
    hi: Optional[float] = None
    values: tuple = ()
    pattern: str = ""
    ref_table: str = ""
    ref_column: str = ""

    @property
    def name(self) -> str:
        if self.kind == "referential":
            return (
                f"referential({self.column}->"
                f"{self.ref_table}.{self.ref_column})"
            )
        return f"{self.kind}({self.column})"


def completeness(column: str, threshold: float = 1.0) -> Check:
    return Check("completeness", column, threshold)


def uniqueness(column: str, threshold: float = 1.0) -> Check:
    return Check("uniqueness", column, threshold)


def in_range(
    column: str, lo: float, hi: float, threshold: float = 1.0
) -> Check:
    return Check("in_range", column, threshold, lo=lo, hi=hi)


def accepted_values(
    column: str, values: list, threshold: float = 1.0
) -> Check:
    return Check("accepted_values", column, threshold, values=tuple(values))


def matches_regex(
    column: str, pattern: str, threshold: float = 1.0
) -> Check:
    """``pattern`` should stay in the Java∩RE2∩POSIX common subset (see
    operators/pii.py) so oracles in other engines reproduce it."""
    return Check("matches_regex", column, threshold, pattern=pattern)


def referential(
    column: str, ref_table: str, ref_column: str, threshold: float = 1.0
) -> Check:
    return Check(
        "referential", column, threshold, ref_table=ref_table,
        ref_column=ref_column,
    )


def _compliance(cond: Column, col: Column) -> Column:
    """sum(cond among non-null) / count(non-null); 1.0 on an all-null
    column (vacuous truth — completeness is the rule that catches it)."""
    n = F.count(col)
    ok = F.sum(F.when(col.isNotNull() & cond, 1).otherwise(0))
    return F.when(n == 0, F.lit(1.0)).otherwise(ok / n)


def run_checks(
    df: DataFrame,
    checks: list[Check],
    refs: Optional[dict[str, DataFrame]] = None,
    broadcast_refs: bool = True,
) -> DataFrame:
    """Evaluate ``checks`` against ``df``; referential rules look their
    ``ref_table`` up in ``refs``. Returns one row per rule:
    ``(ord, check, column, metric, threshold, passed)`` with ``metric``
    rounded to 6 places (engine-portable) and ``passed`` as 0/1 long —
    an EMPTY verdict frame (same schema) for an empty rule list.

    Row ORDER is not guaranteed (referential rules are unioned after the
    row-local aggregate, and Spark does not promise union order on
    collect anyway); ``ord`` carries each rule's declaration index —
    ``.orderBy("ord")`` recovers declaration order. The ``check`` label
    always equals :attr:`Check.name`.

    ``broadcast_refs=False`` drops the broadcast hint on referential
    dimensions so AQE picks the join strategy — use it when a dimension
    key set is too big to broadcast.
    """
    refs = refs or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(checks):
        col = F.col(c.column)
        if c.kind == "completeness":
            metric = F.when(
                F.count(F.lit(1)) == 0, F.lit(1.0)
            ).otherwise(F.count(col) / F.count(F.lit(1)))
        elif c.kind == "uniqueness":
            metric = F.when(
                F.count(F.lit(1)) == 0, F.lit(1.0)
            ).otherwise(F.countDistinct(col) / F.count(F.lit(1)))
        elif c.kind == "in_range":
            metric = _compliance(
                (col >= F.lit(c.lo)) & (col <= F.lit(c.hi)), col
            )
        elif c.kind == "accepted_values":
            metric = _compliance(col.isin(list(c.values)), col)
        elif c.kind == "matches_regex":
            metric = _compliance(col.rlike(c.pattern), col)
        elif c.kind == "referential":
            continue  # joins below, not in the row-local aggregate
        else:
            raise ValueError(f"unknown check kind {c.kind!r}")
        aggs.append(F.round(metric, 6).alias(f"__m_{i}"))
    one = df.agg(*aggs)

    structs = []
    for i, c in enumerate(checks):
        if c.kind == "referential":
            continue
        structs.append(
            F.struct(
                F.lit(i).cast("long").alias("ord"),
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.col(f"__m_{i}").cast("double").alias("metric"),
                F.lit(float(c.threshold)).alias("threshold"),
                (F.col(f"__m_{i}") >= c.threshold)
                .cast("long")
                .alias("passed"),
            )
        )
    if structs:
        out = one.select(F.explode(F.array(*structs)).alias("r")).select(
            "r.*"
        )
    else:
        out = df.sparkSession.createDataFrame(
            [],
            "ord long, check string, column string, metric double, "
            "threshold double, passed long",
        )

    for i, c in enumerate(checks):
        if c.kind != "referential":
            continue
        if c.ref_table not in refs:
            raise KeyError(
                f"referential check {c.name} needs refs[{c.ref_table!r}]"
            )
        dim = (
            refs[c.ref_table]
            .select(F.col(c.ref_column).alias("__rk"))
            .distinct()
        )
        col = F.col(c.column)
        if broadcast_refs:
            dim = F.broadcast(dim)
        joined = df.select(col.alias("__k")).join(
            dim, F.col("__k") == F.col("__rk"), "left"
        )
        m = joined.agg(
            F.round(
                F.when(F.count("__k") == 0, F.lit(1.0)).otherwise(
                    F.sum(
                        F.when(
                            F.col("__k").isNotNull()
                            & F.col("__rk").isNotNull(),
                            1,
                        ).otherwise(0)
                    )
                    / F.count("__k")
                ),
                6,
            ).alias("metric")
        ).select(
            F.lit(i).cast("long").alias("ord"),
            F.lit(c.name).alias("check"),
            F.lit(c.column).alias("column"),
            F.col("metric").cast("double"),
            F.lit(float(c.threshold)).alias("threshold"),
            (F.col("metric") >= c.threshold).cast("long").alias("passed"),
        )
        out = out.unionByName(m)
    return out
