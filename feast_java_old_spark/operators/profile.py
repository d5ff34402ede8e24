"""One-pass column profiling (data-quality audit before training).

The reference validates *specs* (``DataSourceValidator.java``,
``Matchers.java``) but delegates data-quality checks on the source
tables themselves to the compute engine; this module is that audit step,
Spark-first: a single aggregate pass over the table produces, per
profiled column — row count, null count, exact distinct count, min/max,
and mean (numeric columns) — emitted in long format so the profile of a
1000-column table is still one DataFrame with a fixed schema.

Scale notes: everything is ONE ``agg`` over one scan. The exact
``count(distinct …)`` over multiple columns makes Catalyst plan an
``Expand`` (each input row fans out once per distinct-aggregate), so
cost is rows × (profiled columns + 1) — linear, map-side partially
aggregated, but worth knowing: at 100 TB profile the columns you need,
or pass ``approx_distinct=True`` to swap in HyperLogLog
(``approx_count_distinct``, no Expand, mergeable sketch state) — the
driver oracle uses the exact form since HLL estimates are not
cross-engine reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(
    df: DataFrame,
    cols: list[str],
    approx_distinct: bool = False,
) -> DataFrame:
    """Profile ``cols`` in one aggregate pass; returns one row per
    column: ``(column, n, n_null, n_distinct, min_num, max_num, mean,
    min_str, max_str)`` — numeric stats NULL for non-numeric columns
    and vice versa, doubles rounded to 6 places for engine portability.

    The wide 1-row aggregate is unpivoted to long format with a single
    ``explode`` projection — no extra pass, no shuffle beyond the
    aggregate's own (1 partial row per task).
    """
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        aggs.append(
            (
                F.approx_count_distinct(col)
                if approx_distinct
                else F.countDistinct(col)
            ).alias(f"__nd_{c}")
        )
        if c in numeric:
            aggs.append(F.round(F.min(col).cast("double"), 6).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(col).cast("double"), 6).alias(f"__mx_{c}"))
            aggs.append(F.round(F.avg(col), 6).alias(f"__av_{c}"))
        else:
            aggs.append(F.min(col.cast("string")).alias(f"__mns_{c}"))
            aggs.append(F.max(col.cast("string")).alias(f"__mxs_{c}"))
    one = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in cols:
        is_num = c in numeric
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"__mx_{c}") if is_num else null_d).alias("max_num"),
                (F.col(f"__av_{c}") if is_num else null_d).alias("mean"),
                (null_s if is_num else F.col(f"__mns_{c}")).alias("min_str"),
                (null_s if is_num else F.col(f"__mxs_{c}")).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
