"""Driver-canon output-schema audit.

The round driver's correctness gate canonicalizes every query's output
with pandas ``sort_values`` over all columns; array/map/struct cells are
unhashable there and red the row regardless of the values being right
(round 3's ``kmeans_refine``: `TypeError: unhashable type: 'list'`).

This test builds EVERY registered ``queries()`` entry and asserts no
output column is array/map/struct-typed, so a new query with a nested
output fails here before the driver ever samples it. Schema inspection
is analysis-only for batch queries; streaming queries execute their
(tiny, sf0.001) micro-batch run as part of construction.
"""

import os

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

NESTED = (ArrayType, MapType, StructType)


@pytest.mark.slow
def test_no_nested_output_columns_in_any_registered_query(spark):
    qs = entry.queries()
    offenders = {}
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, NESTED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "array/map/struct-typed output columns break the driver's pandas "
        f"canonicalizer — reshape (posexplode) these: {offenders}"
    )
