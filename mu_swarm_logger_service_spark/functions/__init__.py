"""Scalar function families — SURVEY.md §2.8 rows 49-57.

The SPARQL 1.1 builtin library [spec:SPARQL 1.1 §17.4] that the reference's
triplestore exposes over its logged data, mapped onto
``pyspark.sql.functions`` — all JVM-side, whole-stage-codegen'd, zero Python
in the row path.
"""

from . import scalar  # noqa: F401
