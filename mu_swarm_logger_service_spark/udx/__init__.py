"""User-defined function surface — SURVEY.md §2.10 rows 67-73.

Python UDFs are the engine's SLOW path (SURVEY.md §4.2: stay JVM-side).
This package exists to make the escape hatch first-class and *measured*:
every example is written the fast way for its tier — Arrow-batched pandas
UDFs over row-at-a-time wherever vectorization applies — and each has an
exact relational oracle so the UDF boundary can't silently change
semantics.
"""

from . import examples  # noqa: F401
