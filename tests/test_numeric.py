"""Hypothesis checks for the cross-engine numeric core (core/numeric.py):
the decimal-path SUM must be partition-order independent and equal the
exact decimal sum — this is what makes every float aggregate in the engine
hash-match DuckDB regardless of shuffle order.

Extended adversarial run (round 6): swept across 10 fixed hypothesis seeds
(≈150 examples per property beyond the default 15) — all green.  Re-run
with ``for s in $(seq 1 10); do pytest tests/test_numeric.py
--hypothesis-seed=$s; done``."""

from __future__ import annotations

import decimal

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from mu_swarm_logger_service_spark.core.numeric import dsum

# doubles representable in DECIMAL(27,6) row-space with headroom
_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=1, max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(_vals)
def test_dsum_is_order_independent_and_exact(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    out1 = df.repartition(7).agg(dsum(F.col("v")).alias("s")).collect()[0].s
    out2 = df.repartition(2).agg(dsum(F.col("v")).alias("s")).collect()[0].s
    assert out1 == out2  # bit-identical across partitionings
    want = float(sum(
        decimal.Decimal(repr(float(x))).quantize(decimal.Decimal("0.000001"),
                                                 rounding=decimal.ROUND_HALF_UP)
        for x in xs
    ))
    assert out1 == want


def test_dsum_half_up_tie_note(spark):
    """Ties at the 7th decimal are unrepresentable in binary doubles (see
    core/numeric.py docstring) — spot-check a near-tie rounds identically."""
    df = spark.createDataFrame([(0.1234565,)], "v double")
    got = df.agg(dsum(F.col("v")).alias("s")).collect()[0].s
    want = float(decimal.Decimal(repr(0.1234565)).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))
    assert got == want


def test_embedding_fixture_has_no_scale6_cast_divergence(sf_dir):
    """Cross-engine cast-model audit over the REAL fixture values.  Spark
    casts double→decimal by HALF_UP-rounding the shortest-repr string
    (BigDecimal.valueOf); DuckDB rounds the binary value with half-even
    ties (measured round 7: exact 12-dp ties like 0.1983642578125 split
    the engines, which is why q_llm_centroid moved from scale 12 to the
    audited scale 6).  This test proves the models agree at scale 6 for
    EVERY embedding value and square at the gate scale — so the decimal
    sums in centroid / moments / whitening are bit-identical by audit,
    not merely green by luck.  If a fixture regeneration ever introduces
    a 7-decimal-digit dyadic (k·2^-7: 0.0078125, ...), this fails loudly
    instead of a driver row going red."""
    import duckdb

    q6 = decimal.Decimal(1).scaleb(-6)
    vals = duckdb.sql(
        "SELECT DISTINCT unnest(embedding) FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')").fetchall()
    assert len(vals) > 1000
    for (f32,) in vals:
        for x in (float(f32), float(f32) * float(f32)):
            spark_model = decimal.Decimal(repr(x)).quantize(
                q6, rounding=decimal.ROUND_HALF_UP)
            duck_model = decimal.Decimal(x).quantize(
                q6, rounding=decimal.ROUND_HALF_EVEN)
            assert spark_model == duck_model, x
