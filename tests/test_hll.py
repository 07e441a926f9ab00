"""Unit tests for the HLL distinct sketch: accuracy band and the
mergeability property its 100 TB story rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_pratices_spark.functions.hashing import md5_long
from apache_flink_pratices_spark.operators.relational import (
    HLL_M,
    _SQL_HLL_RHO,
    sketch_hll_distinct,
)

from tests.conftest import SF_SMOKE


def _corrected(raw: float, n_buckets_used: int) -> float:
    """The standard HLL small-range correction, applied CLIENT-SIDE from
    the emitted sketch state (the query output avoids ln() because libm
    rounding is not cross-engine-stable; consumers correct like this)."""
    import math

    zeros = HLL_M - n_buckets_used
    if raw <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return raw


def test_hll_estimate_within_error_band(spark):
    rows = sketch_hll_distinct(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        est = _corrected(r["hll_estimate"], r["n_buckets_used"])
        # theoretical std error 1.04/sqrt(1024) ~ 3.2%; allow ~5 sigma
        assert abs(est - r["exact_distinct"]) <= max(
            0.17 * r["exact_distinct"], 3
        ), (r, est)


def test_hll_corrected_accuracy_mid_cardinality(spark):
    """Drive the sketch arithmetic at a cardinality near m where neither
    regime is degenerate, via the same expressions the operator uses."""
    n = 2000
    df = spark.range(n).select(md5_long(F.col("id").cast("string")).alias("h"))
    regs = (
        df.select((F.col("h") % HLL_M).alias("bucket"), F.expr(f"h div {HLL_M}").alias("tail"))
        .groupBy("bucket")
        .agg(F.max(F.expr(_SQL_HLL_RHO)).alias("rho"))
    )
    agg = regs.agg(
        F.count("*").alias("used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 47 - rho)")).alias("units"),
    ).collect()[0]
    denom = agg["units"] + (HLL_M - agg["used"]) * 2**47
    from apache_flink_pratices_spark.operators.relational import _HLL_NUMERATOR

    est = _corrected(_HLL_NUMERATOR / denom, agg["used"])
    assert abs(est - n) / n < 0.17


def test_hll_registers_merge_with_max(spark):
    """Registers built on disjoint halves, MAX-merged, must equal the
    registers built on the union — the property that makes the sketch
    shardable across partitions/streams/days."""
    n = 5000
    df = spark.range(n).select(
        md5_long(F.col("id").cast("string")).alias("h"),
        (F.col("id") % 2).alias("half"),
    )
    split = df.select(
        "half",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("tail"),
    )
    whole = (
        split.groupBy("bucket")
        .agg(F.max(F.expr(_SQL_HLL_RHO)).alias("rho"))
        .collect()
    )
    halves = (
        split.groupBy("half", "bucket")
        .agg(F.max(F.expr(_SQL_HLL_RHO)).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    )
    assert {(r["bucket"], r["rho"]) for r in whole} == {
        (r["bucket"], r["rho"]) for r in halves
    }
