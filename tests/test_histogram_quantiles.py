"""Histogram quantile sketch: estimates must land within one bucket width
of the true quantile (the sketch's documented error bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.operators.relational import (
    HISTO_WIDTH_CENTS,
    sketch_histogram_quantiles,
)

SF = "/root/testdata/sf0.001"
WIDTH = HISTO_WIDTH_CENTS / 100.0  # dollars


def test_estimates_within_one_bucket(spark):
    est = {
        r["priority"]: r
        for r in sketch_histogram_quantiles(spark, SF).collect()
    }
    vals: dict[str, list[float]] = {}
    for r in load(spark, SF, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect():
        vals.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    assert set(est) == set(vals)
    for k, e in est.items():
        xs = sorted(vals[k])
        n = len(xs)
        assert e["n"] == n
        for q_num, q_den, name in ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")):
            # the sketch picks the bucket holding the rank-target order
            # statistic x_(ceil(q*n)); its lower edge is within one width
            target = -(-q_num * n // q_den)  # ceil
            x = xs[target - 1]
            assert e[f"{name}_est"] <= x < e[f"{name}_est"] + WIDTH, (
                k, name, e[f"{name}_est"], x,
            )


def test_sketch_is_bounded_counters(spark):
    """The shuffled state is |keys|x|buckets| counters, not rows: bucket
    cardinality per key is bounded by the value range / width."""
    df = sketch_histogram_quantiles(spark, SF)
    assert df.count() == 5  # one row per priority
    hist_rows = (
        load(spark, SF, "orders")
        .select(
            F.expr(
                f"CAST(ROUND(o_totalprice * 100.0) AS BIGINT) div {HISTO_WIDTH_CENTS}"
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert hist_rows <= 501  # $0..$500k at $1000 width
