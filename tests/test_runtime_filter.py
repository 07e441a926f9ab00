"""Runtime bloom-filter join pruning: at 100 TB, a selective dimension
filter should prune the fact scan *before* the shuffle, not after it.

Spark injects a bloom filter (``might_contain`` on the probe side) when the
application-side scan exceeds ``applicationSideScanSizeThreshold`` (10 GB
default — i.e. exactly the at-scale regime this repo targets) and the
creation side is selective. The sandbox's sf0.1 scans are far below that
threshold, so this test lowers it to 0 to emulate the at-scale condition
and pins that the optimizer actually injects the filter for our
fact⋈filtered-dim shape. No operator code changes: the win is free where
the defaults fire, which is precisely the 100 TB case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.plans.explain import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bloom_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def test_selective_dim_filter_injects_bloom_on_fact_side(bloom_conf):
    spark = bloom_conf
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )
    plan = formatted_plan(j)
    assert "might_contain" in plan, plan
    # the filter guards the FACT (lineitem) scan side
    assert "l_orderkey" in plan.split("might_contain", 1)[1][:200], plan


def test_bloom_not_injected_below_scan_threshold(spark):
    """Under default thresholds the tiny local scans must NOT pay the
    bloom build — the optimizer's size gating is part of the contract."""
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )
    assert "might_contain" not in formatted_plan(j)
