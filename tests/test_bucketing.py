"""Bucketed-table co-located join: the write-once-shuffle-never path
(plans/bucketing.py). Asserts the physical property the module claims —
a fact-fact join over same-bucketed tables plans with ZERO exchanges."""

from __future__ import annotations

import pytest

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.plans.bucketing import colocated_join, write_bucketed
from apache_flink_pratices_spark.plans.explain import exchange_count, formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdemo")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{loc}'")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "bucketdemo.orders_b", "o_orderkey", 4)
    write_bucketed(lineitem, "bucketdemo.lineitem_b", "l_orderkey", 4)
    yield orders, lineitem
    spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_bucketed_join_zero_exchanges(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            spark,
            "bucketdemo.orders_b",
            "bucketdemo.lineitem_b",
            "o_orderkey",
            "l_orderkey",
        )
        plan = formatted_plan(j)
        assert exchange_count(plan) == 0, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    j = colocated_join(
        spark,
        "bucketdemo.orders_b",
        "bucketdemo.lineitem_b",
        "o_orderkey",
        "l_orderkey",
    )
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert j.count() == plain.count()
