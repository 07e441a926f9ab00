"""Semantics of the as-of join kernel (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.temporal import asof_join


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10.0)), (2, "a", _ts(20.0)), (3, "b", _ts(5.0))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "a", _ts(9.0), 1.5),
            (101, "a", _ts(10.0), 2.5),  # exactly at left lid=1's ts
            (102, "a", _ts(15.0), 3.5),
            (103, "b", _ts(6.0), 4.5),  # after b's only left row
        ],
        "rid long, k string, rts timestamp, v double",
    )
    return left, right


def test_asof_inclusive_latest_and_null(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: (r["asof_rid"], r["asof_v"])
        for r in asof_join(left, right, "k", "ts", "rts", ("rid", "v")).collect()
    }
    # tie at identical ts: the right row AT the left ts is visible (inclusive)
    assert out[1] == (101, 2.5)
    # strictly latest preceding row wins, not the first
    assert out[2] == (102, 3.5)
    # no preceding right row -> NULLs survive (left-join semantics)
    assert out[3] == (None, None)


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    joined = asof_join(left, right, "k", "ts", "rts", ("rid",))
    assert joined.count() == left.count()
    assert set(joined.columns) == {"lid", "k", "ts", "asof_rid"}


def test_asof_right_only_keys_do_not_leak(spark):
    left, right = _frames(spark)
    extra = right.union(
        spark.createDataFrame([(104, "zz", _ts(1.0), 9.9)], right.schema)
    )
    joined = asof_join(left, extra, "k", "ts", "rts", ("rid",))
    assert joined.filter(F.col("k") == "zz").count() == 0
    assert joined.count() == 3
