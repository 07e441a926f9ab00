"""Partitioned parquet sink: dynamic-overwrite backfill and foreachBatch
idempotency, driven through real writes and a real readStream."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from apache_flink_pratices_spark.sinks.partitioned import (
    foreach_batch_writer,
    with_event_date,
    write_partitioned,
)
from apache_flink_pratices_spark.sources.collection import stream_from_collection

UTC = datetime.timezone.utc


def _rows(day: int, vals):
    return [
        (v, datetime.datetime(2021, 1, day, 12, 0, i, tzinfo=UTC))
        for i, v in enumerate(vals)
    ]


def test_backfill_replaces_only_its_day(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        _rows(1, [10, 11]) + _rows(2, [20]), "v long, ts timestamp"
    )
    write_partitioned(with_event_date(df), path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("event_date=")
    ) == ["event_date=2021-01-01", "event_date=2021-01-02"]

    # backfill day 2 with corrected data; day 1 must be untouched
    fix = spark.createDataFrame(_rows(2, [21, 22]), "v long, ts timestamp")
    write_partitioned(with_event_date(fix), path)
    got = {
        (str(r["event_date"]), r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2021-01-01", 10),
        ("2021-01-01", 11),
        ("2021-01-02", 21),
        ("2021-01-02", 22),
    }

    # retry of the same backfill is a no-op in effect
    write_partitioned(with_event_date(fix), path)
    assert spark.read.parquet(path).count() == 4


def test_overwrite_mode_is_restored(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    df = spark.createDataFrame(_rows(1, [1]), "v long, ts timestamp")
    write_partitioned(with_event_date(df), str(tmp_path / "t2"))
    assert spark.conf.get(key) == "static"
    spark.conf.unset(key)


def test_foreach_batch_replay_is_idempotent(spark, tmp_path):
    """Replay a micro-batch through the writer (same batch_id, as a
    checkpoint-recovery replay would) — the partition set and row set must
    not change; a same-date LATER batch must coexist, not clobber."""
    path = str(tmp_path / "land")
    writer = foreach_batch_writer(path)

    b0 = with_event_date(
        spark.createDataFrame(
            _rows(1, [10, 11]) + _rows(2, [20]), "v long, ts timestamp"
        )
    ).drop("event_date")
    b1 = spark.createDataFrame(_rows(1, [12]), "v long, ts timestamp")

    writer(b0, 0)
    writer(b1, 1)  # same event date as part of batch 0
    first = {
        (str(r["event_date"]), r["batch_id"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert ("2021-01-01", 0, 10) in first and ("2021-01-01", 1, 12) in first
    assert len(first) == 4

    writer(b0, 0)  # replay after a simulated failure-before-commit
    second = {
        (str(r["event_date"]), r["batch_id"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert second == first


def test_streaming_lands_through_foreach_batch(spark, tmp_path):
    """End-to-end: readStream -> foreachBatch -> partitioned parquet."""
    rows = _rows(1, [1, 2]) + _rows(2, [3, 4])
    src = stream_from_collection(
        spark, rows, "v long, ts timestamp", str(tmp_path / "in"), chunks=2
    )
    path = str(tmp_path / "out")
    q = (
        src.writeStream.foreachBatch(foreach_batch_writer(path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(path)
    assert out.count() == 4
    # partition pruning reaches the scan: a day-scoped read touches only
    # that day's directory
    day = out.filter(F.col("event_date") == "2021-01-01")
    assert day.count() == 2
