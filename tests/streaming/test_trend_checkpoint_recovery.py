"""W8 for the trend detector: the trade buffer, (prev_avg, streak)
scalars, and the parked event-time timeout must survive a query restart.
Run 1 delivers windows whose averages decrease ONCE (streak 1 persisted);
run 2 — a fresh query on the SAME checkpoint — delivers the trades that
make the next fired window the SECOND consecutive decrease. The
transition can only fire if the streak and buffer recovered."""

from __future__ import annotations

import datetime
import os

from apache_flink_pratices_spark.streaming.trend import trend_stream

SCHEMA = "code string, ts timestamp, volume double"
BASE = datetime.datetime(2021, 1, 1, tzinfo=datetime.timezone.utc)
BASE_US = int(BASE.timestamp()) * 1_000_000


def _rows(specs):
    return [
        (code, BASE + datetime.timedelta(seconds=sec), vol)
        for code, sec, vol in specs
    ]


def _run_once(spark, in_dir, ckpt, out_dir):
    src = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        trend_stream(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(
        (r.code, r.trend_ts_us, r.avg_vol, r.prev_avg)
        for r in spark.read.parquet(out_dir).collect()
    )


def test_trend_streak_survives_restart(spark, tmp_path):
    in_dir = os.path.join(str(tmp_path), "in")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out_dir = os.path.join(str(tmp_path), "out")

    # run 1: averages 12 (1s), 10.5 (2s -> streak 1); the 2.2s flush row
    # advances the watermark past window end 2s so both fire pre-restart
    run1 = [("KRW-BTC", 0.5, 12.0), ("KRW-BTC", 1.5, 9.0),
            ("ZZZ-FLUSH", 2.2, 1.0)]
    spark.createDataFrame(_rows(run1), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    out1 = _run_once(spark, in_dir, ckpt, out_dir)
    assert out1 == []  # streak is 1, no transition yet

    # run 2: a 2.5s trade pulls window 3s down to (12+9+6)/3 = 9 < 10.5 —
    # the SECOND decrease, valid only if streak+buffer recovered
    run2 = [("KRW-BTC", 2.5, 6.0), ("ZZZ-FLUSH", 20.0, 1.0)]
    spark.createDataFrame(_rows(run2), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    out2 = _run_once(spark, in_dir, ckpt, out_dir)
    assert ("KRW-BTC", BASE_US + 3_000_000, 9.0, 10.5) in out2
