"""W8 for the CEP SignalGenerator: MapState positions and the ListState
trade window must survive a query restart. Run 1 registers a position
(restore command) and builds a twice-decreasing trade-volume window; run
2 — a fresh query on the SAME checkpoint — delivers only the imbalanced
orderbook. The SELL can fire only if BOTH recovered."""

from __future__ import annotations

import datetime
import os

from apache_flink_pratices_spark.streaming.signal_generator import (
    UNIFIED_SCHEMA,
    signal_stream,
)

BASE = datetime.datetime(2021, 1, 1)


def _row(off_s, source, **kw):
    ts = BASE + datetime.timedelta(seconds=off_s)
    ts_us = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    base = dict(
        code="KRW-BTC", ts=ts, ts_us=ts_us, source=source,
        price=None, volume=None, total_ask=None, total_bid=None,
        levels=None, signal_id=None, status=None, reason=None,
        entry_price=None,
    )
    base.update(kw)
    return tuple(base.values())


def _run_once(spark, in_dir, ckpt, out_dir):
    src = spark.readStream.schema(UNIFIED_SCHEMA).parquet(in_dir)
    q = (
        signal_stream(src)
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
    return spark.read.parquet(out_dir).collect()


def test_cep_state_survives_restart(spark, tmp_path):
    in_dir = os.path.join(str(tmp_path), "in")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out_dir = os.path.join(str(tmp_path), "out")

    run1 = [
        _row(0, "restore", signal_id="sid-1", entry_price=100.0),
        _row(1, "trade", price=100.0, volume=10.0),
        _row(2, "trade", price=100.5, volume=4.0),   # avg 10 -> 7
        _row(3, "trade", price=101.0, volume=1.0),   # avg 7 -> 5 (2nd drop)
    ]
    spark.createDataFrame(run1, UNIFIED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    out1 = _run_once(spark, in_dir, ckpt, out_dir)
    assert out1 == []  # nothing sell-able yet

    # run 2: only the imbalanced book (ask/bid = 3 > threshold 2)
    run2 = [_row(4, "orderbook", total_ask=30, total_bid=10, levels=[])]
    spark.createDataFrame(run2, UNIFIED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    out2 = _run_once(spark, in_dir, ckpt, out_dir)
    assert [(r.side, r.reason, r.ref_price) for r in out2] == [
        ("SELL", "P_WAVE_EARTHQUAKE_DETECTED", 101.0)
    ]
