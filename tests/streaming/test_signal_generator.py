"""CEP SignalGenerator end-to-end: the P-wave buy path (density drop +
spoof proxy), the sell path (imbalance + decreasing trade-volume trend),
the 30s recently-removed restore guard, and FAILED-feedback position
removal — all through a real readStream → memory-sink query.

Scenario timeline (code KRW-BTC, seconds from BASE):
  0..55   : 12 stable orderbooks (ask total 1000) — baseline + warm-up
  55.5    : trade (price 50000, vol 10)
  56      : ask total drops to 600 (density −40% → cond1) AND a new
            large level (999, 300) appears → spoof watch armed (+1.5s)
  57      : the big level vanishes (book without 999)
  58.2    : next book; the 57.5s watch fires first against the t=57 book
            → cond2 → BUY signal + position opened
  60/62/64: trades with falling volumes → sliding avgs 9.5 > 5 > 3.67
  65      : imbalanced book (ask/bid = 3) → SELL, position removed,
            removal guarded for 30s
  70      : restore command → REJECTED (within TTL)
  72      : imbalanced book → no SELL (no position — proves rejection)
  100     : restore again → accepted (TTL expired)
  102     : imbalanced book → SELL (proves the restore took effect)
"""

from __future__ import annotations

import datetime
import os

from apache_flink_pratices_spark.domain.rules import P_WAVE_REASON
from apache_flink_pratices_spark.sources.collection import stream_from_collection
from apache_flink_pratices_spark.streaming.signal_generator import (
    UNIFIED_SCHEMA,
    deterministic_signal_id,
    signal_stream,
    unify_streams,
)

BASE = datetime.datetime(2021, 1, 1, tzinfo=datetime.timezone.utc)
#: ts_us is the absolute unix_micros(ts) — the same domain the watermark
#: lives in, so watch deadlines survive micro-batch boundaries (ADVICE r2)
BASE_US = int(BASE.timestamp()) * 1_000_000
CODE = "KRW-BTC"


def _ts(sec: float) -> datetime.datetime:
    return BASE + datetime.timedelta(seconds=sec)


def _us(sec: float) -> int:
    return BASE_US + int(sec * 1_000_000)


def _ob(sec, total_ask, total_bid, levels):
    return (
        CODE, _ts(sec), _us(sec), "orderbook",
        None, None, total_ask, total_bid, levels, None, None, None, None,
    )


def _trade(sec, price, volume):
    return (
        CODE, _ts(sec), _us(sec), "trade",
        price, volume, None, None, None, None, None, None, None,
    )


def _restore(sec, signal_id, entry_price):
    return (
        CODE, _ts(sec), _us(sec), "restore",
        None, None, None, None, None, signal_id, None, P_WAVE_REASON, entry_price,
    )


def _stable_levels(size=100):
    return [(100 + i, size) for i in range(10)]


def _scenario():
    rows = []
    for k in range(12):  # t = 0..55: baseline books
        rows.append(_ob(5 * k, 1000, 1000, _stable_levels(100)))
    rows.append(_trade(55.5, 50_000.0, 10.0))
    # density drop + spoof level appears
    rows.append(_ob(56, 600, 1000, [(100 + i, 30) for i in range(10)] + [(999, 300)]))
    # level vanishes
    rows.append(_ob(57, 600, 1000, [(100 + i, 60) for i in range(10)]))
    # watch (deadline 57.5s) fires before this row → BUY
    rows.append(_ob(58.2, 600, 1000, [(100 + i, 60) for i in range(10)]))
    # falling trade volumes → decreasing sliding averages
    rows.append(_trade(60, 50_100.0, 9.0))
    rows.append(_trade(62, 50_200.0, 1.0))
    rows.append(_trade(64, 50_300.0, 1.0))
    # imbalance → SELL
    rows.append(_ob(65, 900, 300, [(100 + i, 90) for i in range(10)]))
    # stale restore (rejected), then a sell-shaped book that must NOT fire
    rows.append(_restore(70, "sid-restore-1", 42.0))
    rows.append(_ob(72, 900, 300, [(100 + i, 90) for i in range(10)]))
    # restore after TTL (accepted), then the same book fires a SELL
    rows.append(_restore(100, "sid-restore-2", 42.0))
    rows.append(_ob(102, 900, 300, [(100 + i, 90) for i in range(10)]))
    return rows


def _run(spark, tmpdir, rows, chunks, name):
    src = stream_from_collection(
        spark, rows, UNIFIED_SCHEMA, os.path.join(str(tmpdir), "in"), chunks=chunks
    )
    # rows already carry source/ts_us; feed directly to the keyed processor
    out = signal_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(str(tmpdir), "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(
        spark.sql(f"SELECT * FROM {name}").collect(), key=lambda r: r.ts_us
    )


def test_full_lifecycle(spark, tmp_path):
    signals = _run(spark, tmp_path, _scenario(), chunks=3, name="sigs")
    shape = [(r.side, r.reason, (r.ts_us - BASE_US) // 1_000_000) for r in signals]
    assert shape == [
        ("BUY", P_WAVE_REASON, 58),
        ("SELL", P_WAVE_REASON, 65),
        ("SELL", P_WAVE_REASON, 102),
    ], f"got {shape}"
    buy = signals[0]
    # W7: replay-idempotent deterministic id
    assert buy.signal_id == deterministic_signal_id(CODE, "BUY", P_WAVE_REASON, buy.ts_us)
    # ref price is the last trade price seen before the signal
    assert buy.ref_price == 50_000.0
    assert signals[1].ref_price == 50_300.0


def test_rechunking_invariance(spark, tmp_path):
    """Micro-batch boundaries must not change the output — including a
    chunking that splits the arm(t=56)/fire(t=58.2) rows so an armed watch
    spans a batch boundary (the case that crashed setTimeoutTimestamp when
    ts_us was scenario-relative, and that exercises both the event-time
    timeout path and the end-of-batch drain)."""
    rows = _scenario()
    base = None
    for chunks in (1, 2, 5, len(rows)):
        got = _run(spark, tmp_path / f"c{chunks}", rows, chunks=chunks, name=f"sig_c{chunks}")
        shaped = [(r.side, r.reason, r.ts_us, r.signal_id, r.ref_price) for r in got]
        if base is None:
            base = shaped
        else:
            assert shaped == base, f"chunks={chunks} diverged: {shaped} vs {base}"
    assert [s[0] for s in base] == ["BUY", "SELL", "SELL"]


def test_no_buy_without_spoof(spark, tmp_path):
    """Density drop alone (cond1 without cond2) must not produce a BUY."""
    rows = []
    for k in range(12):
        rows.append(_ob(5 * k, 1000, 1000, _stable_levels(100)))
    rows.append(_ob(56, 600, 1000, [(100 + i, 60) for i in range(10)]))
    rows.append(_ob(58, 600, 1000, [(100 + i, 60) for i in range(10)]))
    signals = _run(spark, tmp_path, rows, chunks=1, name="nobuy")
    assert signals == []


def test_persisting_level_timer_fires_without_signal(spark, tmp_path):
    """The dedicated spoof corpus (stream_spoof_golden): two watches armed
    in one book, only the VANISHING level's timer may set cond2. The
    persisting level's timer fires too — with cond1 fresh — and must
    produce nothing; output is exactly one BUY regardless of how the
    micro-batches split around the 1.5 s deadline."""
    from apache_flink_pratices_spark.operators.streaming_golden import (
        _spoof_expected,
        _spoof_scenario,
    )

    rows = _spoof_scenario()
    expected = [tuple(e) for e in _spoof_expected()]
    for chunks in (1, 2, len(rows)):
        got = _run(spark, tmp_path / f"s{chunks}", rows, chunks=chunks,
                   name=f"spoof_c{chunks}")
        assert [tuple(r) for r in got] == expected, f"chunks={chunks}"


def test_feedback_failure_removes_position(spark, tmp_path):
    """A FAILED execution feedback closes the position: the subsequent
    sell-shaped book must not emit a SELL."""
    rows = [
        _restore(0, "sid-x", 10.0),
        _trade(1, 100.0, 9.0),
        _trade(2, 100.0, 1.0),
        _trade(3, 100.0, 1.0),
        (
            CODE, _ts(5), _us(5), "feedback",
            None, None, None, None, None, "sid-x", "FAILED", P_WAVE_REASON, None,
        ),
        _ob(6, 900, 300, _stable_levels(90)),
    ]
    signals = _run(spark, tmp_path, rows, chunks=1, name="fb")
    assert signals == []


def test_feedback_filled_keeps_position(spark, tmp_path):
    rows = [
        _restore(0, "sid-y", 10.0),
        _trade(1, 100.0, 9.0),
        _trade(2, 100.0, 1.0),
        _trade(3, 100.0, 1.0),
        (
            CODE, _ts(5), _us(5), "feedback",
            None, None, None, None, None, "sid-y", "FILLED", P_WAVE_REASON, None,
        ),
        _ob(6, 900, 300, _stable_levels(90)),
    ]
    signals = _run(spark, tmp_path, rows, chunks=1, name="fbok")
    assert [(r.side,) for r in signals] == [("SELL",)]


def test_unify_streams_discriminator(spark):
    trades = spark.createDataFrame(
        [(CODE, _ts(1), 100.0, 2.0)], "code string, ts timestamp, price double, volume double"
    )
    obs = spark.createDataFrame(
        [(CODE, _ts(2), 500, 400)],
        "code string, ts timestamp, total_ask long, total_bid long",
    )
    u = unify_streams(trades=trades, orderbooks=obs)
    rows = {r.source: r for r in u.collect()}
    assert set(rows) == {"trade", "orderbook"}
    assert rows["trade"].price == 100.0 and rows["trade"].total_ask is None
    assert rows["orderbook"].total_ask == 500 and rows["orderbook"].price is None
