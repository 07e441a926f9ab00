"""CEP SignalGenerator — the reference's designed trading-signal core
(SURVEY.md §2.5 J1 + §2.6 W4/W5/W6/W7), as a keyed stateful processor over
a union-with-discriminator of four streams.

Reference design (``docs/project docs/호가창 분석 스캘퍼: 시스템
아키텍처.md:560-760``, ``2. CEP 레이어 구현 설계 및 체크리스트.md:1-226``):

- **J1** four streams — enriched trades, enriched orderbooks, execution
  feedback, state restore — ``connect``-ed and keyed by market code. Spark
  mapping: ``unionByName(allowMissingColumns=True)`` with a ``source``
  discriminator column into one ``applyInPandasWithState`` keyed by code
  (the co-process pattern; SURVEY §2.5).
- **Buy path ('P파')**: cond1 = orderbook density change rate
  ``(1 - current/baseline) × 100 > 30%`` against the trailing-60s mean
  with warm-up gating (W5 ListState time-series); cond2 = spoof proxy — a
  large new ask level (> 5% of the book) that mostly vanishes within 1.5s,
  detected by diffing against the previous book (W6 ValueState) with a
  per-price timer. cond1 ∧ cond2 (each fresh within 10s) → BUY signal +
  ``active_positions[reason] = PositionInfo`` (W4 MapState).
- **Sell path ('여진')**: only in tracking mode (position held): imbalance
  ratio > 2.0 AND the sliding trade-volume average decreasing twice in a
  row → SELL, position removed, and a ``recently_removed`` entry with a
  30s TTL guards against stale restore commands (W4 MapState + TTL).
- **Feedback**: a FAILED execution removes its position (and guards it).
- **Restore**: re-registers a position unless the recently-removed guard
  rejects it as stale.
- **W7**: every signal id is ``sha256(code|side|reason|second)`` —
  idempotent on replay.

Timer semantics follow the engine's documented event-time interleave (see
``docs/fraud_semantics.md``): armed spoof deadlines strictly earlier than
the next event fire first, against the orderbook state at firing time;
quiet keys fire via the Spark event-time timeout parked on the earliest
deadline. TTLs are emulated by timestamp filtering on read and eviction on
write (the 3.x-compatible form of StateTtlConfig's
OnCreateAndWrite/NeverReturnExpired).

Scale: one shuffle on code; per-key state is bounded (trailing windows
evict by time, removed-guard by TTL, watches by deadline). RocksDB keeps
aggregate state off-heap.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from apache_flink_pratices_spark.domain.rules import (
    CEP_DENSITY_WINDOW_US,
    CEP_MIN_SAMPLES,
    CEP_WARMUP_US,
    COND_FRESH_US,
    CONSEC_DECREASES,
    IMBALANCE_THRESHOLD,
    P_WAVE_DENSITY_DROP_PCT,
    P_WAVE_REASON,
    REMOVED_TTL_MS,
    SPOOF_LEVEL_FRACTION,
    SPOOF_REMAIN_FRACTION,
    SPOOF_VANISH_MS,
    TRADE_WIN_US,
)
from apache_flink_pratices_spark.streaming.watermarks import drop_late

#: unified input row shape after the union-with-discriminator
UNIFIED_SCHEMA = (
    "code string, ts timestamp, ts_us bigint, source string, "
    "price double, volume double, total_ask bigint, total_bid bigint, "
    "levels array<struct<price bigint, size bigint>>, "
    "signal_id string, status string, reason string, entry_price double"
)

SIGNAL_SCHEMA = (
    "code string, ts_us bigint, side string, reason string, "
    "signal_id string, ref_price double"
)

STATE_SCHEMA = (
    "positions array<struct<reason string, signal_id string, entry_price double, entry_ts_us bigint>>, "
    "removed array<struct<reason string, signal_id string, removed_ts_ms bigint>>, "
    "last_ob struct<ts_us bigint, total_ask bigint, total_bid bigint, "
    "levels array<struct<price bigint, size bigint>>>, "
    "watches array<struct<price bigint, size bigint, deadline_ms bigint>>, "
    "ask_vols array<struct<ts_us bigint, vol bigint>>, "
    "first_seen_us bigint, "
    "trades array<struct<ts_us bigint, vol double>>, "
    "win_avgs array<struct<ts_us bigint, avg double>>, "
    "cond1_ts_us bigint, cond2_ts_us bigint, last_price double"
)


def deterministic_signal_id(code: str, side: str, reason: str, ts_us: int) -> str:
    """W7: sha256 over (code, side, reason, second-truncated event time)."""
    payload = f"{code}|{side}|{reason}|{ts_us // 1_000_000}"
    return hashlib.sha256(payload.encode()).hexdigest()


class _KeyState:
    """Mutable working copy of one key's state tuple."""

    def __init__(self, state: GroupState):
        if state.exists:
            (pos, rem, ob, watches, vols, first, trades, avgs, c1, c2, lp) = state.get
            self.positions = [tuple(p) for p in (pos or [])]
            self.removed = [tuple(r) for r in (rem or [])]
            self.last_ob = (
                (ob[0], ob[1], ob[2], [tuple(l) for l in (ob[3] or [])])
                if ob is not None
                else None
            )
            self.watches = sorted((tuple(w) for w in (watches or [])), key=lambda w: w[2])
            self.ask_vols = [tuple(v) for v in (vols or [])]
            self.first_seen_us = first
            self.trades = [tuple(t) for t in (trades or [])]
            self.win_avgs = [tuple(a) for a in (avgs or [])]
            self.cond1_ts_us = c1
            self.cond2_ts_us = c2
            self.last_price = lp if lp is not None else 0.0
        else:
            self.positions = []
            self.removed = []
            self.last_ob = None
            self.watches = []
            self.ask_vols = []
            self.first_seen_us = None
            self.trades = []
            self.win_avgs = []
            self.cond1_ts_us = None
            self.cond2_ts_us = None
            self.last_price = 0.0

    def write(self, state: GroupState) -> None:
        state.update(
            (
                self.positions,
                self.removed,
                self.last_ob,
                self.watches,
                self.ask_vols,
                self.first_seen_us,
                self.trades,
                self.win_avgs,
                self.cond1_ts_us,
                self.cond2_ts_us,
                self.last_price,
            )
        )
        if self.watches:
            state.setTimeoutTimestamp(self.watches[0][2])

    # -- TTL'd recently-removed guard (W4) --------------------------------
    def evict_removed(self, now_ms: int) -> None:
        self.removed = [r for r in self.removed if now_ms - r[2] <= REMOVED_TTL_MS]

    def recently_removed(self, reason: str, now_ms: int) -> bool:
        return any(
            r[0] == reason and now_ms - r[2] <= REMOVED_TTL_MS for r in self.removed
        )


def _row_levels(raw) -> list[tuple[int, int]]:
    """Arrow hands list columns to pandas as numpy arrays (or None/NaN for
    null) — normalize to a plain list of (price, size) tuples."""
    if raw is None or isinstance(raw, float):
        return []
    return [(int(l["price"]), int(l["size"])) for l in raw]


def _ob_level_size(ob, price: int) -> int:
    if ob is None:
        return 0
    for lvl in ob[3]:
        if lvl[0] == price:
            return lvl[1]
    return 0


def make_signal_generator():
    """Build the applyInPandasWithState function."""

    def process(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        code = key[0]
        st = _KeyState(state)
        signals: list[tuple] = []

        def emit(ts_us: int, side: str, reason: str, ref_price: float) -> str:
            sid = deterministic_signal_id(code, side, reason, ts_us)
            signals.append((code, ts_us, side, reason, sid, ref_price))
            return sid

        def last_trade_price() -> float:
            return float(st.last_price)

        def maybe_buy(now_us: int) -> None:
            if st.cond1_ts_us is None or st.cond2_ts_us is None:
                return
            if now_us - st.cond1_ts_us > COND_FRESH_US:
                return
            if now_us - st.cond2_ts_us > COND_FRESH_US:
                return
            if any(p[0] == P_WAVE_REASON for p in st.positions):
                return
            sid = emit(now_us, "BUY", P_WAVE_REASON, last_trade_price())
            st.positions.append((P_WAVE_REASON, sid, last_trade_price(), now_us))
            st.cond1_ts_us = None
            st.cond2_ts_us = None

        def fire_watch(watch, fire_us: int) -> None:
            price, armed_size, _deadline = watch
            remaining = _ob_level_size(st.last_ob, price)
            if remaining < SPOOF_REMAIN_FRACTION * armed_size:
                st.cond2_ts_us = fire_us
                maybe_buy(fire_us)

        def fire_due_watches(up_to_ms: int, fire_us: int) -> None:
            while st.watches and st.watches[0][2] <= up_to_ms:
                w = st.watches.pop(0)
                fire_watch(w, fire_us)

        def on_orderbook(row) -> None:
            now = int(row.ts_us)
            total_ask = int(row.total_ask)
            total_bid = int(row.total_bid)
            levels = _row_levels(row.levels)
            if st.first_seen_us is None:
                st.first_seen_us = now

            # cond1: density change vs trailing baseline (state read BEFORE
            # appending the current sample — A3/A5 semantics)
            samples = [
                v for (t, v) in st.ask_vols if now - CEP_DENSITY_WINDOW_US <= t < now
            ]
            warm = (
                now - st.first_seen_us < CEP_WARMUP_US
                or len(samples) < CEP_MIN_SAMPLES
            )
            if not warm and samples:
                baseline = sum(samples) / len(samples)
                if baseline > 0:
                    rate = (1.0 - total_ask / baseline) * 100.0
                    if rate > P_WAVE_DENSITY_DROP_PCT:
                        st.cond1_ts_us = now

            # cond2 arm: big NEW level vs previous book (W6 diff)
            book_total = total_ask + total_bid
            for price, size in levels:
                prev = _ob_level_size(st.last_ob, price)
                if prev < size and (size - prev) > SPOOF_LEVEL_FRACTION * book_total:
                    deadline_ms = now // 1000 + SPOOF_VANISH_MS
                    if not any(w[0] == price for w in st.watches):
                        st.watches.append((price, size, deadline_ms))
                        st.watches.sort(key=lambda w: w[2])

            # state updates (W5 time-series with eviction, W6 last book)
            st.ask_vols = [
                (t, v) for (t, v) in st.ask_vols if t >= now - CEP_DENSITY_WINDOW_US
            ] + [(now, total_ask)]
            st.last_ob = (now, total_ask, total_bid, levels)

            # sell path (tracking mode only)
            if st.positions and total_bid > 0:
                imbalance = total_ask / total_bid
                if imbalance > IMBALANCE_THRESHOLD and _decreasing(st.win_avgs):
                    for p in [p for p in st.positions if p[0] == P_WAVE_REASON]:
                        emit(now, "SELL", p[0], last_trade_price())
                        st.positions.remove(p)
                        st.removed.append((p[0], p[1], now // 1000))

            maybe_buy(now)

        def on_trade(row) -> None:
            now = int(row.ts_us)
            if st.first_seen_us is None:
                st.first_seen_us = now
            st.trades = [
                (t, v) for (t, v) in st.trades if t >= now - TRADE_WIN_US
            ] + [(now, float(row.volume))]
            if row.price is not None:
                st.last_price = float(row.price)
            avg = sum(v for _, v in st.trades) / len(st.trades)
            st.win_avgs = (st.win_avgs + [(now, avg)])[-(CONSEC_DECREASES + 1):]

        def on_feedback(row) -> None:
            now_ms = int(row.ts_us) // 1000
            if (row.status or "") == "FAILED":
                for p in [p for p in st.positions if p[1] == row.signal_id]:
                    st.positions.remove(p)
                    st.removed.append((p[0], p[1], now_ms))

        def on_restore(row) -> None:
            now_ms = int(row.ts_us) // 1000
            st.evict_removed(now_ms)
            reason = row.reason or P_WAVE_REASON
            if st.recently_removed(reason, now_ms):
                return  # stale restore of a just-closed position — reject
            if not any(p[0] == reason for p in st.positions):
                st.positions.append(
                    (reason, row.signal_id, float(row.entry_price or 0.0), int(row.ts_us))
                )

        if state.hasTimedOut:
            wm = state.getCurrentWatermarkMs()
            fire_due_watches(wm, wm * 1000)
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts_us", kind="mergesort")
            for row in rows.itertuples(index=False):
                now_ms = int(row.ts_us) // 1000
                # event-time interleave: due spoof deadlines fire first
                fire_due_watches(now_ms - 1, (now_ms - 1) * 1000)
                st.evict_removed(now_ms)
                if row.source == "orderbook":
                    on_orderbook(row)
                elif row.source == "trade":
                    on_trade(row)
                elif row.source == "feedback":
                    on_feedback(row)
                elif row.source == "restore":
                    on_restore(row)
            # End-of-batch drain (mirrors streaming/fraud.py): watches the
            # watermark has already passed fire now — they would have been
            # timeout callbacks had no rows arrived, and a leftover deadline
            # <= WM would make write()'s setTimeoutTimestamp raise
            # INVALID_TIMEOUT_TIMESTAMP. Late input rows (which
            # applyInPandasWithState does NOT filter) can arm such watches.
            wm = state.getCurrentWatermarkMs()
            fire_due_watches(wm, wm * 1000)

        st.write(state)
        if signals:
            yield pd.DataFrame(
                signals,
                columns=["code", "ts_us", "side", "reason", "signal_id", "ref_price"],
            )

    return process


def _decreasing(win_avgs: list[tuple]) -> bool:
    if len(win_avgs) < CONSEC_DECREASES + 1:
        return False
    vals = [a for _, a in win_avgs[-(CONSEC_DECREASES + 1):]]
    return all(vals[i + 1] < vals[i] for i in range(len(vals) - 1))


def unify_streams(
    trades: DataFrame | None = None,
    orderbooks: DataFrame | None = None,
    feedback: DataFrame | None = None,
    restore: DataFrame | None = None,
) -> DataFrame:
    """J1: union-with-discriminator of up to four streams.

    Each input must already carry ``code`` and ``ts`` (timestamp); missing
    columns are null-filled by ``unionByName(allowMissingColumns=True)``.
    """
    parts = []
    for src, df in (
        ("trade", trades),
        ("orderbook", orderbooks),
        ("feedback", feedback),
        ("restore", restore),
    ):
        if df is not None:
            parts.append(
                df.withColumn("source", F.lit(src)).withColumn(
                    "ts_us", F.unix_micros("ts")
                )
            )
    if not parts:
        raise ValueError("at least one stream required")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def signal_stream(unified: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Run the unified stream through the SignalGenerator, keyed by code."""
    src = drop_late(unified, ts_col)
    return src.groupBy("code").applyInPandasWithState(
        make_signal_generator(),
        outputStructType=SIGNAL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
