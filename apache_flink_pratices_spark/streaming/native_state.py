"""Native ``transformWithStateInPandas`` backends (Spark 4, SURVEY §2.6).

This is the 1:1 mapping SURVEY §2.6 names for the reference's
``KeyedProcessFunction`` surface: separate named ValueState / ListState /
MapState variables, REAL per-key event-time timers
(``handle.registerTimer`` — many per key, like Flink's timer service, so
no armed-set emulation), and native state TTL. Compared with the
``applyInPandasWithState`` fallback (one monolithic state tuple rewritten
every batch), each state variable here is read and written independently
against the RocksDB store — at 100× state size a batch only touches what
it changes, which is exactly the bottleneck the monolithic tuple hits.

Availability: the Python-side state server of ``transformWithStateInPandas``
speaks protobuf to the JVM and hard-requires the ``google.protobuf``
runtime in the worker environment (import error surfaces as
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE``). No wheel is
installed here, but ``streaming/pb_compat.py`` bridges the Google Cloud
SDK's vendored pure-Python runtime into driver AND workers (PYTHONPATH +
sitecustomize shim, installed by ``session.tune`` before the JVM
launches), so on this box the native path RUNS for real — the 4 tests in
``tests/streaming/test_native_state.py`` execute the fraud detector and
signal generator against the actual JVM state server with real
event-time timers. :func:`native_state_available` still gates every
native code path: sessions created before the bridge (e.g. the driver
harness's own session) keep the ``applyInPandasWithState`` fallback,
because a late driver-side sys.path fix says nothing about the workers
the already-running JVM will spawn.

Reference parity: ``src/pyflink_examples/fraud_detection/
fraud_detector.py:39-149`` (state decl :44-62, logic :64-114, timers
:110,143-145). Transition logic lives framework-free in
:class:`~apache_flink_pratices_spark.domain.rules.FraudMachine`, shared
with the fallback backend, so both produce byte-identical alerts.
"""

from __future__ import annotations

import importlib.util
from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from apache_flink_pratices_spark.domain.rules import (
    REF_LARGE_AMOUNT,
    REF_SMALL_AMOUNT,
    REF_WINDOW_MS,
    FraudMachine,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessorHandle,
        TimerValues,
    )

#: output schema of the streaming detector (same as the fallback's)
ALERT_SCHEMA = "account_id bigint, alert_ts_us bigint, amount double"


def native_state_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually run here.

    The API exists on Spark 4 regardless; what decides is whether the
    WORKER-side state server can import ``google.protobuf``. Two ways it
    can: a real wheel in site-packages (workers share it), or the
    vendored cloud-sdk runtime bridged onto PYTHONPATH before the JVM
    launched (streaming/pb_compat.py — sessions built by session.tune/
    get_spark). A session created before the bridge ran keeps the
    applyInPandasWithState fallback: the driver importing protobuf via a
    late sys.path edit says nothing about its workers."""
    from apache_flink_pratices_spark.streaming.pb_compat import (
        ensure_protobuf,
        workers_can_import_gencode,
    )

    mode = ensure_protobuf()
    if mode is None:
        return False
    # driver importability is necessary but not sufficient: fresh worker
    # interpreters must ALSO be able to import the gencode — via a >=5.27
    # wheel, or the pre-JVM PYTHONPATH shim (old wheel / vendored runtime)
    if not workers_can_import_gencode():
        return False
    try:
        spec = importlib.util.find_spec("google.protobuf.descriptor")
    except (ImportError, ModuleNotFoundError, ValueError):
        return False
    if spec is None:
        return False
    from pyspark.sql import GroupedData

    return hasattr(GroupedData, "transformWithStateInPandas")


def resolve_stateful_backend(state_profile: str = "small") -> str:
    """The ``impl="auto"`` backend policy, set by MEASUREMENT on BOTH
    axes (VERDICT r9 #4 cardinality, r10 #2 state size; both sweep
    tables and this policy live in docs/scale_notes.md).

    ``state_profile="small"`` — every shipped machine: the fraud
    detector is three scalars plus a bounded armed-timer list, the trend
    machine a few scalars, the signal generator TTL-bounded windows —
    resolves to ``"pandas_state"``: the round-10 sweep measured
    ``applyInPandasWithState`` ~1.6× faster than
    ``transformWithStateInPandas`` at EVERY key cardinality from 50 to
    50,000 keys on identical rows (ratio flat ≈0.6 across three orders
    of magnitude — no crossover in cardinality, so the native backend's
    overhead is per-ROW protocol cost, not per-key round trips; the
    prior qualitative low-cardinality argument is retired).

    ``state_profile="large"`` ALSO resolves to ``"pandas_state"``: the
    round-11 state-size sweep (``bench_streams.state_size_sweep`` — a
    synthetic W4-shaped machine, MapState seeded to 16/256/2048
    entries/key, then micro-batches touching ONE existing entry per
    key, per-batch engine time read from the query's own progress)
    measured the two backends EQUAL within noise at every state size
    (median touch-batch ms, native vs pandas_state: 1043 vs 1026 at 16
    entries, 1096 vs 1139 at 256, 1724 vs 1726 at 2048). The
    qualitative per-variable-access argument — 'a batch touching one
    entry should not pay for the monolithic tuple' — did not survive
    measurement on this runtime either: both backends' touch cost grows
    with TOTAL state size at the same rate (per-batch state-store
    maintenance dominates, not the access-path difference), so it is
    retired the same way the cardinality argument was. The profile
    parameter stays: it is the documented hook where a future runtime
    whose measurement DOES diverge re-splits the policy, and a typo'd
    profile must still fail loudly. Native remains an explicit
    ``impl="native"`` opt-in (real event-time timers, per-variable
    semantics), chosen for fidelity, not throughput."""
    if state_profile not in ("small", "large"):
        # an explicit opt-in must not silently fall back on a typo
        raise ValueError(
            f"unknown state_profile {state_profile!r} (use 'small' or 'large')"
        )
    return "pandas_state"


def _make_fraud_processor(small: float, large: float, window_ms: int):
    """Build the StatefulProcessor subclass lazily: the base class import
    is cheap, but constructing it only behind the availability gate keeps
    this module importable everywhere."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class FraudNativeProcessor(StatefulProcessor):
        """W1/W2 on native state: ValueState flag + ValueState latest
        (fraud_detector.py:53-62) and real event-time timers — the armed
        set IS the timer registry (``handle.listTimers``), no emulation.
        """

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self.handle = handle
            # the reference's two ValueStates, as separate named variables
            self.flag = handle.getValueState("flag", "value boolean")
            self.latest = handle.getValueState("latest", "value bigint")
            # Own mirror of the armed-timer set. The native timer registry
            # still drives WHEN handleExpiredTimer runs, but this ValueState
            # decides WHETHER an expiration is honored: if a runtime
            # snapshots expired timers BEFORE input processing, a timer the
            # machine already fired in-batch (via on_event's interleave)
            # would re-fire after the batch and clear state a same-batch
            # small transaction just set. Guarding on our own armed set
            # makes expiry idempotent under either runtime ordering
            # (ADVICE r4).
            self.armed = handle.getValueState("armed", "armed array<bigint>")

        def _armed_list(self) -> list:
            row = self.armed.get()
            return sorted(row[0]) if row and row[0] is not None else []

        def _machine(self) -> FraudMachine:
            flag_row = self.flag.get()
            latest_row = self.latest.get()
            return FraudMachine(
                flag_row[0] if flag_row else None,
                latest_row[0] if latest_row else None,
                self._armed_list(),
                small,
                large,
                window_ms,
            )

        def _write_back(self, m: FraudMachine, fired_ms: "int | None" = None) -> None:
            if m.flag is None:
                self.flag.clear()
            else:
                self.flag.update((m.flag,))
            if m.latest is None:
                self.latest.clear()
            else:
                self.latest.update((m.latest,))
            before, after = set(m.initial_armed), set(m.armed)
            if before != after:
                if m.armed:
                    self.armed.update((sorted(m.armed),))
                else:
                    self.armed.clear()
            # mirror the machine's armed set into the native timer registry
            # (the runtime already removed a just-fired timer itself)
            for t in before - after:
                if t != fired_ms:
                    self.handle.deleteTimer(t)
            for t in after - before:
                self.handle.registerTimer(t)

        def handleInputRows(
            self,
            key: Any,
            rows: Iterator[pd.DataFrame],
            timerValues: "TimerValues",
        ) -> Iterator[pd.DataFrame]:
            m = self._machine()
            account_id = int(key[0])
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values("ts_us", kind="mergesort")
            for row in batch.itertuples(index=False):
                m.on_event(int(row.ts_us) // 1000, int(row.ts_us), float(row.amount))
            # Timers the watermark already passed are NOT fired here:
            # Spark invokes handleExpiredTimer for them after the batch's
            # input — true Flink ordering, no end-of-batch emulation.
            self._write_back(m)
            if m.alerts:
                yield pd.DataFrame(
                    [(account_id, ts_us, amt) for ts_us, amt in m.alerts],
                    columns=["account_id", "alert_ts_us", "amount"],
                )

        def handleExpiredTimer(
            self,
            key: Any,
            timerValues: "TimerValues",
            expiredTimerInfo: "ExpiredTimerInfo",
        ) -> Iterator[pd.DataFrame]:
            expiry = expiredTimerInfo.getExpiryTimeInMs()
            m = self._machine()
            if expiry not in m.armed:
                # Stale double-fire: the machine already fired this timer
                # inside handleInputRows (a runtime that snapshots expired
                # timers before input delivers it anyway). Honoring it
                # would clear a flag a same-batch small tx just set.
                return iter(())
            # fraud_detector.py:116-133 — on_timer clears BOTH ValueStates
            # unconditionally; the fired timer is removed by the runtime.
            m.on_timer(expiry)
            self._write_back(m, fired_ms=expiry)
            return iter(())

        def close(self) -> None:
            pass

    return FraudNativeProcessor()


def fraud_alert_stream_native(
    src: DataFrame,
    small: float = REF_SMALL_AMOUNT,
    large: float = REF_LARGE_AMOUNT,
    window_ms: int = REF_WINDOW_MS,
) -> DataFrame:
    """Native-backend detector over an already-projected, watermarked
    stream of (account_id, ts, ts_us, amount) — the projection
    :func:`~apache_flink_pratices_spark.streaming.fraud.fraud_alert_stream`
    builds. Event-time mode: timers fire off the stream's watermark."""
    return src.groupBy("account_id").transformWithStateInPandas(
        statefulProcessor=_make_fraud_processor(small, large, window_ms),
        outputStructType=ALERT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


# --------------------------------------------------------------------------
# CEP SignalGenerator on native state (J1 + W4/W5/W6/W7)
# --------------------------------------------------------------------------

# NOTE on TTL: the recently-removed guard is deliberately NOT given a
# native (processing-time) TTL. Its semantics are event-time — the machine
# filters and evicts entries by event time on every read/write
# (SignalMachine.evict_removed), which is the actual TTL implementation —
# and a wall-clock TTL diverges from it in both directions: during a
# backtest replaying a day in minutes nothing would expire early, but if a
# key's stream stalls (or the job is down) longer than the TTL while event
# time barely advances, the store would evict entries still live in event
# time, letting a late 'restore' re-register a just-closed position — the
# exact stale-restore case the guard exists to reject (ADVICE r4). The
# cost is storage for keys that go permanently quiet (bounded by #keys ×
# closed-position entries, bytes per key); reclaiming those is an offline
# state-cleanup concern, not a correctness trade.


def _make_signal_processor():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from apache_flink_pratices_spark.streaming.signal_generator import (
        SignalMachine,
    )

    class SignalNativeProcessor(StatefulProcessor):
        """W4 MapState for positions / removed-guard (TTL is event-time,
        enforced by the machine itself — see module TTL note), W5 ListState
        time-series, W6 ValueState last-orderbook + per-price watches with
        REAL event-time timers (one per distinct deadline), W7 ids via the
        shared machine. Each variable is diffed against its loaded value
        and only written when changed — a trade-only batch never rewrites
        the orderbook state, which is the point of the native port."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self.handle = handle
            self.positions = handle.getMapState(
                "positions",
                "reason string",
                "signal_id string, entry_price double, entry_ts_us bigint",
            )
            # no ttlDurationMs: eviction is event-time, done by the machine
            # itself (see module-level TTL note above)
            self.removed = handle.getMapState(
                "removed",
                "reason string",
                "signal_id string, removed_ts_ms bigint",
            )
            self.last_ob = handle.getValueState(
                "last_ob",
                "ts_us bigint, total_ask bigint, total_bid bigint, "
                "levels array<struct<price bigint, size bigint>>",
            )
            self.watches = handle.getMapState(
                "watches", "price bigint", "size bigint, deadline_ms bigint"
            )
            self.ask_vols = handle.getListState("ask_vols", "ts_us bigint, vol bigint")
            self.trades = handle.getListState("trades", "ts_us bigint, vol double")
            self.win_avgs = handle.getListState("win_avgs", "ts_us bigint, avg double")
            self.scalars = handle.getValueState(
                "scalars",
                "first_seen_us bigint, cond1_ts_us bigint, "
                "cond2_ts_us bigint, last_price double",
            )

        # -- machine <-> state-variable adapters --------------------------
        def _load(self, code: str) -> SignalMachine:
            self._pos0 = {k[0]: tuple(v) for k, v in self.positions.iterator()}
            self._rem0 = {k[0]: tuple(v) for k, v in self.removed.iterator()}
            self._watch0 = {k[0]: tuple(v) for k, v in self.watches.iterator()}
            self._vols0 = [tuple(t) for t in self.ask_vols.get()]
            self._trades0 = [tuple(t) for t in self.trades.get()]
            self._avgs0 = [tuple(t) for t in self.win_avgs.get()]
            ob = self.last_ob.get()
            self._ob0 = (
                (ob[0], ob[1], ob[2], [tuple(l) for l in (ob[3] or [])])
                if ob is not None
                else None
            )
            sc = self.scalars.get()
            self._sc0 = tuple(sc) if sc is not None else (None, None, None, 0.0)
            first, c1, c2, lp = self._sc0
            return SignalMachine(
                code,
                positions=[(r, *v) for r, v in self._pos0.items()],
                removed=[(r, *v) for r, v in self._rem0.items()],
                last_ob=self._ob0,
                watches=[(p, *v) for p, v in self._watch0.items()],
                ask_vols=self._vols0,
                first_seen_us=first,
                trades=self._trades0,
                win_avgs=self._avgs0,
                cond1_ts_us=c1,
                cond2_ts_us=c2,
                last_price=lp if lp is not None else 0.0,
            )

        def _save(self, m: SignalMachine, fired_deadline: int | None = None) -> None:
            pos = {r: (sid, price, ts) for (r, sid, price, ts) in m.positions}
            _sync_map(self.positions, self._pos0, pos)
            rem = {r: (sid, ts) for (r, sid, ts) in m.removed}
            _sync_map(self.removed, self._rem0, rem)
            watch = {p: (size, dl) for (p, size, dl) in m.watches}
            _sync_map(self.watches, self._watch0, watch)
            # timer registry mirrors the distinct watch deadlines
            before = {v[1] for v in self._watch0.values()}
            after = {v[1] for v in watch.values()}
            for t in before - after:
                if t != fired_deadline:  # the runtime removes a fired timer
                    self.handle.deleteTimer(t)
            for t in after - before:
                self.handle.registerTimer(t)
            if m.ask_vols != self._vols0:
                self.ask_vols.put([tuple(t) for t in m.ask_vols])
            if m.trades != self._trades0:
                self.trades.put([tuple(t) for t in m.trades])
            if m.win_avgs != self._avgs0:
                self.win_avgs.put([tuple(t) for t in m.win_avgs])
            if m.last_ob != self._ob0:
                self.last_ob.update(m.last_ob)
            sc = (m.first_seen_us, m.cond1_ts_us, m.cond2_ts_us, m.last_price)
            if sc != self._sc0:
                self.scalars.update(sc)

        def handleInputRows(
            self,
            key: Any,
            rows: Iterator[pd.DataFrame],
            timerValues: "TimerValues",
        ) -> Iterator[pd.DataFrame]:
            m = self._load(key[0])
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values("ts_us", kind="mergesort")
            for row in batch.itertuples(index=False):
                m.process_row(row)
            # No end-of-batch watermark drain: deadlines the watermark has
            # passed fire via handleExpiredTimer (real timers), after input.
            self._save(m)
            if m.signals:
                yield pd.DataFrame(
                    m.signals,
                    columns=["code", "ts_us", "side", "reason", "signal_id", "ref_price"],
                )

        def handleExpiredTimer(
            self,
            key: Any,
            timerValues: "TimerValues",
            expiredTimerInfo: "ExpiredTimerInfo",
        ) -> Iterator[pd.DataFrame]:
            expiry_ms = expiredTimerInfo.getExpiryTimeInMs()
            m = self._load(key[0])
            # Flink's on_timer receives the TIMER's timestamp (not the
            # watermark), so the spoof verify fires at its own deadline —
            # slightly more reference-faithful than the fallback's
            # watermark-time approximation.
            # Inherently stale-fire-safe: fire_due_watches consults the
            # watches MapState, which input processing already updated —
            # a timer whose watch the batch consumed or removed finds no
            # due watch and is a no-op, under either runtime ordering of
            # timer snapshot vs input (ADVICE r4; contract-tested in
            # tests/streaming/test_state_sim.py).
            m.fire_due_watches(expiry_ms, expiry_ms * 1000)
            self._save(m, fired_deadline=expiry_ms)
            if m.signals:
                yield pd.DataFrame(
                    m.signals,
                    columns=["code", "ts_us", "side", "reason", "signal_id", "ref_price"],
                )

        def close(self) -> None:
            pass

    return SignalNativeProcessor()


def _sync_map(state, before: dict, after: dict) -> None:
    """Push a dict diff into a MapState: only changed keys are written."""
    for k in before.keys() - after.keys():
        state.removeKey((k,))
    for k, v in after.items():
        if before.get(k) != v:
            state.updateValue((k,), tuple(v))


def signal_stream_native(src: DataFrame) -> DataFrame:
    """Native-backend SignalGenerator over an already-watermarked unified
    stream (see
    :func:`~apache_flink_pratices_spark.streaming.signal_generator.signal_stream`).
    """
    from apache_flink_pratices_spark.streaming.signal_generator import (
        SIGNAL_SCHEMA,
    )

    return src.groupBy("code").transformWithStateInPandas(
        statefulProcessor=_make_signal_processor(),
        outputStructType=SIGNAL_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


# --------------------------------------------------------------------------
# A2 trend rule on native state (sliding 5s/1s avg, 2-consecutive-decrease)
# --------------------------------------------------------------------------


def _make_trend_processor():
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from apache_flink_pratices_spark.streaming.trend import TrendMachine

    class TrendNativeProcessor(StatefulProcessor):
        """A2 trend rule (시스템 아키텍처.md:641-648) on named state: a
        ListState trade buffer + a scalars ValueState, with ONE real
        event-time timer per key parked on the earliest unfired non-empty
        window end. Firing is a pure fold over the aligned window
        sequence (watermark-step invariant, property-tested), so a stale
        snapshot-delivered timer re-fires nothing — no armed-set guard
        needed."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self.handle = handle
            self.buf = handle.getListState("buf", "ts_us bigint, vol double")
            self.scalars = handle.getValueState(
                "scalars", "prev_avg double, streak int, last_end_ms bigint"
            )

        def _load(self) -> "TrendMachine":
            buf = [(int(t), float(v)) for t, v in self.buf.get()]
            sc = self.scalars.get()
            prev, streak, last = sc if sc is not None else (None, 0, None)
            return TrendMachine(buf, prev, int(streak or 0), last)

        def _save(self, m: "TrendMachine", loaded: "TrendMachine",
                  fired_ms: "int | None" = None) -> None:
            # diff-only writes, like the signal processor
            if m.buf != loaded.buf:
                if m.buf:
                    self.buf.put([tuple(t) for t in m.buf])
                else:
                    self.buf.clear()
            sc = (m.prev_avg, m.streak, m.last_end_ms)
            if sc != (loaded.prev_avg, loaded.streak, loaded.last_end_ms):
                self.scalars.update(sc)
            # single-timer mirror: the deadline is a pure function of
            # state, so diff old vs new deadline
            old_dl, new_dl = loaded.next_deadline_ms(), m.next_deadline_ms()
            if old_dl != new_dl:
                if old_dl is not None and old_dl != fired_ms:
                    self.handle.deleteTimer(old_dl)
                if new_dl is not None:
                    self.handle.registerTimer(new_dl)

        def handleInputRows(
            self,
            key: Any,
            rows: Iterator[pd.DataFrame],
            timerValues: "TimerValues",
        ) -> Iterator[pd.DataFrame]:
            loaded = self._load()
            m = TrendMachine(
                list(loaded.buf), loaded.prev_avg, loaded.streak,
                loaded.last_end_ms,
            )
            batch = pd.concat(list(rows), ignore_index=True)
            for row in batch.itertuples(index=False):
                m.add(int(row.ts_us), float(row.volume))
            m.fire(timerValues.getCurrentWatermarkInMs())
            self._save(m, loaded)
            if m.events:
                yield pd.DataFrame(
                    [(key[0], ts, a, p) for ts, a, p in m.events],
                    columns=["code", "trend_ts_us", "avg_vol", "prev_avg"],
                )

        def handleExpiredTimer(
            self,
            key: Any,
            timerValues: "TimerValues",
            expiredTimerInfo: "ExpiredTimerInfo",
        ) -> Iterator[pd.DataFrame]:
            loaded = self._load()
            m = TrendMachine(
                list(loaded.buf), loaded.prev_avg, loaded.streak,
                loaded.last_end_ms,
            )
            # fire everything the watermark reached, not just the fired
            # deadline — identical to the fallback's timeout branch; a
            # stale timer (already-fired windows) folds to a no-op
            m.fire(timerValues.getCurrentWatermarkInMs())
            self._save(m, loaded, fired_ms=expiredTimerInfo.getExpiryTimeInMs())
            if m.events:
                yield pd.DataFrame(
                    [(key[0], ts, a, p) for ts, a, p in m.events],
                    columns=["code", "trend_ts_us", "avg_vol", "prev_avg"],
                )

        def close(self) -> None:
            pass

    return TrendNativeProcessor()


def trend_stream_native(src: DataFrame) -> DataFrame:
    """Native-backend trend detector over the projected
    (code, ts, ts_us, volume) stream
    :func:`~apache_flink_pratices_spark.streaming.trend.trend_stream`
    builds."""
    from apache_flink_pratices_spark.streaming.trend import TREND_SCHEMA

    return src.groupBy("code").transformWithStateInPandas(
        statefulProcessor=_make_trend_processor(),
        outputStructType=TREND_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
