"""In-memory ``transformWithStateInPandas`` contract harness.

The native stateful backends (:mod:`.native_state`) target Spark 4's
``transformWithStateInPandas``, whose Python worker hard-requires the
``google-protobuf`` wheel (the state server speaks protobuf to the JVM).
Where the wheel is absent the real runtime cannot start — but the
processor code is still the production path on any real cluster, so it
needs runtime coverage HERE. This module is that coverage: a faithful
in-memory implementation of the exact API surface
``pyspark.sql.streaming.stateful_processor`` defines —
:class:`SimHandle` (getValueState / getListState / getMapState /
registerTimer / deleteTimer / listTimers), the three state-variable
classes with pyspark's method names and tuple-in/tuple-out conventions,
``TimerValues`` / ``ExpiredTimerInfo`` — plus a micro-batch runner that
drives ``init`` → per-key ``handleInputRows`` → watermark-expired
``handleExpiredTimer`` → ``close`` with Spark's scheduling semantics:

- **grouping**: each batch's rows are grouped by the key columns; every
  key's group is delivered as an iterator of pandas DataFrames (like
  Arrow batches).
- **watermark**: the event-time watermark used by batch N is computed
  from the event times of batches 1..N-1 minus the delay — Spark updates
  the watermark *between* micro-batches, so a batch never sees its own
  data's watermark. After the last batch the runner executes one
  timer-only batch with the final watermark (the no-data batch
  ``processAllAvailable`` triggers when an advanced watermark has
  expired timers).
- **timer ordering**: by default, expired timers are collected AFTER the
  batch's input processing, from the live registry — matching
  ``TransformWithStateExec``, whose output iterator chains the timer
  phase after the data phase, so ``deleteTimer`` calls made while
  handling input take effect. ``snapshot_timers_before_input=True``
  switches to the adversarial ordering (expired set frozen before input)
  to prove processors tolerate a runtime that delivers a timer the batch
  already consumed — the stale-double-fire hazard flagged in ADVICE r4.
- **fired timers**: the runner removes a fired timer from the registry
  itself before invoking ``handleExpiredTimer``, like the runtime, so a
  processor must NOT ``deleteTimer`` the expiry it is handling.

Deliberately not modeled: TTL (no shipped processor uses native TTL —
the removed-guard's TTL is event-time and lives in the machine, see the
note in :mod:`.native_state`), schema enforcement (the sim is
schemaless; schema strings are accepted and recorded), and RocksDB
persistence. State round-trips through plain tuples exactly as the real
client does.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    TimerValues,
)


class SimValueState:
    """pyspark ``ValueState``: Optional[tuple] get / tuple update / clear."""

    def __init__(self, store: "SimStateStore", name: str) -> None:
        self._store, self._name = store, name

    def _slot(self) -> tuple:
        return (self._name, self._store.current_key)

    def exists(self) -> bool:
        return self._slot() in self._store.values

    def get(self):
        return self._store.values.get(self._slot())

    def update(self, newValue) -> None:
        self._store.values[self._slot()] = tuple(newValue)

    def clear(self) -> None:
        self._store.values.pop(self._slot(), None)


class SimListState:
    """pyspark ``ListState``: iterator get / list put / append / clear."""

    def __init__(self, store: "SimStateStore", name: str) -> None:
        self._store, self._name = store, name

    def _slot(self) -> tuple:
        return (self._name, self._store.current_key)

    def exists(self) -> bool:
        return bool(self._store.lists.get(self._slot()))

    def get(self) -> Iterator[tuple]:
        return iter(self._store.lists.get(self._slot(), []))

    def put(self, newState) -> None:
        self._store.lists[self._slot()] = [tuple(v) for v in newState]

    def appendValue(self, newState) -> None:
        self._store.lists.setdefault(self._slot(), []).append(tuple(newState))

    def appendList(self, newState) -> None:
        self._store.lists.setdefault(self._slot(), []).extend(
            tuple(v) for v in newState
        )

    def clear(self) -> None:
        self._store.lists.pop(self._slot(), None)


class SimMapState:
    """pyspark ``MapState``: tuple-keyed get/update/iterate/remove."""

    def __init__(self, store: "SimStateStore", name: str) -> None:
        self._store, self._name = store, name

    def _map(self) -> dict:
        return self._store.maps.setdefault(
            (self._name, self._store.current_key), {}
        )

    def exists(self) -> bool:
        return bool(self._map())

    def getValue(self, key):
        return self._map().get(tuple(key))

    def containsKey(self, key) -> bool:
        return tuple(key) in self._map()

    def updateValue(self, key, value) -> None:
        self._map()[tuple(key)] = tuple(value)

    def iterator(self) -> Iterator[tuple]:
        return iter(list(self._map().items()))

    def keys(self) -> Iterator[tuple]:
        return iter(list(self._map().keys()))

    def values(self) -> Iterator[tuple]:
        return iter(list(self._map().values()))

    def removeKey(self, key) -> None:
        self._map().pop(tuple(key), None)

    def clear(self) -> None:
        self._store.maps.pop((self._name, self._store.current_key), None)


class SimStateStore:
    """All keys' state variables + per-key timer registries."""

    def __init__(self) -> None:
        self.values: dict[tuple, tuple] = {}
        self.lists: dict[tuple, list] = {}
        self.maps: dict[tuple, dict] = {}
        self.timers: dict[tuple, set[int]] = {}
        self.current_key: tuple = ()
        #: declared (name, kind, schema...) — recorded for assertions
        self.declared: list[tuple] = []


class SimHandle:
    """pyspark ``StatefulProcessorHandle`` over a :class:`SimStateStore`."""

    def __init__(self, store: SimStateStore) -> None:
        self._store = store

    def getValueState(self, stateName: str, schema, ttlDurationMs=None):
        self._store.declared.append((stateName, "value", schema, ttlDurationMs))
        return SimValueState(self._store, stateName)

    def getListState(self, stateName: str, schema, ttlDurationMs=None):
        self._store.declared.append((stateName, "list", schema, ttlDurationMs))
        return SimListState(self._store, stateName)

    def getMapState(
        self, stateName: str, userKeySchema, valueSchema, ttlDurationMs=None
    ):
        self._store.declared.append(
            (stateName, "map", userKeySchema, valueSchema, ttlDurationMs)
        )
        return SimMapState(self._store, stateName)

    def registerTimer(self, expiryTimestampMs: int) -> None:
        self._store.timers.setdefault(self._store.current_key, set()).add(
            int(expiryTimestampMs)
        )

    def deleteTimer(self, expiryTimestampMs: int) -> None:
        self._store.timers.get(self._store.current_key, set()).discard(
            int(expiryTimestampMs)
        )

    def listTimers(self) -> Iterator[int]:
        return iter(sorted(self._store.timers.get(self._store.current_key, set())))

    def deleteIfExists(self, stateName: str) -> None:
        for coll in (self._store.values, self._store.lists, self._store.maps):
            for slot in [s for s in coll if s[0] == stateName]:
                coll.pop(slot, None)


class SimQueryRun:
    """Result of :func:`run_transform_with_state`: collected output plus
    the store for state assertions."""

    def __init__(self, store: SimStateStore, outputs: list, fired: list) -> None:
        self.store = store
        self.outputs = outputs
        #: (key, expiry_ms) of every handleExpiredTimer invocation
        self.fired = fired

    def output(self) -> pd.DataFrame:
        if not self.outputs:
            return pd.DataFrame()
        return pd.concat(self.outputs, ignore_index=True)


def run_transform_with_state(
    processor: StatefulProcessor,
    batches: list[pd.DataFrame],
    key_cols: list[str],
    event_ts_us_col: str = "ts_us",
    watermark_delay_ms: int = 0,
    snapshot_timers_before_input: bool = False,
) -> SimQueryRun:
    """Drive a StatefulProcessor through micro-batches, Spark-style.

    ``batches`` are pandas DataFrames (one per micro-batch) whose
    ``event_ts_us_col`` carries event time in microseconds (the same
    column the shipped processors consume)."""
    store = SimStateStore()
    handle = SimHandle(store)
    processor.init(handle)
    outputs: list[pd.DataFrame] = []
    fired: list[tuple] = []
    wm_ms = 0  # Spark's initial event-time watermark
    max_event_ms = 0

    def expired_now() -> list[tuple]:
        return sorted(
            (key, t)
            for key, ts in store.timers.items()
            for t in ts
            if t <= wm_ms
        )

    def run_timer_phase(expired: list[tuple]) -> None:
        for key, t in expired:
            # the runtime removes a fired timer before the callback
            store.timers.get(key, set()).discard(t)
            store.current_key = key
            fired.append((key, t))
            for out in processor.handleExpiredTimer(
                key, TimerValues(-1, wm_ms), ExpiredTimerInfo(t)
            ):
                outputs.append(out)

    for batch in batches:
        pre_expired = expired_now() if snapshot_timers_before_input else None
        for key, group in batch.groupby(key_cols, sort=True):
            key_t = key if isinstance(key, tuple) else (key,)
            store.current_key = key_t
            for out in processor.handleInputRows(
                key_t, iter([group.reset_index(drop=True)]), TimerValues(-1, wm_ms)
            ):
                outputs.append(out)
        run_timer_phase(
            pre_expired if snapshot_timers_before_input else expired_now()
        )
        if len(batch):
            max_event_ms = max(max_event_ms, int(batch[event_ts_us_col].max()) // 1000)
        wm_ms = max(wm_ms, max_event_ms - watermark_delay_ms)
    # final no-data batch: the watermark advanced past the last data —
    # fire whatever it expired (processAllAvailable's trailing batch)
    run_timer_phase(expired_now())
    processor.close()
    return SimQueryRun(store, outputs, fired)
