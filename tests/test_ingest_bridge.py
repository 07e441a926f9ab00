"""WebSocket ingest bridge (S2): reconnect/backoff state machine and error
taxonomy, driven by a scripted fake transport — behavioral parity with the
reference connector's tests (reconnect on connection errors, NO reconnect
on parse errors, exponential backoff, subscription restore)."""

from __future__ import annotations

import asyncio

import pytest

from apache_flink_pratices_spark.ingest.websocket_bridge import (
    BridgeConfig,
    BridgeFailed,
    ConnectionState,
    ParseError,
    WebSocketBridge,
)


class FakeTransport:
    """Pops scripted items: str → delivered frame, Exception → raised."""

    def __init__(self, script, sent):
        self.script = list(script)
        self.sent = sent
        self.closed = False

    async def recv(self):
        if not self.script:
            raise StopAsyncIteration
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item

    async def send(self, msg):
        self.sent.append(msg)

    async def close(self):
        self.closed = True


def _bridge(scripts, subscriptions=(), max_attempts=5, connect_failures=0):
    sent: list[str] = []
    scripts = [list(s) for s in scripts]
    failures = {"n": connect_failures}

    async def factory():
        if failures["n"] > 0:
            failures["n"] -= 1
            raise ConnectionError("connect refused")
        if not scripts:
            raise ConnectionError("no more transports")
        return FakeTransport(scripts.pop(0), sent)

    sunk: list[str] = []
    delays: list[float] = []

    async def fast_sleep(d):
        delays.append(d)

    def parse(raw: str):
        if raw == "garbage":
            raise ParseError(raw)
        return raw.upper()

    bridge = WebSocketBridge(
        factory,
        parse,
        sunk.append,
        BridgeConfig(subscriptions=subscriptions, max_reconnect_attempts=max_attempts),
        sleep=fast_sleep,
    )
    return bridge, sunk, sent, delays


def test_happy_path_and_subscription():
    bridge, sunk, sent, _ = _bridge([["a", "b"]], subscriptions=("sub1", "sub2"))
    asyncio.run(bridge.run())
    assert sunk == ["A", "B"]
    assert sent == ["sub1", "sub2"]
    assert bridge.stats.received == 2 and bridge.stats.parsed == 2


def test_parse_errors_skip_without_reconnect():
    bridge, sunk, _, delays = _bridge([["a", "garbage", "b"]])
    asyncio.run(bridge.run())
    assert sunk == ["A", "B"]
    assert bridge.stats.parse_errors == 1
    assert bridge.stats.reconnects == 0 and delays == []


def test_connection_error_reconnects_and_restores_subscriptions():
    bridge, sunk, sent, delays = _bridge(
        [["a", ConnectionError("drop")], ["b"]], subscriptions=("s",)
    )
    asyncio.run(bridge.run())
    assert sunk == ["A", "B"]
    assert bridge.stats.reconnects == 1
    assert sent == ["s", "s"]  # re-sent after the reconnect
    assert delays == [1.0]  # first backoff = 2^0


def test_exponential_backoff_sequence():
    # every connect fails 3 times before the replacement transport works
    bridge, sunk, _, delays = _bridge(
        [[ConnectionError("drop")], ["x"]], connect_failures=0, max_attempts=5
    )
    # inject connect failures after the drop: patch factory via config
    bridge2, sunk2, _, delays2 = _bridge(
        [["a", ConnectionError("drop")], ["b"]], connect_failures=0
    )
    asyncio.run(bridge2.run())
    assert delays2 == [1.0]
    # direct backoff formula parity with the reference (2^n capped)
    assert [bridge.backoff_delay(n) for n in range(8)] == [
        1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 60.0, 60.0
    ]


def test_attempt_budget_exhaustion_fails():
    bridge, _, _, delays = _bridge(
        [["a", ConnectionError("drop")]], max_attempts=3, connect_failures=99
    )
    with pytest.raises(BridgeFailed):
        asyncio.run(bridge.run())
    assert bridge.state is ConnectionState.FAILED
    assert delays == [1.0, 2.0, 4.0]  # exponential, then give up


def test_cancellation_propagates():
    class EndlessTransport:
        async def recv(self):
            await asyncio.sleep(0)  # suspension point for the cancel
            return "a"

        async def send(self, msg):
            pass

        async def close(self):
            pass

    async def main():
        async def factory():
            return EndlessTransport()

        bridge = WebSocketBridge(factory, lambda r: r, lambda m: None)
        task = asyncio.create_task(bridge.run())
        for _ in range(10):
            await asyncio.sleep(0)
        task.cancel()
        with pytest.raises(asyncio.CancelledError):
            await task
        assert bridge.state is ConnectionState.DISCONNECTED

    asyncio.run(main())


# ---------------------------------------------------------------------------
# Connection-state machine: matrix parity with the reference
# (tests/data_ingestion/domain/models/test_connection_state.py — the full
# 5x5 matrix incl. idempotent self-transitions) and the reconnection
# behaviors its connector suite pins (test_base_websocket_reconnection.py):
# no-reconnect-on-parse-error, single-flight connect, backoff reset on
# success, FAILED-requires-cleanup.
# ---------------------------------------------------------------------------

from apache_flink_pratices_spark.ingest.websocket_bridge import (  # noqa: E402
    InvalidTransitionError,
    StateTransitionTracker,
)

S = ConnectionState
_ALLOWED = {
    (S.DISCONNECTED, S.CONNECTING),
    (S.CONNECTING, S.CONNECTED),
    (S.CONNECTING, S.FAILED),
    (S.CONNECTED, S.DISCONNECTED),
    (S.CONNECTED, S.RECONNECTING),
    (S.CONNECTED, S.FAILED),
    (S.RECONNECTING, S.CONNECTED),
    (S.RECONNECTING, S.FAILED),
    (S.RECONNECTING, S.DISCONNECTED),
    (S.FAILED, S.DISCONNECTED),
} | {(s, s) for s in S}  # same-state hops are idempotent no-ops


@pytest.mark.parametrize("src", list(S))
@pytest.mark.parametrize("dst", list(S))
def test_transition_matrix(src, dst):
    """Full 25-pair matrix, reference connection_state.py:69-75."""
    expected = (src, dst) in _ALLOWED
    assert src.is_valid_transition(dst) is expected
    if expected:
        src.validate_transition(dst)  # must not raise
    else:
        with pytest.raises(InvalidTransitionError, match=f"{src.name} -> {dst.name}"):
            src.validate_transition(dst)


def test_tracker_records_reconnection_flow():
    t = StateTransitionTracker()
    flow = [
        (S.DISCONNECTED, S.CONNECTING, "start"),
        (S.CONNECTING, S.CONNECTED, "handshake"),
        (S.CONNECTED, S.RECONNECTING, "drop"),
        (S.RECONNECTING, S.CONNECTED, "recovered"),
    ]
    for frm, to, why in flow:
        t.record_transition(frm, to, why)
    hist = t.get_history()
    assert [(h["from_state"], h["to_state"], h["reason"]) for h in hist] == flow
    assert all(h["timestamp"] is not None for h in hist)
    t.clear_history()
    assert t.get_history() == []


def test_bridge_history_is_matrix_valid_lifecycle():
    """A full drop-recover-drain run's hops must all be matrix edges and in
    the canonical order."""
    bridge, _, _, _ = _bridge([["a", ConnectionError("drop")], ["b"]])
    asyncio.run(bridge.run())
    hops = [(h["from_state"], h["to_state"]) for h in bridge.tracker.get_history()]
    assert hops == [
        (S.DISCONNECTED, S.CONNECTING),
        (S.CONNECTING, S.CONNECTED),
        (S.CONNECTED, S.RECONNECTING),
        (S.RECONNECTING, S.CONNECTED),
        (S.CONNECTED, S.DISCONNECTED),
    ]
    for frm, to in hops:
        assert frm.is_valid_transition(to)


def test_backoff_resets_after_successful_reconnect():
    """Attempt counter resets on success: two separate outages each start
    back at 2^0, instead of continuing the exponential ladder."""
    bridge, sunk, _, delays = _bridge(
        [["a", ConnectionError("d1")], ["b", ConnectionError("d2")], ["c"]]
    )
    asyncio.run(bridge.run())
    assert sunk == ["A", "B", "C"]
    assert delays == [1.0, 1.0]  # NOT [1.0, 2.0]
    assert bridge.stats.reconnects == 2


def test_single_flight_concurrent_connect():
    """Concurrent connect() callers share one transport: the lock loser
    observes CONNECTED and returns without invoking the factory again."""
    calls = {"n": 0}

    class Slow(FakeTransport):
        pass

    async def factory():
        calls["n"] += 1
        for _ in range(5):  # a suspension window the second caller lands in
            await asyncio.sleep(0)
        return Slow(["a"], [])

    bridge = WebSocketBridge(factory, lambda r: r, lambda m: None, BridgeConfig())

    async def main():
        await asyncio.gather(bridge.connect(), bridge.connect(), bridge.connect())

    asyncio.run(main())
    assert calls["n"] == 1
    assert bridge.state is S.CONNECTED


def test_failed_requires_cleanup_then_retry_succeeds():
    """FAILED's only exit is cleanup → DISCONNECTED (reference matrix); a
    second run() after budget exhaustion must pass through it and succeed."""
    bridge, sunk, _, delays = _bridge(
        [["a"]], max_attempts=2, connect_failures=3
    )
    with pytest.raises(BridgeFailed):
        asyncio.run(bridge.run())
    assert bridge.state is S.FAILED
    asyncio.run(bridge.run())  # factory works now (failures exhausted)
    assert sunk == ["A"]
    hops = [(h["from_state"], h["to_state"]) for h in bridge.tracker.get_history()]
    assert (S.FAILED, S.DISCONNECTED) in hops  # the mandatory cleanup hop
    assert bridge.state is S.DISCONNECTED


def test_parse_error_never_enters_reconnecting_state():
    """Stronger form of the parse-error taxonomy test: the state machine
    never even visits RECONNECTING for a parse failure."""
    bridge, sunk, _, _ = _bridge([["a", "garbage", "garbage", "b"]])
    asyncio.run(bridge.run())
    assert sunk == ["A", "B"]
    visited = {h["to_state"] for h in bridge.tracker.get_history()}
    assert S.RECONNECTING not in visited
    assert bridge.stats.parse_errors == 2


def test_cancel_during_connecting_resolves_through_failed():
    """CONNECTING has no direct edge to DISCONNECTED — a cancel mid-connect
    must resolve CONNECTING → FAILED → DISCONNECTED."""

    async def hanging_factory():
        await asyncio.sleep(3600)

    bridge = WebSocketBridge(hanging_factory, lambda r: r, lambda m: None)

    async def main():
        task = asyncio.create_task(bridge.run())
        for _ in range(10):
            await asyncio.sleep(0)
        task.cancel()
        with pytest.raises(asyncio.CancelledError):
            await task

    asyncio.run(main())
    assert bridge.state is S.DISCONNECTED
    hops = [(h["from_state"], h["to_state"]) for h in bridge.tracker.get_history()]
    assert hops == [
        (S.DISCONNECTED, S.CONNECTING),
        (S.CONNECTING, S.FAILED),
        (S.FAILED, S.DISCONNECTED),
    ]
