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
