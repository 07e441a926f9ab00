"""WebSocket ingest bridge (S2): reconnecting reader → parse → sink.

Behavioral parity with the reference connector
(``src/data_ingestion/infrastructure/connectors/base_websocket.py:194-383``,
state machine ``domain/models/connection_state.py:53-126``):

- connection lifecycle DISCONNECTED → CONNECTING → CONNECTED, with
  RECONNECTING on drop and FAILED after the attempt budget;
- exponential backoff ``min(2^attempt, cap)`` seconds; ``max_attempts = 0``
  means retry forever; the attempt counter resets on a successful connect;
- the subscription registry is re-sent after every (re)connect;
- error taxonomy: connection/transport errors reconnect; PARSE errors are
  logged and skipped WITHOUT reconnecting; cancellation propagates
  immediately (graceful shutdown).

Structure is deliberately different from the reference (injected transport
factory + sink callable instead of an ABC hierarchy) — this is a behavior
port, not a code port. Everything is plain asyncio; Spark consumes the
sink's Kafka topics via :mod:`apache_flink_pratices_spark.sources.kafka`.
"""

from __future__ import annotations

import asyncio
import enum
from dataclasses import dataclass, field
from typing import Any, Awaitable, Callable


class ConnectionState(enum.Enum):
    DISCONNECTED = "disconnected"
    CONNECTING = "connecting"
    CONNECTED = "connected"
    RECONNECTING = "reconnecting"
    FAILED = "failed"


class ParseError(Exception):
    """Malformed message — skip it, never reconnect for it."""


class BridgeFailed(Exception):
    """Reconnect attempt budget exhausted."""


@dataclass
class BridgeConfig:
    subscriptions: tuple[str, ...] = ()
    max_reconnect_attempts: int = 5  # 0 = retry forever
    backoff_cap_s: float = 60.0


@dataclass
class BridgeStats:
    received: int = 0
    parsed: int = 0
    parse_errors: int = 0
    reconnects: int = 0
    backoff_delays: list[float] = field(default_factory=list)


class WebSocketBridge:
    """Drives ``transport_factory() → recv()`` into ``sink(message)``.

    ``transport_factory`` is an async callable returning a transport with
    ``recv() -> str`` and ``send(str)`` and ``close()``; ``parse`` maps a
    raw frame to a message (raising :class:`ParseError` to skip);
    ``sink`` receives parsed messages (the Kafka producer in production).
    """

    def __init__(
        self,
        transport_factory: Callable[[], Awaitable[Any]],
        parse: Callable[[str], Any],
        sink: Callable[[Any], Awaitable[None] | None],
        config: BridgeConfig | None = None,
        sleep: Callable[[float], Awaitable[None]] = asyncio.sleep,
    ) -> None:
        self._factory = transport_factory
        self._parse = parse
        self._sink = sink
        self.config = config or BridgeConfig()
        self._sleep = sleep
        self.state = ConnectionState.DISCONNECTED
        self.stats = BridgeStats()
        self._transport: Any = None
        self._attempts = 0

    def backoff_delay(self, attempt: int) -> float:
        return float(min(2**attempt, self.config.backoff_cap_s))

    async def _connect(self) -> None:
        self.state = ConnectionState.CONNECTING
        self._transport = await self._factory()
        # restore the subscription registry on every (re)connect
        for sub in self.config.subscriptions:
            await self._transport.send(sub)
        self.state = ConnectionState.CONNECTED
        self._attempts = 0

    async def _reconnect(self) -> None:
        self.state = ConnectionState.RECONNECTING
        if self._transport is not None:
            try:
                await self._transport.close()
            except Exception:
                pass
            self._transport = None
        while (
            self.config.max_reconnect_attempts == 0
            or self._attempts < self.config.max_reconnect_attempts
        ):
            delay = self.backoff_delay(self._attempts)
            self._attempts += 1
            self.stats.backoff_delays.append(delay)
            await self._sleep(delay)
            try:
                await self._connect()
                self.stats.reconnects += 1
                return
            except (ConnectionError, OSError, TimeoutError):
                self.state = ConnectionState.RECONNECTING
        self.state = ConnectionState.FAILED
        raise BridgeFailed(f"gave up after {self._attempts} reconnect attempts")

    async def run(self) -> None:
        """Consume until cancelled (or the attempt budget is exhausted)."""
        while True:
            try:
                if self.state != ConnectionState.CONNECTED:
                    if self.state in (
                        ConnectionState.DISCONNECTED,
                        ConnectionState.CONNECTING,
                    ):
                        await self._connect()
                    else:
                        await self._reconnect()
                raw = await self._transport.recv()
                self.stats.received += 1
                try:
                    msg = self._parse(raw)
                except ParseError:
                    self.stats.parse_errors += 1
                    continue  # parse errors never reconnect
                self.stats.parsed += 1
                result = self._sink(msg)
                if asyncio.iscoroutine(result):
                    await result
            except asyncio.CancelledError:
                self.state = ConnectionState.DISCONNECTED
                raise  # graceful shutdown propagates immediately
            except (ConnectionError, OSError, TimeoutError):
                self.state = ConnectionState.RECONNECTING
            except StopAsyncIteration:
                self.state = ConnectionState.DISCONNECTED
                return  # transport drained (test harness end-of-script)
