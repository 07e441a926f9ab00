"""WebSocket ingest bridge (S2): reconnecting reader → parse → sink.

Behavioral parity with the reference connector
(``src/data_ingestion/infrastructure/connectors/base_websocket.py:194-383``,
state machine ``domain/models/connection_state.py:53-126``):

- connection lifecycle DISCONNECTED → CONNECTING → CONNECTED, with
  RECONNECTING on drop and FAILED after the attempt budget; every hop is
  validated against the reference's transition matrix
  (``connection_state.py:69-75``) — an invalid hop is a bug and raises
  :class:`InvalidTransitionError`;
- exponential backoff ``min(2^attempt, cap)`` seconds; ``max_attempts = 0``
  means retry forever; the attempt counter resets on a successful connect;
- the subscription registry is re-sent after every (re)connect;
- error taxonomy: connection/transport errors reconnect; PARSE errors are
  logged and skipped WITHOUT reconnecting; cancellation propagates
  immediately (graceful shutdown);
- connecting is single-flight: concurrent ``connect()`` callers share one
  attempt instead of opening duplicate transports (reference serializes
  this in the connector's ``connect`` lock);
- FAILED requires cleanup before retry: the only edge out is
  FAILED → DISCONNECTED (reference ``connection_state.py:67``).

Structure is deliberately different from the reference (injected transport
factory + sink callable instead of an ABC hierarchy) — this is a behavior
port, not a code port. Everything is plain asyncio; Spark consumes the
sink's Kafka topics via :mod:`apache_flink_pratices_spark.sources.kafka`.
"""

from __future__ import annotations

import asyncio
import datetime
import enum
from dataclasses import dataclass, field
from typing import Any, Awaitable, Callable


class InvalidTransitionError(RuntimeError):
    """A state hop outside the reference's transition matrix."""


class ConnectionState(enum.Enum):
    DISCONNECTED = "disconnected"
    CONNECTING = "connecting"
    CONNECTED = "connected"
    RECONNECTING = "reconnecting"
    FAILED = "failed"

    def is_valid_transition(self, target: "ConnectionState") -> bool:
        """Reference matrix (``connection_state.py:69-75``); same-state
        transitions are always allowed (idempotency)."""
        if self is target:
            return True
        return target in _VALID_TRANSITIONS[self]

    def validate_transition(self, target: "ConnectionState") -> None:
        if self.is_valid_transition(target):
            return
        valid = ", ".join(
            s.name for s in sorted(_VALID_TRANSITIONS[self], key=lambda s: s.name)
        )
        raise InvalidTransitionError(
            f"Invalid state transition: {self.name} -> {target.name}. "
            f"Valid transitions from {self.name} are: {valid}"
        )


#: Key: current state; value: states reachable from it. DISCONNECTED can
#: only start connecting; CONNECTING resolves to CONNECTED or FAILED (no
#: direct drop-out); CONNECTED may end cleanly, drop into RECONNECTING, or
#: die fatally; RECONNECTING resolves to any terminal; FAILED must be
#: cleaned up (→ DISCONNECTED) before another attempt.
_VALID_TRANSITIONS: dict[ConnectionState, set[ConnectionState]] = {
    ConnectionState.DISCONNECTED: {ConnectionState.CONNECTING},
    ConnectionState.CONNECTING: {ConnectionState.CONNECTED, ConnectionState.FAILED},
    ConnectionState.CONNECTED: {
        ConnectionState.DISCONNECTED,
        ConnectionState.RECONNECTING,
        ConnectionState.FAILED,
    },
    ConnectionState.RECONNECTING: {
        ConnectionState.CONNECTED,
        ConnectionState.FAILED,
        ConnectionState.DISCONNECTED,
    },
    ConnectionState.FAILED: {ConnectionState.DISCONNECTED},
}


class StateTransitionTracker:
    """Transition history for debugging/monitoring (reference
    ``connection_state.py:129-217``)."""

    def __init__(self) -> None:
        self._history: list[dict[str, object]] = []

    def record_transition(
        self, from_state: ConnectionState, to_state: ConnectionState, reason: str
    ) -> None:
        self._history.append(
            {
                "timestamp": datetime.datetime.now(datetime.timezone.utc),
                "from_state": from_state,
                "to_state": to_state,
                "reason": reason,
            }
        )

    def get_history(self) -> list[dict[str, object]]:
        return self._history.copy()

    def clear_history(self) -> None:
        self._history.clear()


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


#: transport/OS errors that trigger the reconnect path; anything else is a
#: programming error and propagates (the reference distinguishes
#: ConnectionClosed/network errors from parse/validation errors,
#: ``test_base_websocket_reconnection.py:78-261``)
_TRANSPORT_ERRORS = (ConnectionError, OSError, TimeoutError)


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
        self.tracker = StateTransitionTracker()
        self._transport: Any = None
        self._attempts = 0
        self._connect_lock = asyncio.Lock()

    # -- state machine ----------------------------------------------------

    def _set_state(self, target: ConnectionState, reason: str) -> None:
        """Every hop goes through the reference matrix — a violation is a
        bridge bug, not a runtime condition."""
        self.state.validate_transition(target)
        if self.state is not target:
            self.tracker.record_transition(self.state, target, reason)
        self.state = target

    def _to_disconnected(self, reason: str) -> None:
        """Reach DISCONNECTED via matrix-valid hops from any state
        (CONNECTING has no direct edge — it must resolve through FAILED)."""
        if self.state is ConnectionState.CONNECTING:
            self._set_state(ConnectionState.FAILED, reason)
        if self.state is not ConnectionState.DISCONNECTED:
            self._set_state(ConnectionState.DISCONNECTED, reason)

    def backoff_delay(self, attempt: int) -> float:
        return float(min(2**attempt, self.config.backoff_cap_s))

    # -- connecting -------------------------------------------------------

    async def _close_transport(self) -> None:
        if self._transport is not None:
            try:
                await self._transport.close()
            except Exception:
                pass  # drop path: the socket may already be dead
            self._transport = None

    async def _raw_open(self) -> None:
        """Factory + subscription restore; no state changes."""
        self._transport = await self._factory()
        # restore the subscription registry on every (re)connect
        for sub in self.config.subscriptions:
            await self._transport.send(sub)

    async def _establish(self, immediate_first: bool) -> None:
        """Open with exponential backoff until success or budget exhaustion.

        Caller holds the connect lock and has set CONNECTING (initial) or
        RECONNECTING (drop). Initial connects try once immediately; drop
        recovery always backs off first (the socket just died)."""
        first = immediate_first
        failed_once = False
        while True:
            if not first:
                budget = self.config.max_reconnect_attempts
                if budget != 0 and self._attempts >= budget:
                    self._set_state(
                        ConnectionState.FAILED,
                        f"gave up after {self._attempts} reconnect attempts",
                    )
                    raise BridgeFailed(
                        f"gave up after {self._attempts} reconnect attempts"
                    )
                delay = self.backoff_delay(self._attempts)
                self._attempts += 1
                self.stats.backoff_delays.append(delay)
                await self._sleep(delay)
            first = False
            try:
                await self._raw_open()
            except _TRANSPORT_ERRORS:
                failed_once = True
                continue  # stay in the current (idempotent) state
            break
        recovered = self.state is ConnectionState.RECONNECTING or failed_once
        self._set_state(ConnectionState.CONNECTED, "handshake + subscriptions restored")
        self._attempts = 0  # reference resets the attempt counter on success
        if recovered:
            self.stats.reconnects += 1

    async def connect(self) -> None:
        """Single-flight connect: concurrent callers share one attempt —
        whoever loses the lock race observes CONNECTED and returns without
        opening a second transport."""
        async with self._connect_lock:
            if self.state is ConnectionState.CONNECTED:
                return
            if self.state is ConnectionState.FAILED:
                # FAILED's only exit is cleanup → DISCONNECTED
                await self._close_transport()
                self._set_state(ConnectionState.DISCONNECTED, "cleanup before retry")
            if self.state is ConnectionState.RECONNECTING:
                await self._close_transport()
                await self._establish(immediate_first=False)
            else:
                self._set_state(ConnectionState.CONNECTING, "connect requested")
                await self._establish(immediate_first=True)

    # -- main loop --------------------------------------------------------

    async def run(self) -> None:
        """Consume until cancelled (or the attempt budget is exhausted)."""
        while True:
            try:
                if self.state is not ConnectionState.CONNECTED:
                    await self.connect()
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
                self._to_disconnected("cancelled (graceful shutdown)")
                raise  # graceful shutdown propagates immediately
            except _TRANSPORT_ERRORS as exc:
                self._set_state(
                    ConnectionState.RECONNECTING, f"transport error: {exc!r}"
                )
            except StopAsyncIteration:
                self._set_state(ConnectionState.DISCONNECTED, "transport drained")
                return  # transport drained (test harness end-of-script)
