"""Streaming metrics via StreamingQueryListener (SURVEY.md §2.4 A6 rates,
§2.6 W9 observability).

The reference exposes Prometheus counters from its Kafka producer
(``src/data_ingestion/infrastructure/kafka/kafka_producer.py:24-63``) and
tracks messages/sec in its connection tester
(``examples/upbit_connection_test.py:183-195``). In Spark the equivalent
observability surface is the query-progress event stream: per-batch input
row counts, processing rates, batch durations and state-store rows arrive
on every micro-batch without touching the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QuerySnapshot:
    batches: int = 0
    total_input_rows: int = 0
    last_rows_per_sec: float = 0.0
    batch_durations_ms: list[int] = field(default_factory=list)
    state_rows: int = 0


class MetricsListener(StreamingQueryListener):
    """Collects per-query throughput/latency/state counters."""

    def __init__(self) -> None:
        self.queries: dict[str, QuerySnapshot] = {}
        self.terminated: set[str] = set()

    def snapshot(self, name: str) -> QuerySnapshot:
        return self.queries.get(name, QuerySnapshot())

    # -- listener callbacks ------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.queries.setdefault(event.name or str(event.id), QuerySnapshot())

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = p.name or str(p.id)
        snap = self.queries.setdefault(name, QuerySnapshot())
        snap.batches += 1
        snap.total_input_rows += int(p.numInputRows or 0)
        snap.last_rows_per_sec = float(p.processedRowsPerSecond or 0.0)
        duration = (p.durationMs or {}).get("triggerExecution")
        if duration is not None:
            snap.batch_durations_ms.append(int(duration))
        for op in p.stateOperators or []:
            snap.state_rows = int(op.numRowsTotal or 0)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.add(str(event.id))


def attach_metrics(spark: SparkSession) -> MetricsListener:
    """Register a fresh metrics listener on the session's stream manager."""
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark: SparkSession, listener: MetricsListener) -> None:
    spark.streams.removeListener(listener)
