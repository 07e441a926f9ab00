"""Kafka sink with key partitioning + per-event-type topic routing (K2/K3).

Reference:

- producer keyed by market code so same-market messages stay ordered —
  ``src/data_ingestion/infrastructure/kafka/kafka_producer.py:240-245``;
- topic routing TRADE → ``upbit.trades.v1``, ORDERBOOK →
  ``upbit.orderbooks.v1`` — ``src/data_ingestion/application/services/
  ingestion_service.py:322-337``;
- delivery guarantees via producer options (acks=all, idempotent producer)
  rather than transactions — the reference's measured choice
  (``시스템 아키텍처.md:1326-1360``).

Spark's Kafka sink takes ``key``/``value`` binary columns and an optional
``topic`` string column — a single writer serves multiple topics, which is
exactly the K3 routing pattern. Retries/acks/batching are producer options
(``kafka.*``), mirroring ``kafka_producer.py:105-115``.

:func:`to_kafka_frame` (pure column construction) is unit-tested without a
broker; :func:`write_kafka_stream` wires the writer (jar required).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from apache_flink_pratices_spark.sources.kafka import ORDERBOOKS_TOPIC, TRADES_TOPIC

#: event-type → topic routing table (ingestion_service.py:322-337)
TOPIC_BY_TYPE: dict[str, str] = {
    "trade": TRADES_TOPIC,
    "orderbook": ORDERBOOKS_TOPIC,
}

#: producer options mirroring the reference's tuned async producer
#: (kafka_producer.py:105-115): durable acks, idempotence, lz4 batching.
PRODUCER_OPTIONS: dict[str, str] = {
    "kafka.acks": "all",
    "kafka.enable.idempotence": "true",
    "kafka.compression.type": "lz4",
    "kafka.linger.ms": "5",
    "kafka.max.in.flight.requests.per.connection": "5",
}


def route_topic(type_col: Column, routing: dict[str, str] | None = None) -> Column:
    """Topic column from the event-type discriminator; unknown types get a
    NULL topic, which the caller should filter (the reference logs & skips
    unknown types at parse time, upbit_connector.py:148-156)."""
    routing = routing or TOPIC_BY_TYPE
    expr: Column | None = None
    for etype, topic in routing.items():
        expr = (
            F.when(type_col == etype, F.lit(topic))
            if expr is None
            else expr.when(type_col == etype, F.lit(topic))
        )
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("string"))


def to_kafka_frame(
    df: DataFrame,
    key_col: str,
    value_col: str,
    type_col: str | None = None,
    routing: dict[str, str] | None = None,
) -> DataFrame:
    """Shape rows into Kafka wire columns (key, value[, topic]).

    ``key`` drives Kafka's hash partitioning → per-key ordering; ``value``
    is the serialized payload (string or binary column)."""
    cols = [
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.col(value_col).cast("binary").alias("value"),
    ]
    out = df
    if type_col is not None:
        out = out.withColumn("topic", route_topic(F.col(type_col), routing)).filter(
            F.col("topic").isNotNull()
        )
        cols.append(F.col("topic"))
    return out.select(*cols)


def write_kafka_stream(
    wire: DataFrame,
    brokers: str,
    checkpoint_dir: str,
    topic: str | None = None,
    output_mode: str = "append",
) -> StreamingQuery:
    """Start the Kafka sink (requires the spark-sql-kafka jar).

    If ``wire`` carries a ``topic`` column, one writer serves all routed
    topics (K3); otherwise ``topic`` must be given. The checkpoint dir
    makes the sink at-least-once across restarts — pair with the
    deterministic W7 signal IDs for downstream dedup (the reference's
    exactly-once stance)."""
    writer = (
        wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    for k, v in PRODUCER_OPTIONS.items():
        writer = writer.option(k, v)
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer.start()
