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


# --- K2/K3 wire projection as oracle-checked batch queries -----------------
# The sink's column construction is pure projection, so it is verifiable
# without a broker (VERDICT r2 #3): build the exact (key, value[, topic])
# frame Spark's Kafka writer consumes, then emit driver-comparable columns
# (key text, value md5 + byte length — md5 proves the value bytes match
# across engines without pushing raw BLOBs through the driver's hash).
def _wire_payload() -> Column:
    """Serialized value payload — integer-only JSON so both engines render
    byte-identical strings (same trick as the market-pipeline corpus)."""
    return F.concat(
        F.lit('{"code":"'), F.col("code"),
        F.lit('","t":'), F.col("event_ts_ms").cast("string"),
        F.lit(',"p":'), F.col("price_cents").cast("string"),
        F.lit(',"v":'), F.col("volume_milli").cast("string"),
        F.lit("}"),
    )


_SQL_WIRE_PAYLOAD = (
    "'{\"code\":\"' || code || '\",\"t\":' || event_ts_ms || "
    "',\"p\":' || price_cents || ',\"v\":' || volume_milli || '}'"
)


def _register_wire_queries() -> None:
    from apache_flink_pratices_spark.operators.market_pipeline import (
        parsed_market_rows,
        sql_parsed_market_rows,
    )
    from apache_flink_pratices_spark.registry import register

    @register(
        "kafka_wire_trades",
        oracle=f"""
        WITH {sql_parsed_market_rows(restrict_types=True)}
        SELECT code AS key_str,
               md5({_SQL_WIRE_PAYLOAD}) AS value_md5,
               CAST(strlen({_SQL_WIRE_PAYLOAD}) AS BIGINT) AS value_len
        FROM typed
        WHERE event_type = 'trade'
        """,
        doc="K2 Kafka sink wire frame for trades: key = market code "
        "(Kafka hash partitioning → per-key ordering, reference "
        "kafka_producer.py:240-245), value = serialized payload. The "
        "registered output carries the key text plus md5/length of the "
        "value bytes, proving the exact bytes the producer would send.",
        tags=("sink", "kafka"),
    )
    def kafka_wire_trades(spark, sf_dir):
        rows = parsed_market_rows(spark, sf_dir, restrict_types=True).filter(
            F.col("event_type") == "trade"
        )
        wire = to_kafka_frame(rows.withColumn("payload", _wire_payload()), "code", "payload")
        return wire.select(
            F.col("key").cast("string").alias("key_str"),
            F.md5(F.col("value")).alias("value_md5"),
            F.length(F.col("value")).cast("long").alias("value_len"),
        )

    @register(
        "kafka_wire_routed",
        oracle=f"""
        WITH {sql_parsed_market_rows(restrict_types=False)}
        SELECT code AS key_str,
               md5({_SQL_WIRE_PAYLOAD}) AS value_md5,
               CASE event_type WHEN 'trade' THEN '{TRADES_TOPIC}'
                               WHEN 'orderbook' THEN '{ORDERBOOKS_TOPIC}'
               END AS topic
        FROM typed
        WHERE event_type IN ('trade', 'orderbook')
        """,
        doc="K3 topic routing: one wire frame serves all topics via the "
        "topic column (trade → upbit.trades.v1, orderbook → "
        "upbit.orderbooks.v1, reference ingestion_service.py:322-337); "
        "unrouted types (ticker) get a NULL topic and are skipped, the "
        "reference's log-and-skip stance.",
        tags=("sink", "kafka", "routing"),
    )
    def kafka_wire_routed(spark, sf_dir):
        rows = parsed_market_rows(spark, sf_dir, restrict_types=False)
        wire = to_kafka_frame(
            rows.withColumn("payload", _wire_payload()), "code", "payload",
            type_col="event_type",
        )
        return wire.select(
            F.col("key").cast("string").alias("key_str"),
            F.md5(F.col("value")).alias("value_md5"),
            F.col("topic"),
        )


_register_wire_queries()


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
