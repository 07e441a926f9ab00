"""Projections / filters / row transforms (SURVEY.md §2.3, P1-P8 analogues)
expressed over the driver's tables.

Reference parity:
- P3 predicate filters — reference ``examples/stream_source_example.py:19,39``
  (even-number and event-type filters).
- P4 JSON parse + field extraction — reference
  ``src/data_ingestion/infrastructure/connectors/upbit_connector.py:95-167``
  (strict parse, required-field filter, drop unknown types).
- P6/P7 validation + normalization — reference
  ``src/data_ingestion/domain/models/market_data.py:114-239``.
- W7 deterministic IDs — reference ``docs/project docs/호가창 분석 스캘퍼:
  시스템 아키텍처.md:977-998`` (sha256 replay-idempotent signal IDs).

All transforms are pure column expressions (JVM-side, whole-stage codegen);
no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_flink_pratices_spark.functions.hashing import signal_id, sql_signal_id
from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register


@register(
    "p_filter_even_clicks",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id % 2 = 0 AND event_type = 'click'
    """,
    doc="P3: predicate filter (parity + equality), pushed to the parquet scan.",
    tags=("transform", "filter"),
)
def p_filter_even_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.filter((F.col("event_id") % 2 == 0) & (F.col("event_type") == "click")).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "p_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(json_extract_string(props, '$.k')) AS k_cnt
    FROM events
    GROUP BY event_type
    """,
    doc="P4: parse the raw JSON payload column, extract typed field, aggregate. "
    "Mirrors the reference's raw_data dict carried alongside typed fields "
    "(market_data.py:82,138-145).",
    tags=("transform", "json"),
)
def p_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), T.StructType([T.StructField("k", T.LongType())]))["k"]
    return e.withColumn("k", k).groupBy("event_type").agg(
        F.sum("k").alias("k_sum"), F.count("k").alias("k_cnt")
    )


@register(
    "p_normalize_validate",
    oracle="""
    SELECT upper(trim(source)) AS source_code, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
      AND lang IN ('en', 'de', 'es', 'fr', 'zh')
      AND n_chars = length(text)
    GROUP BY source_code, lang
    """,
    doc="P6/P7: validation predicates (non-empty payload, enum membership, "
    "declared-length consistency) + code normalization (upper/trim), as in "
    "market_data.py:114-239. Invalid rows are filtered, valid rows aggregated.",
    tags=("transform", "validate"),
)
def p_normalize_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    valid = (
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & F.col("lang").isin("en", "de", "es", "fr", "zh")
        & (F.col("n_chars") == F.length("text"))
    )
    return (
        d.filter(valid)
        .withColumn("source_code", F.upper(F.trim(F.col("source"))))
        .groupBy("source_code", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "w7_signal_ids",
    oracle=f"""
    SELECT event_id,
           {sql_signal_id('user_id', "event_type", 'event_id')} AS sig_id
    FROM events
    WHERE event_type = 'signup'
    """,
    doc="W7: deterministic sha256 signal IDs — identical on replay, enabling "
    "at-least-once + downstream dedup (the reference's chosen exactly-once "
    "stance, 시스템 아키텍처.md:1326-1360).",
    tags=("transform", "ids"),
)
def w7_signal_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "signup")
        .select("event_id", signal_id(F.col("user_id"), F.col("event_type"), F.col("event_id")).alias("sig_id"))
    )
