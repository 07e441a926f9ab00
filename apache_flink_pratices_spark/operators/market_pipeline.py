"""Market-data JSON ingestion pipeline (P4+P5+P6+P7 composed) — the
engine-side restatement of the reference's WebSocket message path:

- **P4** strict parse + required-field/type filtering: corrupt payloads
  and unknown message types are dropped at parse time
  (``src/data_ingestion/infrastructure/connectors/upbit_connector.py:95-167``);
- **P5** domain conversion + event-time extraction with the
  ``trade_timestamp``-falls-back-to-``timestamp`` rule
  (``upbit_connector.py:169-230``);
- **P6** validation predicates: KRW market prefix, event time must not
  trail receipt (``domain/models/market_data.py:147-239``);
- **P7** code normalization to upper case (``market_data.py:114-135``).

The JSON payloads are synthesized from `events` with integer-only values
(identical string rendering in both engines), including deliberately
corrupt rows (truncated JSON), unknown types, non-KRW markets, missing
``ttms`` fields and causality violations — every drop-path of the
reference's parser is exercised and the oracle mirrors each one.

Scale: pure per-row map work; the parse stays in the JVM (``from_json``),
filters reach the scan where derivable, and no shuffle exists at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

_MSG_SCHEMA = T.StructType(
    [
        T.StructField("ty", T.StringType()),
        T.StructField("cd", T.StringType()),
        T.StructField("tp", T.LongType()),
        T.StructField("tv", T.LongType()),
        T.StructField("ttms", T.LongType()),
        T.StructField("tms", T.LongType()),
    ]
)

#: network delay added to the wire timestamp to form receive time (ms)
_RECV_DELAY_MS = 1500

_SQL_BUILD = """
  base AS (
    SELECT event_id,
           CAST(epoch_us(ts) AS BIGINT) // 1000 AS tms,
           CAST(floor(value * 100) AS BIGINT) AS tp,
           event_id % 1000 + 1 AS tv,
           CASE WHEN event_id % 5 IN (0, 3, 4) THEN 'trade'
                WHEN event_id % 5 = 1 THEN 'orderbook'
                ELSE 'ticker' END AS ty,
           CASE WHEN event_id % 3 = 0 THEN 'krw-btc'
                WHEN event_id % 3 = 1 THEN 'KRW-ETH'
                ELSE 'usd-xrp' END AS cd,
           (event_id % 4 <> 0) AS has_ttms,
           (event_id % 97 = 0) AS future_ts
    FROM events
  ),
  built AS (
    SELECT event_id,
           CASE WHEN event_id % 101 = 0 THEN '{"broken'
                ELSE '{"ty":"' || ty || '","cd":"' || cd || '","tp":' || tp
                     || ',"tv":' || tv
                     || CASE WHEN has_ttms THEN
                          ',"ttms":' || CASE WHEN future_ts THEN tms + 99999
                                             ELSE tms - 40 END
                        ELSE '' END
                     || ',"tms":' || tms || '}'
           END AS js
    FROM base
  )
"""


def _build_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → raw JSON wire payloads (integer-only values so both
    engines render byte-identical strings)."""
    e = load(spark, sf_dir, "events")
    tms = F.expr("unix_micros(ts) div 1000")
    tp = F.floor(F.col("value") * 100).cast("long")
    tv = F.col("event_id") % 1000 + 1
    ty = (
        F.when(F.col("event_id") % 5 == 1, "orderbook")
        .when(F.col("event_id") % 5 == 2, "ticker")
        .otherwise("trade")
    )
    cd = (
        F.when(F.col("event_id") % 3 == 0, "krw-btc")
        .when(F.col("event_id") % 3 == 1, "KRW-ETH")
        .otherwise("usd-xrp")
    )
    ttms_part = F.when(
        F.col("event_id") % 4 != 0,
        F.concat(
            F.lit(',"ttms":'),
            F.when(F.col("event_id") % 97 == 0, tms + 99999).otherwise(tms - 40).cast("string"),
        ),
    ).otherwise(F.lit(""))
    js = F.when(F.col("event_id") % 101 == 0, F.lit('{"broken')).otherwise(
        F.concat(
            F.lit('{"ty":"'), ty, F.lit('","cd":"'), cd,
            F.lit('","tp":'), tp.cast("string"),
            F.lit(',"tv":'), tv.cast("string"),
            ttms_part,
            F.lit(',"tms":'), tms.cast("string"), F.lit("}"),
        )
    )
    return e.select("event_id", js.alias("js"))


def sql_parsed_market_rows(restrict_types: bool = True) -> str:
    """DuckDB CTE chain ending in a ``typed`` relation: the parsed,
    validated market rows (optionally without the trade/orderbook type
    restriction, for consumers that route on event_type themselves)."""
    type_filter = "AND ty IN ('trade', 'orderbook')" if restrict_types else ""
    return f"""
    {_SQL_BUILD},
    valid AS (SELECT event_id, js FROM built WHERE json_valid(js)),
    parsed AS (
      SELECT event_id,
             json_extract_string(js, '$.ty') AS ty,
             json_extract_string(js, '$.cd') AS cd,
             CAST(json_extract(js, '$.tp') AS BIGINT) AS tp,
             CAST(json_extract(js, '$.tv') AS BIGINT) AS tv,
             CAST(json_extract(js, '$.ttms') AS BIGINT) AS ttms,
             CAST(json_extract(js, '$.tms') AS BIGINT) AS tms
      FROM valid
    ),
    typed AS (
      SELECT event_id,
             upper(cd) AS code,
             ty AS event_type,
             tp AS price_cents,
             tv AS volume_milli,
             coalesce(ttms, tms) AS event_ts_ms,
             tms + {_RECV_DELAY_MS} AS recv_ts_ms
      FROM parsed
      WHERE upper(cd) LIKE 'KRW-%'
        AND coalesce(ttms, tms) <= tms + {_RECV_DELAY_MS}
        {type_filter}
    )
    """


def parsed_market_rows(
    spark: SparkSession, sf_dir: str, restrict_types: bool = True
) -> DataFrame:
    """Parsed + validated market rows; ``restrict_types=False`` keeps
    unrouted types (ticker) so downstream topic routing can drop them."""
    raw = _build_payloads(spark, sf_dir)
    p = raw.select("event_id", F.from_json("js", _MSG_SCHEMA).alias("m"))
    event_ts = F.coalesce(F.col("m.ttms"), F.col("m.tms"))
    recv_ts = F.col("m.tms") + _RECV_DELAY_MS
    out = p.filter(F.col("m").isNotNull() & F.col("m.ty").isNotNull())
    if restrict_types:
        out = out.filter(F.col("m.ty").isin("trade", "orderbook"))
    return (
        out.filter(F.upper(F.col("m.cd")).startswith("KRW-"))
        .filter(event_ts <= recv_ts)
        .select(
            "event_id",
            F.upper(F.col("m.cd")).alias("code"),
            F.col("m.ty").alias("event_type"),
            F.col("m.tp").alias("price_cents"),
            F.col("m.tv").alias("volume_milli"),
            event_ts.alias("event_ts_ms"),
            recv_ts.alias("recv_ts_ms"),
        )
    )


@register(
    "p_market_pipeline",
    oracle=f"""
    WITH {sql_parsed_market_rows(restrict_types=True)}
    SELECT * FROM typed
    """,
    doc="P4-P7 composed: strict JSON parse (corrupt rows dropped), "
    "type/subscription filter, KRW-prefix + causality validation, code "
    "normalization, event-time extraction with ttms→tms fallback — the "
    "reference's WebSocket parse path as one JVM-side plan.",
    tags=("transform", "json", "pipeline"),
)
def p_market_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parsed_market_rows(spark, sf_dir, restrict_types=True)
