"""Typed market-data model (SURVEY.md §1, P5/P6): the Spark schemas for the
reference's domain objects.

Reference shapes:

- Trade — 11 scalar fields + metadata (``proto/market_data.proto:9-24``,
  ``src/data_ingestion/domain/models/market_data.py:45-300``);
- OrderBookUpdate — top-N ask/bid levels as ``repeated OrderBookLevel``
  (``proto/market_data.proto:27-45``), i.e. an array-of-struct column;
- validation invariants — ``KRW-`` code prefix, upper-cased codes,
  tz-aware UTC timestamps, ``event_ts ≤ received_ts``, non-empty payload
  (``market_data.py:114-239``).

Timestamps are carried as epoch-microsecond longs next to TimestampType
where exact cross-engine comparison matters (TESTDATA convention).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: one price level of an order book side
ORDERBOOK_LEVEL = T.StructType(
    [
        T.StructField("price", T.LongType()),  # integer ticks (exact math)
        T.StructField("size", T.LongType()),
    ]
)

#: OrderBookUpdate: code + event time + top-N ask/bid arrays
ORDERBOOK_UPDATE_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("asks", T.ArrayType(ORDERBOOK_LEVEL)),
        T.StructField("bids", T.ArrayType(ORDERBOOK_LEVEL)),
    ]
)

#: Trade message (scalar projection of proto/market_data.proto:9-24)
TRADE_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("trade_price", T.DoubleType()),
        T.StructField("trade_volume", T.DoubleType()),
        T.StructField("ask_bid", T.StringType()),  # enum name (common.proto)
        T.StructField("sequential_id", T.LongType()),
        T.StructField("event_ts_us", T.LongType()),
        T.StructField("received_ts_us", T.LongType()),
    ]
)


def normalized_code(code: Column) -> Column:
    """Upper-cased, trimmed market code (market_data.py:114-135)."""
    return F.upper(F.trim(code))


def is_valid_krw_code(code: Column) -> Column:
    """Non-empty and KRW-prefixed (market_data.py:192-196)."""
    c = normalized_code(code)
    return (F.length(c) > 0) & c.startswith("KRW-")


def is_causally_ordered(event_ts_us: Column, received_ts_us: Column) -> Column:
    """event time must not trail receipt (market_data.py:202-230)."""
    return event_ts_us <= received_ts_us
