"""Orderbook analytics A3-A5 (SURVEY.md §2.4): the designed-but-unbuilt CEP
layer of the reference, restated as DataFrame plans over an orderbook-shaped
stream derived deterministically from `events`.

Specs implemented:

- **A4 imbalance ratio** — ``total_ask_size / total_bid_size`` over the
  top-N levels, flagged above 2.0 (reference ``docs/project docs/호가창 분석
  스캘퍼: 시스템 아키텍처.md:649-651``, threshold ``:90-91``).
- **A3 trailing density baseline** — mean of the top-N ask-size totals over
  a trailing event-time window per code, with the warm-up gate (minimum
  sample count AND minimum elapsed time since the key was first seen)
  (``시스템 아키텍처.md:569-583``; pure-function spec ``2. CEP 레이어 구현
  설계 및 체크리스트.md:111-150``).
- **A5 density change rate** — ``(1 - current/baseline) × 100`` quantized
  to 4 decimal places with ROUND_HALF_UP (``2. CEP 레이어...md:140-149``).
  Implemented in *exact integer fixed-point*: with s = Σ window totals and
  n = sample count, ``rate = (s - cur·n)·100 / s``; the half-up-quantized
  value × 10⁴ is ``sign · ((|num|·2 + s) div (2·s))`` with
  ``num = (s - cur·n)·10⁶`` — pure int64 arithmetic, bit-identical in
  Spark and DuckDB, no cross-engine decimal division rules involved.

Orderbook construction: each `events` row becomes one OrderBookUpdate for
market ``KRW-<EVENT_TYPE>`` with top-10 ask/bid levels whose integer sizes
derive from modular arithmetic on (event_id, level) — deterministic,
skewed (2^(k mod 11)) so imbalance flags actually fire, and reproducible
in ANSI SQL for the oracle.

Scale: construction is per-row map work; A3/A5 are one shuffle on code
(range-frame window). Trailing-window state is O(window-samples) per key —
the same bound the reference's ListState design carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apache_flink_pratices_spark.domain.rules import (
    IMBALANCE_THRESHOLD,
    OB_DENSITY_WINDOW_US,
    OB_MIN_SAMPLES,
    OB_TOP_N,
    OB_WARMUP_US,
)
from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

# level-size mixing constants. The intermediate mod by the prime 9973
# breaks the arithmetic progression mod 11 (without it, each side's ten
# levels cover ten of the eleven power-of-two sizes and the two side totals
# are structurally coupled — the imbalance flag could never fire).
# sizes = 2^(((event_id·A + i·B) % 9973) % 11) ∈ {1..1024}, skewed.
_MIX_P = 9973
_ASK_A, _ASK_B = 7919, 104_729
_BID_A, _BID_B = 6151, 3571

_SQL_OB = f"""
  ob AS (
    SELECT concat('KRW-', upper(event_type)) AS code,
           event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(floor(value * 100) AS BIGINT) AS mid
    FROM events
  ),
  lvls AS (
    SELECT code, event_id, ts_us, i,
           CAST(power(2, ((event_id * {_ASK_A} + i * {_ASK_B}) % {_MIX_P}) % 11) AS BIGINT) AS ask_size,
           CAST(power(2, ((event_id * {_BID_A} + i * {_BID_B}) % {_MIX_P}) % 11) AS BIGINT) AS bid_size
    FROM ob, LATERAL (SELECT unnest(generate_series(1, {OB_TOP_N})) AS i) g
  ),
  totals AS (
    SELECT code, event_id, ts_us,
           CAST(SUM(ask_size) AS BIGINT) AS total_ask,
           CAST(SUM(bid_size) AS BIGINT) AS total_bid
    FROM lvls
    GROUP BY code, event_id, ts_us
  )
"""


def orderbook_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → typed OrderBookUpdate rows (code, event_id, ts_us, asks,
    bids) with ArrayType(StructType) levels per the market-data model."""
    e = load(spark, sf_dir, "events")
    mid = F.floor(F.col("value") * 100).cast("long")

    def levels(a: int, b: int, side_sign: int) -> Column:
        return F.expr(
            f"transform(sequence(1, {OB_TOP_N}), i -> struct("
            f"mid + ({side_sign} * i) AS price, "
            f"CAST(power(2, ((event_id * {a} + i * {b}) % {_MIX_P}) % 11) AS BIGINT) AS size))"
        )

    return (
        e.select(
            F.concat(F.lit("KRW-"), F.upper(F.col("event_type"))).alias("code"),
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            mid.alias("mid"),
        )
        .withColumn("asks", levels(_ASK_A, _ASK_B, +1))
        .withColumn("bids", levels(_BID_A, _BID_B, -1))
        .drop("mid")
    )


def _side_total(side: str) -> Column:
    """Σ sizes over the top-N levels of one side — JVM-side array fold."""
    return F.aggregate(
        F.col(side), F.lit(0).cast("long"), lambda acc, lvl: acc + lvl["size"]
    )


def _direct_total(a: int, b: int) -> Column:
    """Σ level sizes computed straight from the level sequence — same value
    as folding the built array, without materializing array-of-struct rows
    (used by aggregate-only plans that never need the levels)."""
    return F.expr(
        f"aggregate(sequence(1, {OB_TOP_N}), 0L, (acc, i) -> acc + "
        f"CAST(power(2, ((event_id * {a} + i * {b}) % {_MIX_P}) % 11) AS BIGINT))"
    )


@register(
    "ob_imbalance",
    oracle=f"""
    WITH {_SQL_OB}
    SELECT code, event_id, ts_us, total_ask, total_bid,
           CAST(total_ask AS DOUBLE) / total_bid AS imbalance_ratio,
           CAST(total_ask AS DOUBLE) / total_bid > {IMBALANCE_THRESHOLD} AS imbalance_flag
    FROM totals
    """,
    doc="A4: orderbook imbalance ratio over top-N levels, flagged > 2.0 "
    "(시스템 아키텍처.md:649-651). Pure per-row array fold, zero shuffles.",
    tags=("orderbook", "cep"),
)
def ob_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = orderbook_updates(spark, sf_dir)
    ratio = _side_total("asks").cast("double") / _side_total("bids")
    return ob.select(
        "code",
        "event_id",
        "ts_us",
        _side_total("asks").alias("total_ask"),
        _side_total("bids").alias("total_bid"),
        ratio.alias("imbalance_ratio"),
        (ratio > IMBALANCE_THRESHOLD).alias("imbalance_flag"),
    )


@register(
    "ob_density_change",
    oracle=f"""
    WITH {_SQL_OB},
    windowed AS (
      SELECT code, event_id, ts_us, total_ask,
             coalesce(SUM(total_ask) OVER whi, 0)
               - coalesce(SUM(total_ask) OVER wlo, 0) AS win_sum,
             COUNT(*) OVER whi - COUNT(*) OVER wlo AS win_cnt,
             MIN(ts_us) OVER (PARTITION BY code) AS first_seen_us
      FROM totals
      WINDOW whi AS (PARTITION BY code ORDER BY ts_us
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wlo AS (PARTITION BY code ORDER BY ts_us
                     RANGE BETWEEN UNBOUNDED PRECEDING
                               AND {OB_DENSITY_WINDOW_US + 1} PRECEDING)
    )
    SELECT code, event_id, ts_us, total_ask,
           CAST(coalesce(win_cnt, 0) AS BIGINT) AS sample_count,
           (ts_us - first_seen_us < {OB_WARMUP_US}
            OR coalesce(win_cnt, 0) < {OB_MIN_SAMPLES}) AS is_warmup,
           CAST(CASE
             WHEN ts_us - first_seen_us < {OB_WARMUP_US}
                  OR coalesce(win_cnt, 0) < {OB_MIN_SAMPLES} THEN 0
             ELSE (CASE WHEN (win_sum - total_ask * win_cnt) < 0 THEN -1 ELSE 1 END)
                  * ((abs((win_sum - total_ask * win_cnt) * 1000000) * 2 + win_sum)
                     // (2 * win_sum))
           END AS BIGINT) AS rate_pct_e4
    FROM windowed
    """,
    doc="A3+A5: trailing per-code mean of top-N ask totals with warm-up "
    "gate (min samples + min elapsed), and the density change rate "
    "(1 - current/baseline)*100 ROUND_HALF_UP-quantized to 4 dp, in exact "
    "integer fixed-point (rate_pct_e4 = rate × 10⁴).",
    bench=True,
    tags=("orderbook", "cep", "window"),
)
def ob_density_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ob = e.select(
        F.concat(F.lit("KRW-"), F.upper(F.col("event_type"))).alias("code"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        _direct_total(_ASK_A, _ASK_B).alias("total_ask"),
    )
    # Trailing window as the difference of two run-length frames: a bounded
    # sliding RANGE frame makes Spark recompute the aggregate buffer per
    # row (O(rows × window)); unbounded-preceding frames grow incrementally
    # (O(rows)) — measured 8s → 1s at sf0.1. Integer sums keep the
    # subtraction exact and identical in the oracle.
    ordered = Window.partitionBy("code").orderBy("ts_us")
    w_hi = ordered.rangeBetween(Window.unboundedPreceding, -1)
    w_lo = ordered.rangeBetween(
        Window.unboundedPreceding, -(OB_DENSITY_WINDOW_US + 1)
    )
    wfull = Window.partitionBy("code")
    d = ob.select(
        "code",
        "event_id",
        "ts_us",
        "total_ask",
        (
            F.coalesce(F.sum("total_ask").over(w_hi), F.lit(0))
            - F.coalesce(F.sum("total_ask").over(w_lo), F.lit(0))
        ).alias("win_sum"),
        (F.count("*").over(w_hi) - F.count("*").over(w_lo)).alias("win_cnt"),
        F.min("ts_us").over(wfull).alias("first_seen_us"),
    )
    warmup = (F.col("ts_us") - F.col("first_seen_us") < OB_WARMUP_US) | (
        F.coalesce(F.col("win_cnt"), F.lit(0)) < OB_MIN_SAMPLES
    )
    num = (F.col("win_sum") - F.col("total_ask") * F.col("win_cnt")) * 1_000_000
    sign = F.when(num < 0, -1).otherwise(1)
    half_up = F.expr(
        "(abs((win_sum - total_ask * win_cnt) * 1000000) * 2 + win_sum) "
        "div (2 * win_sum)"
    )
    return d.select(
        "code",
        "event_id",
        "ts_us",
        "total_ask",
        F.coalesce(F.col("win_cnt"), F.lit(0)).cast("long").alias("sample_count"),
        warmup.alias("is_warmup"),
        F.when(warmup, F.lit(0)).otherwise(sign * half_up).cast("long").alias("rate_pct_e4"),
    )
