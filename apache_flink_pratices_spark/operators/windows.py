"""Event-time windowed aggregation (SURVEY.md §2.4 A2/A3/A6) — batch
formulations whose streaming twins live in
:mod:`apache_flink_pratices_spark.streaming`.

- tumbling window: per-type daily stats (A6 counters over time buckets);
- sliding window: 5-day size / 1-day slide average (the designed
  ``SlidingEventTimeWindows.of(5s, 1s)`` of 시스템 아키텍처.md:641-648, scaled
  to the testdata's event density);
- session window: gap-based sessionization (the position-lifecycle state
  machine analogue, MapState-based in the reference design).

All timestamps are emitted as epoch microseconds (bigint) so results compare
exactly across engines.

Scale: each query is one shuffle (on the grouping key); the sliding window
multiplies rows by size/slide = 5× *before* the partial aggregation —
acceptable fan-out, and Spark's ``window()`` does it JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apache_flink_pratices_spark.domain.rules import SESSION_GAP_US
from apache_flink_pratices_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register


@register(
    "win_tumbling_daily",
    oracle=f"""
    SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS win_start_us,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY win_start_us, event_type
    """,
    doc="A2/A6: tumbling 1-day event-time window per event_type.",
    tags=("window", "aggregation"),
)
def win_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"), davg("value").alias("avg_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "total_value",
            "avg_value",
        )
    )


@register(
    "win_sliding_5d_1d",
    oracle=f"""
    SELECT CAST(epoch_us(w.ws) AS BIGINT) AS win_start_us,
           event_type,
           COUNT(*) AS n,
           {sql_davg('value')} AS avg_value
    FROM events,
         LATERAL (SELECT unnest(generate_series(date_trunc('day', ts) - INTERVAL 4 DAY,
                                                date_trunc('day', ts),
                                                INTERVAL 1 DAY)) AS ws) w
    GROUP BY win_start_us, event_type
    """,
    doc="A2: sliding event-time window (size 5 days, slide 1 day) — the "
    "SlidingEventTimeWindows analogue; each event lands in size/slide = 5 windows.",
    tags=("window", "aggregation"),
)
def win_sliding_5d_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 days", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), davg("value").alias("avg_value"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"), "event_type", "n", "avg_value")
    )


@register(
    "win_sessionization",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CASE WHEN LAG(CAST(epoch_us(ts) AS BIGINT)) OVER w IS NULL
                    OR CAST(epoch_us(ts) AS BIGINT)
                       - LAG(CAST(epoch_us(ts) AS BIGINT)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM gaps
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    doc="Session windows (30-min gap) via gap-detection + running sum — the "
    "batch twin of streaming session_window / stateful position tracking.",
    bench=True,
    tags=("window", "session", "stateful"),
)
def win_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull() | ((F.col("ts_us") - F.lag("ts_us").over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


@register(
    "rollup_time_hierarchy",
    oracle="""
    SELECT 'hour' AS level, date_trunc('hour', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_value_c
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', date_trunc('day', ts), event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY 2, 3
    """,
    doc="Multi-resolution time rollup (the hypertable / continuous-"
    "aggregate pattern): per-(hour, type) partials computed from ONE "
    "scan of events, then the daily level re-aggregated FROM those "
    "hourly partials — |hours|x|types| rows, never a second pass over "
    "the corpus. The oracle states both levels as independent GROUP "
    "BYs (equivalent because count and the quantized int64 sum are "
    "decomposable aggregates); at 100 TB the derived-level trick is "
    "the difference between re-scanning the corpus per resolution and "
    "a cascade whose every level after the first is dimension-sized. "
    "Cents-quantized int64 sums keep every level bit-identical across "
    "engines and partitionings.",
    bench=True,
    tags=("events", "windowing", "rollup"),
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_flink_pratices_spark.functions.numeric import qlong

    e = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    hour = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(qlong(F.col("value"), 100)).alias("sum_value_c"),
        )
        # both output levels read these |hours|x|types| partials; persist
        # so the corpus is scanned exactly once (asserted in the plan audit)
        .persist()
    )
    day = hour.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_c").alias("sum_value_c"),
    )
    lvl = lambda df, name: df.select(
        F.lit(name).alias("level"), "bucket_start", "event_type", "n_events", "sum_value_c"
    )
    return lvl(hour, "hour").unionByName(lvl(day, "day"))


@register(
    "q_cumulative_revenue",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             o_orderstatus,
             SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(day AS TIMESTAMP) AS day, o_orderstatus,
           CAST(rev_c AS BIGINT) AS day_revenue_c,
           CAST(SUM(rev_c) OVER (
             PARTITION BY o_orderstatus ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_revenue_c
    FROM daily
    """,
    doc="Running-total time series: daily revenue per order status plus "
    "the cumulative-to-date sum — the prefix-sum window pattern "
    "(distinct from lag/rank, which q_daily_momentum and "
    "q_top_customers_per_segment cover). The corpus-sized work is one "
    "(day, status) aggregation with map-side partials; the window then "
    "runs over the |days|x|statuses| DAILY table, so the per-partition "
    "running state is O(1) and the sort is dimension-sized — the same "
    "derived-level discipline as rollup_time_hierarchy. Cents int64 "
    "keeps partials, totals, and the running sum bit-exact.",
    tags=("relational", "window_fn", "cumulative"),
)
def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_flink_pratices_spark.functions.numeric import qlong

    o = load(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day"),
        "o_orderstatus",
    ).agg(F.sum(qlong(F.col("o_totalprice"), 100)).alias("rev_c"))
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        "o_orderstatus",
        F.col("rev_c").alias("day_revenue_c"),
        F.sum("rev_c").over(w).alias("cum_revenue_c"),
    )
