"""Temporal joins — as-of and interval joins over event-time keyed streams.

The reference correlates streams by key and event time throughout (the
fraud detector pairs a small debit with the next large debit on the same
account, reference ``src/flink_job/fraud_detector.py``; the CEP signal
generator reads each trade against the *latest* orderbook state for the
code, ``signal_generator`` design docs). Batch analytics over the same
data need the equivalent relational operators, which Spark does not ship:

- **as-of join**: for every left row, the single most recent right row
  with the same key at-or-before the left row's event time.
- **interval join**: left rows matched to all right rows with the same
  key inside a bounded time range (the batch twin of
  ``tests/streaming/test_stream_stream_join.py``'s stream-stream interval
  join).

Scale design (100 TB): the naive formulation — join on key then filter by
time and pick the max — explodes pairwise per key before pruning
(O(left×right) per key). :func:`asof_join` instead unions both sides and
runs one keyed window fill:

1. tag rows (left/right), align both sides on a common ``__ts``;
2. ONE shuffle by key, sort within partitions by (ts, side-tag);
3. ``last(right_value, ignorenulls=True)`` over rows-unbounded-preceding
   carries the latest right values forward — O(1) running state per row,
   never a pairwise product;
4. keep left rows.

Cost is a single hash partition + per-partition sort — the same shape as
any keyed window aggregate, so skew/AQE handling applies unchanged. For
corpora where single keys exceed a partition's sort budget, pre-bucketing
``__ts`` into coarse ranges and carrying each bucket's closing state
forward (the standard two-pass "segment + border" refinement) keeps sorts
bounded; the testdata's per-key volumes (≤ thousands of rows) do not need
it and the code path stays single-pass.

The interval join keeps its equi-key anchor so Catalyst plans a hash/sort
join on ``user_id`` with the range predicate as a post-join filter —
never a broadcast-nested-loop product (asserted in
``tests/test_plan_audit.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

#: interval-join window: views within this many seconds after an error
INTERVAL_JOIN_SECONDS = 300


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    prefix: str = "asof_",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row per key at-or-before each left row.

    Returns ``left.*`` plus ``{prefix}{c}`` for each ``c`` in
    ``right_cols`` (NULL when no right row precedes the left row). Ties at
    identical event times resolve right-before-left, i.e. a right row AT
    the left timestamp is visible (inclusive as-of, matching DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``). When several RIGHT rows share a
    (key, ts), pass ``right_tiebreak`` (a right column name; highest value
    wins) to make the pick deterministic.
    """
    if right_tiebreak is not None and right_tiebreak not in right_cols:
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} must be one of right_cols"
        )
    carried = [f"__r_{c}" for c in right_cols]
    l_tagged = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(rc)
            for c, rc in zip(right_cols, carried)
        ],
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c != key
            else F.col(key)
            for c in left.columns
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    if right_tiebreak is not None:
        # right-vs-right ties at one (key, ts): highest tiebreak wins
        # (left rows carry NULL here; nulls_first keeps them inert)
        order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        "__is_left",
        *[
            F.last(rc, ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c, rc in zip(right_cols, carried)
        ],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def _events_of(spark, sf_dir: str, event_type: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("event_id", "user_id", "ts", "value")
    )


@register(
    "asof_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.value AS purchase_value,
           v.event_id AS view_id,
           v.value AS view_value,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS view_to_purchase_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="Last-touch attribution as-of join: every purchase paired with the "
    "same user's most recent preceding view (or NULLs when none). The "
    "oracle uses DuckDB's native ASOF JOIN — an independent formulation, "
    "not a mirror of the Spark plan — so the union+window construction is "
    "checked against a reference implementation of the operator itself. "
    "One shuffle by user_id; no pairwise per-key product (see module "
    "docstring for the 100 TB design).",
    bench=True,
    tags=("events", "temporal", "asof"),
)
def asof_attribution(spark, sf_dir: str) -> DataFrame:
    purchases = _events_of(spark, sf_dir, "purchase")
    views = _events_of(spark, sf_dir, "view")
    joined = asof_join(
        purchases,
        views,
        "user_id",
        "ts",
        "ts",
        ("event_id", "ts", "value"),
        "view_",
        right_tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("value").alias("purchase_value"),
        F.col("view_event_id").alias("view_id"),
        F.col("view_value"),
        (F.unix_micros("ts") - F.unix_micros("view_ts"))
        .cast("long")
        .alias("view_to_purchase_us"),
    )


@register(
    "interval_join_error_views",
    oracle=f"""
    SELECT e.event_id AS error_id,
           e.user_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS views_within_5m,
           CAST(COALESCE(SUM(CAST(ROUND(v.value * 100.0) AS BIGINT)), 0)
                AS BIGINT) AS view_value_c
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON e.user_id = v.user_id
     AND v.ts >= e.ts
     AND v.ts < e.ts + INTERVAL {INTERVAL_JOIN_SECONDS} SECONDS
    GROUP BY e.event_id, e.user_id
    """,
    doc="Interval join (batch twin of the stream-stream interval join "
    "test): for each error event, how many views the same user produced "
    "in the following 5 minutes and their summed value (cents-scaled "
    "int64 so both engines aggregate exactly). The equi-key on user_id "
    "anchors a hash join; the time range is a post-join filter — the "
    "plan audit asserts no nested-loop product.",
    tags=("events", "temporal", "interval-join"),
)
def interval_join_error_views(spark, sf_dir: str) -> DataFrame:
    errors = _events_of(spark, sf_dir, "error")
    views = _events_of(spark, sf_dir, "view")
    e, v = errors.alias("e"), views.alias("v")
    cond = (
        (F.col("e.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("e.ts"))
        & (
            F.col("v.ts")
            < F.col("e.ts") + F.expr(f"INTERVAL {INTERVAL_JOIN_SECONDS} SECONDS")
        )
    )
    from apache_flink_pratices_spark.functions.numeric import qlong

    # ROUND-then-cast on BOTH engines: a bare double->int64 cast truncates
    # in Spark but rounds in DuckDB, so any value whose *100 lands below
    # the integer (e.g. 58.60*100 = 5859.999...) would diverge — found by
    # range_join_binned's wider matched set; same exact-quantization fix.
    value_c: Column = qlong(F.col("v.value"), 100)
    return (
        e.join(v, cond, "left")
        .groupBy(F.col("e.event_id").alias("error_id"), F.col("e.user_id").alias("user_id"))
        .agg(
            F.count(F.col("v.event_id")).alias("views_within_5m"),
            F.coalesce(F.sum(value_c), F.lit(0)).cast("long").alias("view_value_c"),
        )
    )


#: binned range join: views within this many seconds after an error,
#: across ALL users (no equi key) — and the bin width used to turn the
#: pure range predicate into an equi-joinable bucket key.
RANGE_JOIN_SECONDS = 60
_RANGE_BIN_US = RANGE_JOIN_SECONDS * 1_000_000


@register(
    "range_join_binned",
    oracle=f"""
    SELECT e.event_id AS error_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS views_within_60s,
           CAST(COALESCE(SUM(CAST(ROUND(v.value * 100.0) AS BIGINT)), 0)
                AS BIGINT) AS view_value_c
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.ts >= e.ts
     AND v.ts < e.ts + INTERVAL {RANGE_JOIN_SECONDS} SECONDS
    GROUP BY e.event_id
    """,
    doc="Binned range join — the PURE range predicate (no equi key at "
    "all: any user's views within 60 s after any error), which naive "
    "Spark plans as a broadcast-nested-loop product scanning "
    "|errors|x|views| pairs. The scale path quantizes time into "
    "window-width bins: each error joins only the two bins its window "
    "can touch (bin and bin+1), turning the range join into an "
    "equi-join on the bin key with the exact range check as a "
    "post-join filter — candidate pairs shrink from |e|x|v| to only "
    "pairs within ~2 bin widths, and the shuffle keys by time bucket, "
    "which parallelizes with the corpus's time span. A view pairs with "
    "an error through exactly one of the error's two bin rows (the "
    "view's own bin), so no dedup is needed; unmatched errors survive "
    "via the left join and count 0. Same cents-scaled int64 value sum "
    "as the interval join. DuckDB's oracle runs the plain inequality "
    "join (IEJoin) — tractable at oracle scale, not at 100 TB.",
    bench=True,
    tags=("events", "temporal", "range-join", "binned"),
)
def range_join_binned(spark, sf_dir: str) -> DataFrame:
    errors = _events_of(spark, sf_dir, "error").select("event_id", "ts")
    views = _events_of(spark, sf_dir, "view").select("event_id", "ts", "value")
    e_bin = F.floor(F.unix_micros(F.col("ts")) / F.lit(_RANGE_BIN_US))
    v_bin = F.floor(F.unix_micros(F.col("ts")) / F.lit(_RANGE_BIN_US))
    e = errors.select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"),
        F.explode(F.array(e_bin, e_bin + 1)).alias("bin"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
        F.col("value"),
        v_bin.alias("bin"),
    )
    cond = (
        (e.bin == v.bin)
        & (F.col("v_ts") >= F.col("e_ts"))
        & (F.col("v_ts") < F.col("e_ts") + F.expr(f"INTERVAL {RANGE_JOIN_SECONDS} SECONDS"))
    )
    from apache_flink_pratices_spark.functions.numeric import qlong

    value_c: Column = qlong(F.col("value"), 100)
    return (
        e.join(v, cond, "left")
        .groupBy("error_id")
        .agg(
            F.count(F.col("view_id")).alias("views_within_60s"),
            F.coalesce(F.sum(value_c), F.lit(0)).alias("view_value_c"),
        )
    )


# --- behavioral sequence mining: event-transition matrix --------------------
@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order behavioral transition matrix (Markov bigrams over each "
    "user's time-ordered event stream) — the batch twin of the CEP layer's "
    "sequence rules (SURVEY §2.5 J2 / funnel_conversion) and the standard "
    "input to next-event models and anomaly scoring. Ordering is the "
    "deterministic (ts, event_id) total order shared with "
    "cdc_upsert_compaction. Scale shape: ONE shuffle on user_id, the lead() "
    "is computed within each user's sorted run (no self-join — the naive "
    "formulation pairs each event with its successor via an equi-join on "
    "row position, a second corpus-wide shuffle), and the output is "
    "bounded by |event_type|² regardless of corpus size, so the final "
    "aggregation is map-side-combined down to a constant-size matrix.",
    tags=("temporal", "sequence", "markov"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
