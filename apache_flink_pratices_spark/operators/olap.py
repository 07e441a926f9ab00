"""OLAP plan-pattern breadth: grouping sets, wide pivot, broadcast-stats
outlier scoring, and a KMV set-overlap sketch.

These extend the reference's aggregation surface (reference
``src/pyflink_examples/window_aggregations.py`` computes per-key windowed
stats one grouping at a time; a warehouse user of that surface expects the
multi-grouping / pivot / outlier shapes below) with the plan classes that
matter at 100 TB:

* ``q_grouping_sets_revenue`` — all four groupings of (priority, status) in
  ONE corpus scan via Expand (Spark's GROUPING SETS physical strategy),
  instead of four scan+agg passes.
* ``q_event_type_pivot`` — long→wide pivot as conditional aggregation with
  an explicit, fixed column list: one shuffle on the grouping key, full
  map-side partial aggregation, and no "collect distinct pivot values"
  pre-job (which is a full extra scan + a driver round-trip at scale).
* ``q_value_zscore_outliers`` — two-pass outlier flagging: the per-type
  moment table is dimension-sized (5 rows), broadcast back to the corpus
  scan; no per-row shuffle at all.
* ``sketch_kmv_jaccard`` — deterministic KMV bottom-k sketch of the UNION
  of two behaviour cohorts with membership flags, giving Jaccard /
  intersection estimates from k rows. The sketch is mergeable and the
  selection is the shared two-stage salted bottom-k kernel
  (operators/skew.py — no global per-set sort).
* ``q_zorder_key_orders`` — Morton layout key as a zero-exchange shift/mask
  chain (2-D file skipping measured in tests/test_zorder_layout.py).
* ``q_value_winsorized`` — robust aggregation: exact discrete quantile
  bounds (distinct-value compression) broadcast back over a clamping pass.

All are oracle-checked bit-exactly: integer/decimal accumulation per
``functions/numeric.py``, portable md5-derived hashes per
``functions/hashing.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_pratices_spark.functions.hashing import md5_long, sql_md5_long
from apache_flink_pratices_spark.functions.numeric import qlong, sql_qsum
from apache_flink_pratices_spark.functions.zorder import sql_zorder_key, zorder_key
from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

#: Event-type domain is part of the schema contract (reference
#: ``src/pyflink_examples``' analytics examples enumerate their event types
#: up front) — pivoting over an explicit list is what keeps the plan
#: single-pass; an inferred pivot needs a distinct-scan job first.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

Z_THRESH = 3.0  # |z| beyond this flags an outlier (classic 3-sigma rule)

KMV_J_K = 256  #: bottom-k size for the union sketch
KMV_J_SALT = 32  #: stage-1 parallelism for the salted bottom-k


# --- GROUPING SETS ----------------------------------------------------------
@register(
    "q_grouping_sets_revenue",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
    doc="All four groupings of (priority, status) — detail, two marginals, "
    "grand total — in ONE scan via Spark's Expand-based GROUPING SETS "
    "strategy. At 100 TB this replaces four scan+shuffle passes with one "
    "scan and a 4x-expanded partial aggregate whose output is still "
    "dimension-sized (5x3 + 5 + 3 + 1 rows). Cents-quantized int64 revenue "
    "keeps the sums order-independent and bit-identical to the oracle. "
    "(Neither grouping column is ever NULL in the data, so coalescing the "
    "grouping-set NULLs to 'ALL' is unambiguous.)",
    bench=True,
    tags=("aggregation", "grouping-sets"),
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cents = qlong("o_totalprice", 100)
    return (
        o.select("o_orderpriority", "o_orderstatus", cents.alias("cents"))
        .groupingSets(
            [
                ["o_orderpriority", "o_orderstatus"],
                ["o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderpriority",
            "o_orderstatus",
        )
        # decimal(38,0) merge of the int64 partials: exact at any row count
        # (a raw long sum could overflow past ~1e14 orders; see numeric.py)
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.col("cents").cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
    )


# --- explicit-domain pivot --------------------------------------------------
def _sql_pivot_cols() -> str:
    parts = []
    for t in EVENT_TYPES:
        # CAST: DuckDB SUM(int) widens to HUGEINT (arrow decimal128), which
        # the driver's type-sensitive hash would flag against Spark's int64
        parts.append(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_{t}"
        )
    parts.append(
        "CAST(SUM(CASE WHEN event_type = 'purchase'"
        " THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END) AS DOUBLE)"
        " / 100.0 AS purchase_value"
    )
    return ",\n           ".join(parts)


@register(
    "q_event_type_pivot",
    oracle=f"""
    SELECT user_id,
           {_sql_pivot_cols()}
    FROM events
    GROUP BY user_id
    """,
    doc="Per-user long→wide pivot over the CLOSED event-type domain: one "
    "count column per type plus quantized purchase revenue, as conditional "
    "aggregation (exactly what Spark's .pivot(col, values) compiles to). "
    "The explicit value list is the scale contract: no distinct-scan "
    "pre-job, one shuffle on user_id, and every conditional count "
    "participates in map-side partial aggregation, so the exchange carries "
    "|users| x 6 longs regardless of event count.",
    tags=("aggregation", "pivot"),
)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    purchase_cents = F.when(
        F.col("event_type") == "purchase", qlong("value", 100)
    ).otherwise(F.lit(0).cast("long"))
    aggs.append(
        (F.sum(purchase_cents.cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias(
            "purchase_value"
        )
    )
    return e.groupBy("user_id").agg(*aggs)


# --- broadcast-stats z-score outliers --------------------------------------
@register(
    "q_value_zscore_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS s,
             SUM(CAST(ROUND(value * 100.0) AS BIGINT)
                 * CAST(ROUND(value * 100.0) AS BIGINT)) AS q
      FROM events GROUP BY event_type
    ),
    scored AS (
      SELECT e.event_id, e.event_type, e.value,
             (CAST(CAST(ROUND(e.value * 100.0) AS BIGINT) AS DOUBLE)
              - CAST(s.s AS DOUBLE) / s.n)
             / sqrt(CAST(s.q AS DOUBLE) / s.n
                    - (CAST(s.s AS DOUBLE) / s.n) * (CAST(s.s AS DOUBLE) / s.n))
               AS z
      FROM events e JOIN stats s ON e.event_type = s.event_type
    )
    SELECT event_id, event_type, value, ROUND(z, 4) AS z4
    FROM scored WHERE abs(z) > {Z_THRESH}
    """,
    doc="Per-type z-score outlier flagging as TWO bounded passes: pass 1 "
    "reduces the corpus to a 5-row exact moment table (count / int64-cents "
    "sum / decimal sum-of-squares — order-independent, so bit-identical "
    "across engines); pass 2 re-scans with the moments BROADCAST, so the "
    "scoring join moves zero event rows. The z computation is a fixed "
    "double division chain evaluated identically by both engines (IEEE "
    "correctly-rounded / and sqrt over identical exact inputs).",
    tags=("aggregation", "quality"),
)
def q_value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cents = qlong("value", 100)
    # per-partition int64 squares stay < 2^52 (cents < 2^17, ~2M rows/split);
    # the decimal cast makes the cross-partition merge exact at any scale
    stats = (
        e.select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("q"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("q").cast("double") / F.col("n") - mean * mean
    scored = e.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        ((cents.cast("double") - mean) / F.sqrt(var)).alias("z"),
    )
    return scored.filter(F.abs(F.col("z")) > Z_THRESH).select(
        "event_id", "event_type", "value", F.round("z", 4).alias("z4")
    )


# --- Z-order layout key -----------------------------------------------------
ZORDER_BITS = 16


@register(
    "q_zorder_key_orders",
    oracle=f"""
    SELECT o_orderkey,
           {sql_zorder_key(f"o_custkey % {1 << ZORDER_BITS}",
                           f"(CAST(epoch(o_orderdate) AS BIGINT) // 86400) % {1 << ZORDER_BITS}",
                           ZORDER_BITS)} AS zkey
    FROM orders
    """,
    doc="Morton (Z-order) clustering key over (customer, order-day): the "
    "sort key behind multi-dimensional data layout. Writing a fact table "
    "range-partitioned + sorted by this key bounds every parquet row "
    "group's extent in BOTH dimensions, so min/max statistics prune 2-D "
    "box predicates on either axis — single-column sort prunes only its "
    "own axis (tests/test_zorder_layout.py measures the row-group "
    "skipping win on real files). Pure shift/mask column expressions, "
    "zero-exchange map-only plan; the 16-bit quantization here is a fixed "
    "modulus — at scale the inputs come from percentile bins.",
    tags=("layout", "zorder"),
)
def q_zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    mask = F.lit((1 << ZORDER_BITS) - 1)
    x = F.col("o_custkey").bitwiseAND(mask)
    # `div`, not `/`: float division + cast could truncate off-by-one;
    # day-aligned epochs make both engines' integer division exact
    day = F.expr("unix_timestamp(o_orderdate) div 86400")
    y = day.bitwiseAND(mask)
    return o.select("o_orderkey", zorder_key(x, y, ZORDER_BITS).alias("zkey"))


# --- KMV Jaccard / intersection sketch --------------------------------------
@register(
    "sketch_kmv_jaccard",
    oracle=f"""
    WITH flagged AS (
      SELECT {sql_md5_long("CAST(user_id AS VARCHAR)")} AS h,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY h
    ),
    totals AS (
      SELECT COUNT(*) AS n_union, SUM(in_a * in_b) AS n_inter FROM flagged
    ),
    bottom AS (
      SELECT h, in_a, in_b,
             ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM flagged
    )
    SELECT t.n_union AS union_exact,
           CAST(least(t.n_union, {KMV_J_K}) AS BIGINT) AS k_used,
           CAST(SUM(b.in_a * b.in_b) AS BIGINT) AS inter_in_sketch,
           CAST(SUM(b.in_a * b.in_b) AS DOUBLE)
             / least(t.n_union, {KMV_J_K}) AS jaccard_kmv,
           CAST(t.n_inter AS DOUBLE) / t.n_union AS jaccard_exact
    FROM bottom b CROSS JOIN totals t
    WHERE b.rn <= {KMV_J_K}
    GROUP BY t.n_union, t.n_inter
    """,
    doc=f"KMV set-overlap sketch between the click and purchase user "
    f"cohorts: the bottom-{KMV_J_K} portable hashes of the cohorts' UNION, "
    "each carrying membership flags, estimate Jaccard as "
    "|sketch ∩ A ∩ B| / k — the classic KMV coordinated-sample identity. "
    "Deterministic (md5 hashes, no RNG), so the estimate itself is "
    "oracle-checked. Scale shape: membership flags reduce via hash-agg on "
    f"the 56-bit hash; the bottom-k runs the same two-stage salted "
    f"selection as sketch_kmv_distinct (stage 1: k smallest per "
    f"(h % {KMV_J_SALT}) slice; stage 2: merge ≤ {KMV_J_SALT}·k rows), so "
    "no task ever globally sorts a cohort. The exact Jaccard rides the "
    "same single hash-agg for free as the sketch's accuracy witness.",
    tags=("sketch", "similarity"),
)
def sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    e = load(spark, sf_dir, "events")
    # NOT persisted although totals and the bottom-k both read it:
    # ReusedExchange shares the scan+shuffle of the membership aggregate
    # between the two branches, and a cache would insert a materialization
    # barrier (measured slower on the same shape — scale notes, review-pass
    # entry)
    flagged = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            md5_long(F.col("user_id").cast("string")).alias("h"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("b"),
        )
        .groupBy("h")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    totals = flagged.agg(
        F.count("*").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
    )
    # two-stage salted bottom-k over the union (shared kernel — see
    # operators/skew.py): global group, so stage 2 merges ≤ SALT·k rows
    bottom = salted_bottom_k(flagged, [], "h", KMV_J_K, KMV_J_SALT)
    k_used = F.least(F.col("n_union"), F.lit(KMV_J_K).cast("long"))
    return (
        bottom.crossJoin(F.broadcast(totals))
        .groupBy("n_union", "n_inter")
        .agg(F.sum(F.col("in_a") * F.col("in_b")).alias("inter_in_sketch"))
        .select(
            F.col("n_union").alias("union_exact"),
            k_used.alias("k_used"),
            F.col("inter_in_sketch").cast("long").alias("inter_in_sketch"),
            (F.col("inter_in_sketch").cast("double") / k_used).alias("jaccard_kmv"),
            (F.col("n_inter").cast("double") / F.col("n_union")).alias("jaccard_exact"),
        )
    )


# --- winsorized robust statistics -------------------------------------------
WINSOR_LO_P100 = 5
WINSOR_HI_P100 = 95


@register(
    "q_value_winsorized",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             quantile_disc(value, {WINSOR_LO_P100 / 100.0}) AS p05,
             quantile_disc(value, {WINSOR_HI_P100 / 100.0}) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(GREATEST(b.p05, LEAST(b.p95, e.value)) * 100.0)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS winsorized_sum,
           CAST(SUM(CASE WHEN e.value < b.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN e.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           b.p05, b.p95
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95
    """,
    doc="Per-type winsorized (p05/p95-clamped) value statistics — the "
    "robust-aggregation counterpart of q_value_zscore_outliers: instead "
    "of flagging tails, clamp them before summing, so one fat-fingered "
    "or adversarial value cannot move the aggregate arbitrarily. Two "
    "bounded passes: pass 1 computes EXACT discrete per-type quantile "
    "bounds with the distinct-value-compression + keyed-cumulative-count "
    "plan of q_price_quantiles (no O(group) aggregation buffer); pass 2 "
    "re-scans with the 5-row bounds table BROADCAST and clamps in the "
    "projection — cents-quantized int64 sums keep the result "
    "bit-identical across engines. The oracle's bounds come from "
    "DuckDB's native quantile_disc, an independent implementation of the "
    "same percentile_disc semantics.",
    tags=("aggregation", "quality", "quantiles"),
)
def q_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events").select("event_type", "value")
    counts = e.groupBy("event_type", "value").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.select(
        "*",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    # integer threshold comparison (cum*100 >= p*n): exact percentile_disc
    bounds = ranked.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") * 100 >= WINSOR_LO_P100 * F.col("n"), F.col("value"))
        ).alias("p05"),
        F.min(
            F.when(F.col("cum") * 100 >= WINSOR_HI_P100 * F.col("n"), F.col("value"))
        ).alias("p95"),
    )
    clamped = qlong(F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value"))), 100)
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count("*").alias("n"),
            (F.sum(clamped.cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias(
                "winsorized_sum"
            ),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
        .select("event_type", "n", "winsorized_sum", "n_low", "n_high", "p05", "p95")
    )


# --- robust outliers: median absolute deviation -----------------------------
MAD_K = 3  #: |value - median| > K·MAD flags an outlier (robust 3-sigma)


@register(
    "q_group_mad_outliers",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS v_c FROM events
    ),
    med AS (
      SELECT event_type, CAST(quantile_disc(v_c, 0.5) AS BIGINT) AS med_c
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, abs(v.v_c - m.med_c) AS d_c
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, CAST(quantile_disc(d_c, 0.5) AS BIGINT) AS mad_c
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, m.med_c, md.mad_c,
           CAST(SUM(CASE WHEN d.d_c > {MAD_K} * md.mad_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM dev d JOIN med m USING (event_type) JOIN mad md USING (event_type)
    GROUP BY d.event_type, m.med_c, md.mad_c
    """,
    doc=f"Robust outlier detection via median absolute deviation — the "
    "MAD-based twin of the z-score op for corpora where the mean/stddev "
    "themselves are poisoned by the outliers (50% breakdown point vs 0%). "
    "Values are cents-quantized so median, MAD and the |dev| > "
    f"{MAD_K}·MAD flag are pure int64 arithmetic — bit-exact across "
    "engines with no float quantile interpolation. Scale shape: ONE "
    "corpus scan compresses to a (group, distinct value, count) table; "
    "median, deviation counts, MAD and the outlier tally are all derived "
    "from that compressed table (same kernel as q_price_quantiles), with "
    "the 5-row median/MAD tables broadcast — the corpus is never "
    "rescanned and no aggregation buffer is O(group).",
    tags=("olap", "robust", "quantiles"),
)
def q_group_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from pyspark.storagelevel import StorageLevel

    v = load(spark, sf_dir, "events").select(
        "event_type", qlong(F.col("value"), 100).alias("v_c")
    )
    # the compressed (group, value, count) table feeds the median window
    # AND the deviation re-group; persisting it is what makes the corpus
    # scan run ONCE (without it each consumer re-expands the scan subtree)
    counts = (
        v.groupBy("event_type", "v_c")
        .agg(F.count("*").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def disc_median(df: DataFrame, val: str) -> DataFrame:
        w = (
            Window.partitionBy("event_type")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ranked = df.select(
            "*",
            F.sum("c").over(w).alias("cum"),
            F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
        )
        return ranked.groupBy("event_type").agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col(val))).alias(
                f"med_{val}"
            )
        )

    med = disc_median(counts, "v_c").withColumnRenamed("med_v_c", "med_c")
    # deviation counts likewise feed the MAD window and the outlier tally
    dev_counts = (
        counts.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("v_c") - F.col("med_c")).alias("d_c"),
            "c",
        )
        .groupBy("event_type", "d_c")
        .agg(F.sum("c").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mad = disc_median(dev_counts, "d_c").withColumnRenamed("med_d_c", "mad_c")
    return (
        dev_counts.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_c", "mad_c")
        .agg(
            F.sum(
                F.when(F.col("d_c") > MAD_K * F.col("mad_c"), F.col("c")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_outliers"),
            F.sum("c").cast("long").alias("n_rows"),
        )
    )


# --- range-partition boundary computation (the TeraSort pattern) ------------
RANGE_BUCKETS = 8  #: target number of range partitions
RANGE_SAMPLE_MOD = 20  #: deterministic ~5% sample: md5(key) % MOD == 0


@register(
    "q_range_partition_bounds",
    # quantile_disc needs constant parameters in DuckDB — unroll the K-1
    # boundaries as a UNION ALL of constant-quantile aggregates
    oracle="WITH s AS (\n"
    "  SELECT o_totalprice AS v\n"
    "  FROM orders\n"
    f"  WHERE {sql_md5_long('CAST(o_orderkey AS VARCHAR)')} % {RANGE_SAMPLE_MOD} = 0\n"
    ")\n"
    # HAVING COUNT(*) > 0 keeps the degenerate empty-sample case aligned
    # with the Spark side (which emits 0 rows); without it the constant
    # quantiles would emit NULL boundaries (ADVICE r6 — unreachable at the
    # shipped scale factors, guarded anyway)
    + "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS bucket, "
        f"CAST(quantile_disc(v, {k / RANGE_BUCKETS!r}) AS DOUBLE) AS boundary "
        f"FROM s HAVING COUNT(*) > 0"
        for k in range(1, RANGE_BUCKETS)
    ),
    doc=f"Range-partition boundary computation — the global-sort / "
    "TeraSort planning step: a deterministic hash sample "
    f"(md5(key) % {RANGE_SAMPLE_MOD} == 0, so both engines pick the "
    f"identical ~5% subset) is reduced to {RANGE_BUCKETS - 1} exact "
    "discrete quantile boundaries; range-partitioning the full corpus by "
    "these bounds yields near-equal buckets (balance property pinned in "
    "tests/test_olap_plans.py). Scale shape: the corpus-sized work is a "
    "map-only filter that forwards ~1/20th of the keys; the sample is "
    "then compressed to (distinct value, count) before one small-window "
    "pass — the only single-task step is over the compressed sample, "
    "which is what Spark's own RangePartitioner does at any cluster "
    "size. Boundaries are existing data values (no interpolation) so "
    "the output is float-arithmetic-free and hash-exact.",
    tags=("olap", "sort", "sampling", "quantiles"),
)
def q_range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    s = (
        load(spark, sf_dir, "orders")
        .filter(
            md5_long(F.col("o_orderkey").cast("string")) % RANGE_SAMPLE_MOD == 0
        )
        .select(F.col("o_totalprice").alias("v"))
    )
    counts = s.groupBy("v").agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = counts.select(
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    buckets = spark.range(1, RANGE_BUCKETS).select(F.col("id").alias("bucket"))
    # cum/n >= bucket/RANGE_BUCKETS as exact integer cross-multiplication
    return (
        ranked.crossJoin(F.broadcast(buckets))
        .filter(F.col("cum") * RANGE_BUCKETS >= F.col("bucket") * F.col("n"))
        .groupBy("bucket")
        .agg(F.min("v").cast("double").alias("boundary"))
    )


# --- incremental materialized-view maintenance ------------------------------
MV_CUTOFF = "1999-01-01"  #: base/delta split point for the refresh demo


@register(
    "mv_incremental_refresh",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_qsum('o_totalprice', 100)} AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Incremental materialized-view maintenance: the per-status revenue "
    f"MV is computed as BASE partials (orders before {MV_CUTOFF}) merged "
    "with DELTA partials (orders on/after it) — union of two partial "
    "aggregates re-aggregated, NOT a rescan of history. The oracle is the "
    "full-table GROUP BY, pinning the algebraic property the whole pattern "
    "rests on: count/sum partials are mergeable, so a 100 TB MV refresh "
    "touches only the delta partition plus a dimension-sized partial table "
    "(the CDC twin: cdc_upsert_compaction / stream_cdc_golden maintain "
    "latest-state the same way). Revenue accumulates as scaled-int64 cents "
    "so base+delta merge is exact regardless of split point.",
    tags=("olap", "aggregation", "incremental", "cdc"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(MV_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(qlong("o_totalprice", 100)).alias("rev_cents"),
        )

    # base/delta must PARTITION the table: a NULL order date satisfies
    # neither `< cutoff` nor `>= cutoff` and would silently vanish from
    # the merged MV while the oracle's full GROUP BY keeps it (review
    # pass r6) — bucket NULLs with the base
    base = partial(
        o.filter((F.col("o_orderdate") < cutoff) | F.col("o_orderdate").isNull())
    )
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_cents").alias("rev_cents"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("revenue"),
        )
    )
