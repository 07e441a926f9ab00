"""Salting correctness: salted plans must produce exactly the plain plan's
results on a pathologically skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 5000 rows on one hot key, a long tail of 50 others
    rows = [(0, i, float(i % 7)) for i in range(5000)]
    rows += [(k, 10_000 + k, float(k)) for k in range(1, 51)]
    return spark.createDataFrame(rows, "k long, payload long, v double")


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 51, 2)], "k long, name string"
    )
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt_n=8).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(0, "hot")], "k long, name string")
    plain = big.join(small, "k", "left").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt_n=4, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, salted.collect(), )) == sorted(map(tuple, plain.collect()))


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = (
        df.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count("*").alias("cnt"))
        .collect()
    )
    salted = salted_agg(df, ["k"], sum_cols=["v"], salt_n=8).collect()
    assert sorted((r.k, r.sum_v, r.cnt) for r in salted) == sorted(
        (r.k, r.sum_v, r.cnt) for r in plain
    )


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    buckets = (
        df.filter(F.col("k") == 0)
        .withColumn("__salt", salt)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(buckets) == 8, "hot key must spread across all salt buckets"
    counts = [r["count"] for r in buckets]
    assert max(counts) < 5000 * 0.25  # no bucket holds the bulk


def test_salted_join_rejects_outer_types(spark):
    """right/full would emit unmatched small-side rows once per salt
    replica — the helper must refuse rather than silently duplicate."""
    import pytest

    big = spark.createDataFrame([(1, "a")], "k int, payload string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    for how in ("right", "full", "full_outer", "left_anti"):
        with pytest.raises(ValueError, match="result-preserving"):
            salted_join(big, small, "k", how=how)


def test_registered_salted_stats_two_stage_plan(spark):
    """The registered query must actually run the two-stage shape: the
    first exchange keys on (event_type, __salt), the second on
    event_type alone."""
    from apache_flink_pratices_spark.operators.skew import q_salted_event_type_stats
    from apache_flink_pratices_spark.plans.explain import formatted_plan

    plan = formatted_plan(q_salted_event_type_stats(spark, "/root/testdata/sf0.001"))
    assert "__salt" in plan, plan
    assert plan.count("Exchange") >= 2, plan


def test_salted_bottom_k_matches_bruteforce(spark):
    """The shared two-stage kernel must return exactly the k smallest rows
    per group (with correct ranks) for adversarial layouts: hot groups,
    singleton groups, groups smaller than k, order values colliding with
    the salt modulus."""
    import random

    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    rng = random.Random(7)
    rows = []
    for g in range(5):
        n = [1, 3, 17, 64, 200][g]
        vals = rng.sample(range(10_000), n)
        rows += [(f"g{g}", v) for v in vals]
    df = spark.createDataFrame(rows, "grp string, v long")
    k, salt_n = 8, 4
    got = {
        (r.grp, r.rn): r.v
        for r in salted_bottom_k(df, ["grp"], "v", k, salt_n).collect()
    }
    by_grp = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    expect = {
        (g, i + 1): v
        for g, vs in by_grp.items()
        for i, v in enumerate(sorted(vs)[:k])
    }
    assert got == expect


def test_salted_bottom_k_ties_deterministic_with_tiebreak(spark):
    """With duplicate order values, the tiebreak_cols extension must make
    the surviving rows (payload included) deterministic and equal to the
    brute-force (order, tiebreak) sort — the ADVICE r5 footgun: without a
    total order, stage-1 slices and stage 2 tie-break independently."""
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    # every v duplicated across 4 distinct payload ids, several groups
    rows = [
        (f"g{g}", v, f"id{g}-{v}-{i}")
        for g in range(3)
        for v in [5, 5, 1, 1, 3, 3, 3, 9]
        for i in range(2)
    ]
    df = spark.createDataFrame(rows, "grp string, v long, pid string")
    got = sorted(
        (r.grp, r.rn, r.v, r.pid)
        for r in salted_bottom_k(
            df, ["grp"], "v", 4, 3, tiebreak_cols=["pid"]
        ).collect()
    )
    by_grp: dict[str, list] = {}
    for g, v, p in rows:
        by_grp.setdefault(g, []).append((v, p))
    expect = sorted(
        (g, i + 1, v, p)
        for g, vs in by_grp.items()
        for i, (v, p) in enumerate(sorted(vs)[:4])
    )
    assert got == expect


def test_salted_bottom_k_global_group(spark):
    """Empty group_cols = global bottom-k (the sketch_kmv_jaccard shape)."""
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    df = spark.createDataFrame([(v,) for v in range(100, 0, -1)], "v long")
    out = sorted(
        (r.rn, r.v) for r in salted_bottom_k(df, [], "v", 5, 8).collect()
    )
    assert out == [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)]


# --- kernel-level tie-handling properties (VERDICT r10 #6) -----------------
# The PRECONDITION note on salted_bottom_k (unique order values OR a
# tiebreak total order) was enforced only by caller discipline; these pin
# it at the kernel level, over the four callers' shapes: grouped with
# salt-from-order (KMV), grouped with separate salt_from + tiebreak
# (quality_topk_per_source, hot-bucket reps), multi-column groups, and
# the global (empty group_cols) sketch shape.

from hypothesis import given, settings
from hypothesis import strategies as st

_tied_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # group (up to 3 groups; 0 rows in one is fine)
        st.integers(0, 4),  # order value from a 5-value domain -> heavy ties
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(
    rows=_tied_rows,
    k=st.integers(1, 6),
    salt_n=st.integers(1, 5),
    n_parts=st.integers(1, 7),
    salt_from_order=st.booleans(),
)
def test_salted_bottom_k_ties_with_tiebreak_equals_naive_window(
    spark, rows, k, salt_n, n_parts, salt_from_order
):
    """PROPERTY: with duplicated order values and a tiebreak total order,
    the two-phase salted kernel returns row-for-row (payload included)
    exactly the naive per-group window's bottom-k, under arbitrary input
    partitionings, salt fan-outs, k, and both salt sources (the order
    column itself vs a distinct unique column)."""
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    spark = spark
    data = [(f"g{g}", v, i) for i, (g, v) in enumerate(rows)]  # pid unique
    df = spark.createDataFrame(
        data, "grp string, v long, pid long"
    ).repartition(n_parts)
    got = sorted(
        (r.grp, r.rn, r.v, r.pid)
        for r in salted_bottom_k(
            df,
            ["grp"],
            "v",
            k,
            salt_n,
            salt_from=None if salt_from_order else "pid",
            tiebreak_cols=["pid"],
        ).collect()
    )
    by_grp: dict = {}
    for g, v, p in data:
        by_grp.setdefault(g, []).append((v, p))
    expect = sorted(
        (g, i + 1, v, p)
        for g, vs in by_grp.items()
        for i, (v, p) in enumerate(sorted(vs)[:k])
    )
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(rows=_tied_rows, k=st.integers(1, 5), n_parts=st.integers(1, 5))
def test_salted_bottom_k_ties_without_tiebreak_values_deterministic(
    spark, rows, k, n_parts
):
    """Mechanical record of the documented nondeterminism: with ties and
    NO tiebreak, the (group, rank) -> ORDER VALUE mapping is still exactly
    the naive window's (each salt slice keeps its k smallest values, and
    the k smallest of the union of slice-wise k-smallest are the k
    smallest overall), but WHICH tied row survives — its payload — is
    partition-dependent and NOT asserted. Callers needing payload
    determinism must pass tiebreak_cols (the kernel docstring's
    PRECONDITION; quality_topk_per_source does)."""
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    spark = spark
    data = [(f"g{g}", v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "grp string, v long, pid long"
    ).repartition(n_parts)
    got = sorted(
        (r.grp, r.rn, r.v)
        for r in salted_bottom_k(df, ["grp"], "v", k, 3).collect()
    )
    by_grp: dict = {}
    for g, v, _ in data:
        by_grp.setdefault(g, []).append(v)
    expect = sorted(
        (g, i + 1, v)
        for g, vs in by_grp.items()
        for i, v in enumerate(sorted(vs)[:k])
    )
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(0, 3), min_size=1, max_size=40),
    k=st.integers(1, 5),
    salt_n=st.integers(1, 4),
)
def test_salted_bottom_k_global_group_ties_with_tiebreak(
    spark, vals, k, salt_n
):
    """The sketch_kmv_jaccard shape (empty group_cols = global bottom-k),
    under ties + tiebreak: stage 2 is a single-task sort over <= salt_n*k
    survivors and must still match the naive global sort row-for-row."""
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    spark = spark
    data = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "v long, pid long")
    got = sorted(
        (r.rn, r.v, r.pid)
        for r in salted_bottom_k(
            df, [], "v", k, salt_n, salt_from="pid", tiebreak_cols=["pid"]
        ).collect()
    )
    expect = sorted(
        (i + 1, v, p) for i, (v, p) in enumerate(sorted(data)[:k])
    )
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(rows=_tied_rows, k=st.integers(1, 4))
def test_salted_bottom_k_multi_group_cols_ties(spark, rows, k):
    """The hot-bucket-reps shape: two group columns (band, bucket) with a
    tiebreak — the composite-key partitioning must not leak rows across
    (band, bucket) pairs."""
    from apache_flink_pratices_spark.operators.skew import salted_bottom_k

    spark = spark
    data = [(g % 2, g // 2, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "band int, bucket int, v long, pid long")
    got = sorted(
        (r.band, r.bucket, r.rn, r.v, r.pid)
        for r in salted_bottom_k(
            df, ["band", "bucket"], "v", k, 8, tiebreak_cols=["pid"]
        ).collect()
    )
    by_g: dict = {}
    for b, u, v, p in data:
        by_g.setdefault((b, u), []).append((v, p))
    expect = sorted(
        (b, u, i + 1, v, p)
        for (b, u), vs in by_g.items()
        for i, (v, p) in enumerate(sorted(vs)[:k])
    )
    assert got == expect
