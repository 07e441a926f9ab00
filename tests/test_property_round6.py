"""Property tests for the round-6 kernels: MAD outliers and the
event-transition matrix against brute-force Python models on arbitrary
small corpora (hypothesis-generated), plus checksum order-invariance."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

# one event type domain shared by both generators
ETYPES = ["a", "b", "c"]


def _write_events(tmpdir, rows):
    """rows: (event_id, ts_seconds, user_id, event_type, value)"""
    import datetime

    t0 = datetime.datetime(2021, 1, 1)
    pd.DataFrame(
        [
            (eid, t0 + datetime.timedelta(seconds=s), uid, et, v, None)
            for eid, s, uid, et, v in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(f"{tmpdir}/events.parquet")


def _lower_median(vals):
    s = sorted(vals)
    n = len(s)
    # smallest value whose cumulative count*2 >= n (percentile_disc(0.5))
    cum = 0
    seen = {}
    for v in s:
        seen[v] = seen.get(v, 0) + 1
    for v in sorted(seen):
        cum += seen[v]
        if cum * 2 >= n:
            return v
    raise AssertionError("unreachable")


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 10),  # ts seconds (collisions on purpose)
        st.integers(1, 3),  # user_id
        st.sampled_from(ETYPES),
        # quarter-step values: v*100 is an exact integer, so the model
        # never sits on a .5 rounding boundary (Spark HALF_UP vs Python
        # banker's rounding would otherwise diverge)
        st.integers(-400, 400).map(lambda k: k / 4.0),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(rows=events_strategy)
def test_mad_matches_python_model(spark, tmp_path_factory, rows):
    from apache_flink_pratices_spark.operators.olap import (
        MAD_K,
        q_group_mad_outliers,
    )

    tmpdir = tmp_path_factory.mktemp("mad")
    _write_events(tmpdir, [(i, s, u, e, v) for i, (s, u, e, v) in enumerate(rows)])
    got = {
        r.event_type: (r.med_c, r.mad_c, r.n_outliers, r.n_rows)
        for r in q_group_mad_outliers(spark, str(tmpdir)).collect()
    }
    by_type: dict[str, list[int]] = {}
    for s, u, e, v in rows:
        by_type.setdefault(e, []).append(round(v * 100))
    expect = {}
    for e, vals in by_type.items():
        med = _lower_median(vals)
        devs = [abs(v - med) for v in vals]
        mad = _lower_median(devs)
        expect[e] = (med, mad, sum(1 for d in devs if d > MAD_K * mad), len(vals))
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(rows=events_strategy)
def test_transitions_match_python_model(spark, tmp_path_factory, rows):
    from apache_flink_pratices_spark.operators.temporal import q_event_transitions

    tmpdir = tmp_path_factory.mktemp("tr")
    indexed = [(i, s, u, e, v) for i, (s, u, e, v) in enumerate(rows)]
    _write_events(tmpdir, indexed)
    got = {
        (r.event_type, r.next_type): r.n
        for r in q_event_transitions(spark, str(tmpdir)).collect()
    }
    expect: dict[tuple, int] = {}
    by_user: dict[int, list] = {}
    for eid, s, u, e, _ in indexed:
        by_user.setdefault(u, []).append((s, eid, e))
    for seq in by_user.values():
        seq.sort()  # (ts, event_id) — the operator's total order
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    assert got == expect


def test_checksum_invariant_under_partitioning(spark):
    """Re-partitioning (hence re-ordering) the input must not change any
    checksum component — the order-independence the operator exists for."""
    from apache_flink_pratices_spark.io import load
    from apache_flink_pratices_spark.operators.relational import table_checksum

    SF = "/root/testdata/sf0.001"
    base = table_checksum(spark, SF).collect()[0]
    # same rows through a deliberately different partitioning
    o = load(spark, SF, "orders").repartition(7, "o_orderpriority")
    o.createOrReplaceTempView("orders_reparted")
    import apache_flink_pratices_spark.operators.relational as R
    from pyspark.sql import functions as F
    from apache_flink_pratices_spark.functions.hashing import md5_long
    from apache_flink_pratices_spark.functions.numeric import qlong

    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        qlong(F.col("o_totalprice"), 100).cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.col("o_orderpriority"),
    )
    again = (
        o.select(md5_long(row_str).alias("rh"))
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum(F.col("rh").cast("decimal(38,0)")) % F.lit(9007199254740881))
            .cast("long")
            .alias("checksum"),
            F.min("rh").alias("min_rh"),
            F.max("rh").alias("max_rh"),
        )
        .collect()[0]
    )
    assert tuple(base) == tuple(again)
