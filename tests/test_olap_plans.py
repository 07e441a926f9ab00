"""Plan audits for the OLAP plan-pattern operators (operators/olap.py):
every scale claim in the docstrings is asserted against the physical plan."""

from __future__ import annotations

import re

from apache_flink_pratices_spark.operators.olap import (
    q_event_type_pivot,
    q_grouping_sets_revenue,
    q_value_zscore_outliers,
    sketch_kmv_jaccard,
)
from apache_flink_pratices_spark.plans.explain import (
    exchange_count,
    formatted_plan,
    join_kinds,
    scan_columns,
)

SF = "/root/testdata/sf0.001"


def _scan_count(plan: str) -> int:
    """Parquet scans, counted by operator-detail header (the tree section
    repeats the operator name, so a raw substring count double-counts)."""
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_grouping_sets_is_one_scan_via_expand(spark):
    """Four groupings must come from ONE orders scan expanded 4x, not four
    scan+agg passes: exactly one Scan, an Expand node, and a single
    aggregation exchange."""
    plan = formatted_plan(q_grouping_sets_revenue(spark, SF))
    assert _scan_count(plan) == 1, plan
    assert "Expand" in plan, plan
    assert exchange_count(plan) == 1, plan
    # only the three referenced columns are read
    assert scan_columns(plan) == {"o_orderpriority", "o_orderstatus", "o_totalprice"}


def test_pivot_is_single_exchange_with_partial_agg(spark):
    """The explicit-domain pivot is one shuffle on user_id with map-side
    partial aggregation — no distinct-scan pre-job, no second exchange."""
    plan = formatted_plan(q_event_type_pivot(spark, SF))
    assert _scan_count(plan) == 1, plan
    assert exchange_count(plan) == 1, plan
    # partial aggregate below the exchange (two HashAggregate operators)
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2, plan
    assert "partial_sum" in plan, plan
    assert scan_columns(plan) == {"user_id", "event_type", "value"}


def test_zscore_scoring_join_is_broadcast(spark):
    """The 5-row moment table must broadcast back to the corpus scan; the
    scoring pass itself moves no event rows through an exchange (the only
    non-broadcast exchange belongs to the stats aggregation)."""
    plan = formatted_plan(q_value_zscore_outliers(spark, SF))
    kinds = set(join_kinds(plan))
    assert kinds == {"BroadcastHashJoin"}, kinds
    # stats agg = 1 shuffle exchange; everything else is broadcast
    assert exchange_count(plan) == 1, plan


def test_kmv_jaccard_bottom_k_is_two_stage(spark):
    """Stage 1's heavy sort must fan out over the salt slices; only the
    bounded merge stage (≤ SALT·k rows) may run a global window."""
    plan = formatted_plan(sketch_kmv_jaccard(spark, SF))
    assert "salt" in plan, plan
    # membership flags reduce via hash aggregation, not sort aggregation
    assert "SortAggregate" not in plan, plan
    # no cartesian anywhere except the 1-row totals broadcast
    assert "CartesianProduct" not in plan, plan
