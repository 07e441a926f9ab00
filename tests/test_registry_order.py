"""Driver-gate window contract: the driver checks the FIRST ~50 entries of
``queries()``, so ordering IS correctness coverage. Pin that every
never-driver-checked query and every §2-critical query sits inside the
window (VERDICT r3 #1: 84 registered vs 50 checked left the flagship
stream goldens outside the hard signal)."""

from __future__ import annotations

from apache_flink_pratices_spark.registry import (
    CRITICAL,
    _driver_check_history,
    all_specs,
    oracle_sql,
    queries,
)

WINDOW = 50

# §2-anchoring queries that must always be driver-checked (SURVEY §8)
S2_ANCHORS = {
    "stream_fraud_golden",  # W1/W2 flagship
    "stream_cep_signals_golden",  # J1/W4-W6
    "stream_window_golden",  # W3/A2
    "stream_session_golden",
    "stream_dedup_golden",  # W8 dedup stance
    "stream_join_golden",
    "stream_topk_golden",
    "w7_signal_ids",  # W7
    "p_filter_even_clicks",  # P3
    "win_tumbling_daily",  # A2/A6
    "win_sliding_5d_1d",  # A2
    "win_sessionization",
    "kafka_wire_trades",  # K2
    "kafka_wire_routed",  # K3
    "fraud_alerts",  # J2
    "p_market_pipeline",  # P4-P7
    "wordcount",  # P2/A1
    "ob_imbalance",  # A4
    "ob_density_change",  # A3/A5
    "proto_roundtrip_trades",  # P8
    "proto_roundtrip_orderbook",
    "q_distinct_users",  # A6
}


def test_window_covers_never_checked_and_critical():
    names = list(all_specs())
    window = set(names[:WINDOW])
    hist = _driver_check_history()
    never = {n for n in names if n not in hist}
    assert never <= window, f"never-driver-checked outside window: {sorted(never - window)}"
    assert set(CRITICAL) <= window, sorted(set(CRITICAL) - window)
    assert S2_ANCHORS <= window, sorted(S2_ANCHORS - window)


def test_views_share_the_ordering():
    names = list(all_specs())
    assert list(queries()) == names
    with_oracle = [n for n in names if all_specs()[n].oracle is not None]
    assert list(oracle_sql()) == with_oracle


def test_entry_contract_same_order():
    import __spark_entry__ as m

    assert list(m.queries()) == list(all_specs())
