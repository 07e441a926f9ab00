"""Golden behavioral test inherited from the reference: the canonical
12-transaction corpus must produce exactly 3 alerts — (account 3, $600),
(account 4, $500), (account 3, $999). FIXTURES.md §1; reference
docs/fraud_detection_guide.md:86-100, fraud_detector.py:35-37."""

from __future__ import annotations

from apache_flink_pratices_spark.domain.rules import (
    REF_LARGE_AMOUNT,
    REF_SMALL_AMOUNT,
    REF_WINDOW_MS,
)
from apache_flink_pratices_spark.operators.fraud import detect

BASE = 1_609_459_200_000  # 2021-01-01T00:00:00Z millis

CORPUS = [
    (1, 0, 600.00),
    (1, 30_000, 700.00),
    (2, 0, 0.50),
    (2, 10_000, 0.75),
    (3, 0, 0.50),
    (3, 30_000, 600.00),
    (4, 0, 1.00),
    (4, 30_000, 500.00),
    (5, 0, 0.10),
    (5, 10_000, 0.50),
    (3, 120_000, 0.99),
    (3, 150_000, 999.00),
]

EDGE_CASES = [
    # boundary amounts are inclusive (fraud_detector.py:87,103)
    (6, 0, 1.00),
    (6, 60_000, 500.00),  # exactly at window edge → still within 60s → alert
    # small → >60s gap → large: timer expired, no alert (fraud_detector.py:116-133)
    (7, 0, 0.50),
    (7, 61_000, 900.00),
    # large-then-large: state cleared by first large, no alert (:111-114)
    (8, 0, 800.00),
    (8, 1_000, 900.00),
    # small, mid-size, large within window: flag untouched by mid → alert
    (9, 0, 0.50),
    (9, 10_000, 50.00),
    (9, 20_000, 700.00),
]


def _df(spark, rows):
    data = [
        (acct, i, amount, (BASE + off) * 1000)  # ts in micros
        for i, (acct, off, amount) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "user_id long, event_id long, value double, ts_us long")


def test_golden_three_alerts(spark):
    alerts = detect(
        _df(spark, CORPUS), REF_SMALL_AMOUNT, REF_LARGE_AMOUNT, REF_WINDOW_MS * 1000
    ).collect()
    got = sorted((r.account_id, r.amount) for r in alerts)
    assert got == [(3, 600.00), (3, 999.00), (4, 500.00)]


def test_edge_cases(spark):
    alerts = detect(
        _df(spark, EDGE_CASES), REF_SMALL_AMOUNT, REF_LARGE_AMOUNT, REF_WINDOW_MS * 1000
    ).collect()
    got = sorted((r.account_id, r.amount) for r in alerts)
    assert got == [(6, 500.00), (9, 700.00)]


def test_batch_diverges_on_consecutive_smalls(spark):
    """small@0, small@30s, large@80s: the lag-based batch form measures the
    window from the MOST RECENT small (gap 50s ≤ 60s → alert), whereas the
    reference's timer semantics (streaming path) would have the first
    small's stale timer clear the flag at t=60s → no alert. Intentional,
    documented divergence — see docs/fraud_semantics.md."""
    txs = [(20, 0, 0.50), (20, 30_000, 0.60), (20, 80_000, 900.00)]
    alerts = detect(
        _df(spark, txs), REF_SMALL_AMOUNT, REF_LARGE_AMOUNT, REF_WINDOW_MS * 1000
    ).collect()
    assert [(r.account_id, r.amount) for r in alerts] == [(20, 900.00)]
