"""Property-based cross-check of the batch fraud plan: the Spark
window-function formulation must agree with an independently written
pure-Python lag model on arbitrary transaction sequences (amount
boundaries, interleaved keys, equal timestamps)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_flink_pratices_spark.operators.fraud import detect

SMALL, LARGE, WINDOW = 1.00, 500.00, 60_000_000  # µs


def _python_lag_model(rows):
    """Per key: alert iff the previous small-or-large event is small and
    within WINDOW (ties broken by event_id, matching the plan's ordering)."""
    alerts = []
    by_key: dict[int, list] = {}
    for acct, event_id, amount, ts in sorted(rows, key=lambda r: (r[0], r[3], r[1])):
        relevant = amount <= SMALL or amount >= LARGE
        if not relevant:
            continue
        hist = by_key.setdefault(acct, [])
        if amount >= LARGE and hist:
            prev_amount, prev_ts = hist[-1]
            if prev_amount <= SMALL and ts - prev_ts <= WINDOW:
                alerts.append((acct, event_id, amount, ts - prev_ts))
        hist.append((amount, ts))
    return sorted(alerts)


amounts = st.one_of(
    st.sampled_from([0.5, 1.0, 1.01, 250.0, 499.99, 500.0, 900.0]),
    st.floats(min_value=0.01, max_value=1000.0, allow_nan=False),
)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=0, max_value=24))
    rows = []
    for i in range(n):
        acct = draw(st.integers(min_value=1, max_value=3))
        ts = draw(st.integers(min_value=0, max_value=300)) * 1_000_000
        rows.append((acct, i, draw(amounts), ts))
    return rows


@given(corpora())
@settings(max_examples=12, deadline=None)
def test_batch_plan_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(a, e, v, t) for a, e, v, t in rows] or [(0, 0, 0.0, 0)],
        "user_id long, event_id long, value double, ts_us long",
    )
    got = sorted(
        (r.account_id, r.alert_event_id, r.amount, r.gap_us)
        for r in detect(df, SMALL, LARGE, WINDOW).collect()
    )
    expected = _python_lag_model(rows)
    assert got == expected
