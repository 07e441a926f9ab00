"""Event-time & late-data policy (SURVEY.md §2.6 W3).

The reference's CEP design is explicit: *no allowed lateness — a late market
event is a lost opportunity, drop it* (reference ``docs/project docs/2. CEP
레이어 구현 설계 및 체크리스트.md:207``). Its fraud job assigns no watermark
strategy at all (``src/pyflink_examples/fraud_detection/job.py:9``), so at
runtime timers only fire on the end-of-input watermark.

Spark requires a watermark for stateful cleanup; a 0-second watermark
reproduces the drop-late design stance while still letting state age out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def drop_late(df: DataFrame, ts_col: str, delay: str = "0 seconds") -> DataFrame:
    """Apply the engine's late-data policy via a watermark.

    What the watermark actually enforces differs by operator (ADVICE r2):
    built-in stateful ops (windowed aggregation, stream-stream joins,
    dropDuplicatesWithinWatermark) DO drop rows older than the watermark,
    but ``applyInPandasWithState`` delivers late rows to the processor —
    there the watermark only drives event-time timeouts and state-cleanup
    timing. Our keyed processors therefore implement the reference's
    late-data stance themselves: the fraud detector processes by event
    time (late rows re-enter the timeline deterministically), and the CEP
    generator drains due watches against the watermark at end-of-batch so
    a late row can never leave a stale timer armed."""
    return df.withWatermark(ts_col, delay)
