"""Print/console sink (K1).

Reference: ``.print()`` at ``examples/word_count.py:51`` and
``src/pyflink_examples/fraud_detection/job.py:145``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def print_sink(df: DataFrame, num_rows: int = 20, truncate: bool = False) -> None:
    """Batch print sink."""
    df.show(num_rows, truncate=truncate)


def console_stream(df: DataFrame, output_mode: str = "append") -> StreamingQuery:
    """Streaming console sink."""
    return df.writeStream.format("console").outputMode(output_mode).start()
