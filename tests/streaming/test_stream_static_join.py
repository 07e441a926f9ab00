"""Refreshable-rules streaming join — the Spark twin of Flink's
broadcast-state pattern.

The reference distributes rule/config updates to keyed operators via
broadcast state (designed CEP layer: thresholds, watched codes). A naive
Spark stream-static join does NOT give this: a static DataFrame pins its
file listing at plan creation, so overwriting the rules table makes
in-flight batches fail (FILE_NOT_EXIST) or go stale. The supported
pattern is ``foreachBatch``: re-read the rules table at each micro-batch
and broadcast-join it to the batch — rule updates become visible to a
running query without restart, which this test pins end to end.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

BASE = datetime.datetime(2021, 1, 1, tzinfo=datetime.timezone.utc)


def _write_rules(spark, path, rows):
    spark.createDataFrame(
        rows, "account_id long, threshold double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_rules_update_visible_without_restart(spark, tmp_path):
    in_dir = os.path.join(str(tmp_path), "in")
    rules_dir = os.path.join(str(tmp_path), "rules")
    os.makedirs(in_dir)

    _write_rules(spark, rules_dir, [(1, 100.0), (2, 100.0)])

    schema = "account_id long, ts timestamp, amount double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )

    hits: list[tuple] = []

    def apply_rules(batch_df, batch_id):
        # the rules table is re-read HERE, once per micro-batch — the
        # refresh point Flink models with broadcast state
        rules = batch_df.sparkSession.read.parquet(rules_dir)
        out = (
            batch_df.join(F.broadcast(rules), "account_id")
            .filter(F.col("amount") > F.col("threshold"))
            .select("account_id", "amount", "threshold")
        )
        hits.extend((r.account_id, r.threshold) for r in out.collect())

    q = (
        stream.writeStream.foreachBatch(apply_rules)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .start()
    )
    try:
        # batch 1 under the original rules: only account 1 exceeds 100
        spark.createDataFrame(
            [(1, BASE, 150.0), (2, BASE, 50.0)], schema
        ).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        assert set(hits) == {(1, 100.0)}, hits

        # rules tightened mid-stream: account 2's threshold drops to 10
        _write_rules(spark, rules_dir, [(1, 100.0), (2, 10.0)])
        spark.createDataFrame(
            [(1, BASE, 60.0), (2, BASE, 50.0)], schema
        ).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        # account 2 now flagged under the NEW threshold — no restart;
        # account 1's 60.0 still passes under its unchanged 100.0 rule
        assert set(hits) == {(1, 100.0), (2, 10.0)}, hits
    finally:
        q.stop()
