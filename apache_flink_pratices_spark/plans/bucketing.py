"""Bucketed (pre-partitioned) tables: the shuffle-free join path.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem on
orderkey) is the shuffle of both sides. When the same join key is used
across many queries — exactly the reference's keyed-everything layout
(`keyBy(account)`, `keyBy(code)` throughout its jobs) — the scale move is
to pay that shuffle ONCE at write time: store both tables bucketed (and
sorted) by the join key. Spark's bucketed scan then reports the hash
partitioning to Catalyst, which plans a sort-merge join with ZERO
exchanges — every subsequent join of the two tables is map-side.

Bucket-count choice at scale: buckets ≈ total_size / target_partition
(128-512 MB each), a power of two so either side can be coalesced into
the other's bucketing when counts differ by a factor of two (Spark reads
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``). Both tables must
bucket by the SAME column semantics (here: the order key) — bucketing is
hash-based, so equal keys land in equal buckets regardless of row volume,
and skewed keys skew a bucket, not the join (AQE skew-split still
applies to the merge phase).

``write_bucketed`` uses ``saveAsTable`` because bucket metadata lives in
the session catalog — a plain ``parquet(path)`` write cannot record it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` into the session catalog."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With matching bucket counts the physical plan is a sort-merge join
    with no Exchange on either side (asserted in
    ``tests/test_bucketing.py``) — the join runs entirely map-side.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
