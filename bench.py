"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_flink_pratices_spark.registry import all_specs
from apache_flink_pratices_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("afp-bench")
    spark.sparkContext.setLogLevel("WARN")
    specs = {n: s for n, s in all_specs().items() if s.bench}

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # warm the JVM/session on the smallest table once
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name, spec in specs.items():
        # Timed: a noop-format write — materializes every output column
        # end-to-end (count() lets Catalyst skip final projections).
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        rows[name] = df.count()  # untimed, recorded for sanity

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
