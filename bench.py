"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (VERDICT r5 #1 — the driver captures only the LAST 2000
chars of stdout and parses the last line, so the final line must stay
compact): two JSON lines are printed —

1. a verbose detail line: per-query medians ("queries_median", the
   box-noise indicator), sanity row counts ("rows") and a schema note;
2. the COMPACT summary line, LAST: {"metric", "value" (sum of mins),
   "unit", "sf", "runs", "queries" (per-query MIN, 3-decimal floats,
   no spaces)}. tests/test_bench_contract.py pins its length budget.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 4); the min is the
best estimate of the plan's cost on this box (single runs vary ±2x from
scheduling noise — an interleaved A/B of identical plans measured
2.4-10.4 s for the same query in one session, so one extra sample per
query materially stabilizes the min); round-over-round comparisons
should use the min. Timing is a noop-format
write — count() lets Catalyst skip computing final projections, which
made round-1 numbers up to 10x optimistic.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_flink_pratices_spark.registry import bench_specs
from apache_flink_pratices_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("afp-bench")
    spark.sparkContext.setLogLevel("WARN")
    # REGISTRATION order, not the driver-gate rotation order: timings are
    # position-in-session sensitive (JIT warm-up), so the sequence must be
    # identical every round for min-over-min comparability.
    specs = bench_specs()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    rows: dict[str, int] = {}
    # Warm-up: one untimed pre-pass of EVERY benched query. Session-wide
    # JIT (C2-compiling the parquet reader, shuffle, and codegen framework
    # classes) accumulates across queries, so without this the same plan
    # measures ~1.4x slower as the 2nd query of the session than the 20th
    # (docs/scale_notes.md round 5) — a position effect min-of-N cannot
    # remove because all N runs share the position.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for spec in specs.values():
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    spark._jvm.System.gc()
    for name, spec in specs.items():
        per: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # Timed: a noop-format write — materializes every output column
            # end-to-end (count() lets Catalyst skip final projections).
            df.write.format("noop").mode("overwrite").save()
            per.append(time.perf_counter() - t0)
            # drop any persist() the query made so repeats stay independent,
            # and collect garbage OUTSIDE the timed window: heap pressure
            # from a query's own first (codegen/JIT) run otherwise leaks GC
            # pauses into its later runs — observed inflating even the MIN
            # of persist-heavy queries 2-3x late in a full session
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        timings[name] = round(min(per), 3)
        medians[name] = round(statistics.median(per), 3)
        rows[name] = spec.fn(spark, sf_dir).count()  # untimed, for sanity
        spark.catalog.clearCache()

    # --- scale-evidence extras (untimed, after the headline loop) --------
    # 1) measured LSH pruning on the planted-cluster corpus (VERDICT r6 #5)
    from apache_flink_pratices_spark.operators.similarity import (
        ann_lsh_clustered_candidate_fraction,
    )

    cand_fraction = round(ann_lsh_clustered_candidate_fraction(spark, sf_dir), 4)
    spark.catalog.clearCache()
    # 1b) measured above-cap hot-bucket guard on a planted adversarial
    #     corpus at sf0.1 (VERDICT r7 #4): pairs + wall for the guarded
    #     branch vs the arithmetic unguarded fan-out
    from apache_flink_pratices_spark.operators.dedup import hot_bucket_guard_bench

    hot_guard = hot_bucket_guard_bench(spark, sf_dir)
    spark.catalog.clearCache()
    # 2) streaming events/sec through the flagship stateful paths
    #    (VERDICT r6 #6 — the reference's only end-to-end perf target),
    #    measured in a FRESH subprocess engine. Measured in THIS JVM
    #    after the 30-query headline loop, the identical paths lose ~2×
    #    to accumulated heap/JIT/session debris (r8: CEP 25.6k ev/s
    #    fresh vs 12.4k in-session) — a bench artifact, not a property
    #    of the paths: a production streaming job owns its driver. The
    #    subprocess prints one JSON line (see bench_streams.main);
    #    full volume by default, "small" keeps the pytest smoke fast.
    #    The batch session is STOPPED first — it has nothing left to do,
    #    and an idle local[32] JVM (32 executor threads + GC/netty
    #    housekeeping) contends with the child's local[32] measurably:
    #    CEP measured 22.5k ev/s with the parent JVM gone vs ~13k with
    #    it idling alongside.
    import subprocess

    spark.stop()
    sp = subprocess.run(
        [
            sys.executable,
            "-m",
            "apache_flink_pratices_spark.streaming.bench_streams",
        ],
        capture_output=True,
        text=True,
        env=dict(os.environ),
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1800,
    )
    if sp.returncode != 0:
        raise RuntimeError(
            f"streaming bench subprocess failed:\n{sp.stderr[-2000:]}"
        )
    stream_detail = json.loads(sp.stdout.strip().splitlines()[-1])
    n_alerts = stream_detail["fraud_output_alerts"]
    n_signals = stream_detail["cep_output_signals"]
    n_replay_sigs = stream_detail["replay_output_signals"]
    replay_rows = stream_detail["replay_slice"]["rows"]
    rp_codes = stream_detail["replay_slice"]["n_codes"]
    rp_slice = stream_detail["replay_slice"]["slice_s"]
    streaming = {
        "fraud_ev_s": stream_detail["fraud_ev_s"],
        "cep_ev_s": stream_detail["cep_ev_s"],
        # extrapolated seconds to replay a 24h 8-market day through the
        # real signal path (the reference's "day of data in minutes" bar)
        "replay_day_s": stream_detail["replay_day_s"],
    }

    detail = {
        "queries_median": medians,
        "rows": rows,
        "ann_lsh_clustered_candidate_fraction": cand_fraction,
        "hot_bucket_guard": hot_guard,
        "streaming": {
            **streaming,
            "fraud_output_alerts": n_alerts,
            "cep_output_signals": n_signals,
            "replay_output_signals": n_replay_sigs,
            "replay_slice": {"n_codes": rp_codes, "slice_s": rp_slice,
                             "rows": replay_rows},
        },
        "schema_note": (
            "final line: value/queries = per-query min over `runs` noop-write "
            "executions (cache cleared between runs); this line: medians = "
            "box-noise indicator, rows = untimed sanity counts"
        ),
    }
    summary = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
        "runs": n_runs,
        "queries": timings,
        # streaming ev/s repeated on the summary line: the driver may only
        # capture the LAST line, and the metric must land in BENCH_r{N}
        "streaming": streaming,
    }
    print(json.dumps(detail))
    # LAST line, compact separators: must fit (with slack) inside the
    # driver's 2000-char stdout tail capture or the round loses its
    # benchmark artifact (BENCH_r05 parsed=null).
    print(json.dumps(summary, separators=(",", ":")))
    # session already stopped before the streaming subprocess


if __name__ == "__main__":
    main()
