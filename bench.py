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
    # 2) streaming events/sec through the two flagship stateful paths
    #    (VERDICT r6 #6 — the reference's only end-to-end perf target)
    import tempfile

    from apache_flink_pratices_spark.streaming.bench_streams import (
        cep_events_per_sec,
        fraud_events_per_sec,
        prepare_cep_input,
        prepare_fraud_input,
        prepare_replay_input,
        replay_day_seconds,
    )

    # full volume by default (the driver's per-round artifact must measure
    # the amortized rate); "small" keeps the pytest contract smoke fast.
    # Same min-over-runs policy as the headline queries: the first run of
    # each streaming path pays one-time Python-worker + state-server
    # spin-up (~2x the steady rate on this box), so an untimed warm-up
    # precedes the measured runs and the best rate is reported.
    small = os.environ.get("SPARK_GRAFT_STREAM_BENCH") == "small"
    stream_runs = 1 if small else 3
    n_tx = 20_000 if small else 100_000
    n_codes, n_cycles = (50, 3) if small else (300, 17)
    rp_codes, rp_slice = (2, 120) if small else (8, 900)
    fraud_rate = cep_rate = 0.0
    day_s = float("inf")
    n_alerts = n_signals = n_replay_sigs = 0
    with tempfile.TemporaryDirectory(prefix="afp_bench_stream_") as wd:
        if not small:  # warm-up: spin up workers/state server, untimed
            fraud_events_per_sec(spark, os.path.join(wd, "w0"), n_tx=2_000)
            cep_events_per_sec(
                spark, os.path.join(wd, "w1"), n_codes=10, n_cycles=1
            )
        # the inputs are deterministic: build each ONCE and share it across
        # the measured runs — only the checkpoint/query must be fresh per
        # run (review r7: rebuilding identical parquet 3x was untimed waste)
        fraud_in = os.path.join(wd, "fraud_in")
        cep_in = os.path.join(wd, "cep_in")
        replay_in = os.path.join(wd, "replay_in")
        fraud_rows = prepare_fraud_input(spark, fraud_in, n_tx=n_tx)
        cep_rows = prepare_cep_input(spark, cep_in, n_codes, n_cycles)
        replay_rows = prepare_replay_input(spark, replay_in, rp_codes, rp_slice)
        for r in range(stream_runs):
            rd = os.path.join(wd, f"r{r}")
            fr, n_alerts = fraud_events_per_sec(
                spark,
                os.path.join(rd, "f"),
                in_dir=fraud_in,
                n_rows=fraud_rows,
            )
            cr, n_signals = cep_events_per_sec(
                spark,
                os.path.join(rd, "c"),
                n_codes=n_codes,
                n_cycles=n_cycles,
                in_dir=cep_in,
                n_rows=cep_rows,
            )
            ds, n_replay_sigs = replay_day_seconds(
                spark,
                os.path.join(rd, "p"),
                n_codes=rp_codes,
                slice_s=rp_slice,
                in_dir=replay_in,
                n_rows=replay_rows,
            )
            fraud_rate, cep_rate = max(fraud_rate, fr), max(cep_rate, cr)
            day_s = min(day_s, ds)
            # a rate over an empty pipeline is not a measurement: fail the
            # artifact loudly rather than record it (review r7; the
            # small-mode pytest smoke asserts the same contract)
            if n_alerts <= 0 or n_signals <= 0 or n_replay_sigs <= 0:
                raise RuntimeError(
                    f"streaming bench produced no output (run {r}: "
                    f"alerts={n_alerts}, signals={n_signals}, "
                    f"replay_signals={n_replay_sigs})"
                )
    streaming = {
        "fraud_ev_s": int(fraud_rate),
        "cep_ev_s": int(cep_rate),
        # extrapolated seconds to replay a 24h 8-market day through the
        # real signal path (the reference's "day of data in minutes" bar)
        "replay_day_s": round(day_s, 1),
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
    spark.stop()


if __name__ == "__main__":
    main()
