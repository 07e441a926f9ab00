"""Local replica of the driver's correctness gate for the CURRENT window.

The per-round driver imports ``__spark_entry__`` with a PLAIN
SparkSession (no engine tuning) and checks the first 50 ``queries()``
entries against ``oracle_sql()`` via DuckDB at sf0.01. The local pytest
parity suite covers every oracle-bearing query, but under the TUNED
session fixture and at sf0.001 — so a conf assumption or an
sf-dependent divergence can pass pytest and still fail the driver.
This tool replays the driver's exact recipe (plain session, sf0.01,
window order) so a round's rotation cohort can be pre-flighted before
the driver burns its independent check on it.

Usage: python tools/driver_replica_check.py [n_window]
       python tools/driver_replica_check.py name1 name2 ...

The second form checks exactly the named queries (window order is
irrelevant) — the fast path after touching plumbing a few specific
queries share. An unknown name is an immediate error, not a skip.

Every invocation also MERGES its per-query outcome into
``REPLICA_r{N}.json`` at the repo root (VERDICT r7 #2: the pre-flight
must be a judge-readable committed artifact, not a registry comment).
``N`` is the round in progress — one past the newest committed
``CORRECTNESS_r*.json`` — overridable via ``SPARK_GRAFT_ROUND``. Merge,
not overwrite: a round's artifact accumulates every query the tool
covered, across targeted and whole-window invocations. Format pinned by
``tests/test_replica_artifact.py``.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [tuple(colnames[i] for i in order)] + out


def _current_round(repo_root: str) -> int:
    """Round in progress = newest committed CORRECTNESS round + 1
    (the driver writes CORRECTNESS_r{N} at the END of round N), unless
    SPARK_GRAFT_ROUND pins it explicitly."""
    import glob
    import re

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        # validate BEFORE any Spark work is queued: a malformed pin must
        # fail fast with the variable named, not as a bare ValueError
        # mid-run (ADVICE r8). ASCII-only: str.isdigit() accepts Unicode
        # digit chars (superscripts) that int() then rejects, and "0"
        # despite the 'positive' message (ADVICE r9).
        if not (env.isascii() and env.isdigit() and int(env) > 0):
            raise SystemExit(
                f"SPARK_GRAFT_ROUND must be a positive integer, got {env!r}"
            )
        return int(env)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _merge_artifact(repo_root: str, sf_dir: str, results: dict) -> str:
    """Merge this invocation's rows into REPLICA_r{N}.json.

    The read-modify-write holds an exclusive flock on a sibling lock
    file for its whole duration (review r8): two targeted checks running
    in parallel would otherwise each read the same prior artifact and
    the second os.replace would discard the first's rows — silently
    dropping queries that WERE verified green from the judge-facing
    record."""
    import contextlib
    import json

    rnd = _current_round(repo_root)
    path = os.path.join(repo_root, f"REPLICA_r{rnd:02d}.json")

    @contextlib.contextmanager
    def _locked():
        try:
            import fcntl
        except ImportError:  # non-POSIX: fall back to unlocked merge
            yield
            return
        with open(f"{path}.lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
    doc = {
        "round": rnd,
        "sf_dir": sf_dir,
        "session": "plain SparkSession.builder.master('local[32]') — no engine tuning",
        "compare": (
            "column-name-sorted, row-sorted full-value equality vs the "
            "registered DuckDB oracle (the driver's rows+schema+hash "
            "gate, replayed locally)"
        ),
        "queries": {},
    }
    with _locked():
        try:
            with open(path) as f:
                prev = json.load(f)
            if isinstance(prev.get("queries"), dict):
                doc["queries"] = prev["queries"]
        except (OSError, ValueError):
            pass
        doc["queries"].update(results)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, path)
    return path


def main() -> int:
    args = sys.argv[1:]

    # fail fast on a malformed round pin BEFORE any Spark work is queued
    # (ADVICE r8) — the merge at the end re-derives the same value
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _current_round(repo_root)

    import duckdb
    from pyspark.sql import SparkSession

    # deliberately NO session.tune: the point is the driver's plain conf
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    if args and not args[0].isdigit():
        unknown = [a for a in args if a not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        window = args
    elif args and len(args) > 1:
        # '20 dedup_simhash' would silently drop the name and report the
        # window green while the touched query never ran — refuse
        raise SystemExit(
            "pass EITHER one window count OR query names, not both: "
            f"{args}"
        )
    else:
        n_window = int(args[0]) if args else 50
        window = list(qs)[:n_window]

    from apache_flink_pratices_spark.io import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, t)}')"
        )

    failed = []
    results: dict[str, dict] = {}
    for i, name in enumerate(window):
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(f"[{i+1}/{len(window)}] {name}: rows-only "
                      f"({len(s_rows)} rows, {time.time()-t0:.1f}s)")
                results[name] = {
                    "rows_only": True,
                    "spark_rows": len(s_rows),
                    "wall_s": round(time.time() - t0, 1),
                    "err": None,
                }
                continue
            res = con.execute(osql[name])
            d_cols = [c[0] for c in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            rows_match = len(s_rows) == len(d_rows)
            schema_match = sorted(s_cols) == sorted(d_cols)
            hash_match = _normalize(s_rows, s_cols) == _normalize(d_rows, d_cols)
            ok = rows_match and schema_match and hash_match
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(s_rows),
                "oracle_rows": len(d_rows),
                "wall_s": round(time.time() - t0, 1),
                "err": None,
            }
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            print(f"[{i+1}/{len(window)}] {name}: ERROR {e}")
            failed.append(name)
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "wall_s": round(time.time() - t0, 1),
                "err": f"{type(e).__name__}: {e}"[:300],
            }
            continue
        status = "ok" if ok else "MISMATCH"
        if not ok:
            failed.append(name)
        print(f"[{i+1}/{len(window)}] {name}: {status} "
              f"({len(s_rows)} rows, {time.time()-t0:.1f}s)")

    artifact = _merge_artifact(repo_root, SF_DIR, results)
    print(f"\n{len(window) - len(failed)}/{len(window)} green; failed: {failed}")
    print(f"artifact: {artifact}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
