"""Replicate the driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry under a PLAIN SparkSession
(no engine tuning — the driver does not use our session helper) at sf0.01
and compares against ``oracle_sql()`` via DuckDB:

- row count,
- column-name set,
- exact values (rows sorted, columns sorted by name; floats compared
  bitwise),
- arrow-type sanity: a DuckDB column materializing as decimal128 while
  Spark yields int64 is the HUGEINT hash trap (integer SUMs need
  ``CAST(... AS BIGINT)`` in the oracle).

Usage: ``python tools/gate_replica.py [name ...]`` (default: all).
Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a: pd.Series, b: pd.Series) -> bool:
    if len(a) != len(b):
        return False
    av, bv = a.to_numpy(), b.to_numpy()
    if av.dtype.kind == "f" and bv.dtype.kind == "f":
        return av.tobytes() == bv.tobytes()  # bit-exact, NaN-safe
    try:
        return bool(np.array_equal(av, bv)) or list(av) == list(bv)
    except ValueError:  # ragged object arrays (lists/arrays in cells)
        return [list(x) if hasattr(x, "__len__") and not isinstance(x, (str, bytes)) else x for x in av] == [
            list(x) if hasattr(x, "__len__") and not isinstance(x, (str, bytes)) else x for x in bv
        ]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, osql = m.queries(), m.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            got = _canon(sdf.toPandas())
            if name not in osql:
                print(f"{name:32s} rows={len(got)} (no oracle — rows-only)")
                continue
            rel = con.execute(osql[name])
            arrow = rel.fetch_arrow_table()
            exp = _canon(arrow.to_pandas())
            probs = []
            if list(got.columns) != list(exp.columns):
                probs.append(f"columns {list(got.columns)} != {list(exp.columns)}")
            elif len(got) != len(exp):
                probs.append(f"rowcount {len(got)} != {len(exp)}")
            else:
                for c in got.columns:
                    if not _values_equal(got[c], exp[c]):
                        probs.append(f"values differ in {c!r}")
                        break
            for field in arrow.schema:
                if "decimal" in str(field.type):
                    probs.append(
                        f"oracle col {field.name!r} is {field.type} (HUGEINT trap?)"
                    )
            status = "OK " if not probs else "FAIL"
            print(f"{name:32s} {status} rows={len(got)}" + ("  " + "; ".join(probs) if probs else ""))
            if probs:
                failures.append(name)
        except Exception as exc:  # noqa: BLE001 — gate must report, not die
            print(f"{name:32s} ERR  {type(exc).__name__}: {exc}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} green" + (f"; FAILURES: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
