"""JSONL/CSV landing-zone loaders: schema enforcement + corrupt-record
quarantine (sources/files.py)."""

from __future__ import annotations

import json

from apache_flink_pratices_spark.sources.files import (
    CORRUPT_COL,
    load_csv,
    load_jsonl,
    split_corrupt,
)

SCHEMA = "event_id long, event_type string, value double"


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    lines = [
        json.dumps({"event_id": 1, "event_type": "click", "value": 1.5}),
        "{this is not json",
        json.dumps({"event_id": 2, "event_type": "view", "value": 2.0}),
        '{"event_id": "not-a-number", "event_type": "x", "value": 3}',
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    clean, bad = split_corrupt(load_jsonl(spark, str(p), SCHEMA))
    got = {(r["event_id"], r["event_type"], r["value"]) for r in clean.collect()}
    assert got == {(1, "click", 1.5), (2, "view", 2.0)}
    assert CORRUPT_COL not in clean.columns
    raw = [r[CORRUPT_COL] for r in bad.collect()]
    assert len(raw) == 2 and any("not json" in x for x in raw)


def test_csv_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "event_id,event_type,value\n"
        "1,click,1.5\n"
        "oops,view,2.0\n"  # non-numeric id -> quarantined
        "3,purchase,9.0\n"
    )
    clean, bad = split_corrupt(load_csv(spark, str(p), SCHEMA))
    got = {(r["event_id"], r["event_type"], r["value"]) for r in clean.collect()}
    assert got == {(1, "click", 1.5), (3, "purchase", 9.0)}
    assert bad.count() == 1


def test_jsonl_parse_is_jvm_side(spark, tmp_path):
    """The scan must be a native JSON FileScan (no Python in the parse
    path) so codegen and pushdown apply."""
    p = tmp_path / "in.jsonl"
    p.write_text(json.dumps({"event_id": 1, "event_type": "c", "value": 0.1}) + "\n")
    df = load_jsonl(spark, str(p), SCHEMA).filter("event_id = 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan json" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_jsonl_streaming_quarantine(spark, tmp_path):
    """The same schema+corrupt contract must hold on the streaming read
    path: malformed lines flow to the quarantine side of a foreachBatch
    split instead of failing the query or vanishing."""
    import json as _json
    import os

    indir = tmp_path / "in"
    os.makedirs(indir)
    (indir / "a.jsonl").write_text(
        _json.dumps({"event_id": 1, "event_type": "click", "value": 1.5})
        + "\n{broken\n"
        + _json.dumps({"event_id": 2, "event_type": "view", "value": 2.0})
        + "\n"
    )
    from apache_flink_pratices_spark.sources.files import (
        CORRUPT_COL,
        _with_corrupt,
    )

    src = (
        spark.readStream.schema(_with_corrupt(SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(str(indir))
    )
    got = {"clean": [], "bad": []}

    def sink(batch, _bid):
        # batch is a plain DataFrame: the corrupt-only restriction does
        # not apply (foreachBatch materializes the parse per batch)
        rows = batch.collect()
        got["clean"] += [
            (r["event_id"], r["event_type"]) for r in rows if r[CORRUPT_COL] is None
        ]
        got["bad"] += [r[CORRUPT_COL] for r in rows if r[CORRUPT_COL] is not None]

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got["clean"]) == [(1, "click"), (2, "view")]
    assert got["bad"] == ["{broken"]
