"""Behavior + plan audits for the inverted-index build
(operators/search_index.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.search_index import (
    IDX_CAP,
    build_inverted_index,
)
from apache_flink_pratices_spark.plans.explain import formatted_plan

SF = "/root/testdata/sf0.001"


def test_postings_are_capped_sorted_and_flagged(spark):
    rows = build_inverted_index(spark, SF).collect()
    assert rows, "empty index"
    for r in rows:
        ids = [int(s) for s in r.postings.split(",")]
        assert len(ids) == min(r.df, IDX_CAP)
        assert ids == sorted(ids)
        assert r.truncated == (r.df > IDX_CAP)
        if not r.truncated:
            assert len(ids) == r.df


def test_hot_term_posting_is_the_smallest_doc_ids(spark):
    """For a truncated term the capped list must be exactly the IDX_CAP
    smallest doc_ids containing it — not an arbitrary subset."""
    idx = {r.term: r for r in build_inverted_index(spark, SF).collect()}
    hot = next((r for r in idx.values() if r.truncated), None)
    assert hot is not None, "test corpus has no term above the cap"
    from apache_flink_pratices_spark.io import load

    d = load(spark, SF, "documents")
    expected = [
        r.doc_id
        for r in d.select("doc_id")
        .filter(
            F.array_contains(F.split(F.lower("text"), " "), hot.term)
        )
        .orderBy("doc_id")
        .limit(IDX_CAP)
        .collect()
    ]
    assert [int(s) for s in hot.postings.split(",")] == expected


def test_bottom_k_sort_fans_out_over_salt(spark):
    """Stage 1's window must partition by (term, salt): no per-term
    corpus-sized sort for stopword-class terms."""
    import re

    plan = formatted_plan(build_inverted_index(spark, SF))
    assert re.search(r"hashpartitioning\(term#\d+, __salt#\d+", plan), plan


# --- BM25 ranked retrieval ---------------------------------------------------


def test_bm25_matches_pure_python_reference(spark):
    """bm25_topk pinned to an independent pure-Python BM25: tokenize,
    df/dl/N/SD, the rank-band query selection, floor-quantized idf and
    the fraction-cleared integral score recomputed with dict/math.floor
    arithmetic — same top-k, same exact scores."""
    import math

    from apache_flink_pratices_spark.io import load
    from apache_flink_pratices_spark.operators.search_index import (
        BM25_K,
        BM25_MICRO,
        BM25_QHI,
        BM25_QLO,
        bm25_topk,
    )

    docs = {
        r["doc_id"]: [w for w in (r["text"] or "").lower().split(" ") if w]
        for r in load(spark, SF, "documents").select("doc_id", "text").collect()
    }
    tf: dict[tuple[int, str], int] = {}
    for d, ws in docs.items():
        for w in ws:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    dl = {d: len(ws) for d, ws in docs.items() if ws}
    n, sd = len(dl), sum(dl.values())
    df: dict[str, int] = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    band = sorted(df, key=lambda w: (-df[w], w))[BM25_QLO - 1 : BM25_QHI]
    idf = {
        w: math.floor(
            BM25_MICRO * math.log((2 * (n - df[w]) + 1) / (2 * df[w] + 1) + 1.0)
        )
        for w in band
    }
    per_doc: dict[int, list[int]] = {}
    for (d, w), t in tf.items():
        if w in idf:
            s = idf[w] * 22 * t * sd // (10 * t * sd + 3 * sd + 9 * dl[d] * n)
            per_doc.setdefault(d, []).append(s)
    ranked = sorted(
        ((d, len(ss), sum(ss)) for d, ss in per_doc.items()),
        key=lambda r: (-r[2], r[0]),
    )[:BM25_K]

    got = [
        (r["doc_id"], r["n_hit_terms"], r["bm25_micro"])
        for r in bm25_topk(spark, SF)
        .orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
        .collect()
    ]
    assert got == ranked
    assert len(got) == BM25_K and all(s > 0 for _, _, s in got)


def test_bm25_plan_broadcasts_query_and_takes_ordered(spark):
    """The scale-critical properties the docstring claims, pinned by
    NODE COUNT so one part of the plan cannot mask regression of
    another (round-13 second review: a bare `in plan` for TakeOrdered
    was satisfied by the query-band top-28 even if the FINAL top-k
    regressed to a global sort, and `BroadcastHashJoin in plan` by the
    dl join even if the 8-row query table shuffled): exactly two
    TakeOrderedAndProject nodes (band top-28 + final top-k), exactly
    two BroadcastHashJoins (query-term join + dl join), ZERO Sort or
    SortMergeJoin nodes anywhere, no real cartesian (the 1-row corpus
    scalars ride BroadcastNestedLoopJoin), nothing in Python."""
    import re

    from apache_flink_pratices_spark.operators.search_index import bm25_topk

    plan = formatted_plan(bm25_topk(spark, SF))
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 0, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
