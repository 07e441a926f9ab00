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
