"""Round-6 additions: C4-style segment dedup, linear quality classifier,
incremental MV refresh. Oracle equivalence is covered by
tests/test_oracle_parity.py; these pin the edge cases and plan shapes the
oracles cannot see."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.dedup import SEG_N, dedup_segment_exact
from apache_flink_pratices_spark.operators.olap import mv_incremental_refresh

SF = "/root/testdata/sf0.001"


def _seg_frame(spark, tmp_path, texts):
    """Write a tiny documents table and point the operator at it."""
    sf = str(tmp_path)
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_segment_dedup_short_doc_yields_no_rows(spark, tmp_path):
    """Docs with < SEG_N tokens produce ZERO segments, not a crash: the
    guarded sequence must not go descending (the dup_ngram_coverage bug
    class from ADVICE r5)."""
    short = " ".join(f"w{i}" for i in range(SEG_N - 1))
    full = " ".join(f"w{i}" for i in range(SEG_N))
    sf = _seg_frame(spark, tmp_path, [short, full])
    rows = {r.doc_id: r for r in dedup_segment_exact(spark, sf).collect()}
    assert 0 not in rows  # short doc: no segments at all
    assert rows[1].n_segments == 1 and rows[1].dup_segments == 0


def test_segment_dedup_first_occurrence_wins(spark, tmp_path):
    """An identical segment later in the corpus (or later in the SAME doc)
    is the duplicate; the smallest (doc_id, seg_idx) is the original."""
    seg = " ".join(f"s{i}" for i in range(SEG_N))
    other = " ".join(f"o{i}" for i in range(SEG_N))
    # doc0 = [seg, other]; doc1 = [other, seg, seg]
    sf = _seg_frame(spark, tmp_path, [f"{seg} {other}", f"{other} {seg} {seg}"])
    rows = {r.doc_id: r for r in dedup_segment_exact(spark, sf).collect()}
    assert rows[0].n_segments == 2 and rows[0].dup_segments == 0
    assert rows[1].n_segments == 3 and rows[1].dup_segments == 3
    assert rows[1].dup_frac == 1.0


# The round-6 md5-stand-in classifier tests moved to
# tests/test_classifier_fit.py in round 13 when the scorer was
# re-registered on TRAINED batch-perceptron weights (VERDICT r12 #3) —
# the pure-Python pin now covers the whole train+score pipeline.


def test_mv_refresh_plan_is_partial_merge(spark):
    """The plan must aggregate base and delta separately and merge partials
    (a Union feeding the final aggregate), not rescan the full table once."""
    df = mv_incremental_refresh(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    assert plan.count("Scan parquet") == 2
    # and the merged result is what a single full aggregate would produce
    from apache_flink_pratices_spark.functions.numeric import qlong
    from apache_flink_pratices_spark.io import load

    o = load(spark, SF, "orders")
    full = {
        r.o_orderstatus: (r.n, round(r.rev, 2))
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            (F.sum(qlong("o_totalprice", 100)).cast("double") / 100.0).alias("rev"),
        )
        .collect()
    }
    merged = {
        r.o_orderstatus: (r.n_orders, round(r.revenue, 2)) for r in df.collect()
    }
    assert merged == full


# --- hypothesis property tests against brute-force models -------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

# small word alphabet so identical segments actually occur
corpus_strategy = st.lists(
    st.lists(st.sampled_from(["x", "y"]), min_size=0, max_size=3 * SEG_N + 5).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


def _segments(text: str):
    toks = text.lower().split(" ")
    return [
        " ".join(toks[i * SEG_N : (i + 1) * SEG_N])
        for i in range(len(toks) // SEG_N)
    ]


@settings(max_examples=10, deadline=None)
@given(texts=corpus_strategy)
def test_segment_dedup_matches_python_model(spark, tmp_path_factory, texts):
    sf = _seg_frame(spark, tmp_path_factory.mktemp("segdedup"), texts)
    got = {
        r.doc_id: (r.n_segments, r.dup_segments)
        for r in dedup_segment_exact(spark, sf).collect()
    }
    seen: set[str] = set()
    expect: dict[int, tuple[int, int]] = {}
    for doc_id, text in enumerate(texts):
        segs = _segments(text)
        dup = 0
        for s in segs:
            if s in seen:
                dup += 1
            seen.add(s)
        if segs:
            expect[doc_id] = (len(segs), dup)
    assert got == expect


def test_segment_dedup_plan_single_digest_shuffle(spark):
    """The winner must come from a window min on the digest partition:
    no join node, and exactly two exchanges (digest, then doc_id)."""
    import re

    df = dedup_segment_exact(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            # tiny alphabet -> some tokens cross VOCAB_MIN_DF, some don't
            st.sampled_from(["p", "q", "r", "s", "t"]),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_vocab_coverage_matches_python_model(spark, tmp_path_factory, texts):
    from collections import Counter

    from apache_flink_pratices_spark.operators.text import (
        VOCAB_MIN_DF,
        tokenizer_vocab_coverage,
    )

    sf = _seg_frame(spark, tmp_path_factory.mktemp("vocab"), texts)
    got = {
        r.source: (r.n_tokens, r.n_oov)
        for r in tokenizer_vocab_coverage(spark, sf).collect()
    }
    toks = [w for t in texts for w in t.lower().split(" ") if w]
    counts = Counter(toks)
    vocab = {w for w, c in counts.items() if c >= VOCAB_MIN_DF}
    if toks:  # all docs share source 'src0' in the fixture
        expect = (len(toks), sum(1 for w in toks if w not in vocab))
        assert got == {"src0": expect}
    else:
        assert got == {}
