"""dup_span_extract / dup_spans_of: maximal merged duplicated-span
extraction (substring dedup, Lee et al. 2022)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.dedup import (
    DUPCOV_N,
    dup_ngram_coverage,
    dup_span_extract,
    dup_spans_of,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _w(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_phrase_yields_one_merged_span_per_doc(spark):
    """A shared run of DUPCOV_N+4 tokens produces overlapping duplicated
    shingles that must merge into ONE maximal span in each doc, at the
    right positions, with exclusive end."""
    shared = _w("p", DUPCOV_N + 4)  # 12 tokens -> 5 overlapping dup shingles
    a = f"{_w('a', 3)} {shared} {_w('b', 3)}"  # span at tokens [3, 15)
    b = f"{shared} {_w('c', 5)}"  # span at tokens [0, 12)
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in dup_spans_of(_docs(spark, [a, b])).collect()
    }
    assert spans == {
        0: (3, 3 + DUPCOV_N + 4, DUPCOV_N + 4),
        1: (0, DUPCOV_N + 4, DUPCOV_N + 4),
    }


def test_disjoint_shared_phrases_stay_separate_spans(spark):
    """Two shared phrases separated by unique tokens must emit TWO spans,
    not one merged range."""
    s1, s2 = _w("x", DUPCOV_N), _w("y", DUPCOV_N)
    a = f"{s1} {_w('u', 4)} {s2}"
    b = f"{s2} {_w('v', 6)} {s1}"
    out = dup_spans_of(_docs(spark, [a, b]))
    spans_a = sorted(
        (r.span_start, r.span_end)
        for r in out.filter(F.col("doc_id") == 0).collect()
    )
    assert spans_a == [(0, DUPCOV_N), (DUPCOV_N + 4, 2 * DUPCOV_N + 4)]
    assert out.count() == 4


def test_within_doc_repetition_never_triggers(spark):
    """The hit definition is cross-document (distinct-doc count >= 2):
    a doc repeating its own phrase twice emits no spans."""
    phrase = _w("r", DUPCOV_N)
    doc = f"{phrase} {_w('m', 3)} {phrase}"
    other = _w("z", DUPCOV_N + 5)
    assert dup_spans_of(_docs(spark, [doc, other])).count() == 0


def test_short_docs_yield_no_spans(spark):
    """< DUPCOV_N tokens -> no shingles -> no spans (and no descending-
    sequence crash, the ADVICE r5 bug class)."""
    assert (
        dup_spans_of(_docs(spark, ["tiny doc", _w("q", DUPCOV_N - 1)])).count()
        == 0
    )


def test_span_totals_equal_coverage_metric(spark):
    """The interval-merge arithmetic is shared with dup_ngram_coverage:
    per doc, the SUM of extracted span_tokens must equal the coverage
    metric's n_covered on the real corpus — two independent plans, one
    truth."""
    spans = (
        dup_span_extract(spark, SF)
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("t"))
    )
    cov = dup_ngram_coverage(spark, SF).select("doc_id", "n_covered")
    joined = cov.join(spans, "doc_id", "left").select(
        "doc_id", "n_covered", F.coalesce("t", F.lit(0)).alias("t")
    )
    bad = joined.filter(F.col("n_covered") != F.col("t")).count()
    assert bad == 0


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        data=st.lists(
            st.lists(
                # 3-token vocab + DUPCOV_N-12 tokens/doc: duplicated
                # shingles, adjacency (s == prev_end), and containment
                # all occur organically
                st.sampled_from(["aa", "bb", "cc"]),
                min_size=0,
                max_size=DUPCOV_N + 4,
            ),
            min_size=2,
            max_size=5,
        )
    )
    def test_spans_match_bruteforce_interval_merge(spark, data):
        """For ARBITRARY tiny-vocab corpora, dup_spans_of equals a
        brute-force oracle: collect duplicated shingles (distinct-doc
        count >= 2), cover [s, s+N) per hit, merge overlapping-or-
        adjacent intervals into maximal spans."""
        docs = [(i, " ".join(toks)) for i, toks in enumerate(data)]
        # brute force
        shingles: dict[int, list[tuple[int, str]]] = {}
        owners: dict[str, set[int]] = {}
        for i, toks in enumerate(data):
            for s in range(len(toks) - DUPCOV_N + 1):
                g = " ".join(toks[s : s + DUPCOV_N])
                shingles.setdefault(i, []).append((s, g))
                owners.setdefault(g, set()).add(i)
        expected = set()
        for i in shingles:
            spans: list[list[int]] = []
            for s, g in shingles[i]:  # s ascending by construction
                if len(owners[g]) < 2:
                    continue
                if spans and s <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], s + DUPCOV_N)
                else:
                    spans.append([s, s + DUPCOV_N])
            for a, b in spans:
                expected.add((i, a, b, b - a))
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in dup_spans_of(
                spark.createDataFrame(docs, "doc_id long, text string")
            ).collect()
        }
        assert got == expected
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_removal_cuts_exactly_the_spans(spark):
    """remove_dup_spans must cut exactly the extracted ranges: rebuild
    each cleaned doc by hand from the span list and compare strings."""
    from apache_flink_pratices_spark.operators.dedup import remove_dup_spans

    shared = _w("p", DUPCOV_N + 4)
    docs = [f"{_w('a', 3)} {shared} {_w('b', 3)}", f"{shared} {_w('c', 5)}"]
    frame = _docs(spark, docs)
    spans = {}
    for r in dup_spans_of(frame).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    got = {r.doc_id: r for r in remove_dup_spans(frame).collect()}
    for i, text in enumerate(docs):
        toks = text.lower().split(" ")
        keep = [
            w
            for j, w in enumerate(toks)
            if not any(a <= j < b for a, b in spans.get(i, []))
        ]
        assert got[i].clean_text == " ".join(keep)
        assert got[i].n_tokens == len(toks)
        assert got[i].n_removed == len(toks) - len(keep)


def test_removal_fully_duplicated_doc_is_empty_string(spark):
    """A doc that is one big duplicated span cleans to '' (not null) —
    the cross-engine edge the oracle coalesces explicitly."""
    from apache_flink_pratices_spark.operators.dedup import remove_dup_spans

    shared = _w("p", DUPCOV_N)
    out = {
        r.doc_id: r
        for r in remove_dup_spans(
            _docs(spark, [shared, f"{shared} {_w('x', 4)}"])
        ).collect()
    }
    assert out[0].clean_text == "" and out[0].n_removed == DUPCOV_N
    assert out[1].n_removed == DUPCOV_N and out[1].clean_text == _w("x", 4)
