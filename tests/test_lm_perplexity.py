"""quality_lm_perplexity: bigram-LM document scorer cross-pinned to a
pure-Python scorer on a pinned corpus (VERDICT r11 #4) — the Python pin
recomputes the whole LM (counts, micro-nat quantization, accumulation)
independently with math.log, so the Spark pipeline's count tables, join
keys and fixed-point arithmetic are all under test."""

from __future__ import annotations

import math
import os
from collections import Counter

import pytest

from apache_flink_pratices_spark.operators.text import LM_MICRO, quality_lm_perplexity

#: pinned corpus: repeated bigrams ("the table"), a rare continuation
#: ("the zebra"), a doc whose only token is also a frequent one, and a
#: double space (empty-string token — part of the tokenizer contract)
PINNED = [
    (1, "the table the table the table"),
    (2, "the zebra sat"),
    (3, "table"),
    (4, "the  table"),
]


def _python_scores(rows):
    docs = {doc_id: text.lower().split(" ") for doc_id, text in rows}
    uni = Counter(w for ws in docs.values() for w in ws)
    n_tot = sum(uni.values())
    bi = Counter(
        (ws[i], ws[i + 1]) for ws in docs.values() for i in range(len(ws) - 1)
    )
    ctx = Counter()
    for (w1, _), c2 in bi.items():
        ctx[w1] += c2

    def nll_micro(num: int, den: int) -> int:
        return math.floor(LM_MICRO * math.log(num / den))

    out = {}
    for doc_id, ws in docs.items():
        terms = [nll_micro(n_tot, uni[ws[0]])]
        terms += [nll_micro(ctx[ws[i]], bi[(ws[i], ws[i + 1])]) for i in range(len(ws) - 1)]
        total = sum(terms)
        out[doc_id] = (len(terms), total, total / len(terms))
    return out


@pytest.fixture(scope="module")
def pinned_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lmcorpus")
    spark.createDataFrame(PINNED, "doc_id long, text string").coalesce(1).write.parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_matches_pure_python_scorer_exactly(spark, pinned_sf_dir):
    got = {
        r["doc_id"]: (
            r["n_scored_tokens"],
            r["total_nll_micro_nats"],
            r["avg_nll_micro_nats"],
        )
        for r in quality_lm_perplexity(spark, pinned_sf_dir).collect()
    }
    assert got == _python_scores(PINNED)


def test_rare_continuation_scores_worse(spark, pinned_sf_dir):
    got = {
        r["doc_id"]: r["avg_nll_micro_nats"]
        for r in quality_lm_perplexity(spark, pinned_sf_dir).collect()
    }
    # doc 2 carries the unique "the zebra" bigram; doc 1 is all repeated
    # bigrams — the LM must rank 1 as far more likely than 2
    assert got[2] > got[1]
    # all four docs scored (incl. the single-token and double-space docs)
    assert set(got) == {1, 2, 3, 4}


#: ref-variant pinned corpus: docs 1-2 pass the Gopher gate (49 words,
#: mean word length ~4.3, alpha 1.0, stopwords the+a), doc 3 fails it
#: (2 words) and carries tokens the clean LM never saw (OOV path)
REF_PINNED = [
    (1, " ".join(["the", "table", "a", "chair", "holds", "stone", "plates"] * 7)),
    (2, " ".join(["the", "floor", "a", "table", "keeps", "chairs", "steady"] * 7)),
    (3, "zzzqx bip"),
]


def _python_ref_scores(rows, clean_ids):
    docs = {doc_id: text.lower().split(" ") for doc_id, text in rows}
    train = [docs[i] for i in clean_ids]
    uni = Counter(w for ws in train for w in ws)
    n_tot = sum(uni.values())
    bi = Counter((ws[i], ws[i + 1]) for ws in train for i in range(len(ws) - 1))
    ctx = Counter()
    for (w1, _), c2 in bi.items():
        ctx[w1] += c2
    oov_nll = math.floor(LM_MICRO * math.log(n_tot))

    out = {}
    for doc_id, ws in docs.items():
        terms, oov = [], 0
        if ws[0] in uni:
            terms.append(math.floor(LM_MICRO * math.log(n_tot / uni[ws[0]])))
        else:
            terms.append(oov_nll)
            oov += 1
        for i in range(len(ws) - 1):
            pair = (ws[i], ws[i + 1])
            if pair in bi:
                terms.append(math.floor(LM_MICRO * math.log(ctx[ws[i]] / bi[pair])))
            else:
                terms.append(oov_nll)
                oov += 1
        total = sum(terms)
        out[doc_id] = (len(terms), total, total / len(terms), oov)
    return out


@pytest.fixture(scope="module")
def ref_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lmrefcorpus")
    spark.createDataFrame(REF_PINNED, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_ref_variant_matches_pure_python_with_oov(spark, ref_sf_dir):
    from apache_flink_pratices_spark.operators.text import quality_gopher_rules
    from apache_flink_pratices_spark.registry import get_spec

    # the clean set really is docs 1-2 (assert, don't assume)
    passing = {
        r["doc_id"]
        for r in quality_gopher_rules(spark, ref_sf_dir).collect()
        if r["passes_gopher"] == 1
    }
    assert passing == {1, 2}

    fn = get_spec("quality_lm_perplexity_ref").fn
    got = {
        r["doc_id"]: (
            r["n_scored_tokens"],
            r["total_nll_micro_nats"],
            r["avg_nll_micro_nats"],
            r["n_oov_tokens"],
        )
        for r in fn(spark, ref_sf_dir).collect()
    }
    assert got == _python_ref_scores(REF_PINNED, [1, 2])
    # the gopher-failing OOV doc is fully OOV and scores worst
    assert got[3][3] == 2 and got[3][0] == 2
    assert got[3][2] > max(got[1][2], got[2][2])


def test_totals_are_exact_integers(spark, pinned_sf_dir):
    for r in quality_lm_perplexity(spark, pinned_sf_dir).collect():
        assert isinstance(r["total_nll_micro_nats"], int)
        assert r["n_scored_tokens"] >= 1
        # avg is the exact int/int division of the emitted columns
        assert r["avg_nll_micro_nats"] == r["total_nll_micro_nats"] / r["n_scored_tokens"]


def test_lm_tables_bigram_key_is_structurally_distinct(spark):
    """ADVICE r12: lm_bi's next-token key must be emitted as ``bw2`` so
    the scorers' join condition references a structurally distinct
    column name instead of leaning on Spark's self-join disambiguation
    heuristics (the frame joins back against its own ancestor)."""
    from apache_flink_pratices_spark.operators.text import _lm_tables, _lm_toks

    d = spark.createDataFrame(PINNED, "doc_id long, text string")
    lm_bi, lm_uni, tot = _lm_tables(_lm_toks(d))
    assert lm_bi.columns == ["w1", "bw2", "nll"]
    assert lm_uni.columns == ["w", "nll"]
