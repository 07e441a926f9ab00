"""bpe_encode: greedy longest-match BPE apply against the fixed piece
table, pinned against an INDEPENDENT pure-Python reference encoder
(VERDICT r11 #3) plus structural properties and the Spark end-to-end
shape (distinct-word kernel, UNK path, exact id-sequence fingerprint)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from apache_flink_pratices_spark.functions.hashing import MOD
from apache_flink_pratices_spark.operators.text import (
    BPE_MAX_PIECE_LEN,
    BPE_PIECE_IDS,
    BPE_SINGLES,
    BPE_UNK_MOD,
    bpe_encode_word,
    bpe_word_fingerprint,
)


def _ref_encode(w: str) -> list[str]:
    """Independent reference: recursive formulation of greedy longest
    match (the operator kernel is an iterative while-loop — different
    code path, same contract)."""
    if not w:
        return []
    for ln in range(min(BPE_MAX_PIECE_LEN, len(w)), 0, -1):
        if w[:ln] in BPE_PIECE_IDS:
            return [w[:ln]] + _ref_encode(w[ln:])
    return [w[0]] + _ref_encode(w[1:])


def _ref_id(piece: str) -> int:
    pid = BPE_PIECE_IDS.get(piece)
    if pid is not None:
        return pid
    return int(hashlib.md5(piece.encode()).hexdigest()[:14], 16) % BPE_UNK_MOD


# corpus-flavored words plus adversarial shapes
WORD = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789éß!table"),
    min_size=0,
    max_size=24,
)


@given(WORD)
@settings(max_examples=300, deadline=None)
def test_kernel_matches_independent_reference(w):
    pieces, ids, n_unk = bpe_encode_word(w)
    assert pieces == _ref_encode(w)
    assert ids == [_ref_id(p) for p in pieces]
    assert n_unk == sum(1 for p in pieces if p not in BPE_PIECE_IDS)


@given(WORD)
@settings(max_examples=300, deadline=None)
def test_pieces_reassemble_and_are_table_or_single_char(w):
    pieces, ids, n_unk = bpe_encode_word(w)
    assert "".join(pieces) == w
    for p in pieces:
        assert p in BPE_PIECE_IDS or len(p) == 1
    # greedy invariant: no piece boundary could have been absorbed by a
    # LONGER table piece starting at the same position
    pos = 0
    for p in pieces:
        for ln in range(min(BPE_MAX_PIECE_LEN, len(w) - pos), len(p), -1):
            assert w[pos : pos + ln] not in BPE_PIECE_IDS
        pos += len(p)


def test_fingerprint_pins_exact_sequence_not_just_counts():
    # same multiset of ids, different order -> different fingerprint
    _, ids_a, _ = bpe_encode_word("tabledata")
    perm = list(reversed(ids_a))
    assert sorted(ids_a) == sorted(perm)
    if ids_a != perm:
        assert bpe_word_fingerprint(ids_a) != bpe_word_fingerprint(perm)
    assert bpe_word_fingerprint(ids_a) == sum(
        (j + 1) * pid for j, pid in enumerate(ids_a)
    ) % MOD


def test_single_chars_encode_to_positional_ids():
    for i, ch in enumerate(BPE_SINGLES):
        pieces, ids, n_unk = bpe_encode_word(ch)
        assert pieces == [ch] and n_unk == 0
        assert ids == [i]


def test_exact_budget_counts_agree_with_bpe_encode(spark):
    """bpe_doc_token_counts_of (the token_budget_plan_exact count source)
    and bpe_encode must agree on every document's token count — two
    plans, one encoding."""
    from apache_flink_pratices_spark.io import load
    from apache_flink_pratices_spark.operators.text import (
        bpe_doc_token_counts_of,
        bpe_encode,
    )

    sf = "/root/testdata/sf0.001"
    via_encode = {
        r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode(spark, sf).collect()
    }
    via_counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_doc_token_counts_of(
            load(spark, sf, "documents").select("doc_id", "text")
        ).collect()
    }
    assert via_counts == via_encode and via_counts


@pytest.mark.usefixtures("spark")
def test_spark_end_to_end_with_unk(spark):
    """The full operator shape on a synthetic frame with an OOV char:
    per-doc counts and the nested fingerprint must equal the pure-Python
    accounting, and the UNK path must count."""
    from apache_flink_pratices_spark.operators import text as t

    rows = [
        (1, "the table café"),
        (2, "table the café"),  # same words, different order
        (3, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    # drive the registered query's body on this frame via a temp dir-free
    # path: replicate the operator pipeline on the frame directly
    from pyspark.sql import functions as F

    words = (
        d.select("doc_id", F.posexplode(t.tokens()).alias("wpos0", "w"))
        .filter(F.col("w") != "")
        .select("doc_id", (F.col("wpos0") + 1).alias("wpos"), "w")
    )
    enc = words.select("w").distinct().mapInPandas(
        t._bpe_encode_batches, "w string, word_fp long, n_pieces long, n_unk long"
    )
    term = (F.col("wpos") * F.col("word_fp")).cast("decimal(38,0)")
    out = {
        r["doc_id"]: r
        for r in words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
            F.sum("n_unk").cast("long").alias("n_unk_pieces"),
            (F.sum(term) % MOD).cast("long").alias("ids_fingerprint"),
        )
        .collect()
    }

    def expect(text: str):
        ws = [w for w in text.lower().split(" ") if w]
        encs = [bpe_encode_word(w) for w in ws]
        fps = [bpe_word_fingerprint(ids) for _, ids, _ in encs]
        return {
            "n_words": len(ws),
            "n_bpe_tokens": sum(len(ids) for _, ids, _ in encs),
            "n_unk_pieces": sum(nu for _, _, nu in encs),
            "ids_fingerprint": sum((i + 1) * fp for i, fp in enumerate(fps)) % MOD,
        }

    assert set(out) == {1, 2}  # empty doc tokenizes to nothing
    for doc_id, text_val in [(1, rows[0][1]), (2, rows[1][1])]:
        exp = expect(text_val)
        got = out[doc_id]
        for k, v in exp.items():
            assert got[k] == v, (doc_id, k, got[k], v)
    assert out[1]["n_unk_pieces"] == 1  # é is OOV
    # same word multiset, different order -> counts equal, fingerprint not
    assert out[1]["n_bpe_tokens"] == out[2]["n_bpe_tokens"]
    assert out[1]["ids_fingerprint"] != out[2]["ids_fingerprint"]
