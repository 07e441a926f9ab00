"""bpe_train: the learned BPE merge table (VERDICT r12 #2), pinned to an
INDEPENDENT pure-Python trainer (dict counting + explicit greedy merge
loop — no shared code with the Spark implementation), plus hypothesis
properties on merge-order determinism and the non-increasing-count
invariant, and the learned-table encode pin (bpe_encode's greedy kernel
against a trained table reproduces a reference encode)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_flink_pratices_spark.operators.text import (
    BPE_TRAIN_MERGES,
    BPE_TRAIN_MIN_COUNT,
    bpe_encode_word_with,
    bpe_train_merges,
    learned_piece_ids,
)

from tests.conftest import SF_SMOKE


# --- independent reference trainer (test-local, dict-based) -----------------
def py_bpe_train(word_counts, n_merges, min_count=2):
    """Reference BPE trainer: count ALL adjacent pairs weighted by word
    frequency, merge the (count DESC, left, right) winner greedily
    left-to-right non-overlapping, repeat."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in segs.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (a, b), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if pc < min_count:
            break
        merges.append((a, b, pc))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def _word_counts(rows):
    wc = {}
    for _, text in rows:
        for w in text.lower().split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


#: planted corpus exercising the tricky shapes: a self-pair run ("aaaa"
#: merges (a,a) at positions 1-2 and 3-4, never 2-3), a tie broken
#: lexicographically, and merges that cascade into 3-char pieces
PLANTED = [
    (1, "aaaa aaaa banana banana banana"),
    (2, "bandana cabana aaaa"),
    (3, "the the the them theme"),
    (4, "xy xy xz"),
]


def test_spark_matches_reference_trainer_on_planted(spark, tmp_path):
    d = spark.createDataFrame(PLANTED, "doc_id long, text string")
    got = bpe_train_merges(d)
    want = py_bpe_train(_word_counts(PLANTED), BPE_TRAIN_MERGES,
                        BPE_TRAIN_MIN_COUNT)
    assert got == want
    # the self-pair run merged greedily: (a,a) pairs counted with overlap
    # (aaaa contributes 3), merged non-overlapping
    assert ("a", "a") in [(l, r) for l, r, _ in got]


def test_spark_matches_reference_trainer_on_sf0001(spark):
    from apache_flink_pratices_spark.io import load

    d = load(spark, SF_SMOKE, "documents")
    got = bpe_train_merges(d)
    rows = [(r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()]
    want = py_bpe_train(_word_counts(rows), BPE_TRAIN_MERGES, BPE_TRAIN_MIN_COUNT)
    assert got == want
    assert len(got) == BPE_TRAIN_MERGES  # real corpus never runs dry


def test_registered_query_emits_learned_sequence(spark):
    from apache_flink_pratices_spark.registry import all_specs

    out = all_specs()["bpe_train"].fn(spark, SF_SMOKE).collect()
    by_rank = {r["merge_rank"]: r for r in out}
    assert sorted(by_rank) == list(range(1, len(out) + 1))
    for r in out:
        assert r["new_piece"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] >= BPE_TRAIN_MIN_COUNT


def test_encode_with_learned_table_matches_reference_encode(spark):
    """The chain-closing pin (VERDICT r12 #2): greedy-encoding with the
    LEARNED piece table must reproduce an independent reference encode
    for every distinct corpus word."""
    from apache_flink_pratices_spark.io import load

    d = load(spark, SF_SMOKE, "documents")
    merges = bpe_train_merges(d)
    words = sorted(
        {w for r in d.select("text").collect() for w in r["text"].lower().split(" ") if w}
    )
    singles = sorted({c for w in words for c in w})
    table = learned_piece_ids(merges, tuple(singles))
    max_len = max(len(p) for p in table)

    def ref_encode(w):  # independent greedy longest-match
        out, pos = [], 0
        while pos < len(w):
            for ln in range(min(max_len, len(w) - pos), 0, -1):
                if w[pos : pos + ln] in table:
                    out.append(w[pos : pos + ln])
                    pos += ln
                    break
            else:  # every corpus char is a single: never reached here
                out.append(w[pos])
                pos += 1
        return out

    n_multi = 0
    for w in words:
        pieces, ids, n_unk = bpe_encode_word_with(w, table, max_len)
        assert pieces == ref_encode(w), w
        assert n_unk == 0  # singles cover the corpus alphabet
        assert [table[p] for p in pieces] == ids
        n_multi += sum(1 for p in pieces if len(p) > 1)
    assert n_multi > 0  # the learned merges actually fire on the corpus


# --- hypothesis properties ----------------------------------------------------
words_strategy = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=30
)


@settings(max_examples=200, deadline=None)
@given(words_strategy, st.randoms())
def test_reference_trainer_is_order_deterministic(words, rnd):
    """Merge order must not depend on corpus/word enumeration order."""
    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    base = py_bpe_train(wc, 6)
    shuffled_keys = list(wc)
    rnd.shuffle(shuffled_keys)
    assert py_bpe_train({k: wc[k] for k in shuffled_keys}, 6) == base


@settings(max_examples=200, deadline=None)
@given(words_strategy)
def test_merge_counts_are_non_increasing(words):
    """The chosen pair's count never increases round over round: a new
    pair involves the just-merged symbol, whose occurrence count is
    bounded by the merged pair's count (the previous max); old pairs
    only lose occurrences."""
    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    merges = py_bpe_train(wc, 10)
    counts = [pc for _, _, pc in merges]
    assert counts == sorted(counts, reverse=True)
    assert all(pc >= 2 for pc in counts)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab", min_size=2, max_size=12))
def test_self_pair_merge_is_greedy_non_overlapping(w):
    """Apply one (a,a) merge via the reference loop: runs of k 'a's
    yield floor(k/2) merged symbols + (k%2) singles, left-to-right."""
    merges = py_bpe_train({w: 10}, 1, min_count=1)
    if ("a", "a") not in [(l, r) for l, r, _ in merges]:
        return
    # re-apply by reference rule and compare against a run-arithmetic oracle
    out, i = [], 0
    while i < len(w):
        if i + 1 < len(w) and w[i] == "a" and w[i + 1] == "a":
            out.append("aa")
            i += 2
        else:
            out.append(w[i])
            i += 1
    k = 0
    expect = []
    for ch in w + "$":
        if ch == "a":
            k += 1
        else:
            expect += ["aa"] * (k // 2) + ["a"] * (k % 2)
            if ch != "$":
                expect.append(ch)
            k = 0
    assert out == expect


def test_trained_encode_matches_pure_python_end_to_end(spark):
    """bpe_encode_trained triangulated: the registered composed query
    (train -> learned table -> greedy encode -> fingerprints) must equal
    a FULL independent pure-Python recomputation — reference trainer,
    reference table construction, reference greedy encode, reference
    fingerprint arithmetic — on the real sf0.001 corpus."""
    from apache_flink_pratices_spark.functions.hashing import MOD
    from apache_flink_pratices_spark.io import load
    from apache_flink_pratices_spark.registry import all_specs

    d = load(spark, SF_SMOKE, "documents")
    rows = [(r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()]
    wc = _word_counts(rows)
    merges = py_bpe_train(wc, BPE_TRAIN_MERGES, BPE_TRAIN_MIN_COUNT)
    singles = sorted({c for w in wc for c in w})
    table = learned_piece_ids(merges, tuple(singles))
    max_len = max(len(p) for p in table)

    def ref_ids(w):
        out, pos = [], 0
        while pos < len(w):
            for ln in range(min(max_len, len(w) - pos), 0, -1):
                pid = table.get(w[pos : pos + ln])
                if pid is not None:
                    out.append(pid)
                    pos += ln
                    break
            else:
                raise AssertionError(f"alphabet does not cover {w!r}")
        return out

    word_fp = {
        w: sum((j + 1) * pid for j, pid in enumerate(ref_ids(w))) % MOD
        for w in wc
    }
    want = {}
    for doc_id, text in rows:
        ws = [w for w in text.lower().split(" ") if w]
        if not ws:
            continue
        n_tok = sum(len(ref_ids(w)) for w in ws)
        fp = sum((i + 1) * word_fp[w] for i, w in enumerate(ws)) % MOD
        want[doc_id] = (len(ws), n_tok, 0, fp)

    got = {
        r["doc_id"]: (
            r["n_words"], r["n_bpe_tokens"], r["n_unk_pieces"],
            r["ids_fingerprint"],
        )
        for r in all_specs()["bpe_encode_trained"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    # the learned merges actually compress: fewer tokens than characters
    total_chars = sum(len(w) for w, c in wc.items() for _ in range(c))
    assert sum(v[1] for v in got.values()) < total_chars


def test_merge_artifact_served_not_rebuilt_and_bit_equal(
    spark, tmp_path, monkeypatch
):
    """trained_bpe_merges (VERDICT r13 #2: bpe_encode_trained re-ran the
    whole train loop per invocation): the first call trains and
    publishes the write-once JSON, BIT-EQUAL to a live bpe_train_merges
    run; the second call must READ the artifact (a rebuild would run the
    trainer again); a corrupt artifact is a cache miss that rebuilds,
    never a crash. The spy wraps the trainer itself — its source is part
    of the key via the whole-module fingerprint, so spying via
    setattr on the MODULE leaves the fingerprinted source untouched."""
    import glob
    import os

    import apache_flink_pratices_spark.operators.text as text_mod
    from apache_flink_pratices_spark.io import load
    from apache_flink_pratices_spark.operators.text import trained_bpe_merges

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))
    served = trained_bpe_merges(spark, SF_SMOKE)
    live = bpe_train_merges(load(spark, SF_SMOKE, "documents"))
    assert served == live  # bit-equal twin pin, tuple for tuple

    calls = []
    real_train = text_mod.bpe_train_merges
    monkeypatch.setattr(
        text_mod,
        "bpe_train_merges",
        lambda *a, **k: calls.append(1) or real_train(*a, **k),
    )
    assert trained_bpe_merges(spark, SF_SMOKE) == served
    assert calls == []  # served, not rebuilt

    art = glob.glob(os.path.join(str(tmp_path), "bpe_merges_*.json"))
    assert len(art) == 1
    with open(art[0], "w") as f:
        f.write("{not json")
    assert trained_bpe_merges(spark, SF_SMOKE) == served
    assert calls == [1]  # exactly one trainer run: the rebuild
    # an ill-TYPED but parseable artifact is a miss too
    with open(art[0], "w") as f:
        f.write('{"merges": [["a", "b"]]}')  # 2-element row: fails valid()
    assert trained_bpe_merges(spark, SF_SMOKE) == served
    assert calls == [1, 1]
