"""Scale properties of the SimHash near-dup tier (VERDICT r2 #1).

Two claims the 100 TB design rests on:

1. **Bucket space**: 16-bit bands (65,536 buckets) must prune candidate
   pairs far harder than the old 8-bit bands (256 buckets) — the 256-bucket
   space made candidate generation quadratic (~4·N²/512 pairs) at scale.
   Measured on a synthetic corpus with realistic vocabulary breadth: the
   driver testdata draws every document from a 31-token vocabulary, which
   concentrates TF-weighted fingerprints into a handful of sign patterns no
   band width can spread (a data property — real web corpora have balanced
   fingerprint bits, which is the regime the 100 TB claim is about).
2. **Pigeonhole recall**: with 4 bands and Hamming ≤ 3, every true
   near-dup pair shares at least one exact band — candidate recall is
   100% by construction, not probabilistic. Checked on BOTH the synthetic
   corpus and the driver testdata (where correlated fingerprints make the
   Hamming-≤3 set large — a worst case for recall accounting).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.dedup import (
    SIMHASH_HAMMING_MAX,
    _simhash_candidates,
    _simhash_fingerprints,
    _simhash_fingerprints_of,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def synth_fp(spark):
    """2,000 docs × ~30 tokens from a 50k-word vocabulary, deterministic,
    with 20 planted near-dup pairs (token-order shuffles — SimHash is a
    bag-of-words fingerprint, so a reordered copy lands at Hamming 0 while
    its raw text differs; single-token edits on 30-token docs flip many
    bits because the sign-sums sit near zero at that length)."""
    rng = random.Random(20260813)
    vocab = [f"w{i:05d}" for i in range(50_000)]
    docs = []
    for i in range(2_000):
        toks = rng.sample(vocab, 30)
        docs.append((f"d{i:04d}", " ".join(toks)))
    for j in range(20):  # planted near-dups: same bag of tokens, new order
        toks = docs[j][1].split(" ")
        rng.shuffle(toks)
        docs.append((f"dup{j:02d}", " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id string, text string")
    fp = _simhash_fingerprints_of(df).persist()
    fp.count()
    yield fp
    fp.unpersist()


def test_16bit_bands_prune_what_8bit_cannot(synth_fp):
    n = synth_fp.count()
    all_pairs = n * (n - 1) // 2  # ~2.04M

    cand16 = _simhash_candidates(synth_fp, band_bits=16).count()
    cand8 = _simhash_candidates(synth_fp, band_bits=8).count()

    # 8-bit: 8 bands × 256 buckets → expected random collisions
    # ~8·N²/512 ≈ 31k+. 16-bit: 4 bands × 65,536 → ~4·N²/131072 ≈ 62.
    assert cand8 > 20 * cand16, f"8-bit {cand8} vs 16-bit {cand16} (n={n})"
    assert cand16 < all_pairs / 1000, f"16-bit candidates {cand16} ~ all-pairs {all_pairs}"
    # and the planted near-dups are all in there (recall floor)
    assert cand16 >= 20


def test_pigeonhole_recall_synthetic(synth_fp):
    truth = _hamming_truth(synth_fp)
    cand = _simhash_candidates(synth_fp)
    missed = truth.join(cand, ["doc_a", "doc_b"], "left_anti").count()
    assert missed == 0
    assert truth.count() >= 20  # the planted pairs sit within Hamming ≤ 3


def test_pigeonhole_recall_testdata(spark):
    fp = _simhash_fingerprints(spark, SF).persist()
    truth = _hamming_truth(fp)
    cand = _simhash_candidates(fp)
    missed = truth.join(cand, ["doc_a", "doc_b"], "left_anti").count()
    assert missed == 0, f"{missed} true near-dup pairs missed by the band join"
    assert truth.count() > 0, "corpus has no near-dup pairs — test is vacuous"
    fp.unpersist()


def _hamming_truth(fp):
    """Brute-force all-pairs Hamming ≤ max — ground truth at test scale only."""
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        fa.crossJoin(fb)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(ham <= SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b")
    )
