"""Above-cap wedge rescue parity across the banded tiers (round 9).

The simhash tier's rescue (tests/test_simhash_scale.py) recovers
near-threshold pairs missed by representative pairing; minhash and
phash share the same banded kernel and the same above-cap exposure, so
they wire the same rescue behind the same guard-fired gate. These tests
pin the plumbing per tier: the branch only builds above the cap, output
keys stay unique, and every emitted pair still passes the tier's own
verification.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_minhash_rescue_branch_gated_and_dedupped(spark, monkeypatch):
    from apache_flink_pratices_spark.operators import dedup as dd

    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.dedup_minhash_lsh(spark, SF).collect()
    }
    assert all(j >= dd.JACCARD_THRESHOLD for j in base.values())
    # force the guard (and therefore the rescue branch) on the same corpus
    monkeypatch.setattr(dd, "HOT_BUCKET_CAP", 2)
    spark.catalog.clearCache()
    resc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.dedup_minhash_lsh(spark, SF).collect()
    }
    keys = list(resc)
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
    assert all(j >= dd.JACCARD_THRESHOLD for j in resc.values())
    # pairs surviving in both runs carry the identical exact-Jaccard value
    for k in set(base) & set(resc):
        assert base[k] == resc[k]


def test_phash_rescue_branch_gated_and_dedupped(spark, monkeypatch):
    from apache_flink_pratices_spark.operators import dedup as dd
    from apache_flink_pratices_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        phash_band_pairs,
    )

    # synthetic above-cap phash block (identical hashes → one bucket per
    # band) + a distinct tail; cap forced low so the guard + rescue run
    monkeypatch.setattr(dd, "HOT_BUCKET_CAP", 8)
    rows = [(i, 0x0123456789ABCDEF) for i in range(24)]
    rows += [(100 + i, (0x1111 << (i % 4) * 16) | i) for i in range(6)]
    ph = spark.createDataFrame(rows, "id long, phash long")
    out = phash_band_pairs(ph, sf_dir=None).collect()
    keys = [(r.id_a, r.id_b) for r in out]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
    assert all(r.hamming <= PHASH_HAMMING_MAX for r in out)
    # the identical block must stay one connected component through the
    # guarded+rescued pair set
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in keys:
        if a < 100 and b < 100:
            parent[find(a)] = find(b)
    assert len({find(i) for i in range(24)}) == 1
