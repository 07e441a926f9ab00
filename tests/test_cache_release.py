"""Bounded session-cache growth (VERDICT r8 #5).

Several operators deliberately leave corpus-sized frames persisted for
the session (LSH/IVF bucket frames, minhash signatures, the simhash
fingerprint behind the pair artifact) so sibling queries share them via
CacheManager plan-dedup. A long-lived session invoking many such
queries must be able to scope that growth: ``registry.run_and_release``
runs a query end-to-end and uncaches everything it created, leaving
pre-existing entries untouched.
"""

from __future__ import annotations

from apache_flink_pratices_spark.registry import (
    cached_entry_count,
    released_caches,
    run_and_release,
)

SF = "/root/testdata/sf0.001"

#: ten queries known to persist session-lived frames (the exact set the
#: VERDICT named plus the rest of the ANN tier and the artifact builders)
CACHE_BEARING = [
    "ann_lsh_topk",
    "ann_lsh_topk_clustered",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "pagerank_neardup",
    "dedup_clusters",
    # the composed pipeline persists the documents frame it feeds to
    # every stage (round 10) — released like the rest
    "corpus_pipeline_e2e",
    # bloom decontamination persists the shingle frame and the probed
    # (bloom-tested) rows (round 10)
    "decontaminate_bloom",
    # BM25 persists its (doc, term, tf) frame for the df/dl/candidate
    # consumers (round 13)
    "bm25_topk",
]


def test_ten_cache_bearing_queries_leave_no_entries(spark):
    spark.catalog.clearCache()
    base = cached_entry_count(spark)
    assert base == 0
    for name in CACHE_BEARING:
        rows = run_and_release(spark, name, SF)
        assert rows >= 0
        # bounded: NOTHING a released run persisted may outlive it
        assert cached_entry_count(spark) == base, name


def test_released_caches_keeps_preexisting_entries(spark):
    spark.catalog.clearCache()
    keeper = spark.range(100).selectExpr("id", "id * 3 AS x").persist()
    keeper.count()
    assert cached_entry_count(spark) == 1
    with released_caches(spark):
        inner = spark.range(50).selectExpr("id * 7 AS y").persist()
        inner.count()
        assert cached_entry_count(spark) == 2
        # re-persisting the ALREADY-cached plan must not mark it for
        # release (CacheManager dedupes by canonicalized plan, so the
        # block did not create a new entry for it)
        spark.range(100).selectExpr("id", "id * 3 AS x").persist().count()
        assert cached_entry_count(spark) == 2
    assert cached_entry_count(spark) == 1  # keeper survives, inner gone
    assert keeper.count() == 100
    keeper.unpersist()


def test_released_caches_keeps_dependent_preexisting_entries(spark):
    """Cascade hazard (review r9): a pre-existing cached frame DERIVED
    from an upstream the block re-persists must survive the release —
    cascade=true would evict it along with the block's own entry."""
    spark.catalog.clearCache()
    upstream = spark.range(1000).selectExpr("id", "id * 13 AS u")
    derived = upstream.groupBy((upstream.u % 7).alias("g")).count().persist()
    derived.count()
    assert cached_entry_count(spark) == 1
    with released_caches(spark):
        # the block caches the shared UPSTREAM plan (like a query
        # persisting the fingerprint frame a user's cached view reads)
        inner = spark.range(1000).selectExpr("id", "id * 13 AS u").persist()
        inner.count()
        assert cached_entry_count(spark) == 2
    # the block's upstream entry is gone; the pre-existing derived
    # entry — whose plan CONTAINS the released plan — survives
    assert cached_entry_count(spark) == 1
    assert derived.count() == 7
    derived.unpersist()


def test_released_caches_releases_on_error(spark):
    spark.catalog.clearCache()
    try:
        with released_caches(spark):
            spark.range(10).selectExpr("id * 11 AS z").persist().count()
            assert cached_entry_count(spark) == 1
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert cached_entry_count(spark) == 0


def test_released_caches_degrades_when_private_api_missing(spark, monkeypatch):
    """Version-proofing (VERDICT r9 #6): the snapshot path reaches private
    JVM internals; when a Spark upgrade moves them, the block must fail
    SOFT — still bounding session cache growth via the public
    ``clearCache()`` — at the documented cost of also evicting
    pre-existing entries (correctness-neutral, rebuilt lazily)."""
    from apache_flink_pratices_spark import registry

    spark.catalog.clearCache()
    keeper = spark.range(64).selectExpr("id * 5 AS k").persist()
    keeper.count()
    assert cached_entry_count(spark) == 1

    def gone(_spark):
        raise AttributeError("cacheManager moved in this Spark version")

    monkeypatch.setattr(registry, "_cached_plans", gone)
    with released_caches(spark):
        inner = spark.range(32).selectExpr("id * 9 AS d").persist()
        inner.count()
        assert cached_entry_count(spark) == 2
    # degraded contract: growth bounded (nothing the block created
    # survives), pre-existing entries evicted too — documented trade
    assert cached_entry_count(spark) == 0
    assert keeper.count() == 64  # still computable, just uncached
