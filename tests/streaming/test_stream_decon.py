"""stream_decon_golden: the streaming decontamination twin (VERDICT r10 #7).

Pins (1) the golden clean-doc output, (2) that the eval bloom is built
exactly ONCE and its broadcast is reused across every micro-batch (the
production contract: a static eval superset must not be re-folded per
batch), and (3) that the replay actually split into multiple micro-batches
— without which "reused across batches" would be vacuously true.
"""

from __future__ import annotations

from apache_flink_pratices_spark.operators import curation
from apache_flink_pratices_spark.operators import streaming_golden as sg


def test_stream_decon_golden_output_and_single_bloom_build(spark, monkeypatch):
    builds = []
    real_build = curation._build_bloom

    def counting_build(eval_h):
        builds.append(1)
        return real_build(eval_h)

    monkeypatch.setattr(curation, "_build_bloom", counting_build)
    df = sg.stream_decon_golden(spark, "/root/testdata/sf0.001")
    rows = sorted((r["doc_id"], r["n_shingles"]) for r in df.collect())
    # docs 2/4/6 share a 3-gram with the eval split and are dropped;
    # doc 3 has <3 words -> zero shingles -> clean by construction
    assert rows == [(1, 5), (3, 0), (5, 5)]
    assert len(builds) == 1, f"bloom built {len(builds)}x, want once"
    assert len(sg._DECON_LAST_BATCHES) >= 2, sg._DECON_LAST_BATCHES


def test_stream_decon_contaminated_docs_are_bloom_positive(spark):
    """The bloom prefilter must flag every truly-contaminated shingle
    (no false negatives): probe the train shingles of the golden corpus
    directly through the shared kernel and check each contaminated doc
    has at least one bloom-positive row."""
    from pyspark.sql import functions as F

    from apache_flink_pratices_spark.operators.dedup import shingles_of

    eval_docs = spark.createDataFrame(
        sg._DECON_EVAL_TEXTS, "doc_id long, text string"
    )
    eval_sh = shingles_of(eval_docs).select("h").distinct()
    bc = spark.sparkContext.broadcast(curation._build_bloom(eval_sh).tobytes())
    train = spark.createDataFrame(
        sg._DECON_TRAIN_ROWS, "doc_id long, text string"
    )
    probed = shingles_of(train).mapInArrow(
        curation._bloom_probe_fn(bc), "doc_id long, h long, hit int"
    )
    pos = {
        r["doc_id"]
        for r in probed.filter(F.col("hit") == 1).select("doc_id").distinct().collect()
    }
    assert {2, 4, 6} <= pos, pos
