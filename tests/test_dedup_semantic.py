"""dedup_semantic (SemDeDup, round 9): kernel pins and semantics.

The within-cell cosine verify is a vectorized Arrow ``mapInPandas``
stage; like every vectorized kernel in this repo it must be BIT-EQUAL
to the retained expression twin (the derivation the DuckDB oracle
mirrors) — float64 ``floor(a·b·SCALE)`` products, exact int64 sums,
double division and sqrt are IEEE-identical across numpy and the JVM.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from apache_flink_pratices_spark.operators.dedup import (
    SEM_DEDUP_TAU,
    _semantic_pair_cosine,
    _semantic_pair_cosine_expr,
)

SF = "/root/testdata/sf0.001"


def _pair_frame_from(spark, e):
    from apache_flink_pratices_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(e)
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), "cell",
        F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), "cell",
        F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b"),
    )
    return (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "cell", "emb_a", "emb_b", "nrm_a", "nrm_b")
    )


def test_vectorized_pair_cosine_matches_expression_twin(spark):
    from apache_flink_pratices_spark.io import load

    e = load(spark, SF, "embeddings")
    raw = _pair_frame_from(spark, e).persist()
    raw.count()
    vec = {
        (r.vec_a, r.vec_b): (r.cell, r.cosine)
        for r in _semantic_pair_cosine(raw).collect()
    }
    exp = {
        (r.vec_a, r.vec_b): (r.cell, r.cosine)
        for r in _semantic_pair_cosine_expr(raw).collect()
    }
    raw.unpersist()
    assert len(vec) > 0
    assert vec == exp  # bit-equal doubles, every pair


def test_vectorized_pair_cosine_twin_on_adversarial_floats(spark):
    """Random embeddings with negative values, zeros, and near-boundary
    magnitudes — the float regime where a floor() disagreement between
    numpy and the JVM would surface."""
    rng = random.Random(20260815)
    rows = []
    for i in range(60):
        emb = [
            rng.choice([0.0, rng.uniform(-1, 1), rng.uniform(-1e-6, 1e-6)])
            for _ in range(64)
        ]
        rows.append((i, [float(f"{x:.6g}") for x in emb], i % 3))
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    raw = _pair_frame_from(spark, e).persist()
    raw.count()
    vec = {
        (r.vec_a, r.vec_b): r.cosine
        for r in _semantic_pair_cosine(raw).collect()
    }
    exp = {
        (r.vec_a, r.vec_b): r.cosine
        for r in _semantic_pair_cosine_expr(raw).collect()
    }
    raw.unpersist()
    assert len(vec) > 0 and vec == exp


def test_dedup_semantic_drop_rule(spark):
    """The dropped member of every pair must be the one NEARER its cell
    centroid (the SemDeDup keep-the-outlier rule): recompute the rule
    from the query's own building blocks and cross-check the output."""
    from apache_flink_pratices_spark.registry import get_spec
    from apache_flink_pratices_spark.operators import dedup  # noqa: F401

    out = get_spec("dedup_semantic").fn(spark, SF).collect()
    assert len(out) > 0
    assert all(r.n_dups >= 1 and r.max_cos >= SEM_DEDUP_TAU for r in out)
    # every dropped vec must actually appear in a τ-pair within its cell
    from apache_flink_pratices_spark.io import load

    e = load(spark, SF, "embeddings")
    raw = _pair_frame_from(spark, e)
    pairs = {
        (r.vec_a, r.vec_b)
        for r in _semantic_pair_cosine(raw)
        .filter(F.col("cosine") >= SEM_DEDUP_TAU)
        .collect()
    }
    members = {v for p in pairs for v in p}
    assert {r.vec_id for r in out} <= members
