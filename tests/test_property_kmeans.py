"""Property tests for the k-means primitives: the Spark assignment must be
optimal (argmin) against a brute-force Python check on arbitrary seed
sets, and the quantization must be engine-stable."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from apache_flink_pratices_spark.operators.kmeans import (
    Q,
    assign_frame,
    update_frame,
)

DIM = 4  # small vectors keep the property run fast; logic is dim-agnostic


def _brute_best(qe, seeds):
    best = None
    for k, s in enumerate(seeds):
        d = sum((a - b) * (a - b) for a, b in zip(qe, s))
        if best is None or d < best[0] or (d == best[0] and k < best[1]):
            best = (d, k)
    return best


vec = st.lists(
    st.floats(min_value=-4, max_value=4, allow_nan=False, allow_infinity=False),
    min_size=DIM,
    max_size=DIM,
)


@settings(max_examples=12, deadline=None)
@given(vecs=st.lists(vec, min_size=3, max_size=8), n_seeds=st.integers(2, 4))
def test_assignment_matches_brute_force(spark, vecs, n_seeds):
    n_seeds = min(n_seeds, len(vecs))  # seeds are drawn from the vectors
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # quantize seeds exactly as the operator does (float32 round-trip first)
    import math

    f32 = [[float(__import__("numpy").float32(x)) for x in v] for v in vecs]
    seeds = [
        [int(math.floor(x * Q)) for x in f32[i]] for i in range(n_seeds)
    ]
    got = {
        r["vec_id"]: (r["dist2"], r["cluster"])
        for r in assign_frame(df, seeds).collect()
    }
    for i, v in enumerate(f32):
        qe = [int(math.floor(x * Q)) for x in v]
        d, k = _brute_best(qe, seeds)
        assert got[i] == (d, k), f"vec {i}: got {got[i]}, want {(d, k)}"


def test_update_centroids_are_cluster_means(spark):
    """Centroid (cluster, k) must equal the exact mean of the quantized
    elements of the vectors assigned to that cluster."""
    import math

    import numpy as np

    vecs = [[0.1, 0.2, -0.3, 1.0], [0.12, 0.18, -0.25, 0.9],
            [-1.0, 2.0, 0.0, 0.5], [-0.9, 1.9, 0.1, 0.6]]
    f32 = [[float(np.float32(x)) for x in v] for v in vecs]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    seeds = [[int(math.floor(x * Q)) for x in f32[0]],
             [int(math.floor(x * Q)) for x in f32[2]]]
    assigned = {r["vec_id"]: r["cluster"] for r in assign_frame(df, seeds).collect()}
    got = {(r["cluster"], r["k"]): (r["centroid"], r["n_vectors"])
           for r in update_frame(df, seeds).collect()}
    for c in set(assigned.values()):
        members = [i for i, cl in assigned.items() if cl == c]
        for k in range(1, 5):
            qs = [int(math.floor(f32[i][k - 1] * Q)) for i in members]
            want = (sum(qs) / Q / len(qs), len(qs))
            assert got[(c, k)] == pytest.approx(want), (c, k)
