"""Distributed k-means over the `embeddings` table — one full Lloyd
iteration (assign + centroid update), the clustering primitive a corpus
curation pipeline runs to diversify / balance training data at 100 TB
(cluster-then-sample, semantic dedup at cluster granularity, etc.).

Scale design:
- **Assignment is map-only.** The K seed centroids are pulled to the driver
  (K rows — a constant-size fetch, same class as a broadcast-dim load, NOT
  a data-path collect) and inlined as literal arrays, so assigning N
  vectors is one whole-stage-codegen pass with ZERO shuffles: per row,
  K quantized squared-distance folds over the 64-dim array and an
  `array_min` over (dist2, cluster) structs for the deterministic argmin
  (ties break to the lowest cluster id).
- **Update is a bounded aggregation.** New centroids aggregate quantized
  int64 element sums grouped by (cluster, dimension) with map-side
  combine — shuffle volume is K x dims x 8 bytes regardless of corpus
  size, the same reduction shape as `label_centroids`.
- **Cross-engine exactness.** Elements quantize to int64 at 1e4 before any
  arithmetic: |x| <= ~6 on unit-ish embeddings -> q <= 6e4, per-dim squared
  diff <= ~1.4e10, 64-dim sums <= ~9e11 « 2^63 — exact integers both
  engines, so even the approximate sketch is hash-checked, and the final
  long->double casts are exact (< 2^53).

Reference parity: the reference has no clustering operator — this is part
of the training-data-pipeline superset (task brief), built on the same
embedding column as `ann_*` / `label_centroids`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

#: number of clusters; seeds are the embeddings of vec_id 0..K-1 (the
#: deterministic "first K" init — k-means++ at scale is a short driver loop
#: of K such map-only distance passes, same plan shape per round)
KMEANS_K = 8
#: element quantization: floor(x * 1e4) — exact int64 arithmetic both engines
Q = 10_000


def _quantized(col: str = "embedding") -> F.Column:
    return F.expr(
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {Q}) AS BIGINT))"
    )


def _seed_arrays(spark: SparkSession, sf_dir: str) -> list[list[int]]:
    """The K seed vectors, quantized, as plain Python lists.

    A K-row bounded fetch (K is a constant): the scale-up equivalent of
    loading a broadcast dimension, not an O(N) collect."""
    rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < KMEANS_K)
        .select("vec_id", _quantized().alias("qe"))
        .collect()
    )
    by_id = {r["vec_id"]: list(r["qe"]) for r in rows}
    return [by_id[i] for i in sorted(by_id)]


def assign_frame(vectors: DataFrame, seeds: list[list[int]]) -> DataFrame:
    """(vec_id, cluster, dist2): nearest seed per vector, map-only."""
    qe = _quantized().alias("qe")
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("qe"),
                F.array(*[F.lit(v).cast("long") for v in seed]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        for seed in seeds
    ]
    best = F.array_min(
        F.array(
            *[
                F.struct(d.alias("dist2"), F.lit(k).cast("long").alias("cluster"))
                for k, d in enumerate(dists)
            ]
        )
    )
    return (
        vectors.select("vec_id", qe)
        .select("vec_id", best.alias("best"))
        .select(
            "vec_id",
            F.col("best.cluster").alias("cluster"),
            F.col("best.dist2").alias("dist2"),
        )
    )


_SQL_ASSIGN = f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {Q}) AS BIGINT)) AS qe
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cluster, qe AS qs FROM q WHERE vec_id < {KMEANS_K}
    ),
    dists AS (
      SELECT v.vec_id, s.cluster,
             CAST(SUM((u.a - u.b) * (u.a - u.b)) AS BIGINT) AS dist2
      FROM q v CROSS JOIN seeds s,
           LATERAL (SELECT unnest(v.qe) AS a, unnest(s.qs) AS b) u
      GROUP BY v.vec_id, s.cluster
    ),
    assign AS (
      SELECT vec_id, cluster, dist2
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist2, cluster) AS rn
            FROM dists)
      WHERE rn = 1
    )
"""


@register(
    "kmeans_assign",
    oracle=f"""
    WITH {_SQL_ASSIGN}
    SELECT vec_id, cluster, dist2 FROM assign
    """,
    doc=f"Lloyd assignment step: nearest of {KMEANS_K} seed centroids per "
    "embedding by exact quantized-int64 squared distance, ties to the "
    "lowest cluster id. Seeds inline as literals so the pass is map-only "
    "(zero shuffles, plan-audited) — the shape that scans 100 TB once "
    "per k-means round.",
    tags=("clustering", "embedding", "kmeans"),
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = load(spark, sf_dir, "embeddings")
    return assign_frame(vectors, _seed_arrays(spark, sf_dir))


@register(
    "kmeans_update",
    oracle=f"""
    WITH {_SQL_ASSIGN}
    SELECT a.cluster, u.k,
           CAST(SUM(u.x) AS DOUBLE) / {Q} / COUNT(*) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM assign a JOIN q v ON v.vec_id = a.vec_id,
         LATERAL (SELECT unnest(v.qe) AS x,
                         generate_subscripts(v.qe, 1) AS k) u
    GROUP BY a.cluster, u.k
    """,
    doc=f"Lloyd update step: mean embedding per assigned cluster in long "
    "form (cluster, dimension k, centroid, n_vectors). Quantized int64 "
    "element sums with map-side combine — shuffle volume is K x dims x 8 "
    f"bytes (= {KMEANS_K} x 64 here) regardless of corpus size. Together "
    "with kmeans_assign this is one complete k-means iteration, both "
    "halves oracle-checked.",
    tags=("clustering", "embedding", "kmeans"),
)
def kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = load(spark, sf_dir, "embeddings")
    assigned = assign_frame(vectors, _seed_arrays(spark, sf_dir))
    elems = (
        vectors.select("vec_id", _quantized().alias("qe"))
        .join(assigned.select("vec_id", "cluster"), "vec_id")
        .select("cluster", F.posexplode("qe").alias("k0", "x"))
        .select("cluster", (F.col("k0") + 1).alias("k"), "x")
    )
    return elems.groupBy("cluster", "k").agg(
        (F.sum("x").cast("double") / Q / F.count("*")).alias("centroid"),
        F.count("*").cast("long").alias("n_vectors"),
    )
