"""Similarity search over the `embeddings` table (array<float> vectors).

Brute-force cosine top-k is the correctness baseline: broadcast the (small)
query set against the distributed corpus, compute dot products JVM-side with
higher-order functions (zip_with + aggregate), rank per query. At 100 TB the
corpus side stays partition-parallel; only k rows per query cross the final
shuffle boundary (per-query top-k is a partial-aggregatable pattern via
window rank after AQE-coalesced exchange).

Numeric determinism: dot products and norms accumulate as exact decimals
(float→double products are IEEE-identical everywhere; decimal addition is
order-independent), so Spark and DuckDB produce bit-identical cosines — see
functions/numeric.py for the full argument.

An LSH/IVF-bucketed approximate variant is the planned scale path (round 2):
same verify step, candidate generation via random-hyperplane signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

N_QUERIES = 5  # vec_id < 5 form the query set
TOP_K = 10

# Precision budget: element products of unit-scale embeddings stay < 1e8,
# so DECIMAL(20,12) holds each term exactly at 1e-12 resolution. The
# accumulator is DECIMAL(25,12): each add yields at most 14 integer digits
# (26 total < 38), so Spark never hits the precision-38 cap — which would
# silently REDUCE SCALE and break cross-engine bit-equality.
_DEC = "decimal(20,12)"
_ACC = "decimal(25,12)"


def _dot(a: Column, b: Column) -> Column:
    """Exact order-independent dot product of two float arrays, as double."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC))
    zero = F.lit("0").cast(_ACC)
    # decimal addition widens precision; pin the accumulator type so the
    # merge lambda's return type stays fixed (required by `aggregate`)
    return F.aggregate(prods, zero, lambda acc, v: (acc + v).cast(_ACC)).cast("double")


def _sql_dot(ax: str, bx: str) -> str:
    return (
        f"CAST(SUM(CAST(CAST({ax} AS DOUBLE) * CAST({bx} AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)"
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id, label,
             {_sql_dot('u.x', 'u.x')} AS nrm
      FROM embeddings, LATERAL (SELECT unnest(embedding) AS x) u
      GROUP BY vec_id, label
    ),
    dots AS (
      SELECT qid AS query_id, vid AS vec_id,
             {_sql_dot('u.qx', 'u.ex')} AS dot
      FROM (SELECT q.vec_id AS qid, e.vec_id AS vid,
                   q.embedding AS qe, e.embedding AS ee
            FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
                 JOIN embeddings e ON e.vec_id <> q.vec_id) p,
           LATERAL (SELECT unnest(qe) AS qx, unnest(ee) AS ex) u
      GROUP BY query_id, vec_id
    ),
    scored AS (
      SELECT d.query_id, d.vec_id, ne.label,
             d.dot / (sqrt(nq.nrm) * sqrt(ne.nrm)) AS cosine
      FROM dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms ne ON ne.vec_id = d.vec_id
    )
    SELECT query_id, vec_id, label, cosine, rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
    doc="Brute-force cosine top-k (k=10) for 5 query vectors over the corpus: "
    "broadcast queries × distributed corpus, JVM-side zip_with/aggregate dot "
    "products, per-query window rank with deterministic tiebreak.",
    bench=True,
    tags=("similarity", "ann"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    with_norm = e.select(
        "vec_id", "label", "embedding", _dot(F.col("embedding"), F.col("embedding")).alias("nrm")
    )
    q = with_norm.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = with_norm.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        "label",
        (
            _dot(F.col("q_embedding"), F.col("embedding"))
            / (F.sqrt(F.col("q_nrm")) * F.sqrt(F.col("nrm")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "label", "cosine", "rn")
    )
