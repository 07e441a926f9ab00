"""Deduplication operators over `documents` — first-class components of the
100 TB training-data pipeline.

Three tiers, all shuffle-based distributed plans (no driver-side collection):

- **exact**: hash-groupBy on md5(normalized text). Shuffling a 16-byte digest
  instead of the document body keeps shuffle volume ~constant per row at any
  document size.
- **near-dup via shingle Jaccard**: 3-token shingles → 56-bit portable hashes
  → candidate pairs from a self-equi-join on shingle hash → exact Jaccard
  verify. The candidate join only materializes pairs that share ≥1 shingle.
- **MinHash + LSH**: 16 minhash signatures (seeded md5 rehash of shingles),
  banded 4×4; candidates share a (band, bucket); verified with exact Jaccard.
  At 100 TB this is the scale path: candidate generation cost is bounded by
  band-bucket collisions, not by pairwise comparison.

Every step is mirrored exactly (same hashes, same thresholds) in the DuckDB
oracle SQL, so results hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_flink_pratices_spark.functions.hashing import md5_long, sql_md5_long
from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

JACCARD_THRESHOLD = 0.4
NUM_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows

_SQL_DOCS = "SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents"
_SQL_SHINGLE = "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]"
_SQL_SH = f"""
  docs AS ({_SQL_DOCS}),
  sh AS (
    SELECT DISTINCT doc_id, {sql_md5_long(_SQL_SHINGLE)} AS h
    FROM docs, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) g
    WHERE len(ws) >= 3
  ),
  sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h): distinct 56-bit hashes of 3-token shingles."""
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.col("text")), " ")
    shingle = F.expr(
        "transform(sequence(1, size(ws) - 2), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))"
    )
    return (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(shingle).alias("s"))
        .select("doc_id", md5_long(F.col("s")).alias("h"))
        .distinct()
    )


def _verified_pairs(shingles: DataFrame, candidates: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over shingle-hash sets for candidate (doc_a, doc_b) pairs.

    If ``candidates`` is None, candidates = all pairs sharing ≥1 shingle.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_key,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY content_key
    """,
    doc="Exact dedup: group on content digest, keep lowest doc_id per group. "
    "Shuffles 16-byte digests, not document bodies.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.lower(F.trim(F.col("text")))).alias("content_key"), "doc_id")
        .groupBy("content_key")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SH},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
    """,
    doc="Near-dup pairs by exact 3-gram shingle Jaccard ≥ 0.4; candidates "
    "from a shingle-hash self-join (only docs sharing a shingle ever meet).",
    bench=True,
    tags=("dedup", "join"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _verified_pairs(_shingles(spark, sf_dir))


def _sql_minhash_cols() -> str:
    return ",\n           ".join(
        f"MIN({sql_md5_long('s', seed=i)}) AS s{i}" for i in range(NUM_HASHES)
    )


def _sql_band_selects() -> str:
    selects = []
    for band in range(NUM_HASHES // BAND_SIZE):
        cols = ", ".join(
            f"CAST(s{band * BAND_SIZE + j} AS VARCHAR)" for j in range(BAND_SIZE)
        )
        selects.append(
            f"SELECT doc_id, {band} AS band, md5(concat_ws('|', {cols})) AS bucket FROM sigs"
        )
    return "\n      UNION ALL ".join(selects)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH docs AS ({_SQL_DOCS}),
    shs AS (
      SELECT DISTINCT doc_id, {_SQL_SHINGLE} AS s
      FROM docs, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) g
      WHERE len(ws) >= 3
    ),
    sh AS (SELECT DISTINCT doc_id, {sql_md5_long('s')} AS h FROM shs),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    sigs AS (
      SELECT doc_id,
           {_sql_minhash_cols()}
      FROM shs GROUP BY doc_id
    ),
    bands AS (
      {_sql_band_selects()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
    FROM inter i
      JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
    """,
    doc="MinHash(16) + LSH(4 bands × 4 rows) near-dup: candidates share a "
    "band bucket, then exact-Jaccard verified. The scale path — pairwise "
    "work bounded by bucket collisions.",
    bench=True,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.col("text")), " ")
    shingle = F.expr(
        "transform(sequence(1, size(ws) - 2), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))"
    )
    shs = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(shingle).alias("s"))
        .distinct()
    )
    sh = shs.select("doc_id", md5_long(F.col("s")).alias("h")).distinct()

    sigs = shs.groupBy("doc_id").agg(
        *[F.min(md5_long(F.col("s"), seed=i)).alias(f"s{i}") for i in range(NUM_HASHES)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"s{band * BAND_SIZE + j}").cast("string") for j in range(BAND_SIZE)],
                    )
                ).alias("bucket"),
            )
            for band in range(NUM_HASHES // BAND_SIZE)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_pairs(sh, candidates=cand)
