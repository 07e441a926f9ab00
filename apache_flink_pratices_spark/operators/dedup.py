"""Deduplication operators over `documents` — first-class components of the
100 TB training-data pipeline.

Three tiers, all shuffle-based distributed plans (no driver-side collection):

- **exact**: hash-groupBy on md5(normalized text). Shuffling a 16-byte digest
  instead of the document body keeps shuffle volume ~constant per row at any
  document size.
- **near-dup via shingle Jaccard**: 3-token shingles → 56-bit portable hashes
  → document-frequency cap (shingles appearing in > NGRAM_DF_CAP documents
  are dropped as non-discriminative — the standard guard against the
  quadratic pair blow-up a stop-phrase shingle causes at web scale) →
  pair generation + intersection count in ONE self-equi-join on shingle
  hash → Jaccard over the capped shingle sets.
- **MinHash + LSH**: 16 minhash signatures (universal integer hashing over
  the base shingle hash — multiply/add/mod by a Mersenne prime, identical
  in both engines and ~16× cheaper than per-seed md5 rehashing),
  banded 4×4; candidates share a (band, bucket); verification joins the
  *candidate pairs* to the per-document shingle sets, so the exact-Jaccard
  work is bounded by bucket collisions — not by all pairs sharing a shingle.

Scale notes:
- documents are explicitly repartitioned before the shingle explode: a
  byte-based parquet split underestimates the CPU of text explosion, and a
  single dense file would otherwise serialize it on one task.
- the shingle table is persisted (memory+disk) for the duration of a query:
  it is read 3-4 times per plan. At 100 TB the equivalent is materializing
  the shingle table to storage once — the standard multi-stage dedup
  pipeline shape — rather than recomputing the explode per consumer.

Every step is mirrored exactly (same hashes, same thresholds, same caps) in
the DuckDB oracle SQL, so results hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from apache_flink_pratices_spark.functions.hashing import md5_long, sql_md5_long
from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.registry import register

JACCARD_THRESHOLD = 0.4
NUM_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows

#: Mersenne prime 2^31-1: the universal-hash modulus. MinHash permutations
#: are h_i(x) = (a_i·(x mod P31) + b_i) mod P31 — a_i·x fits int64 (31+31
#: bits), so both engines evaluate the same exact integer arithmetic with
#: plain multiply/add/mod instead of 16 md5 calls per shingle.
P31 = 2_147_483_647


def _mh_coeffs() -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs derived from md5 of a fixed tag."""
    import hashlib

    out = []
    for i in range(NUM_HASHES):
        d = hashlib.md5(f"afp-minhash-{i}".encode()).digest()
        a = int.from_bytes(d[:4], "big") % (P31 - 1) + 1
        b = int.from_bytes(d[4:8], "big") % P31
        out.append((a, b))
    return out


MH_COEFFS = _mh_coeffs()
#: drop shingles appearing in more documents than this from the Jaccard
#: representation: they carry no near-dup signal and each contributes
#: O(df²) candidate pairs. Pair fan-out per shingle is capped at
#: df_cap·(df_cap-1)/2 ≈ 5k regardless of corpus size.
NGRAM_DF_CAP = 100

_SQL_DOCS = "SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents"
_SQL_SHINGLE = "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]"
_SQL_SHS = f"""
  docs AS ({_SQL_DOCS}),
  shs AS (
    SELECT DISTINCT doc_id, {_SQL_SHINGLE} AS s
    FROM docs, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) g
    WHERE len(ws) >= 3
  ),
  sh AS (SELECT DISTINCT doc_id, {sql_md5_long('s')} AS h FROM shs)
"""


def _docs_repartitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, rebalanced across all cores before the shingle explode.

    Text explosion is CPU-dense per input byte, so parquet's byte-based
    splits under-parallelize it; an explicit hash repartition on doc_id
    spreads the explode evenly (and is what a 1000-executor cluster would
    want too — the shuffle moves only the raw rows, once).
    """
    p = spark.sparkContext.defaultParallelism
    return load(spark, sf_dir, "documents").repartition(p, "doc_id")


def _shingle_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s): distinct 3-token shingle strings per document."""
    d = _docs_repartitioned(spark, sf_dir)
    ws = F.split(F.lower(F.col("text")), " ")
    shingle = F.expr(
        "transform(sequence(1, size(ws) - 2), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))"
    )
    return (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", F.explode(shingle).alias("s"))
        .distinct()
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h): distinct 56-bit hashes of 3-token shingles."""
    return (
        _shingle_strings(spark, sf_dir)
        .select("doc_id", md5_long(F.col("s")).alias("h"))
        .distinct()
    )


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard ≥ threshold) from pair intersection counts."""
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
    WITH {_SQL_SHS},
    dfreq AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
    cold AS (
      SELECT sh.doc_id, sh.h
      FROM sh JOIN dfreq ON sh.h = dfreq.h
      WHERE dfreq.df <= {NGRAM_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM cold GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM cold a JOIN cold b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
    """,
    doc="Near-dup pairs by exact 3-gram shingle Jaccard ≥ 0.4 over the "
    f"df-capped (≤{NGRAM_DF_CAP} docs) shingle sets; one self-equi-join "
    "produces pairs AND intersection counts, with per-shingle fan-out "
    "bounded by the cap.",
    bench=True,
    tags=("dedup", "join"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df"))
    cold = (
        sh.join(dfreq.filter(F.col("df") <= NGRAM_DF_CAP).select("h"), "h")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = cold.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = cold.alias("a")
    b = cold.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes)


def _sql_minhash_cols() -> str:
    return ",\n           ".join(
        f"MIN(({a} * (h % {P31}) + {b}) % {P31}) AS s{i}"
        for i, (a, b) in enumerate(MH_COEFFS)
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
    WITH {_SQL_SHS},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    sigs AS (
      SELECT doc_id,
           {_sql_minhash_cols()}
      FROM sh GROUP BY doc_id
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
      SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
    FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
    """,
    doc="MinHash(16) + LSH(4 bands × 4 rows) near-dup: candidates share a "
    "band bucket; the exact-Jaccard verify joins candidate pairs to the "
    "per-document shingle sets, so its cost is bounded by bucket "
    "collisions — never by all pairs sharing a shingle.",
    bench=True,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))

    h31 = F.col("h") % P31
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * h31 + F.lit(b)) % P31).alias(f"s{i}")
            for i, (a, b) in enumerate(MH_COEFFS)
        ]
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
    # Candidate-bounded verify: expand each candidate pair by doc_a's
    # shingles, then equi-join (doc_b, h) against the shingle table. Work is
    # Σ_{(a,b)∈cand} |shingles(a)| — proportional to bucket collisions.
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("ha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    expanded = cand.join(sa, "doc_a")
    inter = (
        expanded.join(
            sb,
            (expanded["doc_b"] == sb["doc_b"]) & (expanded["ha"] == sb["hb"]),
        )
        .drop(sb["doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes)
