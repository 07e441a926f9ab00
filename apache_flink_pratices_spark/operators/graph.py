"""Iterative graph analytics over the near-duplicate document graph.

``dedup_clusters`` (operators/curation.py) answers *membership* — which
documents form one near-dup component. PageRank answers *centrality* within
that graph: documents sharing fingerprint bands with many other well-
connected documents (hot boilerplate templates, mirrored landing pages)
score high, which is the ranking a curation pipeline uses to pick what to
inspect first when a component is too large to eyeball. This extends the
engine's iterative-algorithm surface beyond label propagation
(connected_components) and Lloyd iterations (kmeans_fit) to damped
message-passing.

Cross-engine exactness: PageRank is usually float — and float message sums
are accumulation-order-dependent, so a naive port would never hash-match
the oracle. Ranks here are SCALED INTEGERS (1e-9 resolution): every
operation is int64 add / truncating div, which is associative enough to be
order-independent (the per-node contribution sum is exact integer
addition). Both engines run the identical recurrence, so even the
*approximate* algorithm is bit-exactly oracle-checked — same stance as
sketch_kmv_distinct / sketch_hll_distinct.

Overflow discipline: total mass is ≤ |nodes| · SCALE. SCALE = 1e9 keeps
the worst case (one node absorbing the entire mass of a 1e9-node
component) at 1e18 < 2^63. The damping multiply is div-before-mul
(``17 * (s div 20)`` = 0.85·s at ≤ 20 quanta of 1e-9 error) so no
intermediate exceeds ~17/20 of the mass bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from apache_flink_pratices_spark.io import load
from apache_flink_pratices_spark.operators.dedup import (
    SQL_SIMHASH_PAIR_CTES,
    simhash_candidate_pairs,
    simhash_verified_pairs,
)
from apache_flink_pratices_spark.registry import register

PR_SCALE = 10**9  #: rank quantum: 1e-9 relative resolution
PR_BASE = PR_SCALE * 15 // 100  #: (1 - d) · SCALE with d = 0.85
PR_ITERS = 3  #: fixed iteration count (oracle unrolls the same three)


def _pr_step(ej: DataFrame, ranks: DataFrame) -> DataFrame:
    """One damped message-passing round: rank' = BASE + 17·(S div 20).

    ``ej`` is the degree-annotated edge list (src, dst, deg); ``ranks``
    must cover exactly the connected nodes. Contributions are
    rank div deg per out-edge; S is their exact int64 sum per dst. In a
    SYMMETRIZED graph every connected node has an in-edge, so the
    contribution aggregate already emits one row per connected node — no
    nodes-frame re-join is needed per round (dropping it removed two jobs
    per iteration: the broadcast build and the outer-join probe)."""
    # `div`, not `/`: float division then cast would lose exactness past
    # 2^53 — the recurrence must stay pure int64 end to end
    return (
        ej.join(ranks, ej.src == ranks.doc_id)
        .select(F.col("dst"), F.expr("rank div deg").alias("contrib"))
        .groupBy("dst")
        .agg(F.sum("contrib").alias("s"))
        .select(
            F.col("dst").alias("doc_id"),
            (F.lit(PR_BASE) + F.lit(17) * F.expr("s div 20")).alias("rank"),
        )
    )


def _sql_pr_step(prev: str, out: str) -> str:
    return f"""
    s_{out} AS (
      SELECT e.dst AS doc_id, CAST(SUM(r.rank // e.deg) AS BIGINT) AS s
      FROM ej e JOIN {prev} r ON r.doc_id = e.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT n.doc_id,
             {PR_BASE} + 17 * (COALESCE(s.s, 0) // 20) AS rank
      FROM nodes n LEFT JOIN s_{out} s ON s.doc_id = n.doc_id
    )"""


@register(
    "pagerank_neardup",
    oracle=f"""
    WITH {SQL_SIMHASH_PAIR_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM sh_pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM sh_pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    ej AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON d.src = e.src),
    nodes AS (SELECT doc_id FROM documents),
    r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes),
    {_sql_pr_step('r0', 'r1')},
    {_sql_pr_step('r1', 'r2')},
    {_sql_pr_step('r2', 'r3')}
    SELECT r.doc_id,
           CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
           CAST(r.rank AS BIGINT) AS rank_scaled
    FROM r3 r LEFT JOIN deg d ON d.src = r.doc_id
    """,
    doc=f"PageRank (d=0.85, {PR_ITERS} rounds) over the symmetrized simhash "
    "near-dup graph (same verified edge set as dedup_simhash / "
    "dedup_clusters, by shared CTE) in exact scaled-integer arithmetic — "
    "the damped message-passing recurrence is bit-identical across "
    "engines, so the iterative algorithm itself is oracle-checked. Scale "
    "shape: the edge set comes from the MATERIALIZED near-dup pair "
    "artifact (built once per corpus by operators/dedup.py — the "
    "multi-stage-pipeline shape a 100 TB deployment uses), so this query "
    "benches the iteration, not the fingerprint pipeline; the "
    "degree-annotated edge list is persisted and re-shuffled on src each "
    "round (rank join) then dst (contribution sum) — two 24-byte-row "
    "exchanges per round, never the documents. "
    "Isolated docs cost one broadcast-side left join and settle at the "
    "base rank. Reference analogue: the reference's designed screening "
    "layer ranks instruments by cross-signal connectivity "
    "(docs/project docs/5. 스크리닝 레이어 설계.md) — same centrality "
    "pattern, here over the near-dup graph.",
    bench=True,
    tags=("graph", "pagerank", "dedup"),
)
def pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = simhash_verified_pairs(spark, sf_dir)
    # symmetrize via explode, NOT union-of-two-selects: a union would scan
    # the pair artifact twice (harmless here, but the explode keeps the
    # one-pass shape the live-pipeline version needed)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    # one degree-annotated edge list feeds all rounds: persist so the
    # artifact scan + degree shuffle run once, not once per iteration
    ej = (
        edges.join(deg, "src")
        .select("src", "dst", "deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Iterate over CONNECTED nodes only. Isolated documents receive no
    # contributions and contribute nothing, so from round 1 on their rank
    # is the constant BASE — computing them per round would drag the full
    # corpus through every iteration for a value known in closed form.
    # out_deg doubles as the connected-node set (one row per src) and is
    # read OFF THE CACHE (deg itself would rescan and re-shuffle).
    out_deg = (
        ej.groupBy("src")
        .agg(F.max("deg").alias("deg"))
        .select(F.col("src").alias("doc_id"), "deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = out_deg.select("doc_id", F.lit(PR_SCALE).cast("long").alias("rank"))
    for _ in range(PR_ITERS):
        # Pregel-style per-round LAZY persist: the ranks side of the next
        # round's join is materialized (broadcast or shuffle) by the
        # engine, and without a cache that materialization re-executes
        # the whole prior chain — measured super-linear in rounds. The
        # persists are deliberately lazy (no per-round action): an
        # eager count()+unpersist(prev) variant bounds cache lifetime to
        # one round but serializes the rounds into extra jobs, measured
        # ~15% slower end-to-end. The cached frames are (id, rank) =
        # 16 bytes/row over the CONNECTED set only, and live until the
        # session (or the bench/driver harness) clears the cache — the
        # same lifetime as this module's fp/ej/out_deg caches.
        ranks = _pr_step(ej, ranks).persist(StorageLevel.MEMORY_AND_DISK)
    connected = ranks.join(out_deg, "doc_id").select(
        "doc_id",
        F.col("deg").cast("long").alias("deg"),
        F.col("rank").cast("long").alias("rank_scaled"),
    )
    isolated = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .join(out_deg.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("deg"),
            F.lit(PR_BASE).cast("long").alias("rank_scaled"),
        )
    )
    return connected.union(isolated)


# --- triangle counting ------------------------------------------------------
@register(
    "triangle_count_neardup",
    oracle=f"""
    WITH {SQL_SIMHASH_PAIR_CTES},
    canon AS (
      SELECT doc_a AS u, doc_b AS v FROM cand
    ),
    deg AS (
      SELECT x AS id, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS x FROM canon UNION ALL SELECT v AS x FROM canon)
      GROUP BY x
    ),
    oriented AS MATERIALIZED (
      SELECT CASE WHEN (da.d, c.u) < (db.d, c.v) THEN c.u ELSE c.v END AS a,
             CASE WHEN (da.d, c.u) < (db.d, c.v) THEN c.v ELSE c.u END AS b
      FROM canon c
        JOIN deg da ON da.id = c.u
        JOIN deg db ON db.id = c.v
    ),
    closing AS (
      SELECT a AS y, b AS z FROM oriented
      UNION ALL
      SELECT b AS y, a AS z FROM oriented
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM oriented e1
        JOIN oriented e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN closing e3 ON e3.y = e1.b AND e3.z = e2.b
    ),
    member AS (
      SELECT x AS doc_id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM member GROUP BY doc_id
    """,
    doc="Per-document triangle participation over the simhash BAND-"
    "COLLISION candidate graph (the `cand` stage of dedup_simhash, by "
    "shared CTE; Spark side reads the materialized pair artifact): a doc "
    "in many candidate triangles sits in a dense "
    "mirror/template cluster, while chance band collisions form isolated "
    "edges — triangle density is the cluster-vs-noise discriminator "
    "BEFORE paying the Hamming verify. Degree-ordered edge orientation — "
    "every edge points from its (degree, id)-smaller endpoint — is the "
    "standard distributed-triangle trick: wedge enumeration fans out "
    "from each node's OUT-edges only, and max out-degree is O(sqrt(m)) "
    "regardless of hub size, so a billion-edge boilerplate hub cannot "
    "produce a quadratic wedge explosion. Wedges close via one equi-join "
    "back to the oriented edge set.",
    tags=("graph", "triangles", "dedup"),
)
def triangle_count_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # candidate pairs come off the materialized artifact (doc_a < doc_b
    # distinct — already canonical); the only remaining build cost is the
    # ~24-byte-row scan, so the query benches the triangle algorithm
    canon = simhash_candidate_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    # degree over the undirected set (explode, not self-union — one pass
    # over the pairs pipeline; see pagerank_neardup)
    both = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("x"), F.col("v").alias("y")),
                F.struct(F.col("v").alias("x"), F.col("u").alias("y")),
            )
        ).alias("e")
    ).select("e.x", "e.y")
    deg = both.groupBy("x").agg(F.count("*").cast("long").alias("d"))
    # orient each edge from its (degree, id)-smaller endpoint; persist the
    # small oriented list — it feeds the wedge join twice and the closing
    # join once
    da = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        canon.join(da, "u")
        .join(db, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1 = oriented.select(F.col("a"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("z"))
    wedges = e1.join(e2, "a").filter(F.col("z") > F.col("y"))
    # close the wedge: the third edge is oriented either y→z or z→y
    closing = oriented.select(F.col("a").alias("y"), F.col("b").alias("z")).union(
        oriented.select(F.col("b").alias("y"), F.col("a").alias("z"))
    )
    tri = wedges.join(closing, ["y", "z"])
    member = tri.select(
        F.explode(F.array(F.col("a"), F.col("y"), F.col("z"))).alias("doc_id")
    )
    return member.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_triangles"))
