"""Z-order layout: measure the actual file-skipping win on written parquet.

A 64x64 grid is written through the real Spark layout path
(repartitionByRange on the layout key → one contiguous key range per
file), then parquet footer min/max statistics decide which files a box
predicate would scan — the same decision Spark's scan planner makes.
Single-column sort prunes only its own axis; the Morton key bounds every
file in BOTH axes."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from apache_flink_pratices_spark.functions.zorder import sql_zorder_key, zorder_key

FILES = 16


def _grid(spark):
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )


def _write(df, key, path):
    df.repartitionByRange(FILES, key).write.mode("overwrite").parquet(path)


def _matched(path, boxes):
    """Files whose [min,max] stats intersect every (col, lo, hi) box."""
    total = hit = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo_hi = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                mn, mx = lo_hi.get(name, (st.min, st.max))
                lo_hi[name] = (min(mn, st.min), max(mx, st.max))
        total += 1
        if all(lo_hi[c][0] <= hi and lo_hi[c][1] >= lo for c, lo, hi in boxes):
            hit += 1
    assert total == FILES, total
    return hit


def test_zorder_prunes_both_axes_single_sort_does_not(spark, tmp_path):
    g = _grid(spark)
    xpath, zpath = str(tmp_path / "by_x"), str(tmp_path / "by_z")
    _write(g, "x", xpath)
    _write(g.withColumn("z", zorder_key(F.col("x"), F.col("y"), 6)), "z", zpath)

    xbox = [("x", 8, 15)]
    ybox = [("y", 8, 15)]
    box2d = [("x", 8, 15), ("y", 8, 15)]

    # sorted-by-x: perfect on x, blind on y
    assert _matched(xpath, xbox) <= 4
    assert _matched(xpath, ybox) == FILES
    # z-order: partial pruning on EITHER axis alone...
    assert _matched(zpath, xbox) <= FILES // 2
    assert _matched(zpath, ybox) <= FILES // 2
    # ...and strong pruning on the 2-D box (one 16x16 tile ≈ 1-3 files)
    assert _matched(zpath, box2d) <= 3
    # the x-sorted layout's 2-D pruning is just its x pruning
    assert _matched(zpath, box2d) <= _matched(xpath, box2d)


def test_zorder_key_matches_duckdb_rendering(spark):
    """The Spark column expression and the SQL rendering are the same
    function — checked on the full 12-bit grid domain."""
    import duckdb

    rows = (
        _grid(spark)
        .select("x", "y", zorder_key(F.col("x"), F.col("y"), 6).alias("z"))
        .collect()
    )
    con = duckdb.connect()
    expr = sql_zorder_key("x", "y", 6)
    duck = {
        (x, y): z
        for x, y, z in con.execute(
            f"SELECT x, y, {expr} AS z FROM (SELECT i % 64 AS x, i // 64 AS y"
            " FROM unnest(generate_series(0, 4095)) AS t(i))"
        ).fetchall()
    }
    assert len(rows) == 4096
    for r in rows:
        assert duck[(r.x, r.y)] == r.z, (r.x, r.y)


def test_zorder_locality_bound(spark):
    """Any 256 consecutive Morton codes cover a 16x16 tile: max extent 16
    per axis — the invariant that makes every row group 2-D bounded."""
    rows = (
        _grid(spark)
        .select("x", "y", zorder_key(F.col("x"), F.col("y"), 6).alias("z"))
        .collect()
    )
    by_z = sorted(rows, key=lambda r: r.z)
    for start in range(0, 4096, 256):
        chunk = by_z[start : start + 256]
        xs = [r.x for r in chunk]
        ys = [r.y for r in chunk]
        assert max(xs) - min(xs) <= 15 and max(ys) - min(ys) <= 15
