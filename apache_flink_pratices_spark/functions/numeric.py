"""Deterministic numeric aggregation helpers.

Floating-point sums depend on accumulation order, which differs between
engines (and between runs once partitioning changes). Every headline
aggregate therefore routes through an exact decimal sum and is cast back to
double at the end:

    cast(sum(cast(x as decimal(25, 6))) as double)

Decimal addition is associative/commutative, so the result is bit-identical
regardless of partitioning, parallelism, or engine (Spark vs the DuckDB
oracle) — which is what makes the driver's order-insensitive value-hash
comparison stable. The 1e-6 quantization is far below the data's precision.

This also matches the reference's stance for financial math: the designed CEP
layer mandates ``Decimal`` arithmetic (reference ``docs/project docs/2. CEP
레이어 구현 설계 및 체크리스트.md:69-96``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precision notes: DECIMAL(25,6) holds |x| < 1e19 exactly at 1e-6 resolution;
# engine-side sum widens (Spark → dec(35,6), DuckDB → dec(38,6)) so overflow
# needs > 1e29 totals — unreachable even at 100 TB.
_PREC, _SCALE = 25, 6
_DEC = f"decimal({_PREC},{_SCALE})"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum divided by exact count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side rendering of :func:`dsum` (identical semantics)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side rendering of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"


# -- scaled-int64 fast path ---------------------------------------------------
#
# For money/quantity columns whose values are exact multiples of 1/scale,
# sum(round(x*scale)::long)/scale equals the decimal sum exactly, and the
# hot accumulation runs on JVM longs instead of BigDecimal (measured ~1.4x
# on TPC-H Q1's scan-agg; see ``docs/scale_notes.md``). The catch at 100 TB
# is overflow: a single int64 accumulator holding sum(x*1e6) over ~1e11+
# rows per group passes 2^63. The scale-safe shape is therefore TWO-stage:
#
#   stage 1  groupBy(keys, spark_partition_id()) . sum(long)
#            — an input-split never exceeds maxPartitionBytes (128 MB ≈
#              ~2M rows), so per-partition long sums are overflow-free by
#              construction (≥ 100x headroom at scaled values < 2^26);
#   stage 2  groupBy(keys) . sum(partial::decimal(38,0))
#            — exact merge of one row per (group, partition): negligible.
#
# DuckDB mirrors this with a single SUM(BIGINT) — its accumulator is a
# 128-bit HUGEINT, so it computes the same exact integer; both sides then
# convert exact-int → double → divide by the same literal, bit-identically.
#
# Rounding parity: Spark ``round`` is HALF_UP, DuckDB rounds half away from
# zero — identical for the non-negative values these helpers are for. The
# quantized products of 2dp inputs are exact integers anyway, so the .5
# boundary is never actually hit.


def qlong(col: Column | str, scale: int) -> Column:
    """``round(x*scale)`` as int64 — the quantized per-row term."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(float(scale))).cast("long")


def sql_qsum(expr: str, scale: int) -> str:
    """DuckDB rendering of the two-stage quantized sum (single-stage there:
    HUGEINT accumulation is already exact)."""
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}.0) AS BIGINT)) AS DOUBLE)"
        f" / {scale}.0"
    )


def sql_qavg(expr: str, scale: int) -> str:
    """DuckDB rendering of the quantized mean (sum/scale, then /count —
    division order must match the Spark side for bit-exactness)."""
    return f"{sql_qsum(expr, scale)} / COUNT({expr})"
