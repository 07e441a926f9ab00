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
