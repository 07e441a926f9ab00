"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a 100 TB table by ONE column makes parquet min/max row-group
statistics selective on that column only; a query filtering on a second
dimension scans everything. Interleaving the bits of two dimensions into
one sort key gives every row group a bounded extent in BOTH dimensions, so
2-D box predicates prune files/row-groups on either axis — the layout
trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. This module provides
the key as a pure column expression (JVM-side shift/mask chain, same
pattern as the simhash band extraction) with a DuckDB rendering for
oracle parity; ``tests/test_zorder_layout.py`` measures the actual
row-group pruning win on written files.

Inputs must already be quantized to ``bits``-bit non-negative integers
(rank/bin space). Quantization is the caller's job — at scale it comes
from percentile bounds (cf. global_dense_ids' bucketing note), in the
registered query from a fixed modulus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits: x→even, y→odd positions."""
    if not 0 < bits <= 31:
        raise ValueError(f"bits must be in 1..31 (2*bits lanes must fit int64); got {bits}")
    z: Column | None = None
    for i in range(bits):
        xb = F.shiftright(x, i).bitwiseAND(1) * F.lit(1 << (2 * i)).cast("long")
        yb = F.shiftright(y, i).bitwiseAND(1) * F.lit(1 << (2 * i + 1)).cast("long")
        term = xb + yb
        z = term if z is None else z + term
    assert z is not None
    return z


def sql_zorder_key(ex: str, ey: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`zorder_key` (identical bit arithmetic)."""
    if not 0 < bits <= 31:
        raise ValueError(f"bits must be in 1..31 (2*bits lanes must fit int64); got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"((({ex}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({ey}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
