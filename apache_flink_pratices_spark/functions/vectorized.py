"""Shared numpy kernels for the vectorized Arrow ``mapInPandas`` stages.

The cross-engine exactness argument — float32→float64 is exact, each
per-element product floors into int64 at a fixed scale BEFORE summing,
int64 sums are order-independent — must hold identically in the LSH
signature pass, the IVF cell assignment, and the IVF+PQ corpus prep.
Review r7: each stage carried its own verbatim copy of the loop (and of
the docstring making the claim); this module is the one definition the
equality-pin tests (vs the retained HOF expression twins) license.
"""

from __future__ import annotations

import numpy as np


def scaled_floor_sums(x: np.ndarray, mat: np.ndarray, scale: int) -> np.ndarray:
    """``(n, k) int64`` matrix of exact quantized products:
    ``out[i, j] = Σ_d floor(x[i, d] · mat[j, d] · scale)``.

    Matches the JVM/DuckDB evaluation ``floor((x·m)·scale)`` bit for bit
    (both sides compute the product in IEEE float64, left-associated),
    so any argmax/argmin/sign decision taken on the result is identical
    across engines."""
    out = np.empty((x.shape[0], mat.shape[0]), dtype=np.int64)
    for j in range(mat.shape[0]):
        out[:, j] = np.floor((x * mat[j]) * scale).astype(np.int64).sum(axis=1)
    return out
