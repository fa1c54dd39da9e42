"""Packed strict-upper-triangle (row-major) index math.

The reference stores the pairwise distance matrix of n sequences as a packed
1-D array of the strict upper triangle, row-major, size n*(n-1)/2
(/root/reference/main.cu:165,250). For 0-based i < j the packed index is

    idx(i, j, n) = i*n - i*(i+1)//2 + (j - i - 1)

which is algebraically identical to the reference's 1-based helper
``getIdxTriangularMatrixRowMajor(i+1, j-i, n)``
(/root/reference/kernels.h:46-48, main.cu:671-673).
"""

from __future__ import annotations

import numpy as np


def packed_size(n: int) -> int:
    """Number of strict-upper-triangle entries for an n x n matrix."""
    return n * (n - 1) // 2


def packed_index(i, j, n: int):
    """0-based (i, j) with i < j  ->  packed row-major index. Vectorized."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    out = i * n - (i * (i + 1)) // 2 + (j - i - 1)
    if out.ndim == 0:
        return int(out)
    return out


def packed_index_reference(i1: int, j_offset: int, n: int) -> int:
    """The reference's exact 1-based formula (kernels.h:46-48): i1 = i+1,
    j_offset = j - i. Kept for differential testing against packed_index."""
    return (n * (i1 - 1) - (((i1 - 2) * (i1 - 1)) // 2)) + (j_offset - i1)


def unpack_indices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) pairs, i < j, in packed order. Returns (rows, cols)."""
    rows, cols = np.triu_indices(n, k=1)
    return rows.astype(np.int64), cols.astype(np.int64)


def packed_to_square(packed: np.ndarray, n: int, diag=0.0) -> np.ndarray:
    """Expand a packed strict-upper-triangle vector to a full symmetric
    n x n matrix with ``diag`` on the diagonal."""
    packed = np.asarray(packed)
    out = np.full((n, n), diag, dtype=packed.dtype)
    rows, cols = unpack_indices(n)
    out[rows, cols] = packed
    out[cols, rows] = packed
    return out


def square_to_packed(square: np.ndarray) -> np.ndarray:
    """Extract the strict upper triangle of a square matrix, packed row-major."""
    square = np.asarray(square)
    n = square.shape[0]
    rows, cols = unpack_indices(n)
    return square[rows, cols]
