"""Dense histograms and per-sequence count matrices (jnp/XLA paths).

Replaces the reference's brute-force count kernel — one full sequence rescan
per k-mer, O(L * 4^k) compares (/root/reference/kernels.h:113-144) — with a
single rolling-code pass per base feeding either:

- a one-hot reduction (MXU-shaped; small bins), or
- a scatter-add (XLA scatter; medium bins),

selected by ``bins``. Pallas TPU twins live in ops/histogram_pallas.py; these
jnp versions are the portable reference path and the CPU-test target.

All counts are exact integers (int32 accumulators, like the reference's
``int`` counters), so results are bit-identical regardless of tiling or
device count — integer adds are associative (SURVEY.md §4 determinism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: one-hot path is profitable while the [chunk, bins] one-hot fits VMEM-ish
ONEHOT_BINS_LIMIT = 4096


def histogram_onehot(
    codes: jax.Array, valid: jax.Array, bins: int, chunk: int = 2048
) -> jax.Array:
    """Dense histogram via chunked one-hot reduction. [T] -> [bins] int32.

    Processes ``chunk`` codes per step (lax.scan keeps peak memory at
    chunk x bins) and accumulates integer partial histograms.
    """
    T = codes.shape[0]
    pad = (-T) % chunk
    codes_p = jnp.pad(codes, (0, pad))
    valid_p = jnp.pad(valid, (0, pad))
    codes_c = codes_p.reshape(-1, chunk)
    valid_c = valid_p.reshape(-1, chunk)

    bin_ids = jnp.arange(bins, dtype=jnp.int32)

    def body(acc, xs):
        c, v = xs
        onehot = (c[:, None] == bin_ids[None, :]) & v[:, None]
        return acc + jnp.sum(onehot.astype(jnp.int32), axis=0), None

    init = jnp.zeros((bins,), dtype=jnp.int32)
    acc, _ = jax.lax.scan(body, init, (codes_c, valid_c))
    return acc


def histogram_scatter(codes: jax.Array, valid: jax.Array, bins: int) -> jax.Array:
    """Dense histogram via scatter-add. [T] -> [bins] int32.

    Invalid codes are routed to an overflow bucket at index ``bins`` and
    dropped, so no branch is needed in the hot path.
    """
    safe = jnp.where(valid, codes, bins)
    hist = jnp.zeros((bins + 1,), dtype=jnp.int32)
    hist = hist.at[safe].add(1)
    return hist[:bins]


def histogram_sorted(codes: jax.Array, valid: jax.Array, bins: int) -> jax.Array:
    """Dense histogram via sort + vectorized bin-edge search. [T] -> [bins].

    hist[b] = #codes in [b, b+1) = searchsorted(sorted, b+1) - (..., b):
    one device sort plus a batched binary search — no scatter at all. The
    TPU-friendly formulation for medium-large dense bins where one-hot
    compare costs outgrow the sort.
    """
    safe = jnp.where(valid, codes, bins)  # invalids beyond the last edge
    sorted_codes = jax.lax.sort(safe)
    edges = jnp.arange(bins + 1, dtype=codes.dtype)
    pos = jnp.searchsorted(sorted_codes, edges)
    return jnp.diff(pos).astype(jnp.int32)


def histogram(codes: jax.Array, valid: jax.Array, bins: int) -> jax.Array:
    """Dense histogram, auto-selecting the implementation by ``bins``."""
    if bins <= ONEHOT_BINS_LIMIT:
        return histogram_onehot(codes, valid, bins)
    return histogram_scatter(codes, valid, bins)


def counts_matrix_onehot(
    codes: jax.Array, valid: jax.Array, bins: int, chunk: int = 512
) -> jax.Array:
    """Per-sequence count matrix via one-hot reduction.

    codes: int32 [S, W] window codes; valid: bool [S, W].
    Returns int32 [S, bins]. Scans over W in chunks: peak memory
    S x chunk x bins. This is the MXU-friendly formulation of the
    reference's step-1 counts matrix (kernels.h:142, transposed: we use
    sequence-major [S, bins], the natural layout for the distance engine).
    """
    S, W = codes.shape
    pad = (-W) % chunk
    codes_p = jnp.pad(codes, ((0, 0), (0, pad)))
    valid_p = jnp.pad(valid, ((0, 0), (0, pad)))
    nchunks = codes_p.shape[1] // chunk
    # [nchunks, S, chunk] so scan carries the [S, bins] accumulator.
    codes_c = jnp.moveaxis(codes_p.reshape(S, nchunks, chunk), 1, 0)
    valid_c = jnp.moveaxis(valid_p.reshape(S, nchunks, chunk), 1, 0)

    bin_ids = jnp.arange(bins, dtype=jnp.int32)

    def body(acc, xs):
        c, v = xs
        onehot = (c[:, :, None] == bin_ids[None, None, :]) & v[:, :, None]
        return acc + jnp.sum(onehot.astype(jnp.int32), axis=1), None

    init = jnp.zeros((S, bins), dtype=jnp.int32)
    acc, _ = jax.lax.scan(body, init, (codes_c, valid_c))
    return acc


def counts_matrix_scatter(codes: jax.Array, valid: jax.Array, bins: int) -> jax.Array:
    """Per-sequence count matrix via one flattened scatter-add: segment id =
    seq_row * bins + code. Used when ``bins`` outgrows the one-hot path.

    Scatters with 2D (row, col) indices rather than a flattened segment
    id: row * bins + code overflows int32 once S * bins reaches 2^31
    (512 rows at 4^11 bins — hit by the r3 distance bench), and int64
    indices would need global x64 mode. Each index stays < 2^31; the
    per-row overflow bucket is column ``bins``. The [S, bins] buffer
    still has to fit device memory — the distance CLI's
    dense_distance_feasible gate bounds that upstream."""
    S, W = codes.shape
    rows = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[:, None], codes.shape
    )
    col = jnp.where(valid, codes, bins)  # per-row overflow bucket
    out = jnp.zeros((S, bins + 1), dtype=jnp.int32)
    out = out.at[rows.reshape(-1), col.reshape(-1)].add(1)
    return out[:, :bins]


def counts_matrix(codes: jax.Array, valid: jax.Array, bins: int) -> jax.Array:
    """Per-sequence count matrix, auto-selecting by ``bins``."""
    if bins <= ONEHOT_BINS_LIMIT:
        return counts_matrix_onehot(codes, valid, bins)
    return counts_matrix_scatter(codes, valid, bins)
