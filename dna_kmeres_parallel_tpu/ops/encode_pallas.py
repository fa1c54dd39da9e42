"""Pallas fused encoder: uint8 bases -> split-word (hi, lo) window codes.

The XLA-lowered split-word encode (ops/sparse.rolling_codes_split) costs
~10 ms per 4M windows at k=21 — every unrolled shift/or round-trips int32
arrays through HBM. This kernel reads each base tile once into VMEM and
emits the (hi, lo) planes directly, with validity/ownership sentinels and
optional RC canonicalization folded in. It feeds the sort in the sparse
counting path (ops/sparse.sort_unique_counts).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dna_kmeres_parallel_tpu.ops.encode import INVALID
from dna_kmeres_parallel_tpu.ops.sparse import (
    MAX_SINGLE_WORD_K,
    MAX_SPARSE_K,
    _lo_bases,
)

_SENTINEL = 0xFFFFFFFF


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_encode_kernel(k: int, canonical: bool, chunk: int, single: bool):
    nlo = _lo_bases(k)
    nhi = k - nlo

    def kernel(bases_ref, n_own_ref, *out_refs):
        lo_ref = out_refs[-1]
        hi_ref = None if single else out_refs[0]
        # Vectorized over the whole [8, chunk] block (per-row processing
        # wastes 7/8 of the VPU sublanes): each row is a contiguous stream
        # span with its own halo tail, so window s of every row is just the
        # column slice [:, s : s+chunk].
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]
        hi = jnp.zeros((8, chunk), jnp.uint32)
        lo = jnp.zeros((8, chunk), jnp.uint32)
        valid = jnp.ones((8, chunk), jnp.bool_)
        for s in range(k):  # static unroll
            # int32 compare domain — uint8-derived bool masks crash the
            # Mosaic compiler downstream (see histogram_pallas note).
            w = jax.lax.slice_in_dim(bases_ref[:], s, s + chunk, axis=1).astype(
                jnp.int32
            )
            valid = valid & (w < 4)
            b = (w & 3).astype(jnp.uint32)
            if s < nhi:
                hi = (hi << 2) | b
            else:
                lo = (lo << 2) | b
        if canonical:
            rc_hi = jnp.zeros_like(hi)
            rc_lo = jnp.zeros_like(lo)
            sh, sl = hi, lo
            for i in range(k):
                d = sl & 3
                sl = (sl >> 2) | ((sh & 3) << (2 * (nlo - 1)))
                sh = sh >> 2
                comp = d ^ 3
                if i < nhi:
                    rc_hi = (rc_hi << 2) | comp
                else:
                    rc_lo = (rc_lo << 2) | comp
            take_rc = (rc_hi < hi) | ((rc_hi == hi) & (rc_lo < lo))
            hi = jnp.where(take_rc, rc_hi, hi)
            lo = jnp.where(take_rc, rc_lo, lo)
        # Global window position of element (r, c): (t*8 + r)*chunk + c.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1)
            + (jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0) + t * 8) * chunk
        )
        valid = valid & (pos < n_own)
        # int32 select + int32 stores: uint32 kernel OUTPUTS crash the
        # Mosaic compiler (bisected); bit patterns are preserved and the
        # wrapper bitcasts back to uint32.
        sent_i = jnp.int32(-1)  # 0xFFFFFFFF
        lo_i = jax.lax.bitcast_convert_type(lo, jnp.int32)
        lo_ref[:] = jnp.where(valid, lo_i, sent_i)
        if hi_ref is not None:
            hi_i = jax.lax.bitcast_convert_type(hi, jnp.int32)
            hi_ref[:] = jnp.where(valid, hi_i, sent_i)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "canonical", "interpret")
)
def rolling_codes_split_pallas(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    interpret: bool = False,
):
    """[T] uint8 stream -> (hi, lo) uint32 [Tp] window codes (sentinel
    0xFFFFFFFF where invalid / beyond n_own; Tp = T rounded up to the tile
    span — the sentinel tail sorts to the end and is ignored downstream).

    For k <= 15 the full code fits lo, so hi is None and the kernel writes
    a single output plane (half the HBM store traffic)."""
    if not (1 <= k <= MAX_SPARSE_K):
        raise ValueError(f"k must be in [1, {MAX_SPARSE_K}]")
    single = k <= MAX_SINGLE_WORD_K
    T = bases.shape[0]
    chunk = int(os.environ.get("KMER_TPU_HIST_CHUNK", "512"))
    halo = k - 1
    # Lane-aligned row width (non-128-multiple block widths crash Mosaic).
    row_w = _round_up(chunk + halo, 128)
    span = 8 * chunk
    Tp = _round_up(max(T, span), span)
    n_tiles = Tp // span
    n_rows = n_tiles * 8
    from dna_kmeres_parallel_tpu.ops.histogram_pallas import _overlapped_rows

    rows = _overlapped_rows(bases, T, Tp, n_rows, chunk, row_w)

    kernel = _make_encode_kernel(k, canonical, chunk, single)
    n_out = 1 if single else 2
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_rows, chunk), jnp.int32)
            for _ in range(n_out)
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (8, row_w), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((8, chunk), lambda t: (t, 0), memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ),
        interpret=interpret,
    )(rows, jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1))
    lo = jax.lax.bitcast_convert_type(out[-1].reshape(-1), jnp.uint32)
    if single:
        return None, lo
    hi = jax.lax.bitcast_convert_type(out[0].reshape(-1), jnp.uint32)
    return hi, lo
