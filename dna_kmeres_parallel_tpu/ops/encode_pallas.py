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


def _rev16_digits(x):
    """Reverse the 16 2-bit digits of a uint32 (butterfly swaps, ~8 ops) —
    the vector analogue of the scalar digit-reverse loop in
    ops/sparse.revcomp_split, at O(log) instead of O(k) cost."""
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    return (x << 16) | (x >> 16)


def _make_encode_kernel(
    k: int, canonical: bool, chunk: int, single: bool, hi16: bool
):
    nlo = _lo_bases(k)
    nhi = k - nlo

    def kernel(bases_ref, n_own_ref, *out_refs):
        lo_ref = out_refs[-1]
        hi_ref = None if single else out_refs[0]
        # Vectorized over the whole [8, row_w] block (per-row processing
        # wastes 7/8 of the VPU sublanes): each row is a contiguous stream
        # span with its own halo tail, so window s of every row is the
        # column slice at offset s — realized as a lane roll so widths stay
        # constant (wrapped tail lanes are garbage beyond the halo and are
        # cropped by the final [:, :chunk] store).
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]
        w = bases_ref[:].astype(jnp.int32)  # int32 compare domain (Mosaic)
        row_w = w.shape[1]

        def lroll(a, off):  # a[:, i + off] at column i
            return pltpu.roll(a, row_w - off, axis=1) if off else a

        # Doubling ladder: window codes/validity for power-of-two lengths —
        # log2(k) lane rolls instead of the k rolls of a linear unroll (the
        # encode was ~45% of the k=21 device path).
        # validity travels as int32 0/1 — Mosaic cannot roll i1 vectors
        # ("Rotate with non-32-bit data").
        c = {1: (w & 3).astype(jnp.uint32)}
        v = {1: (w < 4).astype(jnp.int32)}
        p = 1
        while 2 * p <= max(nlo, nhi, 1):
            c[2 * p] = (c[p] << (2 * p)) | lroll(c[p], p)
            v[2 * p] = v[p] & lroll(v[p], p)
            p *= 2

        def build(n):
            """(codes, valid) for n-base windows from power-of-two pieces."""
            acc_c = acc_v = None
            acc_len = 0
            for q in sorted(c, reverse=True):
                if not (n & q):
                    continue
                if acc_c is None:
                    acc_c, acc_v, acc_len = c[q], v[q], q
                else:
                    acc_c = (acc_c << (2 * q)) | lroll(c[q], acc_len)
                    acc_v = acc_v & lroll(v[q], acc_len)
                    acc_len += q
            return acc_c, acc_v

        lo_full, lo_v = build(nlo)
        if nhi:
            hi_full, hi_v = build(nhi)
            hi = hi_full
            lo = lroll(lo_full, nhi)
            valid_full = hi_v & lroll(lo_v, nhi)
        else:
            hi = jnp.zeros_like(lo_full)
            lo = lo_full
            valid_full = lo_v
        hi = jax.lax.slice_in_dim(hi, 0, chunk, axis=1)
        lo = jax.lax.slice_in_dim(lo, 0, chunk, axis=1)
        valid = jax.lax.slice_in_dim(valid_full, 0, chunk, axis=1) != 0

        if canonical:
            # RC = digit-reverse + complement, via butterfly reversal of the
            # 16-digit words (O(log k) ops vs the O(k) shift loop).
            ones32 = jnp.uint32(0xFFFFFFFF)
            if nhi:
                rev_lo = _rev16_digits(lo ^ ones32)
                hi_mask = jnp.uint32((1 << (2 * nhi)) - 1)
                rev_hi = _rev16_digits((hi ^ hi_mask) & hi_mask)
                rc_hi = rev_lo >> (2 * (16 - nhi))
                rc_lo = (rev_lo << (2 * nhi)) | (rev_hi >> (2 * (16 - nhi)))
            else:
                k_mask = jnp.uint32((1 << (2 * k)) - 1) if k < 16 else ones32
                rc_hi = jnp.zeros_like(hi)
                rc_lo = _rev16_digits((lo ^ k_mask) & k_mask) >> (2 * (16 - k))
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
        if hi_ref is not None and hi16:
            # The 16 <= k <= 23 band: hi fits 14 bits, so the kernel emits
            # the int16 plane DIRECTLY (sentinel 0xFFFF = -1) — half the
            # hi-plane store traffic and no downstream conversion pass.
            # (int16 outputs compile on this Mosaic; uint32 outputs crash.)
            hi_i = jax.lax.bitcast_convert_type(hi, jnp.int32)
            hi_ref[:] = jnp.where(valid, hi_i, jnp.int32(0xFFFF)).astype(
                jnp.int16
            )
        elif hi_ref is not None:
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
    """[T] uint8 stream -> (hi, lo) window codes [Tp] (sentinel all-ones
    where invalid / beyond n_own; Tp = T rounded up to the tile span — the
    sentinel tail sorts to the end and is ignored downstream).

    For k <= 15 the full code fits lo, so hi is None and the kernel writes
    a single output plane (half the HBM store traffic). For 16 <= k <= 23
    hi is emitted as uint16 directly (sentinel 0xFFFF); above that, uint32
    (sentinel 0xFFFFFFFF)."""
    if not (1 <= k <= MAX_SPARSE_K):
        raise ValueError(f"k must be in [1, {MAX_SPARSE_K}]")
    single = k <= MAX_SINGLE_WORD_K
    from dna_kmeres_parallel_tpu.ops.sparse import MAX_U16_HI_K

    hi16 = (not single) and k <= MAX_U16_HI_K
    T = bases.shape[0]
    # Independent of the histogram kernel's chunk: the encoder wants large
    # tiles — at 512 the k-1 halo overlap wastes 25% of input DMA and the
    # grid dispatch dominates; measured k=21 encode 7.2ms (512) -> 5.1ms
    # (4096) per 16M bases. In the no-device-sort era the encode-only
    # program is grid-step-overhead sensitive: same-window sweep 4096 ->
    # 16.0, 8192 -> 16.2, 16384 -> 17.6, 32768 -> 16.3 Gbase/s at k=21.
    chunk = int(os.environ.get("KMER_TPU_ENC_CHUNK", "16384"))
    if chunk < 128 or chunk % 128:
        # Mosaic block widths must be 128-multiples (CLAUDE.md) — fail
        # with a clear message instead of the remote helper's opaque 500;
        # chunk must also cover the k-1 halo (k <= 31 -> halo <= 30 < 128).
        raise ValueError(
            f"KMER_TPU_ENC_CHUNK must be a positive multiple of 128, got {chunk}"
        )
    halo = k - 1
    # Lane-aligned row width (non-128-multiple block widths crash Mosaic).
    row_w = _round_up(chunk + halo, 128)
    span = 8 * chunk
    Tp = _round_up(max(T, span), span)
    n_tiles = Tp // span
    n_rows = n_tiles * 8
    from dna_kmeres_parallel_tpu.ops.histogram_pallas import _overlapped_rows

    rows = _overlapped_rows(bases, T, Tp, n_rows, chunk, row_w)

    kernel = _make_encode_kernel(k, canonical, chunk, single, hi16)
    n_out = 1 if single else 2
    out_dtypes = ([jnp.int16] if hi16 else [jnp.int32])[: n_out - 1] + [
        jnp.int32
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_rows, chunk), dt) for dt in out_dtypes
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
    hi = jax.lax.bitcast_convert_type(
        out[0].reshape(-1), jnp.uint16 if hi16 else jnp.uint32
    )
    return hi, lo
