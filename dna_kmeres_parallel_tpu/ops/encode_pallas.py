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
    k: int,
    canonical: bool,
    chunk: int,
    single: bool,
    hi16: bool,
    with_salt: bool,
    want_sig: bool,
):
    nlo = _lo_bases(k)
    nhi = k - nlo

    def kernel(bases_ref, halo_ref, n_own_ref, *rest):
        if with_salt:
            salt_ref, rest = rest[0], rest[1:]
        out_refs = rest
        if want_sig:
            sig_ref, out_refs = out_refs[-1], out_refs[:-1]
        lo_ref = out_refs[-1]
        hi_ref = None if single else out_refs[0]
        # Vectorized over the whole [8, chunk+128] block (per-row processing
        # wastes 7/8 of the VPU sublanes): each row is a contiguous stream
        # span, and its (k-1)-base halo tail is the next row's 128-lane head
        # (shipped as the tiny `halo` input — the old design materialized a
        # whole overlapped-rows copy of the stream in an XLA pre-pass).
        # Window s of every row is the column slice at offset s — realized
        # as a lane roll so widths stay constant (wrapped tail lanes are
        # garbage beyond the halo and are cropped by the final [:, :chunk]
        # store).
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]
        w = jnp.concatenate(
            [bases_ref[:].astype(jnp.int32), halo_ref[:].astype(jnp.int32)],
            axis=1,
        )  # int32 compare domain (Mosaic)
        if with_salt:
            # Benchmark-only data rotation (distinct window codes per scan
            # iteration at zero extra HBM traffic): valid bases rotate
            # through the alphabet, invalid stay invalid.
            s = salt_ref[0, 0]
            w = jnp.where(w < 4, (w + s) & 3, w)
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
        if want_sig:
            # Fused benchmark reduction: per-block [valid-count | signature]
            # partials accumulated across grid steps into one [8, 256]
            # output (cols 0:128 = n_valid, 128:256 = an order- AND value-
            # dependent mix of both word planes). Computing this here costs
            # a few VPU ops per element and ZERO extra HBM traffic — the
            # old bench re-read the full word planes (96 MB per 16M bases
            # at k=21) just to build this signature, paying ~2x the
            # production program's memory volume. int32 adds wrap mod 2^32;
            # consumers compare wrapped.
            valid_i = valid.astype(jnp.int32)
            hi_i32 = (
                jax.lax.bitcast_convert_type(hi, jnp.int32)
                if not single
                else jnp.int32(0)
            )
            mix = jnp.where(
                valid,
                ((lo_i & 0x7FFF) + (hi_i32 & 0x7FFF)) * (pos | 1),
                0,
            )
            nv = jnp.zeros((8, 128), jnp.int32)
            sg = jnp.zeros((8, 128), jnp.int32)
            for j in range(chunk // 128):
                sl = (slice(None), slice(j * 128, (j + 1) * 128))
                nv = nv + valid_i[sl]
                sg = sg + mix[sl]
            blk = jnp.concatenate([nv, sg], axis=1)

            @pl.when(t == 0)
            def _():
                sig_ref[:] = blk

            @pl.when(t != 0)
            def _():
                sig_ref[:] = sig_ref[:] + blk

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
    jax.jit, static_argnames=("k", "canonical", "interpret", "want_sig")
)
def rolling_codes_split_pallas(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    interpret: bool = False,
    salt: jax.Array | None = None,
    want_sig: bool = False,
):
    """[T] uint8 stream -> (hi, lo) window codes [Tp] (sentinel all-ones
    where invalid / beyond n_own; Tp = T rounded up to the tile span — the
    sentinel tail sorts to the end and is ignored downstream).

    For k <= 15 the full code fits lo, so hi is None and the kernel writes
    a single output plane (half the HBM store traffic). For 16 <= k <= 23
    hi is emitted as uint16 directly (sentinel 0xFFFF); above that, uint32
    (sentinel 0xFFFFFFFF).

    Benchmark hooks (zero cost when unused): `salt` rotates valid bases
    through the alphabet inside the kernel (distinct data per scan
    iteration without an XLA pre-pass); `want_sig=True` appends a third
    return value, an [8, 256] int32 block of fused partial reductions
    (cols 0:128 sum to the valid-window count, 128:256 to an order- and
    value-dependent signature), letting benches consume the kernel without
    re-reading the word planes."""
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
    span = 8 * chunk
    Tp = _round_up(max(T, span), span)
    n_tiles = Tp // span
    n_rows = n_tiles * 8
    # The stream lays out as [n_rows, chunk] row spans — a FREE reshape
    # when T is already span-aligned (one pad pass otherwise). Each row's
    # (k-1)-base halo is the head of the NEXT row, shipped as a tiny
    # [n_rows, 128] side input (k <= 31 -> halo <= 30 < 128) and
    # concatenated in-kernel; the old _overlapped_rows pre-pass copied the
    # whole stream through HBM once more per dispatch.
    if T == Tp:
        main = bases.reshape(n_rows, chunk)
    else:
        padded = jnp.full((Tp,), INVALID, jnp.uint8).at[:T].set(bases)
        main = padded.reshape(n_rows, chunk)
    halos = jnp.concatenate(
        [main[1:, :128], jnp.full((1, 128), INVALID, jnp.uint8)], axis=0
    )

    kernel = _make_encode_kernel(
        k, canonical, chunk, single, hi16, salt is not None, want_sig
    )
    n_out = 1 if single else 2
    out_dtypes = ([jnp.int16] if hi16 else [jnp.int32])[: n_out - 1] + [
        jnp.int32
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n_rows, chunk), dt) for dt in out_dtypes
    ]
    out_specs = [
        pl.BlockSpec((8, chunk), lambda t: (t, 0), memory_space=pltpu.VMEM)
        for _ in range(n_out)
    ]
    if want_sig:
        out_shapes.append(jax.ShapeDtypeStruct((8, 256), jnp.int32))
        out_specs.append(
            pl.BlockSpec((8, 256), lambda t: (0, 0), memory_space=pltpu.VMEM)
        )
    in_specs = [
        pl.BlockSpec((8, chunk), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
    ]
    args = [main, halos, jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1)]
    if salt is not None:
        in_specs.append(pl.BlockSpec((1, 1), memory_space=pltpu.SMEM))
        args.append(jnp.asarray(salt, dtype=jnp.int32).reshape(1, 1))
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)
    sig = out[-1] if want_sig else None
    planes = out[:-1] if want_sig else out
    lo = jax.lax.bitcast_convert_type(planes[-1].reshape(-1), jnp.uint32)
    if single:
        return (None, lo, sig) if want_sig else (None, lo)
    hi = jax.lax.bitcast_convert_type(
        planes[0].reshape(-1), jnp.uint16 if hi16 else jnp.uint32
    )
    return (hi, lo, sig) if want_sig else (hi, lo)


# ==========================================================================
# Packed-input encoder v2 (round 3): SWAR window extraction from 2-bit
# packed words.
#
# The v1 kernel above reads one uint8 lane per BASE and builds window codes
# with a doubling ladder — ~40 VPU ops/window (measured compute-bound at
# ~20-25% of the HBM streaming roofline, docs/BENCHMARKS.md). Here the
# stream arrives as uint32 words of 16 big-endian 2-bit digits (the
# transfer format the host already ships, converted in a fused XLA
# pre-pass), and a window's code words are 32-bit FUNNEL EXTRACTS:
#
#   lo(window i) = bits [2*(i+nhi), 2*(i+nhi)+32) of the packed bitstream
#                = (P[w] << 2r) | (P[w+1] >> (32-2r)),  r = (i+nhi) mod 16
#   hi(window i) = extract at 2*i  >>  (32 - 2*nhi)
#
# For a fixed residue r the shifts are CONSTANT across lanes, so 16 funnel
# extracts E_r (3 ops each, amortized over 16 windows) serve every window:
# lo of residue-group r0 is E[(r0+nhi)%16] (word-rolled when it wraps), hi
# is E[r0] shifted. Window validity comes from an OR-spread ladder over
# the invalid plane (digit j of V = OR of invalid digits j..j+k-1, built
# with log2(k) funnel steps), then a 2-op digit extract per group. Total
# ~15 ops/window — and the input DMA drops 4x (2 bits/base vs 8).
#
# OUTPUT ORDER IS PERMUTED: within each [row, chunk] span, windows are
# stored residue-major (out[:, r*W16 + w] = window 16w + r) so every store
# is a contiguous [8, W16] slice — an in-order store would need a 16-way
# lane interleave. Every production consumer is order-oblivious: the sort
# paths destroy order anyway and the host radix compactor
# (kp_compact_unsorted) treats the stream as a bag. Ownership (pos <
# n_own) and the bench signature use the TRUE stream position, computed
# per group.
# ==========================================================================


def _dshift_digits(X, Xrolls, a: int, row_w: int):
    """Bring digit p+a of the packed big-endian digit stream into digit p.

    X is the [8, row_w] uint32 word vector; Xrolls caches lane-rolls of X
    (Xrolls[q] = X rolled q words left). a in [0, 48): q = a // 16 word
    rolls plus a (2*(a%16))-bit funnel from the next word."""
    q, rbits = divmod(a, 16)
    rbits *= 2
    Xq = Xrolls[q]
    if rbits == 0:
        return Xq
    return (Xq << rbits) | (Xrolls[q + 1] >> (32 - rbits))


def _make_packed_encode_kernel(
    k: int,
    canonical: bool,
    chunk: int,
    single: bool,
    hi16: bool,
    with_salt: bool,
    want_sig: bool,
    sigonly: bool = False,
    words_le: bool = False,
    minimizer_m: int | None = None,
):
    nlo = _lo_bases(k)
    nhi = k - nlo
    W16 = chunk // 16

    def kernel(words_ref, inval_ref, whalo_ref, ihalo_ref, n_own_ref, *rest):
        if with_salt:
            salt_ref, rest = rest[0], rest[1:]
        out_refs = rest
        if want_sig:
            sig_ref, out_refs = out_refs[-1], out_refs[:-1]
        min_ref = None
        if minimizer_m is not None:
            min_ref, out_refs = out_refs[-1], out_refs[:-1]
        # sigonly: stage-timing diagnostic (probe scripts) — all compute
        # runs but the word planes are never written; isolates store-side
        # cost from compute-side cost.
        lo_ref = None if sigonly else out_refs[-1]
        hi_ref = None if (single or sigonly) else out_refs[0]
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]

        def u32(ref):
            return jax.lax.bitcast_convert_type(ref[:], jnp.uint32)

        P = jnp.concatenate([u32(words_ref), u32(whalo_ref)], axis=1)
        I = jnp.concatenate([u32(inval_ref), u32(ihalo_ref)], axis=1)
        if words_le:
            # Host-staged planes arrive in little-endian digit order (a
            # zero-copy view of the packed transfer bytes); the 8-op
            # butterfly costs ~0.5 ops/window — the device-side layout
            # conversion it replaces measured 4x the whole kernel.
            P = _rev16_digits(P)
        if with_salt:
            # Benchmark-only data rotation: XOR every digit with the salt
            # (a valid-preserving alphabet permutation; invalid digits ride
            # in I and are unaffected). One op per 16 windows.
            s = salt_ref[0, 0]
            P = P ^ ((s & 3).astype(jnp.uint32) * jnp.uint32(0x55555555))
        row_w = P.shape[1]

        def lroll(a, off):  # a[:, i + off] at column i
            return pltpu.roll(a, row_w - off, axis=1) if off else a

        class _Rolls:
            """On-demand lane-roll cache: rolls[q] = X rolled q words."""

            def __init__(self, X):
                self._c = {0: X}

            def __getitem__(self, q):
                if q not in self._c:
                    self._c[q] = lroll(self._c[0], q)
                return self._c[q]

        # 16 funnel extracts: E[r][w] = 32 bits of the digit stream
        # starting at digit 16w + r.
        E = [P]
        Pn = lroll(P, 1)
        for r in range(1, 16):
            E.append((P << (2 * r)) | (Pn >> (32 - 2 * r)))

        # Validity OR-spread: V digit j != 0 iff any of invalid digits
        # j..j+k-1 is set. Doubling ladder + binary decomposition of k.
        spans = {1: I}
        span_rolls = {1: _Rolls(I)}
        p = 1
        while 2 * p <= k:
            cur = spans[p]
            nxt = cur | _dshift_digits(cur, span_rolls[p], p, row_w)
            spans[2 * p] = nxt
            span_rolls[2 * p] = _Rolls(nxt)
            p *= 2
        V = None
        covered = 0
        for q in sorted(spans, reverse=True):
            if not (k & q):
                continue
            if V is None:
                V = spans[q]
                covered = q
            else:
                V = V | _dshift_digits(
                    spans[q], span_rolls[q], covered, row_w
                )
                covered += q
        # V: [8, row_w]; digit j of V[., w] nonzero => window 16w+j invalid.

        if canonical:
            # Shared reversed-complement funnel family (r4): R[r][., w] =
            # rev16(~E[r][., w]) holds the complemented digits p+15..p of
            # position p = 16w + r. Every group's BOTH RC words are plain
            # members/rolls of this one 16-plane family (see the group
            # loop), so the two per-group 8-op butterflies of the old
            # formulation collapse to 16 shared reversals per block —
            # the attack on the measured 23% canonical tax.
            Rfam = [_rev16_digits(~e) for e in E]

        if minimizer_m is not None:
            # In-kernel window minimizers (r4): the smallest m-mer code
            # inside each k-window, emitted as a plane in the SAME
            # residue-permuted order as the word planes — this is what
            # lets minimizer owner routing (parallel/bucketed.py) ride
            # the v2 kernel (the XLA positional scan it replaces needed
            # stream order, which v2's permutation breaks). m-mer code
            # at position p is the top 2m bits of the funnel extract at
            # p; the windowed min over the k-m+1 consecutive positions
            # is a span-min doubling ladder over the 16-residue family
            # (shift-by-s = member (r+s)%16 lane-rolled (r+s)//16), so
            # the cost is ~log2(k-m+1) min+roll pairs per 16 windows.
            # Values are garbage at invalid windows (an invalid window
            # has an invalid m-mer by the covering argument — consumers
            # mask by the word planes' validity).
            mm_shift = 32 - 2 * minimizer_m
            L_span = k - minimizer_m + 1
            # SIGNED int32 family: m-mer codes are < 4^m <= 2^30, so the
            # signed order equals the unsigned one — and Mosaic cannot
            # legalize vector arith.minui (a u32 jnp.minimum here failed
            # the COMPILED kernel with HTTP 500; interpret mode, which
            # every prior test used, accepted it silently — r5 finding).
            fam = {
                1: [
                    jax.lax.bitcast_convert_type(
                        e >> mm_shift, jnp.int32
                    )
                    for e in E
                ]
            }
            s = 1
            while 2 * s <= L_span:
                prev = fam[s]
                fam[2 * s] = [
                    jnp.minimum(
                        prev[r], lroll(prev[(r + s) % 16], (r + s) // 16)
                    )
                    for r in range(16)
                ]
                s *= 2
            mins16 = None
            covered_m = 0
            for q in sorted(fam, reverse=True):
                if not (L_span & q):
                    continue
                if mins16 is None:
                    mins16 = fam[q]
                    covered_m = q
                else:
                    mins16 = [
                        jnp.minimum(
                            mins16[r],
                            lroll(
                                fam[q][(r + covered_m) % 16],
                                (r + covered_m) // 16,
                            ),
                        )
                        for r in range(16)
                    ]
                    covered_m += q

        # True stream position of window 16w + r0 in row `row` of tile t:
        # (t*8 + row) * chunk + 16*w + r0.
        pos_base = (
            jax.lax.broadcasted_iota(jnp.int32, (8, W16), 1) * 16
            + (jax.lax.broadcasted_iota(jnp.int32, (8, W16), 0) + t * 8)
            * chunk
        )

        sent_i = jnp.int32(-1)
        nv = jnp.zeros((8, 128), jnp.int32) if want_sig else None
        sg = jnp.zeros((8, 128), jnp.int32) if want_sig else None
        # Group results are CONCATENATED and stored as one full [8, chunk]
        # block per plane: 16 separate sliced sub-stores into the output
        # refs measured 4x slower end-to-end (partial-block output writes
        # defeat Mosaic's store pipelining).
        lo_pieces: list = []
        hi_pieces: list = []
        min_pieces: list = []
        for r0 in range(16):
            if nhi:
                rl = (r0 + nhi) % 16
                woff = (r0 + nhi) // 16
                lo = lroll(E[rl], woff) if woff else E[rl]
                hi = E[r0] >> (32 - 2 * nhi)
            else:
                lo = E[r0] >> (32 - 2 * k) if k < 16 else E[r0]
                # k=16: nhi=0 yet the hi plane exists (the u16 sentinel
                # disambiguates the all-T code) — valid hi is all zero.
                hi = None if single else jnp.zeros_like(lo)
            lo = jax.lax.slice_in_dim(lo, 0, W16, axis=1)
            if hi is not None:
                hi = jax.lax.slice_in_dim(hi, 0, W16, axis=1)
            vdig = (
                jax.lax.slice_in_dim(V, 0, W16, axis=1)
                >> (30 - 2 * r0)
            ) & jnp.uint32(3)
            pos = pos_base + r0
            valid = (vdig == 0) & (pos < n_own)

            if canonical:
                # RC words from the shared Rfam family: the window's rc_lo
                # (last 16 rc bases = rev+comp of the FIRST 16 window
                # digits) is exactly Rfam[r0]; rc_hi (first nhi rc bases =
                # rev+comp of the LAST nhi digits) is the top 2*nhi bits
                # of the family member at position p+k-16. Zero reversal
                # work per group — one roll+shift for rc_hi.
                rc_lo = jax.lax.slice_in_dim(Rfam[r0], 0, W16, axis=1)
                if nhi:
                    rh = (r0 + k) % 16
                    woff_h = (r0 + k - 16) // 16
                    rc_hi = jax.lax.slice_in_dim(
                        lroll(Rfam[rh], woff_h), 0, W16, axis=1
                    ) >> (32 - 2 * nhi)
                    take_rc = (rc_hi < hi) | ((rc_hi == hi) & (rc_lo < lo))
                    hi = jnp.where(take_rc, rc_hi, hi)
                else:
                    # nhi == 0: k < 16 keeps the low 2k digits of the
                    # reversal; k = 16 uses all 16 (RC hi is zero = hi).
                    if k < 16:
                        rc_lo = rc_lo & jnp.uint32((1 << (2 * k)) - 1)
                    take_rc = rc_lo < lo
                lo = jnp.where(take_rc, rc_lo, lo)

            lo_i = jax.lax.bitcast_convert_type(lo, jnp.int32)
            lo_sel = jnp.where(valid, lo_i, sent_i)
            if lo_ref is not None:
                lo_pieces.append(lo_sel)
            if min_ref is not None:
                # Minimizer codes < 4^m <= 2^30: positive in int32.
                min_pieces.append(
                    jax.lax.bitcast_convert_type(
                        jax.lax.slice_in_dim(mins16[r0], 0, W16, axis=1),
                        jnp.int32,
                    )
                )
            if hi_ref is not None:
                hi_i = jax.lax.bitcast_convert_type(hi, jnp.int32)
                if hi16:
                    hi_pieces.append(
                        jnp.where(valid, hi_i, jnp.int32(0xFFFF)).astype(
                            jnp.int16
                        )
                    )
                else:
                    hi_pieces.append(jnp.where(valid, hi_i, sent_i))
            if want_sig:
                hi_i32 = (
                    jax.lax.bitcast_convert_type(hi, jnp.int32)
                    if hi is not None
                    else jnp.int32(0)
                )
                mix = jnp.where(
                    valid,
                    ((lo_i & 0x7FFF) + (hi_i32 & 0x7FFF)) * (pos | 1),
                    0,
                )
                valid_i = valid.astype(jnp.int32)
                for j in range(W16 // 128):
                    blk = (slice(None), slice(j * 128, (j + 1) * 128))
                    nv = nv + valid_i[blk]
                    sg = sg + mix[blk]
        if lo_ref is not None:
            lo_ref[:] = jnp.concatenate(lo_pieces, axis=1)
        if hi_ref is not None:
            hi_ref[:] = jnp.concatenate(hi_pieces, axis=1)
        if min_ref is not None:
            min_ref[:] = jnp.concatenate(min_pieces, axis=1)
        if want_sig:
            blk = jnp.concatenate([nv, sg], axis=1)

            @pl.when(t == 0)
            def _():
                sig_ref[:] = blk

            @pl.when(t != 0)
            def _():
                sig_ref[:] = sig_ref[:] + blk

    return kernel


def _swar_spread_mask(m16_u32):
    """uint32 holding a 16-bit little-endian VALIDITY field (bit j = base j
    of the word valid) -> big-endian 2-bit INVALID digits (digit j = 11
    iff base j invalid)."""
    iv = (~m16_u32) & jnp.uint32(0xFFFF)
    s = iv
    s = (s | (s << 8)) & jnp.uint32(0x00FF00FF)
    s = (s | (s << 4)) & jnp.uint32(0x0F0F0F0F)
    s = (s | (s << 2)) & jnp.uint32(0x33333333)
    s = (s | (s << 1)) & jnp.uint32(0x55555555)
    d = s | (s << 1)  # little-endian digit j = 11 iff invalid
    return _rev16_digits(d)


def _rev16_digits_np(x):
    """NumPy twin of _rev16_digits (host-side plane building)."""
    import numpy as np

    x = x.astype(np.uint32)
    m2 = np.uint32(0x33333333)
    m4 = np.uint32(0x0F0F0F0F)
    m8 = np.uint32(0x00FF00FF)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    return ((x << 16) | (x >> 16)).astype(np.uint32)


def host_planes_from_packfmt(data_u8, mask_u8):
    """HOST-side (numpy) plane builder for the v2 kernel: the 2-bit packed
    transfer format -> (words_le_u32 [T/16], inval_be_u32 [T/16]).

    The words plane is a zero-copy VIEW of the packed data bytes (x86
    little-endian load == the LE digit order the kernel reverses with an
    8-op butterfly); the invalid plane is ~10 vectorized passes over
    T/8 mask bytes. This exists because the DEVICE-side conversion
    (be_planes_from_packfmt) measured 4x the whole kernel's cost on v5e:
    XLA lowers the u8[...,4] -> u32 bitcast as a layout change (u8 tiles
    are (32,128), u32 (8,128)) that dominates the program. Host staging
    ships u32 planes directly — 0.5 B/base of H2D (vs 0.375 packed) and
    NO device pre-pass at all."""
    import numpy as np

    data_u8 = np.ascontiguousarray(data_u8, dtype=np.uint8)
    mask_u8 = np.ascontiguousarray(mask_u8, dtype=np.uint8)
    w_le = data_u8.view(np.uint32)
    m16 = mask_u8.view(np.uint16).astype(np.uint32)
    iv = (~m16) & np.uint32(0xFFFF)
    s = iv
    s = (s | (s << 8)) & np.uint32(0x00FF00FF)
    s = (s | (s << 4)) & np.uint32(0x0F0F0F0F)
    s = (s | (s << 2)) & np.uint32(0x33333333)
    s = (s | (s << 1)) & np.uint32(0x55555555)
    d = s | (s << 1)
    return w_le, _rev16_digits_np(d)


def be_planes_from_packfmt(data_u8, mask_u8):
    """The 2-bit packed transfer format (data [T/4] u8 little-endian in
    byte + validity bitmask [T/8] u8; utils.codec.pack_bases) -> the v2
    kernel's (words_be, inval_be) uint32 planes, each [T/16].

    Fully fused elementwise XLA (~0.9 B/base of HBM traffic) — the v1
    path instead materialized the whole uint8 base stream (unpack_stream,
    >= 1.4 B/base) before the kernel re-read it."""
    data_u8 = data_u8.reshape(-1, 4)
    w_le = jax.lax.bitcast_convert_type(data_u8, jnp.uint32)
    # LE 2-bit digits (base j at bits 2j) -> BE via butterfly reversal.
    words_be = _rev16_digits(w_le)
    m16 = jax.lax.bitcast_convert_type(
        mask_u8.reshape(-1, 2), jnp.uint16
    ).astype(jnp.uint32)
    return words_be, _swar_spread_mask(m16)


def be_planes_from_bases(bases_u8):
    """uint8 base codes [T] (0..3 valid, anything else invalid) -> the v2
    kernel's (words_be, inval_be) uint32 planes [T/16]. SWAR compression
    in the u32 domain (no per-base lane ops)."""
    b4 = jax.lax.bitcast_convert_type(bases_u8.reshape(-1, 4), jnp.uint32)
    # 2-bit digits of 4 bases at bits 0,8,16,24 -> one LE byte per word.
    d = b4 & jnp.uint32(0x03030303)
    c = (d | (d >> 6)) & jnp.uint32(0x000F000F)
    c = (c | (c >> 12)) & jnp.uint32(0x000000FF)
    data_bytes = c.astype(jnp.uint8)  # [T/4]: 4 LE digits per byte
    w_le = jax.lax.bitcast_convert_type(
        data_bytes.reshape(-1, 4), jnp.uint32
    )
    words_be = _rev16_digits(w_le)
    # Invalid base = any bit above the low 2 set in its byte.
    iv = b4 & jnp.uint32(0xFCFCFCFC)
    iv = (iv >> 2) | (iv >> 4) | (iv >> 6)
    iv = iv & jnp.uint32(0x03030303)
    iv = (iv | (iv >> 1)) & jnp.uint32(0x01010101)
    iv3 = iv | (iv << 1)  # 0x03 per invalid base byte
    e = (iv3 | (iv3 >> 6)) & jnp.uint32(0x000F000F)
    e = (e | (e >> 12)) & jnp.uint32(0x000000FF)
    iv_bytes = e.astype(jnp.uint8)
    iv_le = jax.lax.bitcast_convert_type(iv_bytes.reshape(-1, 4), jnp.uint32)
    return words_be, _rev16_digits(iv_le)


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "interpret", "want_sig",
                     "words_le", "_diag_sigonly", "minimizer_m"),
)
def rolling_codes_split_packed_pallas(
    words_be: jax.Array,
    inval_be: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    interpret: bool = False,
    salt: jax.Array | None = None,
    want_sig: bool = False,
    words_le: bool = False,
    _diag_sigonly: bool = False,
    minimizer_m: int | None = None,
):
    """Packed-word encoder v2: (words_be, inval_be) uint32 planes [T/16]
    -> (hi, lo[, sig]) window-code planes, same dtypes/sentinels as
    rolling_codes_split_pallas but in RESIDUE-PERMUTED window order (see
    module comment) — valid for every order-oblivious consumer (sorts,
    the host radix compactor, RLE; NOT for positional window lookup).

    minimizer_m (static, 1 <= m < min(k, 16)): additionally emit each
    window's minimizer m-mer code as an int32 plane in the SAME permuted
    order (garbage at invalid windows — mask by the word sentinels);
    return becomes (hi, lo, mins). This is what lets minimizer owner
    routing (parallel/bucketed.py) run the v2 kernel: the owner plane is
    order-aligned with the words by construction, where the positional
    XLA minimizer scan it replaces required stream order."""
    if not (1 <= k <= MAX_SPARSE_K):
        raise ValueError(f"k must be in [1, {MAX_SPARSE_K}]")
    if minimizer_m is not None:
        if not (1 <= minimizer_m < min(k, 16)):
            raise ValueError(
                f"minimizer_m must satisfy 1 <= m < min(k, 16), got "
                f"{minimizer_m} (k={k})"
            )
        if want_sig or _diag_sigonly:
            raise ValueError("minimizer_m is exclusive with want_sig")
    single = k <= MAX_SINGLE_WORD_K
    from dna_kmeres_parallel_tpu.ops.sparse import MAX_U16_HI_K

    hi16 = (not single) and k <= MAX_U16_HI_K
    Tw = words_be.shape[0]
    chunk = int(os.environ.get("KMER_TPU_ENC_CHUNK", "16384"))
    if chunk < 2048 or chunk % 2048:
        # W16 = chunk/16 must be a 128-multiple (Mosaic block widths).
        raise ValueError(
            "KMER_TPU_ENC_CHUNK must be a positive multiple of 2048 for "
            f"the packed encoder, got {chunk}"
        )
    W16 = chunk // 16
    span_w = 8 * W16
    Twp = _round_up(max(Tw, span_w), span_w)
    n_tiles = Twp // span_w
    n_rows = n_tiles * 8
    ones = jnp.uint32(0xFFFFFFFF)
    if Tw == Twp:
        wmain = words_be.reshape(n_rows, W16)
        imain = inval_be.reshape(n_rows, W16)
    else:
        wmain = (
            jnp.zeros((Twp,), jnp.uint32).at[:Tw].set(words_be)
        ).reshape(n_rows, W16)
        imain = (
            jnp.full((Twp,), ones, jnp.uint32).at[:Tw].set(inval_be)
        ).reshape(n_rows, W16)
    # Per-row halo: the next row's first 128 words (2048 bases >> k-1+32).
    whalo = jnp.concatenate(
        [wmain[1:, :128], jnp.zeros((1, 128), jnp.uint32)], axis=0
    )
    ihalo = jnp.concatenate(
        [imain[1:, :128], jnp.full((1, 128), ones, jnp.uint32)], axis=0
    )

    if _diag_sigonly and not want_sig:
        raise ValueError("_diag_sigonly requires want_sig=True")
    kernel = _make_packed_encode_kernel(
        k, canonical, chunk, single, hi16, salt is not None, want_sig,
        sigonly=_diag_sigonly, words_le=words_le, minimizer_m=minimizer_m,
    )
    n_out = 0 if _diag_sigonly else (1 if single else 2)
    out_dtypes = ([jnp.int16] if hi16 else [jnp.int32])[: max(n_out - 1, 0)] + [
        jnp.int32
    ] * min(n_out, 1)
    if minimizer_m is not None:
        out_dtypes.append(jnp.int32)  # minimizer plane, after lo
        n_out += 1
    out_shapes = [
        jax.ShapeDtypeStruct((n_rows, chunk), dt) for dt in out_dtypes
    ]
    out_specs = [
        pl.BlockSpec((8, chunk), lambda t: (t, 0), memory_space=pltpu.VMEM)
        for _ in range(n_out)
    ]
    if want_sig:
        out_shapes.append(jax.ShapeDtypeStruct((8, 256), jnp.int32))
        out_specs.append(
            pl.BlockSpec((8, 256), lambda t: (0, 0), memory_space=pltpu.VMEM)
        )
    word_spec = pl.BlockSpec(
        (8, W16), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        word_spec,
        word_spec,
        halo_spec,
        halo_spec,
        pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
    ]
    as_i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    args = [
        as_i32(wmain),
        as_i32(imain),
        as_i32(whalo),
        as_i32(ihalo),
        jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1),
    ]
    if salt is not None:
        in_specs.append(pl.BlockSpec((1, 1), memory_space=pltpu.SMEM))
        args.append(jnp.asarray(salt, dtype=jnp.int32).reshape(1, 1))
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)
    sig = out[-1] if want_sig else None
    if _diag_sigonly:
        return None, None, sig
    planes = out[:-1] if want_sig else out
    mins = None
    if minimizer_m is not None:
        mins = planes[-1].reshape(-1)  # int32 minimizer codes
        planes = planes[:-1]
    lo = jax.lax.bitcast_convert_type(planes[-1].reshape(-1), jnp.uint32)
    if single:
        if minimizer_m is not None:
            return None, lo, mins
        return (None, lo, sig) if want_sig else (None, lo)
    hi = jax.lax.bitcast_convert_type(
        planes[0].reshape(-1), jnp.uint16 if hi16 else jnp.uint32
    )
    if minimizer_m is not None:
        return hi, lo, mins
    return (hi, lo, sig) if want_sig else (hi, lo)
