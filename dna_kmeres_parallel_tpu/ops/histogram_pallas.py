"""Pallas TPU kernels: fused rolling-code + histogram / counts-matrix.

Replaces the reference's step-1 count kernel — O(L * 4^k) per-k-mer string
rescans (/root/reference/kernels.h:113-144) — with fused single-pass kernels:

  bases (uint8 codes) -> k-window rolling codes (static-k shift/or, VPU)
                      -> one-hot bin membership
                      -> integer reduction in VMEM.

Kernels:

- ``counts_matrix_pallas``: [S, L] base grid -> [S, bins] per-sequence
  counts (input of the distance engine). One-hot compare + VPU reduce,
  bins <= 1024 (covers the reference workload k=3..5).
- ``histogram_pallas``: flat code stream -> [bins] dense histogram via the
  **two-level MXU outer-product**: split code = hi*W + lo, build one-hot
  planes oh_hi [H, chunk] and oh_lo [chunk, W] (bf16), and accumulate
  hist2d [H, W] += oh_hi @ oh_lo on the MXU. Compare cost is H + W per
  code (vs `bins` for flat one-hot), turning the histogram into matmuls.
  One-hot planes are int8 with int32 MXU accumulation — exact at any
  stream length.

Larger bins (4^11 = 4M) shard the hi axis across grid groups so the
accumulator tile stays within VMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dna_kmeres_parallel_tpu.ops.encode import INVALID

_MAX_ONEHOT_BINS = 1024
_SEQ_TILE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _overlapped_rows(
    bases: jax.Array, T: int, Tp: int, n_rows: int, chunk: int, row_w: int
) -> jax.Array:
    """Lay a flat stream into [n_rows, row_w] rows of chunk-strided spans
    whose tails overlap the next row's head (halo). Pure reshape/slice/
    concat — a vmapped dynamic_slice gather here measured ~28 ms per 16M
    bases, dwarfing the kernels it feeds."""
    halo = row_w - chunk
    padded = jnp.full((Tp + chunk,), INVALID, jnp.uint8).at[:T].set(bases)
    main = padded[:Tp].reshape(n_rows, chunk)
    shifted = padded[chunk : chunk + Tp].reshape(n_rows, chunk)
    return jnp.concatenate([main, shifted[:, :halo]], axis=1)


def _rolling_codes_2d(bases, k: int, n: int):
    """[R, T] uint8 -> ([R, n] int32 codes, [R, n] bool valid), n = T-k+1."""
    code = jnp.zeros((bases.shape[0], n), jnp.int32)
    valid = jnp.ones((bases.shape[0], n), jnp.bool_)
    for t in range(k):
        # Cast to int32 BEFORE comparing: uint8 lane compares crash the
        # Mosaic compiler ("Target does not support this comparison").
        w = jax.lax.slice_in_dim(bases, t, t + n, axis=1).astype(jnp.int32)
        valid = valid & (w < 4)
        code = (code << 2) | (w & 3)
    return code, valid


def _revcomp_2d(codes, k: int):
    rc = jnp.zeros_like(codes)
    c = codes
    for _ in range(k):
        rc = (rc << 2) | ((c & 3) ^ 3)
        c = c >> 2
    return rc


# ---------------------------------------------------------------------------
# Per-sequence counts matrix (small bins, one-hot + VPU reduce)
# ---------------------------------------------------------------------------


def _make_counts_kernel(k: int, bins: int, n_windows: int, canonical: bool):
    # Keep the materialized one-hot below ~2 MB: TS * chunk * bins * 4.
    chunk = max(32, min(512, (1 << 21) // (_SEQ_TILE * bins * 4)))
    nchunks = -(-n_windows // chunk)

    def kernel(bases_ref, out_ref):
        codes, valid = _rolling_codes_2d(bases_ref[:], k, n_windows)
        if canonical:
            codes = jnp.minimum(codes, _revcomp_2d(codes, k))
        codes = jnp.where(valid, codes, bins)  # sentinel outside [0, bins)
        bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bins), 2)
        acc = jnp.zeros((_SEQ_TILE, bins), jnp.int32)
        for c in range(nchunks):  # static unroll
            lo = c * chunk
            hi = min(lo + chunk, n_windows)
            blk = codes[:, lo:hi]
            onehot = (blk[:, :, None] == bin_ids).astype(jnp.int32)
            acc = acc + jnp.sum(onehot, axis=1)
        out_ref[:] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "interpret")
)
def counts_matrix_pallas(
    bases: jax.Array,
    k: int,
    bins: int,
    canonical: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """[S, L] uint8 base grid -> [S, bins] int32 per-sequence counts.

    Rows are independent sequences (pad with INVALID). bins <= 1024.
    """
    if bins > _MAX_ONEHOT_BINS:
        raise ValueError(f"counts_matrix_pallas supports bins <= {_MAX_ONEHOT_BINS}")
    S, L = bases.shape
    Sp = _round_up(max(S, _SEQ_TILE), _SEQ_TILE)
    Lp = _round_up(max(L, k + 127), 128)
    padded = jnp.full((Sp, Lp), INVALID, jnp.uint8).at[:S, :L].set(bases)
    n_windows = Lp - k + 1

    kernel = _make_counts_kernel(k, bins, n_windows, canonical)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sp, bins), jnp.int32),
        grid=(Sp // _SEQ_TILE,),
        in_specs=[
            pl.BlockSpec((_SEQ_TILE, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (_SEQ_TILE, bins), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded)
    return out[:S]


# ---------------------------------------------------------------------------
# Flat histogram: two-level MXU outer-product
# ---------------------------------------------------------------------------


def _split_hw(bins: int) -> tuple[int, int]:
    """Balanced hi/lo split: bins = H * W, W a multiple of 128 (lane dim),
    compare cost H + W per code is minimized near sqrt(bins).

    Small bins (<= 2048) take H=1: a tiny-M matmul is MXU-latency-bound
    (k=4 measured 10x slower through the H=2 outer product than through the
    direct VPU one-hot sum)."""
    if bins <= 2048:
        return 1, bins
    W = 128
    while W * W < bins and W < 2048:
        W *= 2
    W = min(W, bins)
    H = max(bins // W, 1)
    return H, W


def _make_hist2d_fused_kernel(
    k: int,
    canonical: bool,
    chunk: int,
    H: int,
    W: int,
    hi_group: int,
    sentinel: int,
):
    """Fully fused: uint8 bases (with per-row halo) -> rolling codes ->
    [canonical] -> two-level one-hot -> MXU outer-product accumulate.

    Encoding in-kernel keeps the bases in VMEM: the stream is read once as
    uint8 instead of XLA materializing int32 code arrays in HBM (measured
    ~10 ms/4M codes for the unfused XLA encode — more than the sort!).

    The one-hot planes are int8 and the dot accumulates int32 on the MXU —
    exact at any stream length with no periodic flushing (the earlier
    bf16/f32 variant needed flushes below the 2^24 f32-integer bound).

    codes_ref block: [8, chunk + k - 1] uint8 — each row a contiguous span
    of the stream, its tail overlapping the next row's head (halo), with
    absolute start position rows_base = (t*8 + r) * chunk for ownership
    masking against n_own.
    """
    w_bits = W.bit_length() - 1

    def kernel(bases_ref, n_own_ref, out_ref, acc_ref):
        g = pl.program_id(0)  # hi group index
        t = pl.program_id(1)  # stream tile index
        n_tiles = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        hi_base = g * hi_group
        hi_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (hi_group, 1), 0) + hi_base
        )
        lo_ids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        n_own = n_own_ref[0, 0]

        # Encode the whole [8, chunk] block at once (rows are contiguous
        # stream spans with halo tails, so window s of every row is the
        # column slice [:, s:s+chunk]); per-row processing would waste 7/8
        # of the VPU sublanes.
        code = jnp.zeros((8, chunk), jnp.int32)
        valid = jnp.ones((8, chunk), jnp.bool_)
        for s in range(k):  # static unroll: rolling code
            # Cast to int32 BEFORE comparing: bool masks derived from
            # uint8 lane compares crash the Mosaic compiler when they
            # later feed an int32 select (empirically bisected).
            w = jax.lax.slice_in_dim(bases_ref[:], s, s + chunk, axis=1).astype(
                jnp.int32
            )
            valid = valid & (w < 4)
            code = (code << 2) | (w & 3)
        if canonical:
            rc = jnp.zeros_like(code)
            c = code
            for _ in range(k):
                rc = (rc << 2) | ((c & 3) ^ 3)
                c = c >> 2
            code = jnp.minimum(code, rc)
        # Ownership: window (r, c) starts at global (t*8 + r)*chunk + c.
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1)
            + (jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0) + t * 8)
            * chunk
        )
        valid = valid & (pos < n_own)
        code = jnp.where(valid, code, sentinel)

        acc = acc_ref[:]
        if H == 1:
            # Direct one-hot sum on the VPU, one row at a time to bound the
            # materialized [chunk, W] plane (W up to 2048 -> 1 MB bool).
            for r in range(8):
                col = code[r : r + 1, :].reshape(chunk, 1)
                oh = (col == lo_ids) & (col < W)
                acc = acc + jnp.sum(oh.astype(jnp.int32), axis=0)[None, :]
        else:
            for r in range(8):  # MXU outer product per row, int8 -> int32
                row_code = code[r : r + 1, :]
                hi = row_code >> w_bits  # [1, chunk] — lanes
                lo = (row_code & (W - 1)).reshape(chunk, 1)  # [chunk, 1]
                oh_hi = (hi_ids == hi).astype(jnp.int8)
                oh_lo = (lo_ids == lo).astype(jnp.int8)
                acc = acc + jnp.dot(
                    oh_hi, oh_lo, preferred_element_type=jnp.int32
                )
        acc_ref[:] = acc

        @pl.when(t == n_tiles - 1)
        def _():
            out_ref[:] = acc

    return kernel


# ---------------------------------------------------------------------------
# Flat histogram: bit-plane agreement matmul (small/medium bins)
# ---------------------------------------------------------------------------

#: total agreement planes (2k code bits + 1 validity + constant padding).
#: Fixed at 16 so the match test is branch-free: dot in [-16, 16] and
#: match <=> dot == 16 <=> (dot + 16) >> 5 == 1.
_BP_PLANES = 16
#: bins cap for the bit-plane kernel: 2k + 1 <= 16 planes => k <= 7, and
#: the [W, chunk] agreement plane must fit VMEM.
_BP_MAX_BINS = 16384


def _make_hist_bitplane_kernel(k: int, canonical: bool, chunk: int, W: int):
    """uint8 bases (halo rows) -> rolling codes -> bit-plane +-1 matrix ->
    ONE int8 MXU matmul per row against the static bin-pattern matrix ->
    branch-free match extraction -> [W, 128] lane-parallel accumulators.

    Why this beats the compare-based one-hot (the H=1 branch of the
    two-level kernel): that path pays a [1, chunk] -> [chunk, 1] relayout
    per row (lane->sublane transpose) and a cross-SUBLANE reduction of the
    [chunk, W] one-hot, both poorly shaped for the VPU. Here every VPU op
    is a natural [W, chunk] lane op: bins live on sublanes, windows on
    lanes, the one-hot never changes layout, and the reduction over
    windows is 128-lane-wide adds into a [W, 128] accumulator (folded to
    [W] once, outside the kernel). The MXU builds the one-hot: code bits
    as +-1 planes, agree[w, t] = sum_i A[w, i] * B[i, t] == 16 iff window
    t's code == w (validity rides as plane 2k: invalid windows agree at
    most 14).
    """

    def kernel(bases_ref, n_own_ref, a_ref, out_ref):
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]

        code = jnp.zeros((8, chunk), jnp.int32)
        valid = jnp.ones((8, chunk), jnp.bool_)
        for s in range(k):  # static unroll: rolling code (rows carry their
            # k-1 halo in the tail columns — see _overlapped_rows)
            w = jax.lax.slice_in_dim(bases_ref[:], s, s + chunk, axis=1).astype(
                jnp.int32
            )
            valid = valid & (w < 4)
            code = (code << 2) | (w & 3)
        if canonical:
            rc = jnp.zeros_like(code)
            c = code
            for _ in range(k):
                rc = (rc << 2) | ((c & 3) ^ 3)
                c = c >> 2
            code = jnp.minimum(code, rc)
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1)
            + (jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0) + t * 8)
            * chunk
        )
        valid_i = (valid & (pos < n_own)).astype(jnp.int32)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = out_ref[:]
        a_mat = a_ref[:]  # [W, 16] int8 static bin patterns
        # NOTE: a "wide" variant contracting all 8 rows in ONE 3-D
        # dot_general ([W,16] x [16,8,chunk]) fails the remote Mosaic
        # compile (HTTP 500) — kernel matmuls must stay 2-D (CLAUDE.md).
        for r in range(8):
            rows = []
            for i in range(2 * k):  # code bit planes, +-1
                rows.append(((code[r : r + 1, :] >> i) & 1) * 2 - 1)
            rows.append(valid_i[r : r + 1, :] * 2 - 1)  # validity plane
            for _ in range(_BP_PLANES - 2 * k - 1):  # constant +1 pad
                rows.append(jnp.ones((1, chunk), jnp.int32))
            b_mat = jnp.concatenate(rows, axis=0).astype(jnp.int8)
            agree = jnp.dot(
                a_mat, b_mat, preferred_element_type=jnp.int32
            )
            oh = (agree + _BP_PLANES) >> 5  # 1 iff agree == 16, else 0
            for j in range(chunk // 128):
                acc = acc + oh[:, j * 128 : (j + 1) * 128]
        out_ref[:] = acc

    return kernel


def _bitplane_patterns(k: int, W: int, bins: int):
    """Static [W, 16] int8 bin-pattern matrix: row w holds bin w's 2k code
    bits as +-1, a +1 validity plane, then +1 padding planes; rows past
    ``bins`` hold -1 in the validity plane so they can never match."""
    import numpy as np

    a = np.ones((W, _BP_PLANES), np.int8)
    w_ids = np.arange(W, dtype=np.int64)
    for i in range(2 * k):
        a[:, i] = (((w_ids >> i) & 1) * 2 - 1).astype(np.int8)
    a[bins:, 2 * k] = -1  # padding bins: validity plane mismatch
    return a


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "interpret")
)
def histogram_bitplane_pallas(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Flat [T] uint8 base stream -> [bins] int32 histogram via the
    bit-plane agreement matmul (see _make_hist_bitplane_kernel). Exact;
    bins <= _BP_MAX_BINS (k <= 7)."""
    if bins > _BP_MAX_BINS:
        raise ValueError(
            f"bit-plane histogram supports bins <= {_BP_MAX_BINS}, got {bins}"
        )
    T = bases.shape[0]
    W = _round_up(bins, 128)
    # Larger chunks amortize per-tile overheads (k=4 measured: 3.73
    # Gbase/s at 512 -> 4.52 at 4096), but the materialized [W, chunk]
    # int32 agreement plane must stay well under VMEM: clamp chunk so the
    # plane is <= 4 MB (leaves room for the double-buffered input rows
    # and the [W, 128] accumulator).
    chunk = int(os.environ.get("KMER_TPU_HIST_CHUNK_BP", "4096"))
    chunk = max(128, min(chunk, ((1 << 22) // (4 * W)) // 128 * 128))
    halo = k - 1
    row_w = _round_up(chunk + halo, 128)
    span = chunk * 8
    Tp = _round_up(max(T, span), span)
    n_tiles = Tp // span
    rows = _overlapped_rows(bases, T, Tp, n_tiles * 8, chunk, row_w)
    a_mat = jnp.asarray(_bitplane_patterns(k, W, bins))

    kernel = _make_hist_bitplane_kernel(k, canonical, chunk, W)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, 128), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, row_w), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (W, _BP_PLANES), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (W, 128), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        rows,
        jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1),
        a_mat,
    )
    return jnp.sum(out, axis=1)[:bins]


# ---------------------------------------------------------------------------
# Flat histogram: two-level bit-plane outer product (medium bins, k = 6..8)
# ---------------------------------------------------------------------------

#: shared plane count for the two-level bit-plane kernel: up to 2k code
#: bit planes (k <= 8 -> 16) + 1 validity + constant +1 padding. 32 keeps
#: the exact-match test branch-free for BOTH pattern matrices against ONE
#: shared B: agree + (32 - match) == 32 iff all cared planes agree.
_BP2_PLANES = 32
#: bins cap: the [H, W] accumulator and the two [*, chunk] agreement
#: planes must fit VMEM; 4^8 = 65536 covers the whole dense band.
_BP2_MAX_BINS = 65536


def _bp2_patterns(n_bits: int, shift: int, rows: int, count: int, k: int):
    """Static [rows, 32] int8 pattern matrix: row w matches codes whose bit
    field [shift, shift + n_bits) equals w. Planes: i < 2k = code bit i as
    +-1 (0 on the don't-care side), 2k = validity, rest constant +1; rows
    past ``count`` get -1 in the validity plane so they can never match."""
    import numpy as np

    a = np.zeros((rows, _BP2_PLANES), np.int8)
    w_ids = np.arange(rows, dtype=np.int64)
    for i in range(n_bits):
        a[:, shift + i] = (((w_ids >> i) & 1) * 2 - 1).astype(np.int8)
    a[:, 2 * k] = 1
    a[count:, 2 * k] = -1
    a[:, 2 * k + 1 :] = 1
    return a


def _make_hist_bp2_kernel(
    k: int, canonical: bool, chunk: int, w_bits: int, mode: str = "planes"
):
    """uint8 bases (halo rows) -> rolling codes -> ONE shared +-1 plane
    matrix B [32, chunk] -> TWO int8 pattern matmuls build the hi one-hot
    [H, chunk] and lo one-hot [W, chunk] in natural lane layout -> the
    histogram tile accumulates as a THIRD int8 matmul contracting the
    window axis of both: hist[H, W] += oh_hi . oh_lo^T.

    Why this beats the compare-based two-level kernel (H > 1 branch of
    _make_hist2d_fused_kernel): that path pays a [1, chunk] -> [chunk, 1]
    relayout per row to materialize oh_lo [chunk, W] for the outer
    product, plus H + W VPU compares per window. Here NOTHING ever leaves
    lane layout — the one-hots are built on the MXU from bit planes (the
    r2 item-3 trick, generalized two-level), and the window contraction
    runs as a dot_general((1,), (1,)) so the lo one-hot is consumed
    directly in its [W, chunk] layout. Per-window cost is
    (H + W) * 32 + H * W int8 MACs — MXU-bound, not relayout-bound.

    Exact-match extraction: with don't-care planes at 0 in A, a side with
    n cared bit planes has agree <= match = 32 - 2k + n (validity + pads
    included) and agree + (32 - match) == 32 iff the window's field AND
    validity match — (agree + 32 - match) >> 5 is the one-hot, never
    negative for n <= 15.
    """
    h_bits = 2 * k - w_bits
    off_hi = 2 * k - h_bits  # 32 - match_hi
    off_lo = 2 * k - w_bits
    # Diagnostic-only (probe scripts pass mode="planes+noouter" /
    # "planes+noplanes"): "noouter" skips the NT outer-product matmul,
    # "noplanes" skips the agreement matmuls/thresholds — both produce
    # WRONG histograms; they exist to time the stages separately. The diag
    # selector is an explicit function argument, never an ambient env read
    # (an env read at trace time silently poisons cached production traces).
    mode, _, diag = mode.partition("+")

    def kernel(bases_ref, n_own_ref, ahi_ref, alo_ref, out_ref):
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]

        code = jnp.zeros((8, chunk), jnp.int32)
        valid = jnp.ones((8, chunk), jnp.bool_)
        for s in range(k):  # static unroll: rolling code over halo rows
            w = jax.lax.slice_in_dim(bases_ref[:], s, s + chunk, axis=1).astype(
                jnp.int32
            )
            valid = valid & (w < 4)
            code = (code << 2) | (w & 3)
        if canonical:
            rc = jnp.zeros_like(code)
            c = code
            for _ in range(k):
                rc = (rc << 2) | ((c & 3) ^ 3)
                c = c >> 2
            code = jnp.minimum(code, rc)
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1)
            + (jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0) + t * 8)
            * chunk
        )
        valid_i = (valid & (pos < n_own)).astype(jnp.int32)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = _bp2_accumulate(
            code, valid_i, ahi_ref[:], alo_ref[:], out_ref[:],
            k, w_bits, chunk, mode, diag,
        )

    return kernel


def _bp2_accumulate(code, valid_i, ahi, alo, acc, k, w_bits, chunk, mode,
                    diag):
    """Shared bp2 histogram accumulate: [8, chunk] window codes +
    validity -> acc [Hp, Wp] += per-row one-hot NT outer products. The
    window AXIS ORDER is irrelevant (histogram = permutation-invariant
    reduction), which is what lets the packed-plane front end feed this
    body in the v2 encoder's residue-permuted order."""
    off_hi = 2 * k - (2 * k - w_bits)
    off_lo = 2 * k - w_bits
    Hp = ahi.shape[0]
    Wp = alo.shape[0]
    if mode == "cmp":
        # Compare-built one-hots, both in natural lane layout (bins on
        # sublanes, windows on lanes) — 2 VPU ops per element vs the
        # plane matmul + threshold. Invalid windows get sentinel code
        # bins = H*W: its hi field H matches no live hi_ids row (or
        # only a padded row, cropped by the wrapper's [:H] slice).
        sent = jnp.where(
            valid_i > 0, code, (1 << w_bits) * (1 << (2 * k - w_bits))
        )
        hi_ids = jax.lax.broadcasted_iota(jnp.int32, (Hp, 1), 0)
        lo_ids = jax.lax.broadcasted_iota(jnp.int32, (Wp, 1), 0)
        for r in range(8):
            hi_r = sent[r : r + 1, :] >> w_bits  # [1, chunk]
            lo_r = sent[r : r + 1, :] & ((1 << w_bits) - 1)
            oh_hi = (hi_ids == hi_r).astype(jnp.int8)  # [Hp, chunk]
            oh_lo = (lo_ids == lo_r).astype(jnp.int8)  # [Wp, chunk]
            acc = acc + jax.lax.dot_general(
                oh_hi,
                oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return acc
    for r in range(8):
        rows = []
        for i in range(2 * k):  # code bit planes, +-1
            rows.append(((code[r : r + 1, :] >> i) & 1) * 2 - 1)
        rows.append(valid_i[r : r + 1, :] * 2 - 1)  # validity plane
        for _ in range(_BP2_PLANES - 2 * k - 1):  # constant +1 pad
            rows.append(jnp.ones((1, chunk), jnp.int32))
        b = jnp.concatenate(rows, axis=0).astype(jnp.int8)  # [32, chunk]
        if diag == "noplanes":
            oh_hi = jnp.broadcast_to(b[0:1, :], (ahi.shape[0], chunk))
            oh_lo = jnp.broadcast_to(b[1:2, :], (alo.shape[0], chunk))
        else:
            agree_hi = jnp.dot(ahi, b, preferred_element_type=jnp.int32)
            agree_lo = jnp.dot(alo, b, preferred_element_type=jnp.int32)
            oh_hi = ((agree_hi + off_hi) >> 5).astype(jnp.int8)
            oh_lo = ((agree_lo + off_lo) >> 5).astype(jnp.int8)
        if diag == "noouter":
            acc = acc + (
                oh_hi[:, : acc.shape[1]].astype(jnp.int32)
                + oh_lo[: acc.shape[0], : acc.shape[1]].astype(jnp.int32)
            )
        else:
            acc = acc + jax.lax.dot_general(
                oh_hi,
                oh_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    return acc


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "interpret", "mode")
)
def histogram_bp2_pallas(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool = False,
    interpret: bool = False,
    mode: str = "planes",
) -> jax.Array:
    """Flat [T] uint8 base stream -> [bins] int32 histogram via the
    two-level outer product with NT (window-axis) contraction (see
    _make_hist_bp2_kernel). mode="planes" builds the hi/lo one-hots on
    the MXU from +-1 bit planes; mode="cmp" builds them with natural-
    layout VPU compares (2 ops/element); a "+noouter"/"+noplanes" suffix
    selects a WRONG-result stage-timing diagnostic (probe scripts only).
    Exact; bins <= _BP2_MAX_BINS (k <= 8), power of two (the H x W field
    split assumes it — every caller passes 4**k)."""
    if bins > _BP2_MAX_BINS:
        raise ValueError(
            f"bp2 histogram supports bins <= {_BP2_MAX_BINS}, got {bins}"
        )
    if bins & (bins - 1):
        # Non-power-of-two bins would make H*W < bins (silently dropping
        # high bins) and break the w_bits field math below.
        raise ValueError(
            f"bp2 histogram requires power-of-two bins, got {bins}"
        )
    T = bases.shape[0]
    W = min(128, _round_up(bins, 4))
    while W * W < bins:
        W *= 2
    H = max(bins // W, 1)
    Wp = _round_up(W, 128)
    Hp = _round_up(H, 8)
    # Both [H, chunk] and [W, chunk] int32 agreement planes live at once;
    # keep their sum under ~8 MB (VMEM also holds the double-buffered
    # input rows, the int8 one-hots, and the [H, W] accumulator).
    chunk = int(os.environ.get("KMER_TPU_HIST_CHUNK_BP2", "2048"))
    chunk = max(128, min(chunk, ((1 << 23) // (4 * (Hp + Wp))) // 128 * 128))
    halo = k - 1
    row_w = _round_up(chunk + halo, 128)
    span = chunk * 8
    Tp = _round_up(max(T, span), span)
    n_tiles = Tp // span
    rows = _overlapped_rows(bases, T, Tp, n_tiles * 8, chunk, row_w)
    w_bits = W.bit_length() - 1
    a_hi = jnp.asarray(_bp2_patterns(2 * k - w_bits, w_bits, Hp, H, k))
    a_lo = jnp.asarray(_bp2_patterns(w_bits, 0, Wp, W, k))

    kernel = _make_hist_bp2_kernel(k, canonical, chunk, w_bits, mode)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, row_w), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (Hp, _BP2_PLANES), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Wp, _BP2_PLANES), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (Hp, Wp), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        rows,
        jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1),
        a_hi,
        a_lo,
    )
    return out[:H, :W].reshape(-1)[:bins]


def _make_hist_bp2_packed_kernel(
    k: int, canonical: bool, chunk: int, w_bits: int, mode: str = "cmp"
):
    """Packed-plane front end for the bp2 histogram (r5, VERDICT weak
    #4): u32 word/invalid planes (the v2 encoder's wire format,
    ops/encode_pallas) -> SWAR funnel window extraction -> the SAME
    per-row one-hot NT accumulate as _make_hist_bp2_kernel.

    vs the u8 front end: input DMA drops 4x (0.375 B/base of planes vs
    1.0+ of bases — and the production dense path additionally pays an
    in-XLA unpack materialization when H2D ships packed), and window
    extraction is the encoder's 16-funnel family (~2 ops per 16 windows
    per residue) instead of k shift/or passes over the full window axis.
    Windows arrive in the v2 RESIDUE-PERMUTED order — irrelevant here,
    the histogram is a permutation-invariant reduction. Canonicalization
    rides the shared RC funnel family (rev16(~E[r]) masked to 2k bits),
    the same formulation that erased the sparse path's canonical tax.
    """
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        _dshift_digits,
        _rev16_digits,
    )

    if not (1 <= k <= 8):
        raise ValueError(f"packed bp2 kernel serves k <= 8, got {k}")
    W16 = chunk // 16
    mode, _, diag = mode.partition("+")

    def kernel(words_ref, inval_ref, whalo_ref, ihalo_ref, n_own_ref,
               ahi_ref, alo_ref, out_ref):
        t = pl.program_id(0)
        n_own = n_own_ref[0, 0]

        def u32(ref):
            return jax.lax.bitcast_convert_type(ref[:], jnp.uint32)

        P = jnp.concatenate([u32(words_ref), u32(whalo_ref)], axis=1)
        I = jnp.concatenate([u32(inval_ref), u32(ihalo_ref)], axis=1)
        # Host-staged planes arrive little-endian (zero-copy view of the
        # packed bytes); reverse to digit order with the 8-op butterfly.
        P = _rev16_digits(P)
        row_w = P.shape[1]

        def lroll(a, off):
            return pltpu.roll(a, row_w - off, axis=1) if off else a

        class _Rolls:
            def __init__(self, X):
                self._c = {0: X}

            def __getitem__(self, q):
                if q not in self._c:
                    self._c[q] = lroll(self._c[0], q)
                return self._c[q]

        # 16 funnel extracts: E[r][w] = 32 bits starting at digit 16w+r.
        E = [P]
        Pn = lroll(P, 1)
        for r in range(1, 16):
            E.append((P << (2 * r)) | (Pn >> (32 - 2 * r)))

        # Validity OR-spread over k digits (doubling ladder).
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

        if canonical:
            Rfam = [_rev16_digits(~e) for e in E]

        pos_base = (
            jax.lax.broadcasted_iota(jnp.int32, (8, W16), 1) * 16
            + (jax.lax.broadcasted_iota(jnp.int32, (8, W16), 0) + t * 8)
            * chunk
        )
        mask2k = jnp.uint32((1 << (2 * k)) - 1)
        code_pieces = []
        valid_pieces = []
        for r0 in range(16):
            lo = jax.lax.slice_in_dim(
                E[r0] >> (32 - 2 * k), 0, W16, axis=1
            )
            vdig = (
                jax.lax.slice_in_dim(V, 0, W16, axis=1) >> (30 - 2 * r0)
            ) & jnp.uint32(3)
            pos = pos_base + r0
            valid = (vdig == 0) & (pos < n_own)
            if canonical:
                rc_lo = (
                    jax.lax.slice_in_dim(Rfam[r0], 0, W16, axis=1)
                    & mask2k
                )
                lo = jnp.minimum(lo, rc_lo)
            code_pieces.append(
                jax.lax.bitcast_convert_type(lo, jnp.int32)
            )
            valid_pieces.append(valid.astype(jnp.int32))
        code = jnp.concatenate(code_pieces, axis=1)  # [8, chunk], permuted
        valid_i = jnp.concatenate(valid_pieces, axis=1)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = _bp2_accumulate(
            code, valid_i, ahi_ref[:], alo_ref[:], out_ref[:],
            k, w_bits, chunk, mode, diag,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "interpret", "mode")
)
def histogram_bp2_packed_pallas(
    words_le: jax.Array,
    inval_be: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool = False,
    interpret: bool = False,
    mode: str = "cmp",
) -> jax.Array:
    """Dense [bins] histogram from HOST-STAGED u32 planes (words_le /
    inval_be, host_planes_from_packfmt's wire format — 0.375 B/base of
    H2D) via the packed-plane bp2 kernel. Exact twin of
    histogram_bp2_pallas(bases, ...) for k <= 8; see
    _make_hist_bp2_packed_kernel for why this front end exists."""
    if bins != 4**k or k > 8:
        raise ValueError(
            f"packed bp2 serves bins == 4^k, k <= 8 (got k={k}, "
            f"bins={bins})"
        )
    W = min(128, _round_up(bins, 4))
    while W * W < bins:
        W *= 2
    H = max(bins // W, 1)
    Wp = _round_up(W, 128)
    Hp = _round_up(H, 8)
    w_bits = W.bit_length() - 1
    a_hi = jnp.asarray(_bp2_patterns(2 * k - w_bits, w_bits, Hp, H, k))
    a_lo = jnp.asarray(_bp2_patterns(w_bits, 0, Wp, W, k))

    # Same tile geometry as the packed encoder: W16 words per row must be
    # a 128-multiple, so chunk % 2048 == 0.
    chunk = int(os.environ.get("KMER_TPU_HIST_CHUNK_BP2P", "2048"))
    if chunk < 2048 or chunk % 2048:
        raise ValueError(
            "KMER_TPU_HIST_CHUNK_BP2P must be a positive multiple of "
            f"2048, got {chunk}"
        )
    W16 = chunk // 16
    span_w = 8 * W16
    Tw = words_le.shape[0]
    Twp = _round_up(max(Tw, span_w), span_w)
    n_tiles = Twp // span_w
    n_rows = n_tiles * 8
    ones = jnp.uint32(0xFFFFFFFF)
    if Tw == Twp:
        wmain = words_le.reshape(n_rows, W16)
        imain = inval_be.reshape(n_rows, W16)
    else:
        wmain = (
            jnp.zeros((Twp,), jnp.uint32).at[:Tw].set(words_le)
        ).reshape(n_rows, W16)
        imain = (
            jnp.full((Twp,), ones, jnp.uint32).at[:Tw].set(inval_be)
        ).reshape(n_rows, W16)
    whalo = jnp.concatenate(
        [wmain[1:, :128], jnp.zeros((1, 128), jnp.uint32)], axis=0
    )
    ihalo = jnp.concatenate(
        [imain[1:, :128], jnp.full((1, 128), ones, jnp.uint32)], axis=0
    )
    as_i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    kernel = _make_hist_bp2_packed_kernel(k, canonical, chunk, w_bits, mode)
    word_spec = pl.BlockSpec(
        (8, W16), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (8, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            word_spec,
            word_spec,
            halo_spec,
            halo_spec,
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (Hp, _BP2_PLANES), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Wp, _BP2_PLANES), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (Hp, Wp), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        as_i32(wmain),
        as_i32(imain),
        as_i32(whalo),
        as_i32(ihalo),
        jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1),
        a_hi,
        a_lo,
    )
    return out[:H, :W].reshape(-1)[:bins]


#: bins cap for ROUTING the bit-plane kernel: <= 64 (k <= 3 — the
#: reference's own workload band, kernels.h:14), where the bp2 NT matmul
#: would be MXU-latency-bound at H=1 tiny-M. From 256 bins up the bp2
#: compare kernel wins (measured v5e: k=4 7.16 vs bit-plane 4.52 vs
#: two-level 1.63-1.68 Gbase/s; k=5 7.04), so bp2 owns 256..65536.
_BP_ROUTE_MAX_BINS = 64


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "interpret")
)
def histogram_pallas(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Flat [T] uint8 base stream -> [bins] int32 histogram of windows
    starting at positions < n_own. Fully fused: the kernel reads raw uint8
    bases (VMEM) and does rolling-code encode + canonicalization + the
    histogram in one pass — no intermediate code arrays in HBM.

    Routing: tiny bins (<= _BP_ROUTE_MAX_BINS = 64, k <= 3) take the
    bit-plane agreement-matmul kernel (the bp2 NT matmul is MXU-latency-
    bound at H=1 there); 256 <= bins <= 65536 (k = 4..8) take the
    two-level NT outer product with compare-built one-hots (v5e,
    16M-base batches: k=4 7.16 / k=5 7.04 / k=6 6.38 / k=7 4.34 /
    k=8 2.08 Gbase/s — all above both alternatives); larger bins take
    the compare-based two-level MXU outer product.
    KMER_TPU_HIST_IMPL=twolevel|bitplane|bp2 forces a route (escape
    hatch; each within its own bins cap)."""
    impl = os.environ.get("KMER_TPU_HIST_IMPL", "")
    if impl == "bitplane" and bins <= _BP_MAX_BINS:
        return histogram_bitplane_pallas(
            bases, n_own, k, bins, canonical, interpret
        )
    if impl == "bp2" and bins <= _BP2_MAX_BINS:
        return histogram_bp2_pallas(
            bases, n_own, k, bins, canonical, interpret, mode="cmp"
        )
    if impl not in ("twolevel", "bitplane", "bp2"):
        if bins <= _BP_ROUTE_MAX_BINS:
            return histogram_bitplane_pallas(
                bases, n_own, k, bins, canonical, interpret
            )
        # bp2's H x W field split needs power-of-two bins (every k-mer
        # caller passes 4**k); other bin counts fall through to the
        # two-level kernel rather than raising.
        if bins <= _BP2_MAX_BINS and not (bins & (bins - 1)):
            return histogram_bp2_pallas(
                bases, n_own, k, bins, canonical, interpret, mode="cmp"
            )
    T = bases.shape[0]
    H, W = _split_hw(bins)
    chunk = int(os.environ.get("KMER_TPU_HIST_CHUNK", "512"))
    halo = k - 1
    # Lane-align the row width (non-multiple-of-128 block widths crash the
    # Mosaic compiler); the extra overlap columns beyond chunk+halo are
    # simply never sliced by the kernel.
    row_w = _round_up(chunk + halo, 128)
    rows_per_tile = 8
    span = chunk * rows_per_tile  # windows per tile
    Tp = _round_up(max(T, span), span)
    n_tiles = Tp // span
    n_rows = n_tiles * rows_per_tile
    rows = _overlapped_rows(bases, T, Tp, n_rows, chunk, row_w)

    max_rows = max((1 << 20) // W, 8)
    n_groups = max(_round_up(H, max_rows) // max_rows, 1)
    hi_group = _round_up(H, n_groups) // n_groups
    sentinel = H * W + W

    kernel = _make_hist2d_fused_kernel(
        k, canonical, chunk, H, W, hi_group, sentinel
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_groups * hi_group, W), jnp.int32),
        grid=(n_groups, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (rows_per_tile, row_w),
                lambda g, t: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (hi_group, W), lambda g, t: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((hi_group, W), jnp.int32)],
        interpret=interpret,
    )(rows, jnp.asarray(n_own, dtype=jnp.int32).reshape(1, 1))
    return out.reshape(-1)[:bins]
