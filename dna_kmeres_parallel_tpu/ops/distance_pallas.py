"""Pallas TPU kernel: tiled integer (min,+) pairwise reduction.

The TPU-native replacement for the reference's step-2 — n synchronous
one-query-per-launch kernels (/root/reference/main.cu:327-335, kernels.h:85-109)
— as ONE tiled program over the [S, bins] counts matrix:

  grid (S/TI, S/TJ); cell (i, j) loads counts[i-tile] [TI, B] and the
  transposed counts[j-tile] [B, TJ] into VMEM and accumulates
  sum_b min(a[i,b], c[b,j]) on the VPU with an unrolled static loop over b
  (a [TI,1] sublane-broadcast min'd against a [1,TJ] lane-broadcast per b).

Integer in, integer out: the float distance formula is applied downstream by
ops.distance.finish_distances for bit-exact parity (SURVEY.md §2.4.4).

Bins beyond one slab (256, the widest the toolchain compiles — Mosaic
materializes one ~64 KiB scoped temp per unrolled bin) accumulate across
a lax.scan of single-slab calls, covering all bins <= 64K (k <= 8).
Larger-k
distances route to the jnp path in ops/distance.py (and beyond dense, the
sparse-table engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TI = 256
_TJ = 256
#: bins cap for the fused kernels (sliced accumulation; larger k is the
#: sparse engine's regime)
_MAX_BINS = 65536

#: engine routing gate alias (see tri_route_ok — the full k <= 8 dense
#: band routes through the scan-sliced kernels)
_ROUTE_MAX_BINS = 65536

#: widest bin slice per pallas call: Mosaic materializes one ~64 KiB
#: scoped temp PER UNROLLED bin of the (min,+) slab (r3 bisection:
#: 256-unroll = 16.31M scoped, 512-unroll = 32.33M against the 16 MiB
#: limit — constant in S and total bins), so slabs stay at 256 and
#: larger bins accumulate across a lax.scan of SEPARATE single-slab
#: calls (one kernel instance: an unrolled python loop of >32 instances
#: re-trips the scoped limit). The scan keeps each per-call transpose
#: at [256, S], so no bins-scaling relayout buffer ever lands on the
#: scoped-VMEM stack either.
_SLICE_BINS = 256


def tri_route_ok(S: int, bins: int) -> bool:
    """Whether min_sum_matrix_pallas_tri is routable for this shape on
    the current toolchain: single-slab shapes directly, wider bins via a
    lax.scan of single-slab calls (one kernel instance — verified
    compiling + exact at 64K bins, S=2048, on hardware)."""
    del S  # tile-stack outputs made the kernel S-independent
    return bins <= _MAX_BINS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _min_sum_slab(a_ref, ct_ref, unroll: int):
    """One [TI, bt] x [bt, TJ] (min,+) slab -> [TI, TJ] partial sums.

    unroll: REAL bins in this slab — arrays are lane-padded to a 128
    multiple and padding bins are all-zero (min(0,0)=0 contributes
    nothing), so a single-slab call skips them: at k=3 (64 bins padded to
    128) that halves the kernel's work.
    """
    acc = None
    for b in range(unroll):  # static unroll; unroll <= _MAX_UNROLL_B
        col = a_ref[:, b : b + 1]  # [TI, 1] broadcast over lanes
        row = ct_ref[b : b + 1, :]  # [1, TJ] broadcast over sublanes
        term = jnp.minimum(col, row)
        acc = term if acc is None else acc + term
    return acc


def _min_sum_kernel(a_ref, ct_ref, out_ref, n_bins: int | None = None):
    """Single-slab variant (bins fit one unroll): [TI, B] x [B, TJ]."""
    B = a_ref.shape[1] if n_bins is None else n_bins
    out_ref[:] = _min_sum_slab(a_ref, ct_ref, B)


def _tri_single_slice(counts: jax.Array, interpret: bool) -> jax.Array:
    """One <=_SLICE_BINS-wide bin slice of the tri kernel (the only shape
    the toolchain compiles; see _SLICE_BINS). Returns the [S, S] min-sum
    partial for this slice."""
    S, B = counts.shape
    T = 256
    Sp = _round_up(max(S, 8), T)
    Bp = _round_up(B, 128)
    padded = jnp.zeros((Sp, Bp), jnp.int32).at[:S, :B].set(counts)
    transposed = padded.T
    nt = Sp // T
    coords = [(i, j) for i in range(nt) for j in range(i, nt)]
    ti = jnp.asarray([c[0] for c in coords], jnp.int32)
    tj = jnp.asarray([c[1] for c in coords], jnp.int32)
    # The output is a [n_tiles, T, T] TILE STACK, not the [Sp, Sp] matrix:
    # XLA places a pallas result on the scoped VMEM stack, and at S=2048
    # the 16 MiB [S, S] matrix alone exceeds the 16 MiB scoped limit
    # (measured r3). Tile blocks are 256 KiB; assembly runs as plain XLA.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(coords),),
        in_specs=[
            pl.BlockSpec((T, Bp), lambda t, ti, tj: (ti[t], 0)),
            pl.BlockSpec((Bp, T), lambda t, ti, tj: (0, tj[t])),
        ],
        out_specs=pl.BlockSpec((1, T, T), lambda t, ti, tj: (t, 0, 0)),
    )

    def kernel(ti_ref, tj_ref, a_ref, ct_ref, out_ref):
        del ti_ref, tj_ref  # consumed by the index maps only
        _min_sum_kernel(a_ref, ct_ref, out_ref.at[0], n_bins=B)

    tiles = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((len(coords), T, T), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ti, tj, padded, transposed)
    # Assemble [Sp, Sp] from the tile stack with ONE gather + reshape
    # (a per-tile dynamic_update_slice unroll would grow the traced
    # program O(nt^2)). Lower-triangle cells gather their MIRROR tile
    # untransposed (junk values there); the mirror pass below replaces
    # them with the transposed upper values.
    import numpy as _np

    order = _np.zeros((nt, nt), _np.int32)
    for t, (i, j) in enumerate(coords):
        order[i, j] = t
        order[j, i] = t
    grid_t = tiles[jnp.asarray(order.reshape(-1))]  # [nt*nt, T, T]
    out = (
        grid_t.reshape(nt, nt, T, T)
        .transpose(0, 2, 1, 3)
        .reshape(Sp, Sp)
    )
    r = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out = jnp.where(r <= c, out, out.T)
    return out[:S, :S]


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_sum_matrix_pallas_tri(
    counts: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Symmetric all-pairs min-sum computing ONLY upper-triangle tiles.

    min(a,b) is symmetric, so the strict lower triangle of the [S, S]
    matrix is redundant — a 1-D grid over the nt*(nt+1)/2 upper-triangle
    tile coordinates (scalar-prefetched index maps) does ~2x less work
    than the rectangular grid. Bins wider than _SLICE_BINS accumulate
    across separate single-slab calls (Mosaic allocates one ~64 KiB
    scoped temp per unrolled bin — wider slabs do not compile; see
    _SLICE_BINS / BENCHMARKS.md). Callers gate by tri_route_ok.
    """
    S, B = counts.shape
    if B > _MAX_BINS:
        raise ValueError(
            f"pallas min-sum kernel supports bins <= {_MAX_BINS}, got {B}"
        )
    if B <= _SLICE_BINS:
        return _tri_single_slice(counts, interpret)
    # lax.scan over bin slices: ONE kernel instance regardless of slice
    # count (an unrolled python loop of pallas calls re-trips the scoped-
    # VMEM limit past 32 instances AND grows compile time linearly).
    nb = -(-B // _SLICE_BINS)
    Bp = nb * _SLICE_BINS
    cp = counts if Bp == B else jnp.pad(counts, ((0, 0), (0, Bp - B)))
    slices = cp.reshape(S, nb, _SLICE_BINS).transpose(1, 0, 2)

    def body(acc, sl):
        return acc + _tri_single_slice(sl, interpret), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((S, S), jnp.int32), slices
    )
    return acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_sum_matrix_pallas(
    counts: jax.Array,
    counts_other: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """[S, bins] x [S2, bins] int32 -> [S, S2] int32 min-sum matrix.

    counts_other defaults to counts (the symmetric all-pairs case); passing
    a row panel as ``counts`` against the full matrix as ``counts_other``
    yields one panel of the distance matrix — the streamed big-S path.

    Rows are zero-padded to the tile size; zero rows produce zero min-sums
    and are sliced off. Bins are zero-padded to the lane width; zero bins
    contribute min(0,0)=0, preserving exactness.
    """
    other = counts if counts_other is None else counts_other
    S, B = counts.shape
    if B > _MAX_BINS:
        raise ValueError(
            f"pallas min-sum kernel supports bins <= {_MAX_BINS}, got {B}"
        )
    if B > _SLICE_BINS:
        # lax.scan over <=_SLICE_BINS bin slices — one kernel instance
        # (see min_sum_matrix_pallas_tri; wider slabs do not compile).
        S2 = other.shape[0]
        nb = -(-B // _SLICE_BINS)
        Bp = nb * _SLICE_BINS
        cp = counts if Bp == B else jnp.pad(counts, ((0, 0), (0, Bp - B)))
        op = other if Bp == B else jnp.pad(other, ((0, 0), (0, Bp - B)))
        c_sl = cp.reshape(S, nb, _SLICE_BINS).transpose(1, 0, 2)
        o_sl = op.reshape(S2, nb, _SLICE_BINS).transpose(1, 0, 2)

        def body(acc, xs):
            a, b = xs
            return acc + min_sum_matrix_pallas(a, b, interpret), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((S, S2), jnp.int32), (c_sl, o_sl)
        )
        return acc
    S2 = other.shape[0]
    Sp = _round_up(max(S, 8), _TI)
    S2p = _round_up(max(S2, 8), _TJ)
    Bp = _round_up(B, 128)
    padded = jnp.zeros((Sp, Bp), jnp.int32).at[:S, :B].set(counts)
    other_p = jnp.zeros((S2p, Bp), jnp.int32).at[:S2, :B].set(other)
    transposed = other_p.T  # [Bp, S2p]

    kernel = functools.partial(_min_sum_kernel, n_bins=B)
    grid = (Sp // _TI, S2p // _TJ)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sp, S2p), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_TI, Bp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Bp, _TJ), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TI, _TJ), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Sp * S2p * Bp,
            bytes_accessed=(Sp + S2p) * Bp * 4 + Sp * S2p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(padded, transposed)
    return out[:S, :S2]
