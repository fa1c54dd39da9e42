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

Bins beyond the per-step unroll budget (512) are TILED over an extra grid
dimension: the output tile stays resident in VMEM while consecutive grid
steps accumulate one 512-bin slab each, so any bins <= _MAX_BINS (64K =
k <= 8, the dense-distance regime) runs in one fused program. Larger-k
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
_MAX_UNROLL_B = 512
#: bins cap for the fused kernels (bins-tiled accumulation; 4^8 = 64K
#: covers every dense-histogram k — larger k is the sparse engine's regime)
_MAX_BINS = 65536

#: bins cap for ROUTING production distances through these kernels on the
#: CURRENT remote toolchain (r3 finding): any shape using the bins-TILED
#: kernel branch (nb > 1, i.e. bins > _MAX_UNROLL_B = 512) fails to
#: compile with a CONSTANT ~31.76M scoped-VMEM demand against the 16 MiB
#: limit — independent of S and bins — while single-slab shapes compile
#: and run exactly (verified: 256 bins x S=2048, 35 s compile, exact on
#: hardware). 256 covers the reference's own k<=4 band; k=5..8 route to
#: the jnp (min,+) path, which measures ~0.5 T int-ops/s at k=8 (3.1-3.8M
#: pairs/s) — already near the VPU ceiling for this op mix, so the
#: routing cost is small. The engine also falls back to jnp at runtime on
#: any kernel compile failure (engine.distance_sequences).
_ROUTE_MAX_BINS = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _transpose_strips(padded: jax.Array, strip: int = 2048) -> jax.Array:
    """[S, B] -> [B, S] as a concat of column-strip transposes.

    A single whole-array transpose feeding the pallas custom call makes
    XLA stage a bins-scaling relayout buffer on the 16 MiB scoped-VMEM
    stack (measured r3: 64K bins OOM the compile even with tiny S).
    Strip-wise transposes bound the scratch at ~[128, strip]."""
    S, B = padded.shape
    if B <= strip:
        return padded.T
    parts = [
        padded[:, i : i + strip].T for i in range(0, B, strip)
    ]
    return jnp.concatenate(parts, axis=0)


def _bin_tiling(B: int) -> tuple[int, int, int]:
    """(Bp, bt, nb): lane-padded bins, bin-tile width, number of bin tiles."""
    if B > _MAX_BINS:
        raise ValueError(
            f"pallas min-sum kernel supports bins <= {_MAX_BINS}, got {B}"
        )
    Bp = _round_up(B, 128)
    bt = min(Bp, _MAX_UNROLL_B)
    Bp = _round_up(Bp, bt)
    return Bp, bt, Bp // bt


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


def _min_sum_kernel_tiled(a_ref, ct_ref, out_ref, bt: int, bin_dim: int):
    """Bins-tiled variant: grid dim ``bin_dim`` walks bin slabs (fastest
    axis, so the out block stays resident and accumulates across steps)."""
    b_idx = pl.program_id(bin_dim)

    slab = _min_sum_slab(a_ref, ct_ref, bt)

    @pl.when(b_idx == 0)
    def _():
        out_ref[:] = slab

    @pl.when(b_idx != 0)
    def _():
        out_ref[:] = out_ref[:] + slab


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_sum_matrix_pallas_tri(
    counts: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Symmetric all-pairs min-sum computing ONLY upper-triangle tiles.

    min(a,b) is symmetric, so the strict lower triangle of the [S, S]
    matrix is redundant — a 1-D grid over the nt*(nt+1)/2 upper-triangle
    tile coordinates (scalar-prefetched index maps) does ~2x less work
    than the rectangular grid. The kernel never writes tiles strictly
    below the diagonal; the returned matrix is made fully valid by
    mirroring the upper triangle (one cheap elementwise pass — no
    comment-only "read i <= j" contract for consumers to violate).
    """
    S, B = counts.shape
    T = 256
    Sp = _round_up(max(S, 8), T)
    Bp, bt, nb = _bin_tiling(B)
    padded = jnp.zeros((Sp, Bp), jnp.int32).at[:S, :B].set(counts)
    transposed = _transpose_strips(padded)
    nt = Sp // T
    coords = [(i, j) for i in range(nt) for j in range(i, nt)]
    ti = jnp.asarray([c[0] for c in coords], jnp.int32)
    tj = jnp.asarray([c[1] for c in coords], jnp.int32)
    # Bin slabs are the FASTEST grid axis: the out block index is constant
    # across them, so the accumulator tile stays resident in VMEM.
    #
    # The output is a [n_tiles, T, T] TILE STACK, not the [Sp, Sp] matrix:
    # XLA places a pallas result it deems small enough on the scoped VMEM
    # stack, and at S=2048 the 16 MiB [S, S] matrix alone exceeds the
    # 16 MiB scoped limit (measured r3: 'Scoped allocation with size
    # 16.31M ... exceeded by 320K' — the kernel never compiled at the
    # bins the r2 routing claimed). Tile blocks are 256 KiB; the
    # assembly below runs as plain XLA on HBM.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(coords), nb),
        in_specs=[
            pl.BlockSpec((T, bt), lambda t, b, ti, tj: (ti[t], b)),
            pl.BlockSpec((bt, T), lambda t, b, ti, tj: (b, tj[t])),
        ],
        out_specs=pl.BlockSpec((1, T, T), lambda t, b, ti, tj: (t, 0, 0)),
    )

    def kernel(ti_ref, tj_ref, a_ref, ct_ref, out_ref):
        del ti_ref, tj_ref  # consumed by the index maps only
        if nb == 1:
            _min_sum_kernel(a_ref, ct_ref, out_ref.at[0], n_bins=B)
        else:
            _min_sum_kernel_tiled(a_ref, ct_ref, out_ref.at[0], bt, bin_dim=1)

    tiles = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((len(coords), T, T), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ti, tj, padded, transposed)
    # Assemble [Sp, Sp] from the tile stack with ONE gather + reshape
    # (a per-tile dynamic_update_slice unroll would grow the traced
    # program O(nt^2) — 22K+ ops at the 54K design scale). Lower-triangle
    # cells gather their MIRROR tile untransposed (junk values there);
    # the mirror pass below replaces them with the transposed upper
    # values, so only upper tiles are ever computed.
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
    S2 = other.shape[0]
    Sp = _round_up(max(S, 8), _TI)
    S2p = _round_up(max(S2, 8), _TJ)
    Bp, bt, nb = _bin_tiling(B)
    padded = jnp.zeros((Sp, Bp), jnp.int32).at[:S, :B].set(counts)
    other_p = jnp.zeros((S2p, Bp), jnp.int32).at[:S2, :B].set(other)
    transposed = other_p.T  # [Bp, S2p]

    if nb == 1:
        kernel = functools.partial(_min_sum_kernel, n_bins=B)
    else:
        kernel = functools.partial(
            _min_sum_kernel_tiled, bt=bt, bin_dim=2
        )
    # Bin slabs innermost: the out block accumulates in VMEM across them.
    grid = (Sp // _TI, S2p // _TJ, nb)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sp, S2p), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_TI, bt), lambda i, j, b: (i, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, _TJ), lambda i, j, b: (b, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TI, _TJ), lambda i, j, b: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Sp * S2p * Bp,
            bytes_accessed=(Sp + S2p) * Bp * 4 + Sp * S2p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(padded, transposed)
    return out[:S, :S2]
