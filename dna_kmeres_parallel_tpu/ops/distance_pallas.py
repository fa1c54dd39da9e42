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

B (padded bins) is static and must be modest (<= 512: unrolled loop); this
covers the reference workload k=3/4 (64/256 bins). Larger-k distances route
to the jnp path in ops/distance.py.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _min_sum_kernel(a_ref, ct_ref, out_ref, n_bins: int | None = None):
    """a_ref: [TI, B] int32; ct_ref: [B, TJ] int32; out_ref: [TI, TJ] int32.

    n_bins: REAL bin count — the arrays are lane-padded to a 128 multiple,
    and padding bins are all-zero (min(0,0)=0 contributes nothing), so the
    loop skips them: at k=3 (64 bins padded to 128) that halves the
    kernel's work."""
    B = a_ref.shape[1] if n_bins is None else n_bins
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for b in range(B):  # static unroll; B <= _MAX_UNROLL_B
        col = a_ref[:, b : b + 1]  # [TI, 1] broadcast over lanes
        row = ct_ref[b : b + 1, :]  # [1, TJ] broadcast over sublanes
        acc = acc + jnp.minimum(col, row)
    out_ref[:] = acc


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
    if B > _MAX_UNROLL_B:
        raise ValueError(
            f"pallas min-sum kernel supports bins <= {_MAX_UNROLL_B}, got {B}"
        )
    T = 256
    Sp = _round_up(max(S, 8), T)
    Bp = _round_up(B, 128)
    padded = jnp.zeros((Sp, Bp), jnp.int32).at[:S, :B].set(counts)
    transposed = padded.T
    nt = Sp // T
    coords = [(i, j) for i in range(nt) for j in range(i, nt)]
    ti = jnp.asarray([c[0] for c in coords], jnp.int32)
    tj = jnp.asarray([c[1] for c in coords], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(coords),),
        in_specs=[
            pl.BlockSpec((T, Bp), lambda t, ti, tj: (ti[t], 0)),
            pl.BlockSpec((Bp, T), lambda t, ti, tj: (0, tj[t])),
        ],
        out_specs=pl.BlockSpec((T, T), lambda t, ti, tj: (ti[t], tj[t])),
    )
    def kernel(ti_ref, tj_ref, a_ref, ct_ref, out_ref):
        del ti_ref, tj_ref  # consumed by the index maps only
        _min_sum_kernel(a_ref, ct_ref, out_ref, n_bins=B)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sp, Sp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ti, tj, padded, transposed)
    # Mirror: entries below the diagonal take the transposed (computed)
    # value, overwriting the never-written lower tiles.
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
    if B > _MAX_UNROLL_B:
        raise ValueError(
            f"pallas min-sum kernel supports bins <= {_MAX_UNROLL_B}, got {B}"
        )
    Sp = _round_up(max(S, 8), _TI)
    S2p = _round_up(max(S2, 8), _TJ)
    Bp = _round_up(B, 128)
    padded = jnp.zeros((Sp, Bp), jnp.int32).at[:S, :B].set(counts)
    other_p = jnp.zeros((S2p, Bp), jnp.int32).at[:S2, :B].set(other)
    transposed = other_p.T  # [Bp, S2p]

    grid = (Sp // _TI, S2p // _TJ)
    out = pl.pallas_call(
        functools.partial(_min_sum_kernel, n_bins=B),
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
