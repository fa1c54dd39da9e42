"""Pallas in-VMEM bitonic row sort: [R, m] u32 segments, m a power of two.

XLA's lax.sort on [R, m] rows costs ~8.4 ms per 16M u32 at m=512 on v5e
(scripts/rowsort_probe2.py) — a generic comparison network with HBM
round-trips per exchange span. This kernel keeps whole segments in VMEM
and runs the classic bitonic network with lane rolls:

  for k in 2,4,..,m:            # bitonic block size
    for j in k/2,..,1:          # exchange distance (power of two)
      partner(i) = i ^ j        # = roll(x, -j) on lower half, roll(+j) upper
      keep min where (i & j == 0) == (i & k == 0), else max

log2(m)*(log2(m)+1)/2 passes, each ~8 VPU ops/element — pure compute, no
scatter, no data-dependent control flow. Unsigned order is preserved by
biasing into the signed domain (x ^ 0x80000000) since Mosaic compares are
int32 (uint compares/outputs are crash-prone; see histogram_pallas notes).

Used by the sparse path when KMER_TPU_PALLAS_SORT=1 (experimental): the
host loser-tree compactor consumes the same [rows, m] layout either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _make_kernel(rb: int, m: int):
    passes = []
    k = 2
    while k <= m:
        j = k >> 1
        while j >= 1:
            passes.append((k, j))
            j >>= 1
        k <<= 1

    def kernel(x_ref, o_ref):
        bias = jnp.int32(-(1 << 31))  # x ^ 0x80000000, int32 domain
        x = x_ref[:] ^ bias  # unsigned order -> signed order
        lane = jax.lax.broadcasted_iota(jnp.int32, (rb, m), 1)
        for kk, j in passes:  # static unroll: log2(m)*(log2(m)+1)/2 passes
            lower = (lane & j) == 0  # partner sits at i + j
            from_above = pltpu.roll(x, m - j, axis=1)  # value of i + j
            from_below = pltpu.roll(x, j, axis=1)  # value of i - j
            partner = jnp.where(lower, from_above, from_below)
            up = (lane & kk) == 0  # ascending bitonic block
            keep_min = lower == up
            x = jnp.where(
                keep_min, jnp.minimum(x, partner), jnp.maximum(x, partner)
            )
        o_ref[:] = x ^ bias

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_sort_pallas_u32(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Sort each row of a [R, m] uint32 array ascending (m = power of two,
    multiple of 128; R a multiple of 8)."""
    R, m = x.shape
    if m & (m - 1) or m % 128:
        raise ValueError(f"m={m} must be a power of two and lane-aligned")
    if R % 8:
        raise ValueError(f"R={R} must be a multiple of 8")
    rb = min(R, max(8, (1 << 20) // (4 * m) // 8 * 8))  # ~1MB block
    while R % rb:
        rb //= 2
    rb = max(rb, 8)
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    out = pl.pallas_call(
        _make_kernel(rb, m),
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, m), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rb, m), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, m), jnp.int32),
        interpret=interpret,
    )(xi)
    return jax.lax.bitcast_convert_type(out, jnp.uint32)
