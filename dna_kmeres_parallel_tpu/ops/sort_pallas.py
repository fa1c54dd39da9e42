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


# ---------------------------------------------------------------------------
# Owner-segment extraction (r5): the write side of the row-partitioned
# bucketed exchange (parallel/bucketed.py, VERDICT r4 weak #3)
# ---------------------------------------------------------------------------
#
# After a PER-ROW sort by the routing word, each row's owner-d windows
# form one contiguous segment [starts[r, d], starts[r, d+1]). Placing
# those segments into fixed [D, row_cap] send slots is per-element
# data movement at data-dependent positions — the operation XLA can only
# express as gather (measured 20x slower, r4) or scatter (measured 545x,
# r2). In-kernel it is ONE dynamic lane-rotation per (row, owner): roll
# the row left by starts[r, d] and keep the first row_cap lanes
# (capability probed: scripts/dynroll_probe.py, OK compiled on v5e).
# Grid (n_tiles, D): each step re-DMAs its input tile (D-fold input
# re-read — ~1 ms per 128 MB plane at D=8, noise next to the sort this
# design replaces) and writes owner d's [8, row_cap] block; everything
# beyond a segment is the all-ones sentinel the receivers' compactors
# already skip.


def _make_extract_kernel(n_planes: int, row_w: int, row_cap: int):
    # Whole-tile rolls, one per (row, owner): rolling the full [8, row_w]
    # block by row r's shift keeps ALL lanes busy (a [1, row_w]
    # single-sublane roll runs at 1/8 lane occupancy — the first cut of
    # this kernel did that and its extraction cost ate the entire row-
    # sort saving); only sublane r of each roll is correct, selected by
    # a sublane-id compare. 8 rolls + selects per (tile, owner, plane).
    def kernel(starts_ref, *refs):
        d = pl.program_id(1)
        in_refs = refs[:n_planes]
        out_refs = refs[n_planes:]
        sent = jnp.int32(-1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, row_cap), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, row_cap), 1)
        for p in range(n_planes):
            X = in_refs[p][:]
            acc = jnp.full((8, row_cap), sent, jnp.int32)
            for r in range(8):
                s = starts_ref[r, d]
                n = starts_ref[r, d + 1] - s
                shift = jax.lax.rem(row_w - s, row_w)
                rolled = jax.lax.slice_in_dim(
                    pltpu.roll(X, shift, axis=1), 0, row_cap, axis=1
                )
                keep = (sub == r) & (col < n)
                acc = jnp.where(keep, rolled, acc)
            out_refs[p][:] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("row_cap", "D", "interpret")
)
def extract_owner_segments(
    planes: tuple,
    starts_full: jax.Array,
    row_cap: int,
    D: int,
    interpret: bool = False,
) -> tuple:
    """Row-sorted planes -> per-owner fixed-capacity segments.

    planes: tuple of [n_rows, row_w] uint32 (row-sorted by planes[0];
    n_rows a multiple of 8). starts_full: [n_rows, D+1] int32 — owner
    d's segment in row r is [starts[r, d], starts[r, d+1]) (callers
    compute it as counts-below-edge on the sorted rows; column D is the
    first sentinel position). Returns same-length tuple of
    [n_rows, D * row_cap] uint32: owner d's slots at columns
    [d*row_cap, (d+1)*row_cap), all-ones sentinel beyond each segment.
    Segments longer than row_cap are truncated — callers MUST gate on
    the overflow flag (seg_len > row_cap) before using the result.
    """
    n_rows, row_w = planes[0].shape
    if n_rows % 8:
        raise ValueError(f"n_rows must be a multiple of 8, got {n_rows}")
    if row_cap % 128:
        raise ValueError(f"row_cap must be a 128-multiple, got {row_cap}")
    n_tiles = n_rows // 8
    n_planes = len(planes)
    as_i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    kernel = _make_extract_kernel(n_planes, row_w, row_cap)
    plane_spec = pl.BlockSpec(
        (8, row_w), lambda t, d: (t, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_rows, D * row_cap), jnp.int32)
            for _ in range(n_planes)
        ),
        grid=(n_tiles, D),
        in_specs=[
            pl.BlockSpec(
                (8, D + 1), lambda t, d: (t, 0), memory_space=pltpu.SMEM
            ),
        ]
        + [plane_spec] * n_planes,
        out_specs=tuple(
            pl.BlockSpec(
                (8, row_cap), lambda t, d: (t, d), memory_space=pltpu.VMEM
            )
            for _ in range(n_planes)
        ),
        interpret=interpret,
    )(starts_full.astype(jnp.int32), *[as_i32(p) for p in planes])
    return tuple(
        jax.lax.bitcast_convert_type(o, jnp.uint32) for o in out
    )
