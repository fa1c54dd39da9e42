"""Data-parallel SPARSE counting: per-chip row-sorted shards, host merge.

The k=21 multi-chip configuration (BASELINE config 4) when the distinct
table fits host memory: each device encodes + row-sorts its own stream
shard (halo-carrying, like the dense DP path), the host compacts each
device's rows with the native loser-tree merge and tree-merges the
per-device tables — pure integer merges, so the result is bit-identical
to a single-device count at any device count (SURVEY.md §4 determinism).

This is the collective-free DP alternative to parallel/bucketed.py (which
routes codes to owner chips over all_to_all so no single host ever holds
the whole table): DP-sparse moves D2H volume ~ windows, bucketed moves
ICI volume ~ distinct codes. For a single host with 4 chips, DP-sparse is
the simpler and faster plan; for k=31 pod-scale tables, bucketed.

Reference contrast: the CUDA program is single-GPU (SURVEY.md §2.5); this
subsumes its step-1 counting across chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops
from dna_kmeres_parallel_tpu.parallel.mesh import DATA_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "mesh", "axis", "row_len", "pallas"),
)
def sort_words_rows_sharded(
    bases: jax.Array,
    n_own_per_shard: jax.Array,
    k: int,
    canonical: bool,
    mesh: jax.sharding.Mesh,
    axis: str = DATA_AXIS,
    row_len: int = 2048,
    pallas: str | None = None,
):
    """[D, T + k - 1] halo-carrying stream shards -> per-device row-sorted
    word planes [D, rows, row_len] (see ops/sparse.sort_words_rows).

    Each device sorts only its own shard — no collectives; the exact merge
    happens on host (count_sparse_sharded). Shards carry their k-1 halo and
    n_own_per_shard[d] owned windows, so every window is counted exactly
    once (halo rule, SURVEY.md §5).

    pallas='compiled'/'interpret' routes each shard's encode through the
    fused Pallas kernel (ops/encode_pallas.py) — the same ~10x-faster
    encode the single-chip path runs; every chip of the mesh must run the
    fast program, not the XLA fallback.
    """

    def shard_fn(b, n_own):
        b = b.reshape(-1)
        n_own = n_own.reshape(())
        # The per-shard program IS the single-device row-sorted program —
        # one implementation, so the DP-sparse table stays bit-identical to
        # a single-device count at any device count.
        out = sparse_ops._encode_and_sort_rows(
            b, n_own, k, canonical, pallas, row_len
        )
        return tuple(o[None] for o in out)

    n_words = 1 if k <= sparse_ops.MAX_SINGLE_WORD_K else 2
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=tuple(P(axis, None, None) for _ in range(n_words)),
        check_vma=False,
    )
    return fn(bases, n_own_per_shard)


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "mesh", "axis", "pallas"),
)
def encode_words_sharded(
    bases: jax.Array,
    n_own_per_shard: jax.Array,
    k: int,
    canonical: bool,
    mesh: jax.sharding.Mesh,
    axis: str = DATA_AXIS,
    pallas: str | None = None,
):
    """[D, T + k - 1] halo-carrying stream shards -> per-device UNSORTED
    word planes [D, N] — the no-device-sort DP variant: each device runs
    the encode kernel alone and the host radix compactor
    (sparse_engine.compact_unsorted) absorbs each plane. See
    KmerConfig.device_sort.

    pallas='compiled' runs the fused Pallas encoder per shard (the
    production mode on TPU: encode-only at the HBM streaming bound on
    every chip); 'interpret' for CI; None falls back to the XLA encode.
    N is T-k+1 on the XLA path, T rounded up to the encoder tile span on
    the Pallas path (sentinel tail, ignored by the host compactor)."""

    def shard_fn(b, n_own):
        b = b.reshape(-1)
        n_own = n_own.reshape(())
        out = sparse_ops._encode_words(b, n_own, k, canonical, pallas)
        return tuple(o[None] for o in out)

    n_words = 1 if k <= sparse_ops.MAX_SINGLE_WORD_K else 2
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=tuple(P(axis, None) for _ in range(n_words)),
        check_vma=False,
    )
    return fn(bases, n_own_per_shard)


def stage_shard_planes(shards: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side plane staging for the DP-sparse v2 route: [D, Ts] uint8
    halo-carrying shards -> ([D, Tw] words_le_u32, [D, Tw] inval_be_u32).

    Rows pad to a 16-base multiple with INVALID (pad windows are invalid
    or beyond n_own either way), then ONE flattened pack + plane build
    serves all rows (row spans stay byte-aligned). See engine.
    stage_batch_planes for why planes are built host-side (the in-jit
    conversion measured 4x the kernel's cost)."""
    from dna_kmeres_parallel_tpu.models.engine import pack_planes_np
    from dna_kmeres_parallel_tpu.ops.encode import INVALID

    D, Ts = shards.shape
    Tp = -(-Ts // 16) * 16
    if Tp != Ts:
        padded = np.full((D, Tp), INVALID, dtype=np.uint8)
        padded[:, :Ts] = shards
    else:
        padded = shards
    w_le, iv_be = pack_planes_np(np.ascontiguousarray(padded).reshape(-1))
    return w_le.reshape(D, -1), iv_be.reshape(D, -1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "mesh", "axis", "interpret"),
)
def encode_words_planes_sharded(
    words_le: jax.Array,
    inval_be: jax.Array,
    n_own_per_shard: jax.Array,
    k: int,
    canonical: bool,
    mesh: jax.sharding.Mesh,
    axis: str = DATA_AXIS,
    interpret: bool = False,
):
    """The v2 DP-sparse device program: HOST-STAGED u32 plane shards
    [D, Tw] -> per-device UNSORTED word planes. Each chip runs the packed
    SWAR kernel ALONE (ops/encode_pallas, words_le route — measured 4.1x
    the v1 kernel single-chip); the host radix compactor absorbs each
    device's plane exactly as in encode_words_sharded."""

    def shard_fn(w, iv, n_own):
        from dna_kmeres_parallel_tpu.ops.encode_pallas import (
            rolling_codes_split_packed_pallas,
        )

        w = w.reshape(-1)
        iv = iv.reshape(-1)
        n_own = n_own.reshape(())
        hi, lo = rolling_codes_split_packed_pallas(
            w, iv, n_own, k, canonical, interpret=interpret, words_le=True
        )
        if hi is not None and hi.dtype == jnp.uint16:
            out = (hi, lo)
        elif k <= sparse_ops.MAX_SINGLE_WORD_K:
            out = (lo,)
        else:
            out = (hi, lo)
        return tuple(o[None] for o in out)

    n_words = 1 if k <= sparse_ops.MAX_SINGLE_WORD_K else 2
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=tuple(P(axis, None) for _ in range(n_words)),
        check_vma=False,
    )
    return fn(words_le, inval_be, n_own_per_shard)


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "mesh", "axis", "row_len", "interpret"),
)
def sort_words_rows_planes_sharded(
    words_le: jax.Array,
    inval_be: jax.Array,
    n_own_per_shard: jax.Array,
    k: int,
    canonical: bool,
    mesh: jax.sharding.Mesh,
    axis: str = DATA_AXIS,
    row_len: int = 2048,
    interpret: bool = False,
):
    """The v2 DEVICE-SORT DP program: host-staged plane shards [D, Tw] ->
    per-device row-sorted word planes [D, rows, row_len]. Each chip runs
    the packed SWAR kernel (the 2.5x-measured v2 encode) followed by the
    independent row sorts; rows sort segments of the residue-permuted
    stream, which the host row compactor merges as bags — identical
    tables to the v1 route at any device count."""

    def shard_fn(w, iv, n_own):
        words = sparse_ops.encode_words_planes(
            w.reshape(-1), iv.reshape(-1), n_own.reshape(()), k, canonical,
            interpret=interpret,
        )
        out = sparse_ops._sort_words_as_rows(
            words, "interpret" if interpret else "compiled", row_len
        )
        return tuple(o[None] for o in out)

    n_words = 1 if k <= sparse_ops.MAX_SINGLE_WORD_K else 2
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=tuple(P(axis, None, None) for _ in range(n_words)),
        check_vma=False,
    )
    return fn(words_le, inval_be, n_own_per_shard)


def count_sparse_sharded(
    flat: np.ndarray,
    k: int,
    canonical: bool,
    mesh: jax.sharding.Mesh,
    axis: str = DATA_AXIS,
    row_len: int = 2048,
    total_own=None,
    device_sort: bool = True,
    pallas: str | None = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Flat encoded stream -> exact sorted (codes_u64, counts_i64) table,
    counted data-parallel across the mesh (one shard per device).
    total_own: see shard_stream_with_halo (streaming batch-overlap rule).
    device_sort=False runs encode-only shards + the host radix compactor.
    pallas: 'auto' resolves per backend (compiled on TPU — the fused
    encoder runs on every chip); pass None/'interpret' to override."""
    from dna_kmeres_parallel_tpu.models.sparse_engine import (
        compact_table,
        compact_unsorted,
        fetch_words,
        merge_sparse_tables,
    )
    from dna_kmeres_parallel_tpu.parallel.bucketed import shard_stream_with_halo

    if pallas == "auto":
        from dna_kmeres_parallel_tpu.ops import runtime

        pallas = runtime.pallas_mode()
    shards, n_own = shard_stream_with_halo(flat, k, mesh, axis, total_own)
    if device_sort and pallas is not None and sparse_ops._enc_v2_active():
        # v2 plane-staged route + device row sorts (non-native hosts).
        w_le, iv_be = stage_shard_planes(shards)
        words = sort_words_rows_planes_sharded(
            jnp.asarray(w_le),
            jnp.asarray(iv_be),
            jnp.asarray(n_own),
            k,
            canonical,
            mesh,
            axis,
            row_len,
            interpret=(pallas == "interpret"),
        )
    elif device_sort:
        words = sort_words_rows_sharded(
            jnp.asarray(shards),
            jnp.asarray(n_own),
            k,
            canonical,
            mesh,
            axis,
            row_len,
            pallas=pallas,
        )
    elif pallas is not None and sparse_ops._enc_v2_active():
        # v2 plane-staged route: each chip runs the packed kernel alone.
        w_le, iv_be = stage_shard_planes(shards)
        words = encode_words_planes_sharded(
            jnp.asarray(w_le),
            jnp.asarray(iv_be),
            jnp.asarray(n_own),
            k,
            canonical,
            mesh,
            axis,
            interpret=(pallas == "interpret"),
        )
    else:
        words = encode_words_sharded(
            jnp.asarray(shards),
            jnp.asarray(n_own),
            k,
            canonical,
            mesh,
            axis,
            pallas=pallas,
        )
    words = fetch_words(words)
    D = words[-1].shape[0]
    tables = [
        compact_table(tuple(w[d] for w in words))
        if device_sort
        else compact_unsorted(tuple(w[d] for w in words), k)
        for d in range(D)
    ]
    return merge_sparse_tables(tables)
