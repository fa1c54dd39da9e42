"""The fused Pallas kernels INSIDE the sharded device programs.

Round-2 requirement: every multi-chip path must run the same fast fused
Pallas programs as the single-chip path (the reference has ONE device
program for its one GPU, /root/reference/main.cu:290 — ours must be the
fast one on every chip). These tests run the Pallas kernels in interpret
mode inside shard_map on the virtual 8-device CPU mesh and assert exact
oracle equality / bit-identity with the XLA-encode variants.
"""

import jax
import numpy as np
import pytest

from dna_kmeres_parallel_tpu.models import oracle
from dna_kmeres_parallel_tpu.models.oracle import count_table_any_k
from dna_kmeres_parallel_tpu.parallel import bucketed, sharded_count as sc, sharded_sparse
from dna_kmeres_parallel_tpu.parallel.mesh import make_mesh
from dna_kmeres_parallel_tpu.utils import codec


def _flat_stream(seqs):
    parts = []
    for i, s in enumerate(seqs):
        if i:
            parts.append(np.array([codec.INVALID_BASE], dtype=np.uint8))
        parts.append(codec.encode_bases(s))
    return np.concatenate(parts)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.mark.parametrize("k,canonical", [(3, False), (5, True)])
def test_dense_sharded_pallas_matches_oracle(make_dna, mesh8, k, canonical):
    seqs = [make_dna(211 + 37 * i, invalid_frac=0.02) for i in range(5)]
    flat = _flat_stream(seqs)
    stream = sc.device_put_sharded_stream(flat, mesh8)
    hist = sc.count_sharded(
        stream, k, codec.num_bins(k), canonical, mesh8, pallas="interpret"
    )
    want = sum(
        (oracle.count_vector(s, k, canonical=canonical) for s in seqs),
        np.zeros(codec.num_bins(k), dtype=np.int64),
    )
    assert np.array_equal(np.asarray(hist, dtype=np.int64), want)


@pytest.mark.parametrize(
    "k,canonical,device_sort",
    [(13, False, False), (21, False, False), (21, True, True), (17, False, True)],
)
def test_dp_sparse_sharded_pallas_matches_oracle(
    make_dna, k, canonical, device_sort
):
    seqs = [make_dna(130 + 31 * i, invalid_frac=0.02) for i in range(5)]
    flat = _flat_stream(seqs)
    mesh = make_mesh(8)
    codes, counts = sharded_sparse.count_sparse_sharded(
        flat, k, canonical, mesh, row_len=64,
        device_sort=device_sort, pallas="interpret",
    )
    want = count_table_any_k(seqs, k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, counts)}
    assert got == want


@pytest.mark.parametrize("owner_mode", ["prefix", "minimizer"])
@pytest.mark.parametrize("k,canonical", [(21, False), (21, True), (13, False)])
def test_bucketed_agg_pallas_matches_oracle(
    make_dna, mesh8, owner_mode, k, canonical
):
    seqs = [make_dna(150 + 11 * i, invalid_frac=0.02) for i in range(4)]
    flat = _flat_stream(seqs)
    shards, n_own = bucketed.shard_stream_with_halo(flat, k, mesh8)
    hi, lo, counts, starts, overflow = bucketed.count_bucket_sharded(
        jax.numpy.asarray(shards), jax.numpy.asarray(n_own), k, canonical,
        mesh8, owner_mode=owner_mode, pallas="interpret",
    )
    assert not bool(overflow)
    codes, cnts = bucketed.gather_table(hi, lo, counts, starts)
    want = count_table_any_k(seqs, k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, cnts)}
    assert got == want


@pytest.mark.parametrize("k", [13, 16, 21, 31])
def test_bucketed_raw_pallas_matches_oracle(make_dna, k):
    # k=16 exercises the u16-hi band (native-width planes through the
    # exchange); 13 the single-word band; 31 the u32-hi band.
    seqs = [make_dna(140 + 13 * i, invalid_frac=0.02) for i in range(4)]
    flat = _flat_stream(seqs)
    mesh = make_mesh(8)
    codes, cnts = bucketed.count_bucket_sharded_raw(
        flat, k, False, mesh, pallas="interpret"
    )
    want = count_table_any_k(seqs, k, False)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, cnts)}
    assert got == want


def test_bucketed_raw_pallas_bitidentical_to_xla(make_dna):
    flat = codec.encode_bases(make_dna(1200, invalid_frac=0.02))
    mesh = make_mesh(8)
    a = bucketed.count_bucket_sharded_raw(flat, 21, True, mesh, pallas=None)
    b = bucketed.count_bucket_sharded_raw(
        flat, 21, True, mesh, pallas="interpret"
    )
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])


def test_dp_sparse_pallas_bitidentical_to_xla(make_dna):
    flat = codec.encode_bases(make_dna(900, invalid_frac=0.02))
    mesh = make_mesh(8)
    a = sharded_sparse.count_sparse_sharded(
        flat, 21, False, mesh, device_sort=False, pallas=None
    )
    b = sharded_sparse.count_sparse_sharded(
        flat, 21, False, mesh, device_sort=False, pallas="interpret"
    )
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])


def test_dp_sparse_plane_route_matches_oracle(make_dna, mesh8):
    # The v2 plane-staged DP route (host plane shards + per-chip packed
    # kernel) == oracle, including a shard width that needs 16-alignment
    # padding and invalid bases.
    from dna_kmeres_parallel_tpu.parallel import sharded_sparse

    seqs = [make_dna(171 + 13 * i, invalid_frac=0.03) for i in range(5)]
    flat = _flat_stream(seqs)
    codes, counts = sharded_sparse.count_sparse_sharded(
        flat, 21, False, mesh8, device_sort=False, pallas="interpret"
    )
    want = count_table_any_k(seqs, 21)
    got = {codec.code_to_kmer(int(c), 21): int(n) for c, n in zip(codes, counts)}
    assert got == want


def test_dp_sparse_plane_route_off_matches_on(make_dna, mesh8, monkeypatch):
    # KMER_TPU_ENC_V2=0 (v1 per-shard kernel) produces the identical table.
    from dna_kmeres_parallel_tpu.ops import sparse as sp
    from dna_kmeres_parallel_tpu.parallel import sharded_sparse

    seqs = [make_dna(140 + 11 * i) for i in range(4)]
    flat = _flat_stream(seqs)
    on = sharded_sparse.count_sparse_sharded(
        flat, 17, False, mesh8, device_sort=False, pallas="interpret"
    )
    import warnings

    monkeypatch.setattr(sp, "_enc_v2_first_seen", None)
    monkeypatch.setenv("KMER_TPU_ENC_V2", "0")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        off = sharded_sparse.count_sparse_sharded(
            flat, 17, False, mesh8, device_sort=False, pallas="interpret"
        )
    assert np.array_equal(on[0], off[0]) and np.array_equal(on[1], off[1])


@pytest.mark.parametrize("k", [13, 21, 31])
def test_bucketed_raw_minimizer_planes_matches_oracle(make_dna, k):
    # Minimizer owner routing on the v2 plane-staged route: owners come
    # from the kernel's order-aligned minimizer plane (r4), not the
    # positional XLA scan — exact vs oracle across all key-word bands.
    seqs = [make_dna(150 + 13 * i, invalid_frac=0.02) for i in range(4)]
    flat = _flat_stream(seqs)
    mesh = make_mesh(8)
    codes, cnts = bucketed.count_bucket_sharded_raw(
        flat, k, False, mesh, owner_mode="minimizer", pallas="interpret"
    )
    want = count_table_any_k(seqs, k, False)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, cnts)}
    assert got == want


@pytest.mark.parametrize("owner_mode", ["prefix", "minimizer"])
def test_bucketed_agg_planes_driver_matches_oracle(make_dna, owner_mode):
    # The aggregated exchange through the plane-staging driver
    # (count_bucket_auto exchange='agg'): the v2 kernel runs on every
    # shard, canonical folding included.
    k = 21
    seqs = [make_dna(160 + 11 * i, invalid_frac=0.02) for i in range(4)]
    flat = _flat_stream(seqs)
    mesh = make_mesh(8)
    codes, cnts = bucketed.count_bucket_auto(
        flat, k, True, mesh, owner_mode=owner_mode, exchange="agg",
        pallas="interpret",
    )
    want = count_table_any_k(seqs, k, True)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, cnts)}
    assert got == want


def test_bucketed_minimizer_planes_bitidentical_to_positional(make_dna):
    # Same table whether owners come from the in-kernel minimizer plane
    # (v2 planes) or the positional scan (XLA encode) — the owner function
    # is shared, so routing is identical by construction.
    flat = codec.encode_bases(make_dna(1400, invalid_frac=0.02))
    mesh = make_mesh(8)
    a = bucketed.count_bucket_sharded_raw(
        flat, 21, False, mesh, owner_mode="minimizer", pallas=None
    )
    b = bucketed.count_bucket_sharded_raw(
        flat, 21, False, mesh, owner_mode="minimizer", pallas="interpret"
    )
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])
