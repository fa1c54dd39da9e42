"""Sparse (sorted-table) engine tests: split codes, RLE, merge, large k."""

import jax.numpy as jnp
import numpy as np
import pytest

from dna_kmeres_parallel_tpu.models import oracle
from dna_kmeres_parallel_tpu.models.sparse_engine import (
    SparseKmerEngine,
    merge_sparse_tables,
)
from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops
from dna_kmeres_parallel_tpu.utils import codec
from dna_kmeres_parallel_tpu.utils.config import KmerConfig


@pytest.mark.parametrize("k", [13, 16, 17, 21, 31])
def test_split_codes_match_host(make_dna, k):
    s = make_dna(300, invalid_frac=0.03)
    bases = jnp.asarray(codec.encode_bases(s))
    (hi, lo), valid = sparse_ops.rolling_codes_split(bases, k)
    hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
    for i in range(len(s) - k + 1):
        w = s[i : i + k]
        if any(c not in "ACGT" for c in w):
            assert not valid[i]
            continue
        code = codec.kmer_to_code(w)
        assert valid[i]
        assert int(hi[i]) == code >> (2 * sparse_ops._lo_bases(k))
        assert int(lo[i]) == code & ((1 << (2 * sparse_ops._lo_bases(k))) - 1)


@pytest.mark.parametrize("k", [13, 17, 21, 31])
def test_revcomp_split_matches_string(make_dna, k):
    s = make_dna(k + 40)
    bases = jnp.asarray(codec.encode_bases(s))
    (hi, lo), _ = sparse_ops.rolling_codes_split(bases, k)
    rc_hi, rc_lo = sparse_ops.revcomp_split(hi, lo, k)
    nlo = sparse_ops._lo_bases(k)
    for i in range(len(s) - k + 1):
        rc_code = codec.kmer_to_code(codec.revcomp_str(s[i : i + k]))
        assert int(np.asarray(rc_hi)[i]) == rc_code >> (2 * nlo)
        assert int(np.asarray(rc_lo)[i]) == rc_code & ((1 << (2 * nlo)) - 1)


def test_sort_unique_counts_small():
    # "AAAAA..." at k=16: all windows identical.
    s = "A" * 40
    bases = jnp.asarray(codec.encode_bases(s))
    hi, lo, counts, starts = sparse_ops.sort_unique_counts(
        bases, jnp.int32(len(s) - 16 + 1), 16
    )
    idx = np.flatnonzero(np.asarray(starts))
    assert idx.shape == (1,)
    assert int(np.asarray(counts)[idx[0]]) == 40 - 16 + 1
    assert int(np.asarray(hi)[idx[0]]) == 0 and int(np.asarray(lo)[idx[0]]) == 0


@pytest.mark.parametrize("k,canonical", [(17, False), (21, False), (21, True), (31, False)])
def test_sparse_engine_matches_naive(make_dna, k, canonical):
    seqs = [make_dna(200 + 41 * i, invalid_frac=0.02) for i in range(5)]
    engine = SparseKmerEngine(KmerConfig(k=k, canonical=canonical, batch_bases=256))
    result = engine.count_sequences(seqs)
    want = oracle.count_table_any_k(seqs, k, canonical)
    got = result.table()
    assert got == want
    assert result.total_kmers == sum(want.values())


def test_sparse_engine_batch_boundaries(make_dna):
    # Tiny batches: cross-batch duplicate k-mers must merge exactly.
    s = make_dna(100) * 3  # force repeats across batch boundaries
    k = 17
    small = SparseKmerEngine(KmerConfig(k=k, batch_bases=128))
    big = SparseKmerEngine(KmerConfig(k=k, batch_bases=1 << 20))
    a, b = small.count_sequences([s]), big.count_sequences([s])
    assert np.array_equal(a.codes, b.codes)
    assert np.array_equal(a.counts, b.counts)
    assert a.total_kmers == len(s) - k + 1


def test_merge_sparse_tables():
    t1 = (np.array([1, 5, 9], np.uint64), np.array([2, 3, 1], np.int64))
    t2 = (np.array([5, 7], np.uint64), np.array([10, 4], np.int64))
    codes, counts = merge_sparse_tables([t1, t2])
    assert codes.tolist() == [1, 5, 7, 9]
    assert counts.tolist() == [2, 13, 4, 1]


def test_count_of_lookup(make_dna):
    s = make_dna(500)
    k = 21
    result = SparseKmerEngine(KmerConfig(k=k)).count_sequences([s])
    want = oracle.count_table_any_k([s], k)
    some = list(want.items())[:20]
    for kmer, cnt in some:
        assert result.count_of(kmer) == cnt
    assert result.count_of("A" * k) == want.get("A" * k, 0)


def test_sparse_file(tmp_path, make_dna):
    from dna_kmeres_parallel_tpu.utils import fasta

    records = [(f">r{i}", make_dna(300)) for i in range(4)]
    path = tmp_path / "s.fasta"
    fasta.write_fasta(path, records)
    result = SparseKmerEngine(KmerConfig(k=21)).count_file(str(path))
    want = oracle.count_table_any_k([s for _, s in records], 21)
    assert result.table() == want
    assert result.n_seqs == 4


@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("k", [13, 15, 16, 17, 21, 23, 24, 31])
def test_sort_unique_starts_matches_oracle(make_dna, k, canonical):
    # The new (words, starts) contract across every sort-key-width band:
    # k<=15 single u32 key, 16..23 (u16, u32), 24..31 (u32, u32).
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_starts

    s = make_dna(400, invalid_frac=0.03)
    bases = jnp.asarray(codec.encode_bases(s))
    n_own = jnp.int32(len(s) - k + 1)
    words, starts = sparse_ops.sort_unique_starts(bases, n_own, k, canonical)
    assert len(words) == sparse_ops.key_words(k)
    if k <= sparse_ops.MAX_SINGLE_WORD_K:
        assert words[0].dtype == jnp.uint32
    else:
        assert words[0].dtype == (
            jnp.uint16 if k <= sparse_ops.MAX_U16_HI_K else jnp.uint32
        )
    codes, counts = compact_starts(words, starts)
    want = oracle.count_table_any_k([s], k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, counts)}
    assert got == want


@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("k", [13, 15, 16, 17, 21, 24, 31])
def test_sort_words_compact_table_matches_oracle(make_dna, k, canonical):
    # The production contract: device outputs ONLY sorted words; the host
    # compactor derives boundaries and counts from neighbor compares.
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_table

    s = make_dna(400, invalid_frac=0.03)
    bases = jnp.asarray(codec.encode_bases(s))
    words = sparse_ops.sort_words(bases, jnp.int32(len(s) - k + 1), k, canonical)
    codes, counts = compact_table(words)
    want = oracle.count_table_any_k([s], k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, counts)}
    assert got == want


def test_compact_table_all_T_k16():
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_table

    s = "T" * 40
    words = sparse_ops.sort_words(
        jnp.asarray(codec.encode_bases(s)), jnp.int32(40 - 16 + 1), 16
    )
    codes, counts = compact_table(words)
    assert codes.tolist() == [0xFFFFFFFF]
    assert counts.tolist() == [40 - 16 + 1]


def test_sort_unique_starts_all_T_k16():
    # k=16 all-T code is 0xFFFFFFFF — must NOT be eaten by the sentinel
    # (the u16 hi word exists exactly to disambiguate this).
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_starts

    s = "T" * 40
    k = 16
    bases = jnp.asarray(codec.encode_bases(s))
    words, starts = sparse_ops.sort_unique_starts(
        bases, jnp.int32(len(s) - k + 1), k
    )
    codes, counts = compact_starts(words, starts)
    assert codes.tolist() == [0xFFFFFFFF]
    assert counts.tolist() == [40 - 16 + 1]


def test_sort_unique_starts_all_T_k15():
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_starts

    s = "T" * 40
    k = 15
    bases = jnp.asarray(codec.encode_bases(s))
    words, starts = sparse_ops.sort_unique_starts(
        bases, jnp.int32(len(s) - k + 1), k
    )
    codes, counts = compact_starts(words, starts)
    assert codes.tolist() == [(1 << 30) - 1]
    assert counts.tolist() == [40 - 15 + 1]


def test_merge_ladder_matches_flat_merge(make_dna):
    from dna_kmeres_parallel_tpu.models.sparse_engine import MergeLadder

    rng = np.random.default_rng(7)
    tables = []
    for _ in range(9):
        n = int(rng.integers(1, 50))
        codes = np.unique(rng.integers(0, 200, n).astype(np.uint64))
        cnts = rng.integers(1, 10, codes.shape[0]).astype(np.int64)
        tables.append((codes, cnts))
    ladder = MergeLadder()
    for t in tables:
        ladder.push(t)
    lc, ln = ladder.result()
    fc, fn = merge_sparse_tables(tables)
    assert np.array_equal(lc, fc)
    assert np.array_equal(ln, fn)


@pytest.mark.parametrize("k,canonical", [(13, False), (21, False), (21, True), (31, True)])
def test_pallas_encoder_matches_jnp(make_dna, k, canonical):
    # The fused Pallas split-word encoder (interpret mode) produces the
    # same sorted table as the jnp encode path.
    s = make_dna(700, invalid_frac=0.03)
    bases = jnp.asarray(codec.encode_bases(s))
    n_own = jnp.int32(len(s) - k + 1)
    ref = sparse_ops.sort_unique_counts(bases, n_own, k, canonical)
    pal = sparse_ops.sort_unique_counts(bases, n_own, k, canonical, pallas="interpret")

    def compact(out):
        hi, lo, counts, starts = out
        idx = np.flatnonzero(np.asarray(starts))
        return (
            sparse_ops.merged_code64(np.asarray(hi)[idx], np.asarray(lo)[idx]),
            np.asarray(counts)[idx],
        )

    rc, rn = compact(ref)
    pc, pn = compact(pal)
    assert np.array_equal(rc, pc)
    assert np.array_equal(rn, pn)


@pytest.mark.parametrize(
    "k,canonical",
    [(13, False), (15, True), (16, False), (17, False), (21, True), (31, False)],
)
def test_sort_words_rows_matches_oracle(make_dna, k, canonical):
    # Row-sorted device output (tiny row_len -> many rows, runs spanning
    # rows) merged by the host compactor must equal the oracle table.
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_table

    s = make_dna(90, invalid_frac=0.03) * 6  # repeats => cross-row duplicate runs
    bases = jnp.asarray(codec.encode_bases(s))
    n_own = jnp.int32(len(s) - k + 1)
    words = sparse_ops.sort_words_rows(bases, n_own, k, canonical, row_len=64)
    assert words[-1].ndim == 2 and words[-1].shape[1] == 64
    codes, counts = compact_table(words)
    want = oracle.count_table_any_k([s], k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, counts)}
    assert got == want


@pytest.mark.parametrize("k", [13, 21])
def test_sort_words_rows_equals_flat(make_dna, k):
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_table

    s = make_dna(500, invalid_frac=0.02)
    bases = jnp.asarray(codec.encode_bases(s))
    n_own = jnp.int32(len(s) - k + 1)
    flat = compact_table(sparse_ops.sort_words(bases, n_own, k, False))
    rows = compact_table(
        sparse_ops.sort_words_rows(bases, n_own, k, False, row_len=128)
    )
    assert np.array_equal(flat[0], rows[0])
    assert np.array_equal(flat[1], rows[1])


def test_sort_words_rows_all_invalid():
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_table

    bases = jnp.full((256,), 0xFF, jnp.uint8)
    words = sparse_ops.sort_words_rows(bases, jnp.int32(256 - 21 + 1), 21, row_len=64)
    codes, counts = compact_table(words)
    assert codes.size == 0 and counts.size == 0


@pytest.mark.parametrize("row_len", [64, 2048])
def test_sparse_engine_row_sort_config(make_dna, row_len):
    # Engine-level: row-sorted config produces the same result as flat.
    # device_sort=True forces the sort paths (the default auto-routes to
    # the no-device-sort radix compactor when the native lib is present).
    seqs = [make_dna(150 + 13 * i, invalid_frac=0.02) for i in range(4)]
    k = 21
    flat = SparseKmerEngine(
        KmerConfig(k=k, batch_bases=512, sort_row_len=0, device_sort=True)
    ).count_sequences(seqs)
    rows = SparseKmerEngine(
        KmerConfig(k=k, batch_bases=512, sort_row_len=row_len, device_sort=True)
    ).count_sequences(seqs)
    assert np.array_equal(flat.codes, rows.codes)
    assert np.array_equal(flat.counts, rows.counts)
    want = oracle.count_table_any_k(seqs, k)
    assert rows.table() == want


@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("k", [13, 15, 16, 17, 21, 23, 24, 31])
def test_encode_words_compact_unsorted_matches_oracle(make_dna, k, canonical):
    """The no-device-sort route: UNSORTED encode words -> host radix
    compactor == oracle, across every key-word layout."""
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_unsorted

    s = make_dna(400, invalid_frac=0.05)
    bases = jnp.asarray(codec.encode_bases(s))
    n_own = jnp.int32(len(s) - k + 1)
    words = sparse_ops.encode_words(bases, n_own, k, canonical)
    codes, counts = compact_unsorted(words, k)
    want = oracle.count_table_any_k([s], k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, counts)}
    assert got == want
    assert np.all(np.diff(codes.astype(np.int64)) > 0)


@pytest.mark.parametrize("k", [15, 21])
def test_compact_unsorted_native_matches_fallback(make_dna, k):
    from dna_kmeres_parallel_tpu import native
    from dna_kmeres_parallel_tpu.models import sparse_engine

    if not native.available():
        pytest.skip("native lib unavailable")
    s = make_dna(600, invalid_frac=0.03)
    bases = jnp.asarray(codec.encode_bases(s))
    n_own = jnp.int32(len(s) - k + 1)
    words = sparse_ops.encode_words(bases, n_own, k)
    got = native.compact_unsorted_native(
        tuple(np.asarray(w) for w in words), 2 * k
    )
    # Force the NumPy fallback by calling its body via monkeypatched
    # availability: simplest is to recompute with the documented fallback
    # semantics (filter sentinels, sort, RLE).
    ws = tuple(np.asarray(w).reshape(-1) for w in words)
    major = ws[0]
    sent = major.dtype.type(np.iinfo(major.dtype).max)
    valid = major != sent
    if len(ws) == 1:
        codes_all = ws[0][valid].astype(np.uint64)
    else:
        codes_all = sparse_ops.merged_code64(ws[0][valid], ws[1][valid])
    codes_all = np.sort(codes_all)
    uniq, counts = np.unique(codes_all, return_counts=True)
    assert np.array_equal(got[0], uniq)
    assert np.array_equal(got[1], counts.astype(np.int64))
    del sparse_engine


@pytest.mark.parametrize("device_sort", [None, False, True])
def test_sparse_engine_device_sort_routes_agree(make_dna, device_sort):
    seqs = [make_dna(150 + 13 * i, invalid_frac=0.02) for i in range(4)]
    k = 21
    r = SparseKmerEngine(
        KmerConfig(k=k, batch_bases=512, device_sort=device_sort)
    ).count_sequences(seqs)
    assert r.table() == oracle.count_table_any_k(seqs, k)


@pytest.mark.parametrize("shape", [(17,), (16,), (4, 6), (3, 7)])
def test_fetch_words_u16_bitcast_roundtrip(shape):
    """fetch_words dodges the tunnel's u16 slow path via device bitcast;
    the result must be bit-identical to a direct fetch for any shape/parity."""
    import jax

    from dna_kmeres_parallel_tpu.models.sparse_engine import fetch_words

    rng = np.random.default_rng(9)
    h16 = rng.integers(0, 1 << 16, size=shape, dtype=np.uint16)
    h32 = rng.integers(0, 1 << 32, size=shape, dtype=np.uint32)
    dev = (jax.device_put(jnp.asarray(h16)), jax.device_put(jnp.asarray(h32)))
    got = fetch_words(dev)
    assert np.array_equal(got[0], h16) and got[0].dtype == np.uint16
    assert np.array_equal(got[1], h32)
    # np passthrough
    got2 = fetch_words((h16, h32))
    assert np.array_equal(got2[0], h16)


def test_compact_unsorted_empty_and_all_invalid():
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_unsorted

    k = 21
    # All-sentinel words (every window invalid).
    hi = np.full(64, 0xFFFF, np.uint16)
    lo = np.full(64, 0xFFFFFFFF, np.uint32)
    codes, counts = compact_unsorted((hi, lo), k)
    assert codes.size == 0 and counts.size == 0


def test_sparse_engine_packed_feed(make_dna):
    seqs = [make_dna(150 + 13 * i, invalid_frac=0.05) for i in range(4)]
    k = 21
    a = SparseKmerEngine(
        KmerConfig(k=k, batch_bases=512, pack_input=True)
    ).count_sequences(seqs)
    b = SparseKmerEngine(
        KmerConfig(k=k, batch_bases=512, pack_input=False)
    ).count_sequences(seqs)
    assert np.array_equal(a.codes, b.codes)
    assert np.array_equal(a.counts, b.counts)
    assert a.table() == oracle.count_table_any_k(seqs, k)


@pytest.mark.parametrize("k", [13, 21, 31])
def test_encoder_fused_sig_and_salt(make_dna, k):
    """The in-kernel bench hooks: want_sig's [8, 256] block must reduce to
    the exact valid-window count and to the same order/value-dependent
    signature recomputed from the returned planes; salt must equal an
    alphabet rotation of the input applied before encoding."""
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        rolling_codes_split_pallas,
    )

    s = make_dna(900, invalid_frac=0.04)
    bases = np.asarray(codec.encode_bases(s))
    n_own = len(s) - k + 1
    hi, lo, sig = rolling_codes_split_pallas(
        jnp.asarray(bases),
        jnp.int32(n_own),
        k,
        want_sig=True,
        salt=jnp.int32(0),
        interpret=True,
    )
    ref_hi, ref_lo = rolling_codes_split_pallas(
        jnp.asarray(bases), jnp.int32(n_own), k, interpret=True
    )
    if ref_hi is not None:
        assert np.array_equal(np.asarray(hi), np.asarray(ref_hi))
    assert np.array_equal(np.asarray(lo), np.asarray(ref_lo))

    lo_np = np.asarray(lo).astype(np.int64)
    major = np.asarray(hi if hi is not None else lo)
    sent = np.iinfo(major.dtype).max
    valid = major != sent
    sig_np = np.asarray(sig, dtype=np.int64)
    assert int(sig_np[:, :128].sum()) % (1 << 32) == int(valid.sum())
    pos = np.arange(lo_np.size, dtype=np.int64)
    hi_np = (
        np.asarray(hi).astype(np.int64) if hi is not None else np.zeros_like(pos)
    )
    mix = np.where(
        valid, ((lo_np & 0x7FFF) + (hi_np & 0x7FFF)) * (pos | 1), 0
    )
    assert int(sig_np[:, 128:].sum()) % (1 << 32) == int(mix.sum()) % (1 << 32)

    # Salt = alphabet rotation of valid bases before encoding.
    rot = np.where(bases < 4, (bases + 3) & 3, bases).astype(np.uint8)
    hi_s, lo_s, sig_s = rolling_codes_split_pallas(
        jnp.asarray(bases),
        jnp.int32(n_own),
        k,
        want_sig=True,
        salt=jnp.int32(3),
        interpret=True,
    )
    ref_hi2, ref_lo2 = rolling_codes_split_pallas(
        jnp.asarray(rot), jnp.int32(n_own), k, interpret=True
    )
    if ref_hi2 is not None:
        assert np.array_equal(np.asarray(hi_s), np.asarray(ref_hi2))
    assert np.array_equal(np.asarray(lo_s), np.asarray(ref_lo2))
    assert int(np.asarray(sig_s, dtype=np.int64)[:, :128].sum()) % (
        1 << 32
    ) == int(valid.sum())


# --------------------------------------------------------------------------
# Sparse-table pairwise distances (k > 15)
# --------------------------------------------------------------------------


def test_distance_sparse_matches_oracle_k21(make_dna):
    from dna_kmeres_parallel_tpu.models import oracle, sparse_engine

    seqs = [make_dna(140 + 33 * i, invalid_frac=0.02) for i in range(7)]
    got = sparse_engine.distance_sparse_packed(seqs, 21)
    want = oracle.distance_matrix_packed_sparse(seqs, 21)
    assert got.dtype == np.float32
    assert np.array_equal(got, want)


def test_distance_sparse_canonical_matches_oracle(make_dna):
    from dna_kmeres_parallel_tpu.models import oracle, sparse_engine

    seqs = [make_dna(120 + 17 * i) for i in range(5)]
    got = sparse_engine.distance_sparse_packed(seqs, 19, canonical=True)
    want = oracle.distance_matrix_packed_sparse(seqs, 19, canonical=True)
    assert np.array_equal(got, want)


def test_distance_sparse_crosschecks_dense_engine(make_dna):
    # k=12 lives in BOTH regimes: the sparse-table path must reproduce the
    # dense oracle's float32 distances bit-for-bit (same finish formula).
    from dna_kmeres_parallel_tpu.models import oracle, sparse_engine

    seqs = [make_dna(200 + 11 * i, invalid_frac=0.01) for i in range(6)]
    got = sparse_engine.distance_sparse_packed(seqs, 12)
    want = oracle.distance_matrix_packed(seqs, 12)
    assert np.array_equal(got, want)


def test_min_sum_pairs_python_matches_native(make_dna):
    from dna_kmeres_parallel_tpu import native
    from dna_kmeres_parallel_tpu.models import sparse_engine
    from dna_kmeres_parallel_tpu.utils import codec

    if not native.available():
        pytest.skip("native engine unavailable")
    seqs = [make_dna(100 + 29 * i) for i in range(5)]
    parts, offs = [], np.zeros(6, np.int64)
    cnts = []
    for i, s in enumerate(seqs):
        c, n = native.count_sparse_host_native(codec.encode_bases(s), 21, False)
        parts.append(c)
        cnts.append(n)
        offs[i + 1] = offs[i] + c.shape[0]
    codes = np.concatenate(parts)
    counts = np.concatenate(cnts)
    a = native.min_sum_pairs_native(codes, counts, offs)
    b = sparse_engine.min_sum_pairs_python(codes, counts, offs)
    assert np.array_equal(a, b)


# --------------------------------------------------------------------------
# Device sort + RLE compaction (compact='device-rle')
# --------------------------------------------------------------------------


@pytest.mark.parametrize("k,canonical", [(13, False), (21, False), (21, True)])
def test_sort_words_rle_matches_oracle(make_dna, k, canonical):
    from dna_kmeres_parallel_tpu.models.oracle import count_table_any_k
    from dna_kmeres_parallel_tpu.models.sparse_engine import table_from_rle
    from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops
    from dna_kmeres_parallel_tpu.utils import codec

    # High duplication on purpose: one read repeated + noise.
    core = make_dna(90)
    seqs = [core] * 9 + [make_dna(140, invalid_frac=0.02)]
    flat = codec.concat_with_sentinels(seqs)
    n_own = jnp.int32(flat.shape[0])
    words, counts, n_distinct = sparse_ops.sort_words_rle(
        jnp.asarray(flat), n_own, k, canonical
    )
    codes, cnts = table_from_rle(words, counts, n_distinct)
    got = {
        codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, cnts)
    }
    want = count_table_any_k(seqs, k, canonical)
    assert got == want
    # the dedup actually bit: distinct << windows
    assert int(n_distinct) < sum(len(s) for s in seqs) - len(seqs) * (k - 1)


def test_sort_words_rle_all_invalid():
    from dna_kmeres_parallel_tpu.models.sparse_engine import table_from_rle
    from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops
    from dna_kmeres_parallel_tpu.utils import codec

    flat = np.full(300, codec.INVALID_BASE, np.uint8)
    words, counts, n_distinct = sparse_ops.sort_words_rle(
        jnp.asarray(flat), jnp.int32(300), 21, False
    )
    codes, cnts = table_from_rle(words, counts, n_distinct)
    assert codes.size == 0 and cnts.size == 0


def test_stream_device_rle_matches_oracle(tmp_path, make_dna):
    from dna_kmeres_parallel_tpu.models.oracle import count_table_any_k
    from dna_kmeres_parallel_tpu.models.pipeline import StreamingCounter
    from dna_kmeres_parallel_tpu.utils import fasta
    from dna_kmeres_parallel_tpu.utils.config import KmerConfig

    core = make_dna(200)
    records = [(f">r{i}", core) for i in range(6)] + [(">x", make_dna(333))]
    path = tmp_path / "dup.fasta"
    fasta.write_fasta(path, records)
    result = StreamingCounter(
        KmerConfig(k=21, batch_bases=512, compact="device-rle")
    ).run(str(path))
    assert result.table() == count_table_any_k([s for _, s in records], 21)


# --------------------------------------------------------------------------
# Mid-k (9..15) distance routing: sparse tables whenever [S, 4^k] is
# infeasible (VERDICT r2 item 1 — the reference's core deliverable,
# kernels.h:85-109, must cover every k)
# --------------------------------------------------------------------------


def test_dense_distance_feasible_gate():
    from dna_kmeres_parallel_tpu.models.sparse_engine import (
        dense_distance_feasible,
    )

    # k=3 at any sane S: 64 bins, always feasible.
    assert dense_distance_feasible(54018, 3)
    # k=13: 4^13 bins = 268 MB/sequence; S=2000 needs ~537 GB. Never
    # dense — the scatter's int32 index ceiling (S_padded * bins < 2^31)
    # rules it out at ANY budget.
    assert not dense_distance_feasible(2000, 13)
    assert not dense_distance_feasible(9, 13)  # default 2 GiB budget
    assert not dense_distance_feasible(4, 13, budget_bytes=1 << 60)
    # k=12 likewise: 128-row padding floor x 4^12 bins >= 2^31.
    assert not dense_distance_feasible(2, 12)
    # k=11 small-S stays on the fast dense (min,+) path.
    assert dense_distance_feasible(30, 11)
    assert not dense_distance_feasible(4000, 11)


@pytest.mark.parametrize("k", [9, 13, 15])
def test_distance_sparse_midk_matches_oracle(make_dna, k):
    # k=9 also has a dense twin (1 MB vectors): the sparse-table result
    # must equal the dense oracle bit-for-bit; 13/15 check the sparse
    # oracle twin (dense vectors are 268 MB - 4 GB per sequence there).
    from dna_kmeres_parallel_tpu.models import oracle, sparse_engine

    seqs = [make_dna(160 + 23 * i, invalid_frac=0.02) for i in range(6)]
    got = sparse_engine.distance_sparse_packed(seqs, k)
    if k == 9:
        want = oracle.distance_matrix_packed(seqs, k)
    else:
        want = oracle.distance_matrix_packed_sparse(seqs, k)
    assert got.dtype == np.float32
    assert np.array_equal(got, want)


def test_cli_distance_routes_midk_to_sparse(tmp_path, make_dna, monkeypatch, capsys):
    # Routing pin: k=13 from the CLI must take the sparse-table path (no
    # [S, 4^13] materialization) and write the oracle's exact CSV bytes.
    import json as json_mod

    from dna_kmeres_parallel_tpu import cli
    from dna_kmeres_parallel_tpu.models import oracle
    from dna_kmeres_parallel_tpu.utils import io as io_mod

    seqs = [make_dna(150 + 31 * i) for i in range(5)]
    fa = tmp_path / "mid.fasta"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    out = tmp_path / "d13.csv"
    rc = cli.main(["distance", "--k", "13", str(fa), "-o", str(out)])
    assert rc == 0
    report = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["engine"] == "host/sparse"  # the routing pin
    want = tmp_path / "want.csv"
    io_mod.write_distances_csv(
        want, oracle.distance_matrix_packed_sparse(seqs, 13)
    )
    assert out.read_bytes() == want.read_bytes()


def test_cli_distance_budget_gate_forces_sparse(
    tmp_path, make_dna, monkeypatch, capsys
):
    # A tiny budget must push even k=5 (1024 bins) onto the sparse path,
    # and the distances must still match the dense oracle exactly.
    import json as json_mod

    from dna_kmeres_parallel_tpu import cli
    from dna_kmeres_parallel_tpu.models import oracle

    monkeypatch.setenv("KMER_TPU_DENSE_DIST_BUDGET", "1024")
    seqs = [make_dna(90 + 13 * i) for i in range(4)]
    fa = tmp_path / "tiny.fasta"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    out = tmp_path / "d5.csv"
    rc = cli.main(["distance", "--k", "5", str(fa), "-o", str(out)])
    assert rc == 0
    report = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["engine"] == "host/sparse"
    got = np.array(
        [float(x) for x in out.read_text().split()], dtype=np.float32
    )
    want = oracle.distance_matrix_packed(seqs, 5)
    assert np.allclose(got, want, atol=1e-6)


# --------------------------------------------------------------------------
# Packed-word encoder v2 (round 3): SWAR extraction from 2-bit packed words
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "k,canonical",
    [(9, False), (13, False), (15, True), (16, False), (16, True),
     (21, False), (21, True), (24, False), (31, True)],
)
def test_packed_encoder_v2_matches_jnp_multiset(make_dna, k, canonical):
    # The v2 kernel emits windows in residue-permuted order (documented);
    # the CODE MULTISET must equal the jnp encoder's exactly, across every
    # key-word layout, with ownership cropping and invalid bases.
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        be_planes_from_bases,
        rolling_codes_split_packed_pallas,
    )

    s = make_dna(4208, invalid_frac=0.02)
    T = len(s) // 16 * 16
    bases = codec.encode_bases(s[:T])
    n_own = T - 400
    w, iv = be_planes_from_bases(jnp.asarray(bases))
    hi, lo = rolling_codes_split_packed_pallas(
        w, iv, jnp.int32(n_own), k, canonical, interpret=True
    )
    ref = sparse_ops._encode_words(
        jnp.asarray(bases), jnp.int32(n_own), k, canonical, pallas=None
    )

    def codes64(h, l):
        h = None if h is None else np.asarray(h)
        l = np.asarray(l)
        if h is None:
            m = l != 0xFFFFFFFF
            return np.sort(l[m].astype(np.uint64))
        m = h != np.iinfo(h.dtype).max
        return np.sort(
            (h[m].astype(np.uint64) << np.uint64(32)) | l[m].astype(np.uint64)
        )

    ref_hi, ref_lo = (None, ref[0]) if len(ref) == 1 else (ref[0], ref[1])
    assert np.array_equal(codes64(hi, lo), codes64(ref_hi, ref_lo))


def test_be_planes_packfmt_matches_from_bases(make_dna):
    # The packed-transfer-format plane builder and the raw-bases builder
    # agree digit-for-digit on valid bases and bit-for-bit on the invalid
    # plane (invalid bases' data digits are don't-cares).
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        be_planes_from_bases,
        be_planes_from_packfmt,
    )

    s = make_dna(512, invalid_frac=0.05)
    bases = codec.encode_bases(s)
    w1, iv1 = (np.asarray(x) for x in be_planes_from_bases(jnp.asarray(bases)))
    data, mask, _ = codec.pack_bases(bases)
    w2, iv2 = (
        np.asarray(x)
        for x in be_planes_from_packfmt(jnp.asarray(data), jnp.asarray(mask))
    )
    assert np.array_equal(iv1, iv2)
    care = ~iv1  # 2-bit digit = 00 where valid
    assert np.array_equal(w1 & care, w2 & care)


@pytest.mark.parametrize("k", [13, 21])
def test_encode_words_v2_engine_route_matches_oracle(make_dna, k, monkeypatch):
    # Engine-level: the interpret-mode Pallas route (which now takes the
    # v2 packed kernel) against the oracle, packed feed included.
    monkeypatch.setenv("KMER_TPU_PALLAS_INTERPRET", "1")
    seqs = [make_dna(220 + 17 * i, invalid_frac=0.03) for i in range(3)]
    got = SparseKmerEngine(
        KmerConfig(k=k, batch_bases=2048, pack_input=True)
    ).count_sequences(seqs)
    assert got.table() == oracle.count_table_any_k(seqs, k)


def test_enc_v2_escape_hatch(monkeypatch):
    import warnings

    from dna_kmeres_parallel_tpu.ops import sparse as sp

    monkeypatch.setattr(sp, "_enc_v2_first_seen", None)
    assert sp._enc_v2_active()  # default ON (host-plane-staged route)
    monkeypatch.setenv("KMER_TPU_ENC_V2", "0")
    # Mid-process flips warn (already-traced shapes keep their route).
    with pytest.warns(UserWarning, match="changed after"):
        assert not sp._enc_v2_active()
    monkeypatch.delenv("KMER_TPU_ENC_V2")
    monkeypatch.setenv("KMER_TPU_ENC_CHUNK", "512")  # not a 2048-multiple
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert not sp._enc_v2_active()


def test_host_planes_match_xla_builder(make_dna):
    # The numpy (host-staged) plane builder and the XLA builder agree:
    # same invalid plane, same data digits where valid (host ships LE
    # words the kernel butterflies; reverse here for comparison).
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        _rev16_digits_np,
        be_planes_from_packfmt,
        host_planes_from_packfmt,
    )

    s = make_dna(1024, invalid_frac=0.04)
    data, mask, _ = codec.pack_bases(codec.encode_bases(s))
    w_le, iv_be = host_planes_from_packfmt(data, mask)
    wx, ivx = (
        np.asarray(x)
        for x in be_planes_from_packfmt(jnp.asarray(data), jnp.asarray(mask))
    )
    assert np.array_equal(iv_be, ivx)
    care = ~iv_be
    assert np.array_equal(_rev16_digits_np(w_le) & care, wx & care)


@pytest.mark.parametrize("k,canonical", [(13, False), (21, True), (31, False)])
def test_encode_words_planes_matches_packed(make_dna, k, canonical):
    # The host-staged plane program == the packfmt program, code multiset.
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        host_planes_from_packfmt,
    )

    s = make_dna(2048, invalid_frac=0.03)
    bases = codec.encode_bases(s)
    data, mask, _ = codec.pack_bases(bases)
    n_own = jnp.int32(len(s) - k + 1)
    w_le, iv_be = host_planes_from_packfmt(data, mask)
    got = sparse_ops.encode_words_planes(
        jnp.asarray(w_le), jnp.asarray(iv_be), n_own, k, canonical,
        interpret=True,
    )
    ref = sparse_ops._encode_words(
        jnp.asarray(bases), n_own, k, canonical, pallas=None
    )

    def codes64(words):
        if len(words) == 1:
            l = np.asarray(words[0])
            return np.sort(l[l != 0xFFFFFFFF].astype(np.uint64))
        h = np.asarray(words[0])
        l = np.asarray(words[1])
        m = h != np.iinfo(h.dtype).max
        return np.sort(
            (h[m].astype(np.uint64) << np.uint64(32)) | l[m].astype(np.uint64)
        )

    assert np.array_equal(codes64(got), codes64(ref))


@pytest.mark.parametrize("k,m", [(13, 7), (21, 7), (21, 11), (31, 7), (16, 15)])
def test_packed_encoder_minimizer_plane_matches_positional(make_dna, k, m):
    # The v2 kernel's in-kernel minimizer plane (span-min doubling ladder
    # over the funnel family) must pair every window code with the SAME
    # minimizer the positional XLA scan computes — compared as multisets
    # of (code, minimizer) pairs, since v2 order is residue-permuted.
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        be_planes_from_bases,
        rolling_codes_split_packed_pallas,
    )
    from dna_kmeres_parallel_tpu.parallel.bucketed import window_minimizers

    s = make_dna(4096, invalid_frac=0.02)
    bases = codec.encode_bases(s)
    T = len(bases)
    w, iv = be_planes_from_bases(jnp.asarray(bases))
    hi, lo, mins = rolling_codes_split_packed_pallas(
        w, iv, jnp.int32(T), k, False, interpret=True, minimizer_m=m
    )
    lo = np.asarray(lo)
    mins = np.asarray(mins)
    if hi is None:
        valid = lo != 0xFFFFFFFF
        codes = lo.astype(np.uint64)
    else:
        hi = np.asarray(hi)
        valid = hi != np.iinfo(hi.dtype).max
        codes = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    mini_ref = np.asarray(window_minimizers(jnp.asarray(bases), k, m))
    (rhi, rlo), rvalid = sparse_ops.rolling_codes_split(jnp.asarray(bases), k)
    rcodes = (np.asarray(rhi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        rlo
    ).astype(np.uint64)
    rvalid = np.asarray(rvalid)

    def pairs(c, mn):
        dt = [("c", np.uint64), ("m", np.int64)]
        out = np.empty(c.shape[0], dtype=dt)
        out["c"], out["m"] = c, mn
        return np.sort(out)

    got = pairs(codes[valid], mins[valid].astype(np.int64))
    want = pairs(rcodes[rvalid], mini_ref[rvalid].astype(np.int64))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("k,canonical", [(13, False), (17, True), (21, False)])
def test_sort_words_rows_planes_matches_v1_tables(make_dna, k, canonical):
    # The v2 device-sort route (plane-staged encode + row sorts) must
    # yield the exact table the v1 row-sort route yields.
    from dna_kmeres_parallel_tpu.models.sparse_engine import compact_table
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        host_planes_from_packfmt,
    )

    s = make_dna(3200, invalid_frac=0.02)
    bases = codec.encode_bases(s)
    n_own = jnp.int32(len(bases) - k + 1)
    data, mask, _ = codec.pack_bases(bases)
    w_le, iv_be = host_planes_from_packfmt(data, mask)
    got = compact_table(
        sparse_ops.sort_words_rows_planes(
            jnp.asarray(w_le), jnp.asarray(iv_be), n_own, k, canonical,
            interpret=True, row_len=256,
        )
    )
    want = compact_table(
        sparse_ops.sort_words_rows(
            jnp.asarray(bases), n_own, k, canonical, pallas=None, row_len=256
        )
    )
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])


def test_sparse_engine_device_sort_planes_route_matches_oracle(
    make_dna, monkeypatch
):
    # Engine-level: device_sort=True + pack_input routes through the v2
    # plane-staged row-sort program (r4) and stays exact.
    monkeypatch.setenv("KMER_TPU_PALLAS_INTERPRET", "1")
    seqs = [make_dna(300 + 17 * i, invalid_frac=0.03) for i in range(3)]
    got = SparseKmerEngine(
        KmerConfig(
            k=21, batch_bases=2048, pack_input=True, device_sort=True,
            sort_row_len=256,
        )
    ).count_sequences(seqs)
    assert got.table() == oracle.count_table_any_k(seqs, 21)


def test_dense_distance_preferred_cost_gate():
    from dna_kmeres_parallel_tpu.models.sparse_engine import (
        dense_distance_preferred,
    )

    # VERDICT r3 Weak #2's pinned case: 1-Kbase S=256 k=11 FITS the
    # memory budget but the sparse tables do ~2000x less work per pair —
    # must route sparse on predicted cost.
    assert not dense_distance_preferred(256, 11, [1000] * 256)
    # Short sequences at k=9 keep dense (4^9 bins, tiny tables: the
    # crossover model favors the device).
    # (4^9 = 262144; avg_table ~82 -> sparse cost still higher only when
    # thread-scaled throughput is low; with lengths ~90 dense wins iff
    # bins/C_dense <= table/(C_sparse*threads).)
    import os

    threads = max(os.cpu_count() or 1, 1)
    if 4**9 / 2.3e11 <= 82 / (3.6e8 * threads):
        assert dense_distance_preferred(16, 9, [90] * 16)
    # k <= 8 always dense when feasible, regardless of lengths.
    assert dense_distance_preferred(64, 4, [30] * 64)
    # The memory ceiling still rules: infeasible shapes are never dense.
    assert not dense_distance_preferred(1 << 20, 12, [100] * 4)


@pytest.mark.parametrize("k,canonical", [(13, False), (21, True), (31, False)])
def test_superkmer_records_device_matches_oracle(make_dna, k, canonical):
    # Single-chip super-k-mer D2H compaction (r4): device records ->
    # host expand+count == oracle, across key-word bands + canonical.
    from dna_kmeres_parallel_tpu.parallel.bucketed import (
        superkmer_records_device,
        table_from_superkmers,
    )

    seqs = [make_dna(150 + 17 * i, invalid_frac=0.03) for i in range(4)]
    flat = codec.concat_with_sentinels(seqs)
    n_own = jnp.int32(flat.shape[0])
    planes, meta, n_rec = superkmer_records_device(
        jnp.asarray(flat), n_own, k
    )
    codes, counts = table_from_superkmers(planes, meta, n_rec, k, 7, canonical)
    want = oracle.count_table_any_k(seqs, k, canonical)
    got = {codec.code_to_kmer(int(c), k): int(n) for c, n in zip(codes, counts)}
    assert got == want


def test_superkmer_records_ownership_boundary(make_dna):
    # Batch-overlap rule: runs split at the ownership edge; the two
    # batches' tables merge to the full-stream count exactly.
    from dna_kmeres_parallel_tpu.models.sparse_engine import (
        merge_sparse_tables,
    )
    from dna_kmeres_parallel_tpu.parallel.bucketed import (
        superkmer_records_device,
        table_from_superkmers,
    )

    k = 21
    s = make_dna(700, invalid_frac=0.02)
    flat = codec.encode_bases(s)
    cut = 333
    parts = []
    for start, end in ((0, cut), (cut, flat.shape[0])):
        seg = flat[start : min(end + k - 1, flat.shape[0])]
        planes, meta, n_rec = superkmer_records_device(
            jnp.asarray(seg), jnp.int32(end - start), k
        )
        parts.append(table_from_superkmers(planes, meta, n_rec, k, 7, False))
    got_codes, got_counts = merge_sparse_tables(parts)
    want = oracle.count_table_any_k([s], k, False)
    got = {
        codec.code_to_kmer(int(c), k): int(n)
        for c, n in zip(got_codes, got_counts)
    }
    assert got == want


def test_stream_device_super_matches_oracle(tmp_path, make_dna):
    from dna_kmeres_parallel_tpu.models.oracle import count_table_any_k
    from dna_kmeres_parallel_tpu.models.pipeline import StreamingCounter
    from dna_kmeres_parallel_tpu.utils import fasta
    from dna_kmeres_parallel_tpu.utils.config import KmerConfig

    core = make_dna(200)
    records = [(f">r{i}", core) for i in range(6)] + [(">x", make_dna(333))]
    path = tmp_path / "dup.fasta"
    fasta.write_fasta(path, records)
    result = StreamingCounter(
        KmerConfig(k=21, batch_bases=512, compact="device-super")
    ).run(str(path))
    assert result.table() == count_table_any_k([s for _, s in records], 21)
