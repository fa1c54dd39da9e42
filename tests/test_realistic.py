"""Realistic-data validation (VERDICT r2 item 7).

Every fixture before r3 was uniform-random ACGT — the one distribution
real data never is. These tests run the flagship paths on sequencing-
shaped data (coverage duplication, repeats, N runs, soft-masked lowercase;
utils/datagen.realistic_fasta) and pin exactness against the oracle. The
reference itself ran real data (plants.fasta / all_seqs.fasta,
/root/reference/main.cu:47-50) — this is the framework's stand-in with a
checked-in generator instead of an unshippable corpus.
"""

import numpy as np
import pytest

from dna_kmeres_parallel_tpu.models import oracle
from dna_kmeres_parallel_tpu.utils import codec, datagen, fasta
from dna_kmeres_parallel_tpu.utils.config import KmerConfig


@pytest.fixture(scope="module")
def realistic(tmp_path_factory):
    path = tmp_path_factory.mktemp("real") / "reads.fasta"
    total = datagen.realistic_fasta(
        str(path), genome_len=3000, coverage=10.0, read_len=150,
        repeat_unit=311, repeat_copies=4, seed=11,
    )
    records = fasta.parse_fasta(str(path))
    seqs = [r.seq for r in records]
    assert total == sum(len(s) for s in seqs)
    return str(path), seqs


def test_fixture_has_realistic_features(realistic):
    _, seqs = realistic
    blob = "".join(seqs)
    assert "N" in blob or "n" in blob  # N runs present
    assert any(c.islower() for c in blob)  # soft masking present
    # Coverage duplication: distinct 21-mers well below total windows.
    tbl = oracle.count_table_any_k(seqs, 21)
    total_kmers = sum(tbl.values())
    assert total_kmers / max(len(tbl), 1) > 3.0


def test_dense_k4_realistic_matches_oracle(realistic):
    from dna_kmeres_parallel_tpu.models.engine import KmerEngine

    path, seqs = realistic
    res = KmerEngine(KmerConfig(k=4)).count_file(path)
    want = sum(
        (oracle.count_vector(s, 4) for s in seqs), np.zeros(256, np.int64)
    )
    assert np.array_equal(res.hist.astype(np.int64), want)


def test_sparse_k21_stream_auto_realistic(realistic):
    from dna_kmeres_parallel_tpu import native
    from dna_kmeres_parallel_tpu.models.pipeline import StreamingCounter

    path, seqs = realistic
    sc = StreamingCounter(KmerConfig(k=21, batch_bases=4096, compact="auto"))
    result = sc.run(path)
    assert result.table() == oracle.count_table_any_k(seqs, 21)
    if native.available():
        # r5: no RLE pre-selection — the EWMA race owns the decision.
        rep = sc.metrics.report()
        assert "compact_rle_selected" not in rep["counters"]


def test_bucketed_k31_minimizer_skew_realistic(realistic):
    # The planted repeat concentrates minimizers on few owners — the auto
    # policy must absorb the skew (raw overflow -> aggregated fallback is
    # its designed degradation) and stay exact.
    from dna_kmeres_parallel_tpu.parallel import bucketed
    from dna_kmeres_parallel_tpu.parallel.mesh import make_mesh

    path, seqs = realistic
    mesh = make_mesh(8)
    flat = codec.concat_with_sentinels(seqs[:40])
    codes, counts = bucketed.count_bucket_auto(
        flat, 31, False, mesh, owner_mode="minimizer"
    )
    want = oracle.count_table_any_k(seqs[:40], 31)
    got = {
        codec.code_to_kmer(int(c), 31): int(n) for c, n in zip(codes, counts)
    }
    assert got == want


def test_distance_k3_realistic_matches_oracle(realistic):
    from dna_kmeres_parallel_tpu.models.engine import KmerEngine

    path, seqs = realistic
    sub = seqs[:24]
    got = KmerEngine(KmerConfig(k=3)).distance_sequences(sub).packed
    want = oracle.distance_matrix_packed(sub, 3)
    assert np.array_equal(got, want)


def test_sparse_distance_k17_realistic_matches_oracle(realistic):
    from dna_kmeres_parallel_tpu.models import sparse_engine

    _, seqs = realistic
    sub = seqs[:12]
    got = sparse_engine.distance_sparse_packed(sub, 17)
    want = oracle.distance_matrix_packed_sparse(sub, 17)
    assert np.array_equal(got, want)
