"""Property-based tests (hypothesis) for the codec and counting invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dna_kmeres_parallel_tpu.models import oracle
from dna_kmeres_parallel_tpu.utils import codec

dna = st.text(alphabet="ACGT", min_size=0, max_size=200)
dna_with_junk = st.text(alphabet="ACGTNacgt-", min_size=0, max_size=200)
ks = st.integers(min_value=1, max_value=8)


@settings(max_examples=60, deadline=None)
@given(dna_with_junk, ks)
def test_window_count_invariant(s, k):
    # Total counts == number of fully-valid windows, <= L-k+1.
    hist = oracle.count_vector(s, k)
    n_windows = max(len(s) - k + 1, 0)
    valid_windows = sum(
        1
        for i in range(n_windows)
        if all(c in "ACGT" for c in s[i : i + k])
    )
    assert hist.sum() == valid_windows


@settings(max_examples=60, deadline=None)
@given(dna, ks)
def test_rolling_matches_per_window(s, k):
    codes, valid = codec.kmer_codes(codec.encode_bases(s), k)
    for i in range(max(len(s) - k + 1, 0)):
        assert valid[i]
        assert codes[i] == codec.kmer_to_code(s[i : i + k])


@settings(max_examples=60, deadline=None)
@given(dna, ks)
def test_canonical_strand_invariance(s, k):
    a = oracle.count_vector(s, k, canonical=True)
    b = oracle.count_vector(codec.revcomp_str(s), k, canonical=True)
    assert np.array_equal(a, b)


@settings(max_examples=60, deadline=None)
@given(dna_with_junk)
def test_pack_roundtrip_property(s):
    bases = codec.encode_bases(s)
    packed, mask, L = codec.pack_bases(bases)
    assert np.array_equal(codec.unpack_bases(packed, mask, L), bases)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=12), st.integers(min_value=0))
def test_code_kmer_bijection(k, seed):
    code = seed % (4**k)
    assert codec.kmer_to_code(codec.code_to_kmer(code, k)) == code


@settings(max_examples=40, deadline=None)
@given(dna, st.integers(min_value=2, max_value=6))
def test_split_concat_additivity(s, k):
    # Counting s split anywhere (with halo semantics via concatenation of
    # count tables) equals counting s whole when split point respects the
    # halo: hist(s) == hist(s[:i+k-1] windows<i) + hist(s[i:]).
    if len(s) < k + 2:
        return
    i = len(s) // 2
    whole = oracle.count_vector(s, k)
    left = oracle.count_vector(s[: i + k - 1], k)
    right = oracle.count_vector(s[i:], k)
    assert np.array_equal(whole, left + right)
