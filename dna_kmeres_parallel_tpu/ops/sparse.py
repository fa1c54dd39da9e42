"""Sparse (sorted) k-mer counting for large k (16 <= k <= 31).

4^k dwarfs HBM for k >= 16 (4^21 ~ 4.4e12 bins), so the dense-histogram
representation gives way to the sorted sparse table — the TPU-native
formulation of what CPU/GPU counters (KMC, Gerbil) do with disk buckets:

  bases -> rolling SPLIT-WORD codes (hi, lo) uint32     (k <= 31: 2k bits)
        -> optional RC canonicalization (lexicographic min of split words)
        -> two-key XLA sort (lexicographic on (hi, lo))
        -> run-length encoding with static shapes (no scatter):
           run starts by neighbor-compare, run lengths by a reverse
           minimum-scan over flagged positions.

Every step is O(T) or O(T log T) vectorized work with static shapes — no
data-dependent control flow, no scatter. The compaction of the masked RLE
output to a dense (codes, counts) table is host-side (np.flatnonzero), and
cross-batch merging is an integer sorted-merge (models/sparse_engine.py).

Codes use two uint32 words: lo = last 16 bases (32 bits), hi = first k-16
bases (2k-32 bits, < 31 bits for k <= 31). For k <= 16 hi is 0-padded; the
dense engine remains the right tool below k=16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MIN_SPARSE_K = 13
MAX_SPARSE_K = 31

_LO_BASES = 16  # bases held in the lo word


def _lo_bases(k: int) -> int:
    return min(k, _LO_BASES)


def rolling_codes_split(bases: jax.Array, k: int):
    """[T] uint8 base codes -> ((hi, lo) uint32 [T-k+1], valid bool).

    hi holds the first k-16 bases (0 if k <= 16), lo the last min(k,16);
    (hi, lo) compares lexicographically identically to the 2k-bit code.
    """
    if not (1 <= k <= MAX_SPARSE_K):
        raise ValueError(f"k must be in [1, {MAX_SPARSE_K}]")
    T = bases.shape[-1]
    n = T - k + 1
    if n <= 0:
        raise ValueError(f"window axis too short: T={T} < k={k}")
    nlo = _lo_bases(k)
    nhi = k - nlo
    hi = jnp.zeros(bases.shape[:-1] + (n,), jnp.uint32)
    lo = jnp.zeros(bases.shape[:-1] + (n,), jnp.uint32)
    valid = jnp.ones(bases.shape[:-1] + (n,), jnp.bool_)
    for t in range(k):  # static unroll
        w = jax.lax.slice_in_dim(bases, t, t + n, axis=-1)
        valid = valid & (w < 4)
        b = (w & 3).astype(jnp.uint32)
        if t < nhi:
            hi = (hi << 2) | b
        else:
            lo = (lo << 2) | b
    return (hi, lo), valid


def revcomp_split(hi: jax.Array, lo: jax.Array, k: int):
    """Reverse complement of split codes (digit-reverse + complement)."""
    nlo = _lo_bases(k)
    nhi = k - nlo
    # Walk digits from least significant (end of k-mer) to most significant,
    # emitting complemented digits into the rc accumulator most-significant
    # first — i.e. plain rolling accumulation of complemented digits.
    rc_hi = jnp.zeros_like(hi)
    rc_lo = jnp.zeros_like(lo)
    src_hi, src_lo = hi, lo

    def next_digit(sh, sl):
        d = sl & 3
        sl = (sl >> 2) | ((sh & 3) << (2 * (nlo - 1)))
        sh = sh >> 2
        return d, sh, sl

    for i in range(k):  # static
        d, src_hi, src_lo = next_digit(src_hi, src_lo)
        comp = d ^ 3
        if i < nhi:
            rc_hi = (rc_hi << 2) | comp
        else:
            rc_lo = (rc_lo << 2) | comp
    return rc_hi, rc_lo


def canonicalize_split(hi: jax.Array, lo: jax.Array, k: int):
    """Lexicographic min of (hi, lo) and its reverse complement."""
    rc_hi, rc_lo = revcomp_split(hi, lo, k)
    take_rc = (rc_hi < hi) | ((rc_hi == hi) & (rc_lo < lo))
    return jnp.where(take_rc, rc_hi, hi), jnp.where(take_rc, rc_lo, lo)


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def sort_unique_counts(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """Flat [T] base stream -> sorted sparse count table (static shapes).

    Returns (hi, lo, counts, starts):
      hi, lo:  uint32 [N] sorted window codes (invalid windows sort to the
               sentinel tail hi=0xFFFFFFFF; N = T-k+1 on the jnp path, T
               rounded up to the encoder tile on the Pallas path)
      counts:  int32 [N] — at run-start positions, the run length (count of
               that k-mer); elsewhere garbage
      starts:  bool [N] — True at the first element of each distinct run
               (False for the invalid-sentinel tail)

    pallas='compiled'/'interpret' routes the encode through the fused
    Pallas kernel (ops/encode_pallas.py) — one VMEM pass instead of XLA's
    HBM-round-tripping unrolled shifts.

    Host-side compaction: idx = flatnonzero(starts);
    table = (hi[idx], lo[idx], counts[idx]).
    """
    sentinel = jnp.uint32(0xFFFFFFFF)
    if pallas is not None:
        from dna_kmeres_parallel_tpu.ops.encode_pallas import (
            rolling_codes_split_pallas,
        )

        hi, lo = rolling_codes_split_pallas(
            bases, n_own, k, canonical, interpret=(pallas == "interpret")
        )
    else:
        (hi, lo), valid = rolling_codes_split(bases, k)
        n = hi.shape[0]
        own = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_own
        valid = valid & own
        if canonical:
            hi, lo = canonicalize_split(hi, lo, k)
        hi = jnp.where(valid, hi, sentinel)
        lo = jnp.where(valid, lo, sentinel)

    hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2)
    n = hi_s.shape[0]

    prev_hi = jnp.concatenate([jnp.full((1,), sentinel, jnp.uint32), hi_s[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), sentinel, jnp.uint32), lo_s[:-1]])
    is_valid = hi_s != sentinel  # valid windows can't reach hi sentinel
    starts = ((hi_s != prev_hi) | (lo_s != prev_lo)) & is_valid

    # Run length at a start = (index of next start) - (own index), where the
    # sentinel tail acts as a final start. Reverse cummin over flagged
    # positions gives "index of next start at or after me".
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    next_flag = starts | ~is_valid
    flagged = jnp.where(next_flag, idx, n)
    # next_start_at_or_after[i] = min(flagged[i:]) — reverse cumulative min.
    # lax.cummin (native scan primitive) — NOT associative_scan, whose
    # generic slice/concat tree takes >15 min to compile at 4M elements on
    # the TPU toolchain (cummin: ~30 s).
    next_start = jax.lax.cummin(flagged, reverse=True)
    # For a start at i, its run ends at the next flagged position AFTER i.
    after = jnp.concatenate([next_start[1:], jnp.full((1,), n, jnp.int32)])
    counts = after - idx
    return hi_s, lo_s, counts, starts


def merged_code64(hi, lo):
    """Pack split words into one uint64 (host-side convenience)."""
    import numpy as np

    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64
    )
