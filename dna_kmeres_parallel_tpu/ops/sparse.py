"""Sparse (sorted) k-mer counting for large k (13 <= k <= 31).

4^k dwarfs HBM for k >= 16 (4^21 ~ 4.4e12 bins), so the dense-histogram
representation gives way to the sorted sparse table — the TPU-native
formulation of what CPU/GPU counters (KMC, Gerbil) do with disk buckets:

  bases -> rolling SPLIT-WORD codes (hi, lo)             (k <= 31: 2k bits)
        -> optional RC canonicalization (lexicographic min of split words)
        -> multi-key XLA sort (lexicographic)
        -> run-START flags by neighbor-compare (no scatter)

Run *lengths* are NOT computed on device: consecutive start indices encode
them for free, so the host compactor (native/fastaparse.cpp kp_compact_*)
derives counts while compacting — this removes both a device scan
(lax.cummin) and a 4-bytes-per-window device->host transfer.

The sort is the dominant cost (measured ~88% of the path at k=21 on v5e),
and every additional 32-bit operand costs ~28% more sort time, so the key
layout adapts to k:

  k <= 15:       one u32 key (code < 2^30; sentinel 0xFFFFFFFF is safe)
  16 <= k <= 23: (u16 hi, u32 lo) — hi holds the first 2k-32 <= 14 bits
                 (k=16's all-T code IS 0xFFFFFFFF, hence the hi word even
                 though it is zero: the u16 sentinel 0xFFFF disambiguates)
  24 <= k <= 31: (u32 hi, u32 lo)

lo always holds the last min(k,16) bases; (hi, lo) compares
lexicographically identically to the 2k-bit code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MIN_SPARSE_K = 13
MAX_SPARSE_K = 31

_LO_BASES = 16  # bases held in the lo word

#: largest k whose codes fit a single u32 strictly below the sentinel
MAX_SINGLE_WORD_K = 15
#: largest k whose hi word fits strictly below the u16 sentinel
MAX_U16_HI_K = 23


def _lo_bases(k: int) -> int:
    return min(k, _LO_BASES)


def key_words(k: int) -> int:
    """Number of sort-key words for this k (1 or 2)."""
    return 1 if k <= MAX_SINGLE_WORD_K else 2


def hi_dtype(k: int):
    """Dtype of the hi sort word (None if single-word)."""
    if k <= MAX_SINGLE_WORD_K:
        return None
    return jnp.uint16 if k <= MAX_U16_HI_K else jnp.uint32


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


_enc_v2_first_seen: bool | None = None


def _enc_v2_active() -> bool:
    """Whether the v2 packed-word kernel serves the HOST-PLANE-STAGED
    encode route (engine.stage_batch_planes -> encode_words_planes).

    Default ON: with planes built host-side the device program is the
    kernel alone, measured 89 Gbase/s at k=21 on v5e vs v1's 21.6 (the
    kernel was never the problem — the DEVICE-side plane conversion's
    tile relayout was, which is why _encode_words/_encode_words_packfmt
    below always run v1: their in-jit XLA conversion measured 5.4).
    KMER_TPU_ENC_V2=0 forces v1 everywhere; a KMER_TPU_ENC_CHUNK that is
    not a 2048-multiple forces v1 regardless (lane geometry). Read at
    trace time — the jit cache keys on shapes/static args, NOT on this
    env, so already-traced shapes keep their original route after a
    mid-process flip (both routes produce identical word multisets; only
    the kernel differs). Set it before first use; a mid-process change
    warns loudly instead of silently half-applying."""
    global _enc_v2_first_seen
    import os

    active = os.environ.get("KMER_TPU_ENC_V2", "1") != "0"
    if active:
        chunk = int(os.environ.get("KMER_TPU_ENC_CHUNK", "16384"))
        active = chunk >= 2048 and chunk % 2048 == 0
    if _enc_v2_first_seen is None:
        _enc_v2_first_seen = active
    elif active != _enc_v2_first_seen:
        import warnings

        warnings.warn(
            "KMER_TPU_ENC_V2/KMER_TPU_ENC_CHUNK changed after the encoder "
            "route was first resolved: already-compiled programs keep "
            "their original (exact) route; only newly traced shapes pick "
            "up the change",
            stacklevel=2,
        )
        _enc_v2_first_seen = active
    return active


def _encode_words(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool,
    pallas: str | None,
    force_v1: bool = False,
):
    """Encode to the adaptive UNSORTED key-word tuple: (lo,) for k <= 15,
    (hi_u16, lo) for k <= 23, else (hi_u32, lo); invalid windows hold the
    all-ones sentinel in every word.

    Word ORDER is unspecified (the v2 packed-word kernel emits residue-
    permuted order; see ops/encode_pallas.py) — every consumer sorts or
    bag-compacts. This entry always runs the v1 kernel on the Pallas
    route: v2 only wins when its planes are staged HOST-side
    (encode_words_planes); the in-jit XLA plane conversion this entry
    would need measured 4x the whole kernel (BENCHMARKS.md "Encoder
    v2"). force_v1 is kept for explicitness at positional call sites
    (minimizer owner routing)."""
    del force_v1  # v1 is the only in-jit route; see docstring
    sentinel32 = jnp.uint32(0xFFFFFFFF)
    if pallas is not None:
        interp = pallas == "interpret"
        from dna_kmeres_parallel_tpu.ops.encode_pallas import (
            rolling_codes_split_pallas,
        )

        hi, lo = rolling_codes_split_pallas(
            bases, n_own, k, canonical, interpret=interp
        )
        if hi is not None and hi.dtype == jnp.uint16:
            # The kernel already emitted the u16 hi plane (16 <= k <= 23)
            # with the 0xFFFF sentinel — no conversion pass needed.
            return (hi, lo)
    else:
        (hi, lo), valid = rolling_codes_split(bases, k)
        n = hi.shape[0]
        own = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_own
        valid = valid & own
        if canonical:
            hi, lo = canonicalize_split(hi, lo, k)
        hi = jnp.where(valid, hi, sentinel32)
        lo = jnp.where(valid, lo, sentinel32)

    if k <= MAX_SINGLE_WORD_K:
        # hi is all zeros for valid windows; the sentinel lives in lo and
        # cannot collide (codes < 2^30 < 0xFFFFFFFF).
        return (lo,)
    if k <= MAX_U16_HI_K:
        # hi fits 14 bits; the u16 sentinel 0xFFFF disambiguates even when
        # lo is all-ones (the k=16 all-T k-mer). Narrower key word -> fewer
        # bytes through every sort pass.
        hi16 = jnp.where(
            hi == sentinel32, jnp.uint16(0xFFFF), hi.astype(jnp.uint16)
        )
        return (hi16, lo)
    return (hi, lo)


def _encode_words_packfmt(
    data: jax.Array,
    mask: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool,
    pallas: str | None,
):
    """_encode_words over the 2-bit packed transfer format: unpack fused
    into the device program, v1 kernel. (A v2 variant converting planes
    in-jit was measured 4x slower than the kernel itself — the tile
    relayout of the u8->u32 bitcast; hosts that can stage planes use
    encode_words_planes instead.)"""
    from dna_kmeres_parallel_tpu.ops import encode as encode_ops

    bases = encode_ops.unpack_stream(data, mask)
    return _encode_words(bases, n_own, k, canonical, pallas)


def narrow_words(hi, lo, k: int):
    """(hi, lo) planes from the Pallas encoders -> the adaptive word
    tuple: (lo,) for k <= 15, (hi_u16, lo) when the kernel already
    emitted the u16 hi plane, else (hi_u32, lo)."""
    if hi is not None and hi.dtype == jnp.uint16:
        return (hi, lo)
    if k <= MAX_SINGLE_WORD_K:
        return (lo,)
    return (hi, lo)


@functools.partial(jax.jit, static_argnames=("k", "canonical", "interpret"))
def encode_words_planes(
    words_le: jax.Array,
    inval_be: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    interpret: bool = False,
):
    """The v2 production device program: HOST-STAGED u32 planes (words_le
    = zero-copy view of the packed data bytes; inval_be from
    encode_pallas.host_planes_from_packfmt) -> adaptive UNSORTED word
    tuple, with NO device-side format conversion at all (the XLA
    u8->u32 bitcast relayout measured 4x the kernel's own cost)."""
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        rolling_codes_split_packed_pallas,
    )

    hi, lo = rolling_codes_split_packed_pallas(
        words_le, inval_be, n_own, k, canonical,
        interpret=interpret, words_le=True,
    )
    return narrow_words(hi, lo, k)


@functools.partial(
    jax.jit, static_argnames=("k", "canonical", "interpret")
)
def sort_words_planes(
    words_le: jax.Array,
    inval_be: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    interpret: bool = False,
):
    """sort_words on the v2 plane-staged route: the packed SWAR kernel
    (encode_words_planes) feeds the flat multi-key sort directly — the
    sort destroys order anyway, so the kernel's residue permutation is
    free here. Serves device_sort=True hosts (no native radix compactor)
    at the v2 encode rate."""
    words = encode_words_planes(
        words_le, inval_be, n_own, k, canonical, interpret
    )
    return tuple(jax.lax.sort(words, num_keys=len(words)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "interpret", "row_len", "pallas_sort"),
)
def _sort_words_rows_planes_jit(
    words_le, inval_be, n_own, k, canonical, interpret, row_len, pallas_sort
):
    words = encode_words_planes(
        words_le, inval_be, n_own, k, canonical, interpret
    )
    return _sort_words_as_rows(
        words, "interpret" if interpret else "compiled", row_len, pallas_sort
    )


def sort_words_rows_planes(
    words_le: jax.Array,
    inval_be: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    interpret: bool = False,
    row_len: int = 2048,
    pallas_sort: bool | None = None,
):
    """sort_words_rows on the v2 plane-staged route: packed SWAR encode +
    independent row sorts. Rows sort SEGMENTS of the residue-permuted
    window stream — each row is an arbitrary bag of windows either way,
    and the host row compactor (native.compact_rows_native) merges rows
    as bags, so the permutation is invisible downstream."""
    if pallas_sort is None:  # resolved outside the jit boundary
        pallas_sort = pallas_sort_enabled()
    return _sort_words_rows_planes_jit(
        words_le, inval_be, n_own, k, canonical, interpret, row_len,
        pallas_sort,
    )


def word_sentinel(dtype):
    """All-ones sentinel of a sort-word dtype."""
    return jnp.asarray(0xFFFF if dtype == jnp.uint16 else 0xFFFFFFFF, dtype)


def _encode_and_sort(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool,
    pallas: str | None,
):
    words = _encode_words(bases, n_own, k, canonical, pallas)
    return tuple(jax.lax.sort(words, num_keys=len(words)))


def pallas_sort_enabled() -> bool:
    """Whether the experimental bitonic row-sort kernel is requested
    (KMER_TPU_PALLAS_SORT=1). Read at call time by the public entry points,
    never inside a trace."""
    import os

    return os.environ.get("KMER_TPU_PALLAS_SORT") == "1"


def _encode_and_sort_rows(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool,
    pallas: str | None,
    row_len: int,
    pallas_sort: bool = False,
):
    words = _encode_words(bases, n_own, k, canonical, pallas)
    return _sort_words_as_rows(words, pallas, row_len, pallas_sort)


def _sort_words_as_rows(
    words,
    pallas: str | None,
    row_len: int,
    pallas_sort: bool = False,
):
    n = words[-1].shape[0]
    rows = max(1, -(-n // row_len))
    npad = rows * row_len
    shaped = []
    for w in words:
        if npad != n:
            w = jnp.pad(w, (0, npad - n), constant_values=word_sentinel(w.dtype))
        shaped.append(w.reshape(rows, npad // rows))
    # Experimental in-VMEM bitonic kernel (single-word keys only): ~16%
    # faster than XLA's row sort at m=2048 (ops/sort_pallas.py). Opt-in via
    # pallas_sort_enabled() — read OUTSIDE the jitted callers and passed as
    # a static arg so the jit cache keys on it (an env read at trace time
    # would silently ignore later toggles). Requires a Pallas-capable mode
    # (pallas is not None): the kernel shares the encoder's compile path.
    if (
        pallas_sort
        and pallas is not None
        and len(shaped) == 1
        and row_len & (row_len - 1) == 0
        and row_len % 128 == 0
        and rows % 8 == 0
    ):
        from dna_kmeres_parallel_tpu.ops.sort_pallas import row_sort_pallas_u32

        return (row_sort_pallas_u32(shaped[0], interpret=(pallas == "interpret")),)
    return tuple(jax.lax.sort(shaped, num_keys=len(shaped), dimension=-1))


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def sort_words(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """Flat [T] base stream -> tuple of SORTED code words (the production
    device program for k >= 13: encode -> [canonicalize] -> sort, nothing
    else).

    Words are lexicographic-major first — (lo_u32,) for k <= 15,
    (hi_u16, lo_u32) for k <= 23, else (hi_u32, lo_u32). Invalid windows
    sort to an all-ones sentinel tail. N = T-k+1 on the jnp path, T
    rounded up to the encoder tile on the Pallas path.

    Run boundaries and lengths are NOT computed on device: the host
    compactor (native.compact_sorted_native) derives both from neighbor
    compares in the single pass it makes anyway — a device neighbor-compare
    pass plus 1 B/window of D2H for information the sorted codes already
    carry. pallas='compiled'/'interpret' routes the encode through the
    fused Pallas kernel (ops/encode_pallas.py).
    """
    return _encode_and_sort(bases, n_own, k, canonical, pallas)


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "pallas", "row_len", "pallas_sort"),
)
def _sort_words_rows_jit(
    bases, n_own, k, canonical, pallas, row_len, pallas_sort
):
    return _encode_and_sort_rows(
        bases, n_own, k, canonical, pallas, row_len, pallas_sort
    )


def sort_words_rows(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
    row_len: int = 2048,
    pallas_sort: bool | None = None,
):
    """Row-sorted variant of sort_words: encode, then sort [rows, row_len]
    SEGMENTS of the window stream independently (lax.sort dimension=-1).

    XLA's TPU sort is a comparison network whose cost scales ~log^2 of the
    sorted segment, so R independent rows are far cheaper than one flat
    sort — measured on v5e at 16M windows: single u32 key 41.9 ms flat vs
    13.3 ms at 4096 rows; (u16, u32) keys 53.6 ms flat vs 13.7 ms at 8192
    rows (scripts/rowsort_probe{,2}.py). The R-way merge the device skips
    moves to the host compactor (native.compact_rows_native), which walks
    every entry once anyway and merges with a code-range-partitioned
    multiway heap.

    Returns the same word tuple as sort_words but 2-D [rows, row_len]; each
    row ascends with an all-ones sentinel tail (padding windows join the
    sentinels). The stream is padded up to a row multiple, so rows =
    ceil(n_windows / row_len).
    """
    if pallas_sort is None:  # resolved HERE, outside the jit boundary
        pallas_sort = pallas_sort_enabled()
    return _sort_words_rows_jit(
        bases, n_own, k, canonical, pallas, row_len, pallas_sort
    )


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def sort_words_packed(
    data: jax.Array,
    mask: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """sort_words over the 2-bit packed transfer format (data [T/4] +
    validity mask [T/8]; see models/engine.stage_batch): 4x less H2D, the
    unpack (v1) or plane conversion (v2 packed encoder) fuses into the
    device program."""
    words = _encode_words_packfmt(data, mask, n_own, k, canonical, pallas)
    return tuple(jax.lax.sort(words, num_keys=len(words)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "pallas", "row_len", "pallas_sort"),
)
def _sort_words_rows_packed_jit(
    data, mask, n_own, k, canonical, pallas, row_len, pallas_sort
):
    words = _encode_words_packfmt(data, mask, n_own, k, canonical, pallas)
    return _sort_words_as_rows(words, pallas, row_len, pallas_sort)


def sort_words_rows_packed(
    data: jax.Array,
    mask: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
    row_len: int = 2048,
    pallas_sort: bool | None = None,
):
    """sort_words_rows over the 2-bit packed transfer format."""
    if pallas_sort is None:  # resolved outside the jit boundary
        pallas_sort = pallas_sort_enabled()
    return _sort_words_rows_packed_jit(
        data, mask, n_own, k, canonical, pallas, row_len, pallas_sort
    )


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def encode_words(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """Encode-ONLY device program: UNSORTED adaptive code words.

    The device half of the no-device-sort sparse path: windows become the
    same split-word tuple sort_words produces — (lo,) / (hi_u16, lo) /
    (hi_u32, lo) with all-ones sentinels for invalid or padding windows —
    but are shipped in stream order with NO device sort. The host radix
    compactor (native.compact_unsorted_native) builds the sorted-unique
    table in a constant number of passes, so the comparison-network sort
    cost (the dominant device cost at k >= 13, ~log^2 of the segment)
    disappears from the device program entirely: encode runs at the HBM
    streaming bound (~2.6+ Gbase/s/chip measured vs 1.3-1.8 with the row
    sort fused in).
    """
    return _encode_words(bases, n_own, k, canonical, pallas)


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def encode_words_packed(
    data: jax.Array,
    mask: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """encode_words over the 2-bit packed transfer format."""
    return _encode_words_packfmt(data, mask, n_own, k, canonical, pallas)


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def sort_unique_starts(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """sort_words plus device-computed run-start flags.

    Returns (words, starts); starts[i] is True at the first element of
    each distinct run (False throughout the sentinel tail). Prefer
    sort_words + host compaction in pipelines; this variant serves
    device-resident consumers of the flags (and benches).
    """
    words = _encode_and_sort(bases, n_own, k, canonical, pallas)
    n = words[-1].shape[0]
    major = words[0]
    major_sent = jnp.asarray(
        0xFFFF if major.dtype == jnp.uint16 else 0xFFFFFFFF, major.dtype
    )
    is_valid = major != major_sent
    neq = jnp.zeros((n - 1,), jnp.bool_)
    for w in words:
        neq = neq | (w[1:] != w[:-1])
    starts = jnp.concatenate([is_valid[:1], neq & is_valid[1:]])
    return words, starts


def sort_unique_counts(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """Back-compat wrapper: (hi, lo, counts, starts) with device-computed
    run lengths. Prefer sort_unique_starts + host-side counts (the counts
    array costs a device scan and 4 bytes/window of D2H for information the
    start indices already encode)."""
    words, starts = sort_unique_starts(bases, n_own, k, canonical, pallas)
    return _with_counts(words, starts, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _with_counts(words, starts, k: int):
    lo_s = words[-1]
    n = lo_s.shape[0]
    if len(words) == 1:
        is_valid = lo_s != jnp.uint32(0xFFFFFFFF)
        hi_s = jnp.where(is_valid, jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    else:
        hi_s = words[0].astype(jnp.uint32)
        sent = jnp.asarray(
            0xFFFF if words[0].dtype == jnp.uint16 else 0xFFFFFFFF,
            words[0].dtype,
        )
        is_valid = words[0] != sent
        hi_s = jnp.where(is_valid, hi_s, jnp.uint32(0xFFFFFFFF))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    flagged = jnp.where(starts | ~is_valid, idx, n)
    # next_start_at_or_after[i] = min(flagged[i:]) — reverse cumulative min.
    # lax.cummin (native scan primitive) — NOT associative_scan, whose
    # generic slice/concat tree takes >15 min to compile at 4M elements on
    # the TPU toolchain (cummin: ~30 s).
    next_start = jax.lax.cummin(flagged, reverse=True)
    after = jnp.concatenate([next_start[1:], jnp.full((1,), n, jnp.int32)])
    counts = after - idx
    return hi_s, lo_s, counts, starts


def merged_code64(hi, lo):
    """Pack split words into one uint64 (host-side convenience)."""
    import numpy as np

    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64
    )


@functools.partial(jax.jit, static_argnames=("k", "canonical", "pallas"))
def sort_words_rle(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    canonical: bool = False,
    pallas: str | None = None,
):
    """Device sort + RLE compaction to DISTINCT (code, count) pairs — the
    high-duplication D2H mode (KmerConfig.compact='device-rle').

    Sequencing reads carry 30-50x coverage: most windows are duplicates.
    The words paths ship every window (6-8 B each) and leave dedup to the
    host radix (~50 Melem/s); here the device collapses runs after its
    sort, so D2H and host work scale with DISTINCT codes — ~(10/dup)
    B/window — and the host merge consumes already-sorted-unique tables
    through the two-pointer ladder (~100 Melem/s), with no radix pass.

    Device cost: the usual multi-key sort plus ONE extra single-key sort
    (the distinct-first compaction permutes run starts to the front by
    their stream position, which is code order). Low-duplication inputs
    should prefer the no-sort encode path — the device sort only pays
    when dup is high.

    Returns (words_compact, counts_i32, n_distinct_i32): entries past
    n_distinct are sentinel garbage; counts[j] is the j-th distinct
    code's multiplicity.
    """
    words, starts = sort_unique_starts(bases, n_own, k, canonical, pallas)
    n = words[-1].shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    key = jnp.where(starts, idx, jnp.int32(n))
    parts = jax.lax.sort((key, *words), num_keys=1)
    pos = parts[0]
    words_c = parts[1:]
    n_distinct = jnp.sum(starts.astype(jnp.int32))
    major = words[0]
    major_sent = jnp.asarray(
        0xFFFF if major.dtype == jnp.uint16 else 0xFFFFFFFF, major.dtype
    )
    n_valid = jnp.sum((major != major_sent).astype(jnp.int32))
    nxt = jnp.concatenate([pos[1:], jnp.full((1,), n, jnp.int32)])
    counts = jnp.where(nxt == n, n_valid, nxt) - pos
    return words_c, counts, n_distinct
