"""2-bit DNA codec: base encoding, k-mer codes, reverse complements, packing.

The canonical k-mer index space of this framework is the **big-endian rolling
2-bit code**: for a k-mer string ``s``,

    code(s) = sum_t base(s[t]) * 4**(k-1-t),   base: A=0, C=1, G=2, T=3

i.e. lexicographic order (AAA=0, AAC=1, ..., TTT=4^k-1), identical to the
rolling update ``c = ((c << 2) | b) & (4^k - 1)``.

Reference-parity note: the reference builds its vocabulary with an odometer
whose digit 0 varies fastest and writes string position j from digit j
(/root/reference/utils.h:21-50), so *its* internal index space is
little-endian (index 1 = "CAA"). That layout is a pure permutation
(string-reversal) of ours; per-k-mer-string counts and all pairwise distances
are invariant under it, and the reference only ever externalizes distances
(main.cu:199-202,355-358), never raw count vectors. We therefore use the
natural rolling-code order and verify parity on per-string counts and on
distances, not on internal bucket layout.

Everything here is pure NumPy (host-side). Device-side twins live in
``ops/encode.py``.
"""

from __future__ import annotations

import numpy as np

#: Number of bits per base in the packed representation.
BITS_PER_BASE = 2

#: Sentinel base code for characters outside {A,C,G,T} (case-sensitive,
#: matching the reference: lowercase/N/anything else is invalid —
#: reference sends such windows to bucket 0 (main.cu:643-644) / never
#: matches them (kernels.h:136-139); both exclude them from distances.
INVALID_BASE = np.uint8(0xFF)

# 256-entry ASCII -> base-code lookup table.
_BASE_LUT = np.full(256, INVALID_BASE, dtype=np.uint8)
_BASE_LUT[ord("A")] = 0
_BASE_LUT[ord("C")] = 1
_BASE_LUT[ord("G")] = 2
_BASE_LUT[ord("T")] = 3

_BASE_CHARS = np.frombuffer(b"ACGT", dtype=np.uint8)


def num_bins(k: int) -> int:
    """4**k — size of the dense histogram for k-mer length ``k``."""
    return 1 << (2 * k)


def encode_bases(seq: str | bytes | np.ndarray) -> np.ndarray:
    """ASCII sequence -> uint8 base codes (0..3; INVALID_BASE elsewhere)."""
    if isinstance(seq, str):
        raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    elif isinstance(seq, (bytes, bytearray)):
        raw = np.frombuffer(bytes(seq), dtype=np.uint8)
    else:
        raw = np.asarray(seq, dtype=np.uint8)
    return _BASE_LUT[raw]


def decode_bases(codes: np.ndarray) -> str:
    """uint8 base codes (0..3) -> ASCII string. Invalid codes -> 'N'."""
    codes = np.asarray(codes)
    out = np.full(codes.shape, ord("N"), dtype=np.uint8)
    ok = codes < 4
    out[ok] = _BASE_CHARS[codes[ok]]
    return out.tobytes().decode("ascii")


def kmer_to_code(kmer: str) -> int:
    """k-mer string -> canonical big-endian code. Raises on invalid chars."""
    code = 0
    for ch in kmer:
        b = int(_BASE_LUT[ord(ch)])
        if b > 3:
            raise ValueError(f"invalid base {ch!r} in k-mer {kmer!r}")
        code = (code << 2) | b
    return code


def code_to_kmer(code: int, k: int) -> str:
    """Canonical code -> k-mer string (inverse of kmer_to_code)."""
    chars = []
    for t in range(k):
        chars.append("ACGT"[(code >> (2 * (k - 1 - t))) & 3])
    return "".join(chars)


def kmer_codes(base_codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-window codes of a base-code array.

    Returns ``(codes, valid)`` each of length ``max(len - k + 1, 0)``:
    ``codes[i]`` is the big-endian code of the window starting at ``i``
    (garbage where invalid), ``valid[i]`` is True iff all k bases of the
    window are in {A,C,G,T}. Window count = L - k + 1, matching the
    reference's loop bounds (main.cu:641, kernels.h:133).
    """
    base_codes = np.asarray(base_codes, dtype=np.uint8)
    n = base_codes.shape[0] - k + 1
    if n <= 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool))
    codes = np.zeros(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for t in range(k):
        window = base_codes[t : t + n]
        valid &= window < 4
        codes = (codes << 2) | (window & 3).astype(np.int64)
    return codes, valid


def all_kmers(k: int) -> list[str]:
    """All 4^k k-mer strings in canonical (lexicographic) order — the
    explicit vocabulary the reference materializes with its odometer
    (utils.h:21-50); here it exists only for display/debug, never in the
    compute path (codes are implicit)."""
    if k > 12:
        raise ValueError("refusing to materialize 4^k strings for k > 12")
    return [code_to_kmer(c, k) for c in range(num_bins(k))]


def revcomp_str(seq: str) -> str:
    """Reverse complement of an ACGT string (N and others map to N)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp.get(ch, "N") for ch in reversed(seq))


def revcomp_code(code: int | np.ndarray, k: int):
    """Reverse complement in code space: complement each 2-bit digit
    (b -> 3-b, i.e. XOR 3) and reverse digit order."""
    code = np.asarray(code)
    rc = np.zeros_like(code)
    c = code.copy()
    for _ in range(k):
        rc = (rc << 2) | ((c & 3) ^ 3)
        c = c >> 2
    if rc.ndim == 0:
        return int(rc)
    return rc


def canonical_code(code: int | np.ndarray, k: int):
    """min(code, revcomp(code)) — the canonical (strand-folded) code."""
    rc = revcomp_code(code, k)
    out = np.minimum(code, rc)
    if np.ndim(out) == 0:
        return int(out)
    return out


# ---------------------------------------------------------------------------
# 2-bit packing (4 bases/byte) + validity bitmask (8 bases/byte).
#
# This is the codec the reference only sketched and never shipped
# (/root/reference/utils.h:65-92, main.cu:78-86: "00->A, 01->C, 10->G, 11->T").
# Packed layout is little-endian within a byte: base i of a 4-base group
# occupies bits [2i, 2i+2), so byte = b0 | b1<<2 | b2<<4 | b3<<6. Invalid
# bases pack as 0 ('A') in the data plane and as a 0 bit in the mask plane.
# ---------------------------------------------------------------------------


def pack_bases(base_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Pack uint8 base codes to (packed_data, packed_mask, length).

    packed_data: uint8 [ceil(L/4)]  — 4 bases per byte, little-endian.
    packed_mask: uint8 [ceil(L/8)]  — validity bits, little-endian.
    """
    base_codes = np.asarray(base_codes, dtype=np.uint8)
    L = base_codes.shape[0]
    valid = base_codes < 4
    safe = np.where(valid, base_codes, 0).astype(np.uint8)
    pad4 = (-L) % 4
    data4 = np.concatenate([safe, np.zeros(pad4, dtype=np.uint8)]).reshape(-1, 4)
    packed = (
        data4[:, 0]
        | (data4[:, 1] << 2)
        | (data4[:, 2] << 4)
        | (data4[:, 3] << 6)
    ).astype(np.uint8)
    mask = np.packbits(valid, bitorder="little")
    return packed, mask, L


def unpack_bases(packed: np.ndarray, mask: np.ndarray, length: int) -> np.ndarray:
    """Inverse of pack_bases: -> uint8 base codes with INVALID_BASE holes."""
    packed = np.asarray(packed, dtype=np.uint8)
    b = np.empty((packed.shape[0], 4), dtype=np.uint8)
    b[:, 0] = packed & 3
    b[:, 1] = (packed >> 2) & 3
    b[:, 2] = (packed >> 4) & 3
    b[:, 3] = (packed >> 6) & 3
    flat = b.reshape(-1)[:length]
    valid = np.unpackbits(np.asarray(mask, dtype=np.uint8), bitorder="little")[
        :length
    ].astype(bool)
    return np.where(valid, flat, INVALID_BASE).astype(np.uint8)


def concat_with_sentinels(seqs) -> "np.ndarray":
    """Encode sequences into ONE flat uint8 stream joined by single 0xFF
    sentinels (the invariant every engine shares: sequence boundaries are
    one INVALID byte, so no window spans two sequences)."""
    parts = []
    for i, s in enumerate(seqs):
        if i:
            parts.append(np.array([INVALID_BASE], dtype=np.uint8))
        parts.append(encode_bases(s))
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)
