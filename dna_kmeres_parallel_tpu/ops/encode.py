"""Device-side encoding: 2-bit unpack, rolling k-mer codes, RC canonicalization.

These are the jnp twins of utils/codec.py, shaped for XLA: static shapes,
unrolled static-k loops (k is a Python int at trace time), no data-dependent
control flow. They replace the reference's per-k-mer string-compare scan
(/root/reference/kernels.h:133-141) with one rolling-code pass per base.

Codes use int32 — valid for k <= 15 (4^15 < 2^31). Larger k uses the
split-word representation in ops/sparse.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DENSE_K = 15

#: device-side sentinel for invalid bases (matches utils.codec.INVALID_BASE)
INVALID = 0xFF


def ascii_to_bases(ascii_u8: jax.Array) -> jax.Array:
    """ASCII bytes -> uint8 base codes (0..3, INVALID elsewhere), on device.

    Branch-free arithmetic instead of a 256-entry gather: A(65)->0, C(67)->1,
    G(71)->2, T(84)->3.
    """
    x = ascii_u8.astype(jnp.int32)
    code = jnp.where(
        x == ord("A"), 0,
        jnp.where(x == ord("C"), 1,
                  jnp.where(x == ord("G"), 2,
                            jnp.where(x == ord("T"), 3, INVALID))),
    )
    return code.astype(jnp.uint8)


def unpack_2bit(packed_u8: jax.Array) -> jax.Array:
    """uint8 packed bytes [B] -> uint8 base codes [B*4] (little-endian in byte).

    Inverse of utils.codec.pack_bases's data plane; validity comes from the
    separate mask plane (see unpack_mask).
    """
    p = packed_u8.astype(jnp.uint8)
    parts = jnp.stack(
        [p & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3], axis=-1
    )
    return parts.reshape(*packed_u8.shape[:-1], -1)


def unpack_mask(mask_u8: jax.Array) -> jax.Array:
    """uint8 mask bytes [B] -> bool validity [B*8] (little-endian in byte)."""
    m = mask_u8.astype(jnp.uint8)
    bits = jnp.stack([(m >> i) & 1 for i in range(8)], axis=-1)
    return bits.reshape(*mask_u8.shape[:-1], -1).astype(jnp.bool_)


def unpack_stream(data_u8: jax.Array, mask_u8: jax.Array) -> jax.Array:
    """Packed (data [T/4], mask [T/8]) planes -> uint8 base codes [T].

    The device half of the 2-bit packed transfer format (the encoding the
    reference only sketched, /root/reference/utils.h:65-92): the host ships
    4 bases/byte + a validity bitmask (utils.codec.pack_bases / native
    kp_pack_2bit) — 4.5 bytes per 16 bases instead of 16 — and this unpack
    is the first (fully fused) step of the jitted count program. Invalid
    bases come back as the INVALID sentinel. T must be a multiple of 8
    (batches are padded to lane multiples anyway).
    """
    bases = unpack_2bit(data_u8)
    valid = unpack_mask(mask_u8)
    return jnp.where(valid, bases, jnp.uint8(INVALID))


def rolling_codes(bases: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Window codes over the trailing axis.

    bases: uint8 [..., T] base codes (0..3 valid, anything else invalid).
    Returns (codes int32 [..., T-k+1], valid bool [..., T-k+1]): codes[i] is
    the big-endian code of window [i, i+k); valid[i] iff all k bases valid.
    Invalid sentinel bases double as sequence separators: any window touching
    one is dropped, which is exactly the cross-boundary-window exclusion the
    flat-stream counter relies on (SURVEY.md §5 halo/chunk design).

    Uses logarithmic doubling: span-2^j codes combine pairwise, so k-window
    codes take ceil(log2 k)+1 passes instead of k (the naive unrolled
    shift-or costs ~10 ms per 4M windows at k=11 through XLA; doubling
    roughly halves-to-thirds that).
    """
    if k < 1 or k > MAX_DENSE_K:
        raise ValueError(f"rolling_codes supports 1 <= k <= {MAX_DENSE_K}, got {k}")
    T = bases.shape[-1]
    n = T - k + 1
    if n <= 0:
        raise ValueError(f"window axis too short: T={T} < k={k}")

    def win(x, start, length):
        return jax.lax.slice_in_dim(x, start, start + length, axis=-1)

    # Power-of-two span codes: levels[j] = (code, valid) for span 2^j, where
    # code[i] encodes bases [i, i + 2^j) big-endian.
    code = (bases & 3).astype(jnp.int32)
    valid = bases < 4
    levels = [(code, valid)]
    span = 1
    while span * 2 <= k:
        m = bases.shape[-1] - 2 * span + 1
        code = (win(code, 0, m) << (2 * span)) | win(code, span, m)
        valid = win(valid, 0, m) & win(valid, span, m)
        levels.append((code, valid))
        span *= 2

    # Binary decomposition of k: concatenate the selected power spans,
    # most significant first, at increasing offsets.
    acc_code = None
    acc_valid = None
    off = 0
    for j in range(len(levels) - 1, -1, -1):
        s = 1 << j
        if not (k & s):
            continue
        c_j, v_j = levels[j]
        c = win(c_j, off, n)
        v = win(v_j, off, n)
        if acc_code is None:
            acc_code, acc_valid = c, v
        else:
            acc_code = (acc_code << (2 * s)) | c
            acc_valid = acc_valid & v
        off += s
    return acc_code, acc_valid


def revcomp_codes(codes: jax.Array, k: int) -> jax.Array:
    """Reverse-complement in code space: per-digit complement (XOR 3) with
    digit-order reversal. Unrolled static-k shift loop."""
    rc = jnp.zeros_like(codes)
    c = codes
    for _ in range(k):
        rc = (rc << 2) | ((c & 3) ^ 3)
        c = c >> 2
    return rc


def canonicalize(codes: jax.Array, k: int) -> jax.Array:
    """min(code, revcomp(code)) — strand-folded canonical codes."""
    return jnp.minimum(codes, revcomp_codes(codes, k))
