"""Synthetic FASTA generation for benchmarks and large-scale tests."""

from __future__ import annotations

import numpy as np

_ALPHABET = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_fasta(
    path: str,
    n_seqs: int,
    seq_len: int | tuple[int, int],
    seed: int = 0,
    line_width: int = 80,
    invalid_frac: float = 0.0,
) -> int:
    """Write a random FASTA file; returns total bases written.

    seq_len: fixed length or (lo, hi) uniform range.
    """
    rng = np.random.default_rng(seed)
    total = 0
    with open(path, "wb") as f:
        for i in range(n_seqs):
            if isinstance(seq_len, tuple):
                L = int(rng.integers(seq_len[0], seq_len[1] + 1))
            else:
                L = seq_len
            seq = _ALPHABET[rng.integers(0, 4, size=L)]
            if invalid_frac > 0:
                mask = rng.random(L) < invalid_frac
                seq = np.where(mask, np.uint8(ord("N")), seq)
            f.write(b">seq%d synthetic\n" % i)
            for off in range(0, L, line_width):
                f.write(seq[off : off + line_width].tobytes())
                f.write(b"\n")
            f.write(b"\n")
            total += L
    return total
