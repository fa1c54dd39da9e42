"""The TPU engine: batched counting + pairwise distances on device.

High-level flow (the TPU-native re-design of the reference's main(),
/root/reference/main.cu:120-174):

  FASTA -> host parse/encode -> padded device batches
        -> rolling-code encode (ops/encode)
        -> histogram / counts matrix (ops/histogram, Pallas twins)
        -> (min,+) distance reduction (ops/distance)
        -> reference-format CSVs / count tables (utils/io)

Counting uses a flat base stream with one invalid sentinel byte between
sequences (mirroring the reference's '|'->'\\0' sentinel, main.cu:506,539):
any window touching a sentinel is invalid, so no cross-sequence window is
ever counted and chunk boundaries stay exact.

Every path here is verified count-for-count against models/oracle.py.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dna_kmeres_parallel_tpu.models import oracle
from dna_kmeres_parallel_tpu.ops import distance as dist_ops
from dna_kmeres_parallel_tpu.ops import encode as encode_ops
from dna_kmeres_parallel_tpu.ops import histogram as hist_ops
from dna_kmeres_parallel_tpu.utils import codec, fasta
from dna_kmeres_parallel_tpu.utils.config import KmerConfig

_LANE = 128  # pad axes to lane multiples so XLA tiles cleanly


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pow2_bucket(x: int) -> int:
    """Smallest power of two >= x (>= 128): shape buckets for small inputs."""
    b = _LANE
    while b < x:
        b <<= 1
    return b


@dataclass
class CountResult:
    k: int
    canonical: bool
    hist: np.ndarray  # int64 [4^k] dense histogram
    n_seqs: int
    total_bases: int
    elapsed_s: float = 0.0

    def table(self) -> dict[str, int]:
        nz = np.nonzero(self.hist)[0]
        return {codec.code_to_kmer(int(c), self.k): int(self.hist[c]) for c in nz}

    @property
    def total_kmers(self) -> int:
        return int(self.hist.sum())

    @property
    def distinct_kmers(self) -> int:
        return int(np.count_nonzero(self.hist))


@dataclass
class DistanceResult:
    k: int
    n: int
    ids: list[str]
    packed: np.ndarray  # float32 [n*(n-1)/2] strict upper triangle
    counts: np.ndarray | None = None  # int32 [n, 4^k] per-sequence counts
    elapsed_s: float = 0.0


@functools.partial(jax.jit, static_argnames=("k", "bins", "canonical"))
def _count_batch(
    bases: jax.Array, n_own: jax.Array, k: int, bins: int, canonical: bool
) -> jax.Array:
    """One flat base batch [T] uint8 -> dense histogram [bins] int32.

    Only windows *starting* at positions < n_own are counted; the trailing
    k-1 bases are the halo completing the last owned windows (SURVEY.md §5
    halo-correct chunking) — windows starting inside the halo belong to the
    next chunk and are masked out here, so every window is counted exactly
    once across chunk boundaries.
    """
    codes, valid = encode_ops.rolling_codes(bases, k)
    n = codes.shape[0]
    own = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_own
    valid = valid & own
    if canonical:
        codes = encode_ops.canonicalize(codes, k)
    return hist_ops.histogram(codes, valid, bins)


@functools.partial(jax.jit, static_argnames=("k", "bins", "canonical"))
def _counts_matrix_batch(
    bases: jax.Array, k: int, bins: int, canonical: bool
) -> jax.Array:
    """Padded sequence grid [S, L] uint8 -> per-sequence counts [S, bins]."""
    codes, valid = encode_ops.rolling_codes(bases, k)
    if canonical:
        codes = encode_ops.canonicalize(codes, k)
    return hist_ops.counts_matrix(codes, valid, bins)


class KmerEngine:
    """Single-host engine. Multi-chip sharding lives in parallel/."""

    def __init__(self, config: KmerConfig | None = None, **kw):
        self.config = (config or KmerConfig()).replace(**kw) if kw else (
            config or KmerConfig()
        )
        if self.config.k > encode_ops.MAX_DENSE_K:
            raise NotImplementedError(
                f"dense engine supports k <= {encode_ops.MAX_DENSE_K}; "
                f"use the sparse engine (ops/sparse.py) for k={self.config.k}"
            )

    # ------------------------------------------------------------- ingest
    def _parse(self, source) -> list[fasta.FastaRecord]:
        cfg = self.config
        if cfg.parser_variant == "modern":
            return fasta.parse_fasta(source, max_seqs=cfg.max_seqs)
        return fasta.parse_fasta_reference(
            source, variant=cfg.parser_variant, max_seqs=cfg.max_seqs
        )

    def _flat_stream(self, seqs: list[str]) -> tuple[np.ndarray, int]:
        """Concatenate base codes with 1 invalid sentinel between sequences."""
        total = sum(len(s) for s in seqs) + max(len(seqs) - 1, 0)
        flat = np.full(total, codec.INVALID_BASE, dtype=np.uint8)
        pos = 0
        for i, s in enumerate(seqs):
            if i:
                pos += 1  # sentinel separator
            flat[pos : pos + len(s)] = codec.encode_bases(s)
            pos += len(s)
        return flat, total

    # ------------------------------------------------------------- counting
    def count_sequences(self, seqs: list[str]) -> CountResult:
        cfg = self.config
        t0 = time.perf_counter()
        total_bases = sum(len(s) for s in seqs)
        hist = np.zeros(cfg.bins, dtype=np.int64)
        if total_bases:
            flat, total = self._flat_stream(seqs)
            overlap = cfg.k - 1
            # Inputs smaller than one batch use a power-of-two shape bucket
            # (bounded compile count); larger inputs stream through a single
            # fixed batch shape (one compile).
            batch = max(min(cfg.batch_bases, _pow2_bucket(total)), cfg.k)
            T = _round_up(batch + overlap, _LANE)
            start = 0
            while start < total:
                end = min(start + batch, total)
                # Each chunk owns windows *starting* in [start, end); the
                # halo [end, end+k-1) completes the tail windows.
                seg = flat[start : min(end + overlap, total)]
                padded = np.full(T, codec.INVALID_BASE, dtype=np.uint8)
                padded[: seg.shape[0]] = seg
                h = _count_batch(
                    jnp.asarray(padded),
                    jnp.int32(end - start),
                    cfg.k,
                    cfg.bins,
                    cfg.canonical,
                )
                hist += np.asarray(h, dtype=np.int64)
                start = end
        return CountResult(
            k=cfg.k,
            canonical=cfg.canonical,
            hist=hist,
            n_seqs=len(seqs),
            total_bases=total_bases,
            elapsed_s=time.perf_counter() - t0,
        )

    def count_file(self, source) -> CountResult:
        records = self._parse(source)
        return self.count_sequences([r.seq for r in records])

    # ------------------------------------------------------------- distances
    def counts_matrix(self, seqs: list[str]) -> np.ndarray:
        cfg = self.config
        S = len(seqs)
        L = max((len(s) for s in seqs), default=0)
        Lp = _round_up(max(L, cfg.k), _LANE)
        grid = np.full((S, Lp), codec.INVALID_BASE, dtype=np.uint8)
        for i, s in enumerate(seqs):
            grid[i, : len(s)] = codec.encode_bases(s)
        counts = _counts_matrix_batch(
            jnp.asarray(grid), cfg.k, cfg.bins, cfg.canonical
        )
        return np.asarray(counts)

    def distance_sequences(
        self, seqs: list[str], ids: list[str] | None = None
    ) -> DistanceResult:
        cfg = self.config
        t0 = time.perf_counter()
        n = len(seqs)
        counts = self.counts_matrix(seqs)
        lengths = jnp.asarray([len(s) for s in seqs], dtype=jnp.int32)
        packed = dist_ops.distance_matrix_packed(
            jnp.asarray(counts), lengths, cfg.k
        )
        return DistanceResult(
            k=cfg.k,
            n=n,
            ids=ids or [f">seq{i}" for i in range(n)],
            packed=np.asarray(packed),
            counts=counts,
            elapsed_s=time.perf_counter() - t0,
        )

    def distance_file(self, source) -> DistanceResult:
        records = self._parse(source)
        return self.distance_sequences(
            [r.seq for r in records], ids=[r.id for r in records]
        )

    # ------------------------------------------------------------- verification
    def verify_against_oracle(self, seqs: list[str]) -> dict:
        """Differential check (the formalization of the reference's dual-engine
        CSV-diff strategy, SURVEY.md §4): exact count + distance equality."""
        cfg = self.config
        got = self.count_sequences(seqs)
        want = sum(
            (oracle.count_vector(s, cfg.k, cfg.canonical) for s in seqs),
            np.zeros(cfg.bins, dtype=np.int64),
        )
        counts_equal = bool(np.array_equal(got.hist, want))
        d_got = self.distance_sequences(seqs).packed
        d_want = oracle.distance_matrix_packed(seqs, cfg.k, cfg.canonical)
        dist_equal = bool(np.array_equal(d_got, d_want))
        return {
            "counts_equal": counts_equal,
            "distances_equal": dist_equal,
            "n_seqs": len(seqs),
            "total_kmers": int(want.sum()),
        }
