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
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dna_kmeres_parallel_tpu.models import distance_stream, oracle
from dna_kmeres_parallel_tpu.ops import distance as dist_ops
from dna_kmeres_parallel_tpu.ops import distance_pallas
from dna_kmeres_parallel_tpu.ops import encode as encode_ops
from dna_kmeres_parallel_tpu.ops import histogram as hist_ops
from dna_kmeres_parallel_tpu.ops import histogram_pallas
from dna_kmeres_parallel_tpu.ops import runtime
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


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _count_batch(
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str | None = None,
) -> jax.Array:
    """One flat base batch [T] uint8 -> dense histogram [bins] int32.

    Only windows *starting* at positions < n_own are counted; the trailing
    k-1 bases are the halo completing the last owned windows (SURVEY.md §5
    halo-correct chunking) — windows starting inside the halo belong to the
    next chunk and are masked out here, so every window is counted exactly
    once across chunk boundaries.

    pallas: None -> jnp path; 'compiled'/'interpret' -> the fused two-level
    MXU Pallas kernel (ops/histogram_pallas.py). Measured on TPU v5e, the
    Pallas kernel wins up to 64K bins (k <= 8: ~1 Gbase/s vs ~0.14 for XLA
    scatter); beyond that the compare cost of the one-hot planes dominates
    and XLA scatter (or the sparse sort path) is faster.
    """
    if pallas is not None and bins <= (1 << 16):
        return histogram_pallas.histogram_pallas(
            bases, n_own, k, bins, canonical, interpret=(pallas == "interpret")
        )
    codes, valid = encode_ops.rolling_codes(bases, k)
    n = codes.shape[0]
    own = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_own
    valid = valid & own
    if canonical:
        codes = encode_ops.canonicalize(codes, k)
    return hist_ops.histogram(codes, valid, bins)


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _count_batch_acc(
    acc: jax.Array,
    bases: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str | None = None,
) -> jax.Array:
    """acc + count(batch) in ONE dispatch: separate tiny add programs cost
    ~100 ms each over the tunneled dev TPU (no donation: the retry path may
    reuse acc after a failed dispatch)."""
    return acc + _count_batch(bases, n_own, k, bins, canonical, pallas)


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _count_batch_packed(
    data: jax.Array,
    mask: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str | None = None,
) -> jax.Array:
    """_count_batch over the 2-bit packed transfer format: the host ships
    (data [T/4], mask [T/8]) — 4x less H2D — and the unpack fuses into the
    count program (ops/encode.unpack_stream)."""
    bases = encode_ops.unpack_stream(data, mask)
    return _count_batch(bases, n_own, k, bins, canonical, pallas)


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _count_batch_acc_packed(
    acc: jax.Array,
    data: jax.Array,
    mask: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str | None = None,
) -> jax.Array:
    bases = encode_ops.unpack_stream(data, mask)
    return acc + _count_batch(bases, n_own, k, bins, canonical, pallas)


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _count_batch_planes(
    w_le: jax.Array,
    iv_be: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str = "compiled",
) -> jax.Array:
    """Dense count over HOST-STAGED u32 planes (r5): the packed-plane
    bp2 kernel does SWAR funnel extraction + the one-hot NT accumulate
    in one pass — no in-jit unpack materialization (the *_packed
    variants pay a [T] u8 round trip through HBM before the kernel) and
    0.5 B/base of H2D. k = 4..8 (the bp2 band); measured 1.07-1.17x the
    u8 kernel on v5e (scripts/bp2_packed_probe.py)."""
    return histogram_pallas.histogram_bp2_packed_pallas(
        w_le, iv_be, n_own, k, bins, canonical,
        interpret=(pallas == "interpret"),
    ).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _count_batch_acc_planes(
    acc: jax.Array,
    w_le: jax.Array,
    iv_be: jax.Array,
    n_own: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str = "compiled",
) -> jax.Array:
    return acc + _count_batch_planes(
        w_le, iv_be, n_own, k, bins, canonical, pallas
    )


def stage_batch(padded, pack: bool):
    """Host->device staging of one padded batch [T] uint8.

    pack=True ships the 2-bit packed planes (4 bases/byte + validity
    bitmask; native kp_pack_2bit or the numpy codec) — 4.5 bytes per 16
    bases of H2D instead of 16 — for the *_packed program variants.
    Returns a device array (pack=False) or a (data, mask) tuple.
    """
    if not pack:
        return jnp.asarray(padded)
    from dna_kmeres_parallel_tpu import native
    from dna_kmeres_parallel_tpu.utils import codec

    if native.available():
        data, mask, _ = native.pack_2bit_native(padded)
    else:
        data, mask, _ = codec.pack_bases(padded)
    return jnp.asarray(data), jnp.asarray(mask)


def pack_planes_np(flat_u8):
    """HOST half of the v2 plane staging: pack + plane build, numpy in
    and numpy out (the single definition of the pack/plane contract —
    the single-chip and DP-sparse stagers both delegate here)."""
    from dna_kmeres_parallel_tpu import native
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        host_planes_from_packfmt,
    )
    from dna_kmeres_parallel_tpu.utils import codec

    if native.available():
        data, mask, _ = native.pack_2bit_native(flat_u8)
    else:
        data, mask, _ = codec.pack_bases(flat_u8)
    return host_planes_from_packfmt(data, mask)


def stage_batch_planes(padded):
    """v2 encoder staging: pack on host, then build the kernel's u32
    planes host-side (encode_pallas.host_planes_from_packfmt) so the
    device program is the Pallas kernel ALONE — no XLA format-conversion
    pre-pass (measured 4x the kernel's cost; see BENCHMARKS.md "Encoder
    v2"). Ships (words_le, inval_be), 0.5 B/base of H2D."""
    w_le, inval_be = pack_planes_np(padded)
    return jnp.asarray(w_le), jnp.asarray(inval_be)


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "canonical", "pallas")
)
def _counts_matrix_batch(
    bases: jax.Array,
    k: int,
    bins: int,
    canonical: bool,
    pallas: str | None = None,
) -> jax.Array:
    """Padded sequence grid [S, L] uint8 -> per-sequence counts [S, bins]."""
    if pallas is not None and bins <= histogram_pallas._MAX_ONEHOT_BINS:
        return histogram_pallas.counts_matrix_pallas(
            bases, k, bins, canonical, interpret=(pallas == "interpret")
        )
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

    def _pallas(self) -> str | None:
        """Effective Pallas mode: honors config.use_pallas and the backend."""
        if not self.config.use_pallas:
            return None
        return runtime.pallas_mode()

    def _mesh(self):
        """Device mesh from config.mesh_shape (None = single chip;
        mesh_shape=(1,) also resolves to None — the single-chip triangle
        kernel beats a 1-device shard_map of the full square, matching
        StreamingCounter._mesh)."""
        if not self.config.mesh_shape:
            return None
        from dna_kmeres_parallel_tpu.parallel.mesh import make_mesh

        n = 1
        for d in self.config.mesh_shape:
            n *= d
        return make_mesh(n) if n > 1 else None

    def _mxu_dist_cmax(self, counts_np) -> int | None:
        """Whether the MXU threshold route serves this counts matrix:
        returns the static cmax to use (rounded up to its power-of-two
        bucket — extra thresholds contribute zero exactly, and a cmax
        stream then compiles a bounded program set), or None to keep the
        (min,+) routes.

        Gates (r4 continuation — COST-based, not a fixed crossover):
        cmax_bucket <= the unroll cap (KMER_TPU_MXU_CMAX, default
        ops.distance.MXU_CMAX_DEFAULT=64; setting the env skips the cost
        comparison — an explicit override is trusted), predicted MXU
        time under the measured per-pair models beats the route the
        engine would otherwise take (Pallas tri for bins <= 64K on a
        Pallas backend, jnp past it — mxu_time_per_pair vs
        tri/jnp_time_per_pair; at 64K bins the breakeven sits near
        cmax ~40, at 64 bins near ~35, both measured), every row's
        window total < 2^31 (int32 exactness — always true for int32
        counts matrices in practice), and a real TPU backend
        (KMER_TPU_DIST_MXU=1/0 forces/disables — tests route it on CPU
        with =1)."""
        force = os.environ.get("KMER_TPU_DIST_MXU")
        if force == "0":
            return None
        counts_np = np.asarray(counts_np)
        if counts_np.size == 0:
            return None
        cmax = int(counts_np.max(initial=0))
        if cmax <= 0:
            return None
        cmax_b = 1 << max(cmax - 1, 0).bit_length()
        limit_env = os.environ.get("KMER_TPU_MXU_CMAX")
        limit = int(limit_env) if limit_env else dist_ops.MXU_CMAX_DEFAULT
        if cmax_b > limit:
            return None
        if limit_env is None:
            bins = int(counts_np.shape[1])
            if (
                self._pallas() is not None
                and bins <= distance_pallas._ROUTE_MAX_BINS
            ):
                t_alt = dist_ops.tri_time_per_pair(bins)
            else:
                t_alt = dist_ops.jnp_time_per_pair(bins)
            if dist_ops.mxu_time_per_pair(bins, cmax_b) >= t_alt:
                return None
        if int(counts_np.sum(axis=1).max(initial=0)) >= (1 << 31):
            return None
        if force != "1" and runtime.pallas_mode() != "compiled":
            return None
        return cmax_b

    def _min_sum_panel_mesh(self, panel, other, mesh, pallas,
                            mxu_cmax=None):
        """Column-sharded (min,+) panel over the mesh: [Pr, bins] x
        [S2, bins] -> np.int32 [Pr, S2]. Pads partner rows to a mesh-axis
        multiple with zero-count rows (min-sum 0, sliced off); routes the
        MXU threshold matmuls (mxu_cmax) or the Pallas kernel per shard
        exactly like the single-chip engine, with the same
        compile-failure degradation to jnp."""
        from dna_kmeres_parallel_tpu.parallel.mesh import DATA_AXIS
        from dna_kmeres_parallel_tpu.parallel.sharded_count import (
            min_sum_panel_sharded,
        )

        D = mesh.shape[DATA_AXIS]
        S2 = other.shape[0]
        pad = (-S2) % D
        if pad:
            other = jnp.pad(other, ((0, pad), (0, 0)))
        if mxu_cmax is not None and not getattr(
            self, "_mesh_mxu_broken", False
        ):
            try:
                sums = min_sum_panel_sharded(
                    panel, other, mesh, mxu_cmax=mxu_cmax
                )
                return np.asarray(sums)[:, :S2]
            except Exception as e:
                if not runtime.degradable_compile_error(e):
                    raise
                # Sticky: fall through to the Pallas/jnp routes for the
                # rest of the stream (same policy as below).
                self._mesh_mxu_broken = True
        use_pl = (
            pallas
            if (
                pallas is not None
                and self.config.bins <= distance_pallas._ROUTE_MAX_BINS
                and not getattr(self, "_mesh_pallas_broken", False)
            )
            else None
        )
        try:
            sums = min_sum_panel_sharded(panel, other, mesh, pallas=use_pl)
        except Exception as e:
            if use_pl is None or not runtime.degradable_compile_error(e):
                raise
            # Sticky degradation: a streamed run dispatches one panel per
            # loop iteration — re-attempting the failing compile every
            # panel would pay the multi-minute remote failure ~30x at
            # design scale.
            self._mesh_pallas_broken = True
            sums = min_sum_panel_sharded(panel, other, mesh, pallas=None)
        return np.asarray(sums)[:, :S2]

    # ------------------------------------------------------------- ingest
    def _parse(self, source) -> list[fasta.FastaRecord]:
        cfg = self.config
        if cfg.parser_variant == "modern":
            return fasta.parse_fasta(source, max_seqs=cfg.max_seqs)
        return fasta.parse_fasta_reference(
            source, variant=cfg.parser_variant, max_seqs=cfg.max_seqs
        )

    def _flat_stream(self, seqs: list[str]) -> tuple[np.ndarray, int]:
        """Concatenate base codes with 1 invalid sentinel between sequences
        (the shared codec helper — one implementation of the invariant)."""
        flat = codec.concat_with_sentinels(seqs)
        return flat, flat.shape[0]

    # ------------------------------------------------------------- counting
    def count_stream(
        self, flat: np.ndarray, total_bases: int, n_seqs: int
    ) -> CountResult:
        """Count a pre-encoded flat base stream (uint8 codes, 0xFF sentinels
        between sequences) — the native-parser fast path."""
        cfg = self.config
        t0 = time.perf_counter()
        # Medium-dense bins (k=9..12): the one-hot compare cost outgrows the
        # Pallas kernel and XLA scatter crawls; the sorted-sparse path is
        # ~2-3x faster on TPU (see docs/ARCHITECTURE.md). Count sparse and
        # materialize the dense histogram once at the end (codes are unique,
        # so it's a direct indexed store, not a scatter-add).
        if (1 << 16) < cfg.bins and total_bases > 0:
            from dna_kmeres_parallel_tpu.models.sparse_engine import (
                SparseKmerEngine,
                dense_from_sparse,
            )

            sp = SparseKmerEngine(cfg).count_stream(flat, total_bases, n_seqs)
            hist = dense_from_sparse(sp, cfg.bins)
            return CountResult(
                k=cfg.k,
                canonical=cfg.canonical,
                hist=hist,
                n_seqs=n_seqs,
                total_bases=total_bases,
                elapsed_s=time.perf_counter() - t0,
            )
        hist = np.zeros(cfg.bins, dtype=np.int64)
        total = flat.shape[0]
        if total >= cfg.k:
            overlap = cfg.k - 1
            # Inputs smaller than one batch use a power-of-two shape bucket
            # (bounded compile count); larger inputs stream through a single
            # fixed batch shape (one compile).
            batch = max(min(cfg.batch_bases, _pow2_bucket(total)), cfg.k)
            T = _round_up(batch + overlap, _LANE)
            # Accumulate on DEVICE (async dispatch pipelines host prep with
            # TPU compute — no per-batch device->host sync), flushing to the
            # host int64 histogram before int32 could overflow.
            acc = None
            acc_windows = 0
            flush_limit = (1 << 31) - (1 << 27)
            pallas = self._pallas()
            # r5: the dense k=4..8 band rides the packed-plane bp2 kernel
            # when input packing is on — same host pack, planes staged on
            # host (the v2 discipline), no in-jit unpack pass, 1.07-1.17x
            # the u8 kernel device-side (KMER_TPU_DENSE_PLANES=0 opts
            # out; k<=3 keeps the bit-plane route, where bp2 is
            # MXU-latency-bound).
            use_planes = (
                cfg.pack_input
                and pallas is not None
                and 4 <= cfg.k <= 8
                and cfg.bins == 4**cfg.k
                and os.environ.get("KMER_TPU_DENSE_PLANES") != "0"
            )
            start = 0
            while start < total:
                end = min(start + batch, total)
                # Each chunk owns windows *starting* in [start, end); the
                # halo [end, end+k-1) completes the tail windows.
                seg = flat[start : min(end + overlap, total)]
                padded = np.full(T, codec.INVALID_BASE, dtype=np.uint8)
                padded[: seg.shape[0]] = seg
                if use_planes and pallas is not None:
                    staged = stage_batch_planes(padded)
                    args = (*staged, jnp.int32(end - start))
                    batch_fn, acc_fn = (
                        _count_batch_planes,
                        _count_batch_acc_planes,
                    )
                elif cfg.pack_input:
                    staged = stage_batch(padded, True)
                    args = (*staged, jnp.int32(end - start))
                    batch_fn, acc_fn = _count_batch_packed, _count_batch_acc_packed
                else:
                    staged = stage_batch(padded, False)
                    args = (staged, jnp.int32(end - start))
                    batch_fn, acc_fn = _count_batch, _count_batch_acc
                try:
                    if acc is None:
                        acc = batch_fn(
                            *args, cfg.k, cfg.bins, cfg.canonical, pallas
                        )
                    else:
                        acc = acc_fn(
                            acc, *args, cfg.k, cfg.bins, cfg.canonical, pallas
                        )
                except Exception as e:
                    # Kernel-compile failures (e.g. a flaky remote Mosaic
                    # helper) degrade to the jnp path instead of failing the
                    # run; numerics are identical.
                    if pallas is None or not any(
                        s in str(e).lower()
                        for s in ("mosaic", "remote_compile")
                    ):
                        raise
                    pallas = None
                    if use_planes:
                        # The planes entry IS the Pallas kernel — degrade
                        # to the packed-unpack program for the rest of
                        # the stream.
                        use_planes = False
                        staged = stage_batch(padded, True)
                        args = (*staged, jnp.int32(end - start))
                        batch_fn, acc_fn = (
                            _count_batch_packed,
                            _count_batch_acc_packed,
                        )
                    if acc is None:
                        acc = batch_fn(
                            *args, cfg.k, cfg.bins, cfg.canonical, None
                        )
                    else:
                        acc = acc_fn(
                            acc, *args, cfg.k, cfg.bins, cfg.canonical, None
                        )
                acc_windows += end - start
                if acc_windows >= flush_limit:
                    hist += np.asarray(acc, dtype=np.int64)
                    acc, acc_windows = None, 0
                start = end
            if acc is not None:
                hist += np.asarray(acc, dtype=np.int64)
        return CountResult(
            k=cfg.k,
            canonical=cfg.canonical,
            hist=hist,
            n_seqs=n_seqs,
            total_bases=total_bases,
            elapsed_s=time.perf_counter() - t0,
        )

    def count_sequences(self, seqs: list[str]) -> CountResult:
        flat, _total = self._flat_stream(seqs)
        return self.count_stream(flat, sum(len(s) for s in seqs), len(seqs))

    def count_file(self, source) -> CountResult:
        """Count a FASTA file. Prefers the native C++ parse->encode path
        (one pass, no Python string materialization)."""
        from dna_kmeres_parallel_tpu import native

        if (
            self.config.parser_variant == "modern"
            and isinstance(source, (str, os.PathLike))
            and native.available()
        ):
            parsed = native.parse_fasta_native(
                source, max_seqs=self.config.max_seqs
            )
            return self.count_stream(
                parsed.stream, parsed.total_bases, parsed.n_seqs
            )
        records = self._parse(source)
        return self.count_sequences([r.seq for r in records])

    # ------------------------------------------------------------- distances
    def counts_matrix(self, seqs: list[str]) -> np.ndarray:
        """Per-sequence count vectors [S, 4^k] int32.

        Sequences are grouped into power-of-two length buckets so mixed
        lengths don't all pad to the global max (the reference pads nothing
        but rescans per k-mer; here padding is the only waste and bucketing
        bounds it at 2x).
        """
        cfg = self.config
        S = len(seqs)
        out = np.zeros((S, cfg.bins), dtype=np.int32)
        if S == 0:
            return out
        buckets: dict[int, list[int]] = {}
        for i, s in enumerate(seqs):
            Lp = _round_up(max(_pow2_bucket(max(len(s), 1)), cfg.k), _LANE)
            buckets.setdefault(Lp, []).append(i)
        pallas = self._pallas()
        for Lp, idxs in buckets.items():
            # Row counts are power-of-two bucketed too: a data-dependent
            # row count would compile a fresh device program per call
            # (expensive on the remote-compile tunnel); INVALID rows
            # produce all-zero counts and are sliced off below.
            rows_p = max(_pow2_bucket(len(idxs)), histogram_pallas._SEQ_TILE)
            grid = np.full((rows_p, Lp), codec.INVALID_BASE, dtype=np.uint8)
            for row, i in enumerate(idxs):
                grid[row, : len(seqs[i])] = codec.encode_bases(seqs[i])
            try:
                counts = np.asarray(
                    _counts_matrix_batch(
                        jnp.asarray(grid), cfg.k, cfg.bins, cfg.canonical, pallas
                    )
                )
            except Exception as e:
                # Same degradation as count_stream: a kernel-compile failure
                # (flaky remote Mosaic helper) falls back to the jnp path.
                if pallas is None or not any(
                    s in str(e).lower()
                    for s in ("mosaic", "remote_compile")
                ):
                    raise
                pallas = None
                counts = np.asarray(
                    _counts_matrix_batch(
                        jnp.asarray(grid), cfg.k, cfg.bins, cfg.canonical, None
                    )
                )
            out[np.asarray(idxs)] = counts[: len(idxs)]
        return out

    def distance_sequences(
        self, seqs: list[str], ids: list[str] | None = None
    ) -> DistanceResult:
        cfg = self.config
        t0 = time.perf_counter()
        n = len(seqs)
        counts = self.counts_matrix(seqs)
        lengths = np.array([len(s) for s in seqs], dtype=np.int64)
        pallas = self._pallas()
        mesh = self._mesh()
        mxu_cmax = self._mxu_dist_cmax(counts) if n else None
        sums = None  # [S, S] int32 min-sums; None -> jnp packed path
        if mesh is not None and n:
            # Multi-chip: one partner-sharded panel covering all rows —
            # every device runs the same (MXU-/Pallas-routed) kernel as
            # the single-chip path; integer sums, so the distances are
            # bit-identical at any device count.
            sums = self._min_sum_panel_mesh(
                jnp.asarray(counts), jnp.asarray(counts), mesh, pallas,
                mxu_cmax=mxu_cmax,
            )
        elif mxu_cmax is not None:
            # MXU threshold route (r4): cmax boolean matmuls on the
            # systolic array — the low-multiplicity regime's fast path
            # (ops/distance.min_sum_matrix_mxu; exact, gated above).
            sums = np.asarray(
                dist_ops.min_sum_matrix_mxu(jnp.asarray(counts), mxu_cmax)
            )
        elif pallas is not None and cfg.bins <= distance_pallas._ROUTE_MAX_BINS:
            try:
                # Triangle-only grid: ~2x fewer tiles than the full matrix
                # (min is symmetric); only i < j entries are read below.
                sums = np.asarray(
                    distance_pallas.min_sum_matrix_pallas_tri(
                        jnp.asarray(counts), interpret=(pallas == "interpret")
                    )
                )
            except Exception as e:
                # Large S x large bins can exceed the kernel's scoped VMEM
                # at COMPILE time (measured: S=2048 at 64K bins — XLA
                # places the whole [S, S] output on the VMEM stack). Fall
                # back to the jnp path, which is exact by construction.
                # Case-insensitive: VMEM/Mosaic errors are spelled
                # differently across toolchain layers
                # (runtime.degradable_compile_error).
                if not runtime.degradable_compile_error(e):
                    raise
                sums = None
        if sums is not None:
            square = dist_ops.finish_distances(sums, lengths, cfg.k)
            rows, cols = np.triu_indices(n, k=1)
            packed = square[rows, cols]
        else:
            packed = dist_ops.distance_matrix_packed(
                jnp.asarray(counts), jnp.asarray(lengths, dtype=jnp.int32), cfg.k
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

    def distance_stream_to_csv(
        self,
        seqs: list[str],
        output_path,
        panel_rows: int = 2048,
        checkpoint_path=None,
        max_panels: int | None = None,
        row_lo: int = 0,
        row_hi: int | None = None,
    ) -> dict:
        """Large-S distance path: the [S, S] matrix never materializes.

        Counts live on device ([S, bins] int32 — tiny); the (min,+) matrix
        is computed one row panel at a time (Pallas panel kernel;
        partner-sharded over the mesh when config.mesh_shape is set) and
        each panel's packed strict-upper-triangle entries are appended to
        the CSV in reference format. Handles the reference's design-target
        scale (54K sequences -> 1.46G pairs) in bounded memory.

        checkpoint_path: make the run preemption-safe (SURVEY.md §5 —
        this is the framework's single longest job at design scale) via
        the shared writer (models/distance_stream.py): the CSV appends
        panel-at-a-time with fsync-then-checkpoint durability; resume is
        byte-identical to a single-shot run. max_panels bounds the
        panels processed this call (testing / cooperative yielding).
        row_lo/row_hi stream only that row block (multi-host row
        sharding — parallel/multihost.py concatenates the shards).
        """
        cfg = self.config
        S = len(seqs)
        counts_np = self.counts_matrix(seqs)
        mxu_cmax = self._mxu_dist_cmax(counts_np) if S else None
        lengths = np.array([len(s) for s in seqs], dtype=np.int64)
        panel_fn = self.make_dense_panel_fn(
            counts_np, lengths, panel_rows, mxu_cmax=mxu_cmax
        )
        meta = {
            "k": cfg.k,
            "canonical": cfg.canonical,
            "n_seqs": S,
            "regime": "dense",
            "input_sha": distance_stream.input_fingerprint(seqs),
        }
        return distance_stream.stream_panels_to_csv(
            output_path,
            S,
            panel_rows,
            panel_fn,
            meta=meta,
            checkpoint_path=checkpoint_path,
            max_panels=max_panels,
            row_lo=row_lo,
            row_hi=row_hi,
        )

    def make_dense_panel_fn(
        self, counts_np, lengths, panel_rows: int, mxu_cmax=None
    ):
        """Packed-panel closure over the dense [S, bins] counts matrix:
        panel_fn(r0, r1) -> float32 flat packed distances for rows
        r0..r1 (each row i: columns i+1..S), routed exactly like
        distance_sequences (mesh panel / MXU thresholds / Pallas / jnp)
        with the host IEEE float finish."""
        cfg = self.config
        S = int(counts_np.shape[0])
        counts = jnp.asarray(counts_np)
        pallas = self._pallas()
        mesh = self._mesh()
        # Shape discipline: every panel is padded to [panel_rows, bins] and
        # the partner matrix to a power-of-two-ish column bucket, so the
        # whole run compiles a HANDFUL of device programs (a naive
        # counts[r0:] trim would trace a fresh program per panel — ~30
        # remote compiles at the 54K design scale). The trim itself stays:
        # only columns >= r0 are computed/fetched, halving both the (min,+)
        # work and the D2H volume across the run.
        col_bucket = max(panel_rows, 16384)
        counts_p = jnp.pad(counts, ((0, panel_rows), (0, 0)))
        lengths = np.asarray(lengths, dtype=np.int64)

        def panel_fn(r0: int, r1: int) -> np.ndarray:
            rp = r1 - r0
            panel = counts_p[r0 : r0 + panel_rows]
            n_cols = min(_round_up(S - r0, col_bucket), S)
            other = counts[S - n_cols :]
            base = S - n_cols  # first column's sequence index
            if mesh is not None:
                sums = self._min_sum_panel_mesh(
                    panel, other, mesh, pallas, mxu_cmax=mxu_cmax
                )[:rp]
            elif mxu_cmax is not None:
                sums = np.asarray(
                    dist_ops.min_sum_matrix_mxu(panel, mxu_cmax, other)
                )[:rp]
            elif (
                pallas is not None
                and cfg.bins <= distance_pallas._ROUTE_MAX_BINS
            ):
                sums = np.asarray(
                    distance_pallas.min_sum_matrix_pallas(
                        panel, other, interpret=(pallas == "interpret")
                    )
                )[:rp]
            else:
                sums = np.asarray(
                    dist_ops.min_sum_matrix(panel, counts_other=other)
                )[:rp]
            d = dist_ops.finish_distances_panel(
                sums, lengths[r0:r1], lengths[base:], cfg.k
            )
            # Pack the panel's strict-upper-triangle entries (row i
            # keeps columns i+1..S) into one flat array; the shared
            # writer formats it through the native %f formatter.
            rows = [d[i - r0, (i - base) + 1 :] for i in range(r0, r1)]
            return (
                np.concatenate(rows) if rows else np.empty(0, np.float32)
            )

        return panel_fn

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
