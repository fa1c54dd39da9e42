#!/usr/bin/env python
"""Driver benchmark: single-chip k-mer counting throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: giga-bases/second/chip through the device count path at
k=21 — BASELINE.json's north-star configuration ("Giga-bases/sec/chip at
k=21"), served by the no-device-sort route (fused Pallas encode kernel
alone; the host radix compactor builds the table — KmerConfig.device_sort;
BENCH_DEVICE_SORT=1 measures the row-sorted fallback). The reference
publishes no throughput numbers (BASELINE.md: "published": {}); the
baseline denominator is 1.0 Gbase/s, a generous estimate of an A100-class
CUDA k-mer counter (Gerbil-era GPU counters sustain ~0.5-1.5 Gbase/s), so
vs_baseline == achieved Gbase/s. BASELINE.json's stated target is >=10x.

BENCH_K <= 8 instead measures the dense-histogram path (config-1 shapes,
fused Pallas two-level MXU kernel, two-size differential timing); k >= 9
mirrors production routing through the sparse path. Details (per-phase
timings, device, exactness check) go to stderr.
"""

import json
import os
import sys


def main() -> int:
    # Persistent compile cache: repeated driver invocations skip recompiles.
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from dna_kmeres_parallel_tpu.ops.runtime import apply_platform_env

    apply_platform_env()  # no-op for the driver (env unset); lets CPU
    # smoke runs honor JAX_PLATFORMS despite the sitecustomize override

    from dna_kmeres_parallel_tpu.models.benchmarks import (
        run_count_bench,
        run_distance_bench,
        run_sparse_bench,
    )

    # BENCH_METRIC=distance: pairwise-distance throughput (the reference's
    # step-2, kernels.h:85-109, as one tiled (min,+) program). BENCH_K
    # selects the band (k=8 = 64K bins, the Pallas bins-tiled kernel's
    # upper routing edge; k<=8 routes Pallas on TPU, larger k routes jnp;
    # r4: low-multiplicity counts route the MXU threshold matmuls).
    # BENCH_DIST_IMPL=jnp|pallas|mxu forces a path for A/B. vs_baseline is
    # value / 1e6 pairs/s — an indicative denominator (the reference's own
    # per-query-launch step 2 is launch-latency-bound; it publishes no
    # pairs/s).
    if os.environ.get("BENCH_METRIC") == "distance":
        k = int(os.environ.get("BENCH_K", "8"))
        n_seqs = int(os.environ.get("BENCH_DIST_SEQS", "2048"))
        seq_len = int(os.environ.get("BENCH_DIST_LEN", "1024"))
        impl = os.environ.get("BENCH_DIST_IMPL", "auto")
        # In-program scan reps scale inversely with per-rep (min,+) volume
        # (pairs x bins): k=3 amortizes dispatch over 8 reps, k=8's 137G-op
        # rep is its own amortization.
        n_pairs = n_seqs * (n_seqs - 1) // 2
        reps = int(os.environ.get("BENCH_DIST_REPS", "0")) or max(
            1, min(8, (2 << 30) // max(n_pairs * (4**k), 1))
        )
        report = run_distance_bench(
            n_seqs=n_seqs, seq_len=seq_len, k=k, impl=impl, reps=reps
        )
        print(json.dumps(report), file=sys.stderr)
        value = report["pairs_per_sec"]
        print(
            json.dumps(
                {
                    "metric": f"distance_pairs_k{k}",
                    "value": value,
                    "unit": "pairs/s",
                    "vs_baseline": round(value / 1e6, 4),
                }
            )
        )
        return 0

    # BENCH_METRIC=realistic: end-to-end streamed count over a
    # sequencing-shaped input (reads at BENCH_COVERAGE-x coverage of one
    # synthetic genome — high k-mer duplication, the distribution the
    # adversarial all-distinct default cannot exercise) through the
    # production StreamingCounter with compact routing BENCH_COMPACT
    # (default 'auto': the EWMA race picks the route). Records
    # END-TO-END Gbase/s (host + D2H + device), not device-only.
    if os.environ.get("BENCH_METRIC") == "realistic":
        import time

        import numpy as np

        from dna_kmeres_parallel_tpu.models.pipeline import StreamingCounter
        from dna_kmeres_parallel_tpu.utils import datagen
        from dna_kmeres_parallel_tpu.utils.config import KmerConfig

        k = int(os.environ.get("BENCH_K", "21"))
        total = int(os.environ.get("BENCH_BASES", str(64 << 20)))
        coverage = float(os.environ.get("BENCH_COVERAGE", "30"))
        compact = os.environ.get("BENCH_COMPACT", "auto")
        path = os.environ.get(
            "BENCH_REALISTIC_PATH", f"/tmp/bench_realistic_{total}.fasta"
        )
        if not (
            os.path.exists(path) and os.path.getsize(path) >= total
        ):
            datagen.realistic_fasta(
                path,
                genome_len=max(int(total / coverage), 10_000),
                coverage=coverage,
                read_len=150,
                seed=11,
            )
        sc = StreamingCounter(
            KmerConfig(
                k=k,
                compact=compact,
                batch_bases=int(os.environ.get("BENCH_BATCH", str(16 << 20))),
            )
        )
        t0 = time.perf_counter()
        res = sc.run(path)
        wall = time.perf_counter() - t0
        rep = sc.metrics.report()
        # k <= 12 streams return the dense CountResult (hist), k >= 13
        # the sparse one (codes/counts) — normalize.
        if hasattr(res, "codes"):
            total_kmers = int(res.counts.sum())
            distinct = int(res.codes.shape[0])
        else:
            total_kmers = int(res.hist.sum())
            distinct = int(np.count_nonzero(res.hist))
        # Exactness spot-check: total windows must equal the per-read sum
        # of valid windows, which the native host engine recomputes
        # independently from the same file.
        from dna_kmeres_parallel_tpu import native

        exact = None
        if native.available():
            parsed = native.parse_fasta_native(path)
            _, host_counts = native.count_sparse_host_native(
                parsed.stream, k, False
            )
            exact = int(host_counts.sum()) == total_kmers and (
                distinct == host_counts.shape[0]
            )
        value = round(res.total_bases / wall / 1e9, 4)
        print(
            json.dumps(
                {
                    "bench": "realistic",
                    "k": k,
                    "coverage": coverage,
                    "compact": compact,
                    "total_bases": int(res.total_bases),
                    "distinct": distinct,
                    "dup_factor": round(
                        float(total_kmers) / max(distinct, 1), 2
                    ),
                    "wall_s": round(wall, 2),
                    "exact_vs_host_engine": exact,
                    "counters": rep["counters"],
                }
            ),
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": f"realistic_e2e_k{k}",
                    "value": value,
                    "unit": "Gbase/s/chip",
                    "vs_baseline": round(value / 1.0, 4),
                }
            )
        )
        return 0 if exact is not False else 1

    # Programs for the default shapes are pre-warmed into the persistent
    # compile cache so the bench runs even when the remote compile service
    # is flaky (see CLAUDE.md).
    k = int(os.environ.get("BENCH_K", "21"))
    total = int(os.environ.get("BENCH_BASES", str(64 << 20)))
    batch = int(os.environ.get("BENCH_BATCH", str(16 << 20)))
    row_len = int(os.environ.get("BENCH_ROW_LEN", "2048"))
    # Device-sort routing mirrors production (KmerConfig.device_sort=None):
    # with the native radix compactor present the device runs the encode
    # kernel alone. BENCH_DEVICE_SORT=1/0 forces either route.
    ds_env = os.environ.get("BENCH_DEVICE_SORT", "auto")
    if ds_env == "auto":
        from dna_kmeres_parallel_tpu.models.sparse_engine import (
            resolve_device_sort,
        )
        from dna_kmeres_parallel_tpu.utils.config import KmerConfig

        device_sort = resolve_device_sort(KmerConfig(k=max(k, 13)))
    else:
        device_sort = ds_env == "1"

    # k <= 8: the dense fused-Pallas histogram (production routing);
    # k >= 9 routes through the sparse path in production (engine.py), so
    # the bench mirrors that — the dense kernel at k=11 measures 0.08
    # Gbase/s, which is precisely why production does not use it there.
    if k <= 8:
        report = run_count_bench(
            k=k, canonical=False, total_bases=total, batch_bases=batch
        )
    else:
        report = run_sparse_bench(
            k=k,
            canonical=False,
            total_bases=total,
            batch_bases=batch,
            row_len=row_len,
            device_sort=device_sort,
        )
    print(json.dumps(report), file=sys.stderr)

    exact = report["windows_counted"] == report["windows_expected"]
    if not exact:
        print("WINDOW COUNT MISMATCH — benchmark invalid", file=sys.stderr)
    if report.get("timing_valid") is False:
        # The differential timer caught the jitter pathology (small program
        # out-timed the large one): the number is 0.0 by construction —
        # flag the run rather than record a fake metric.
        print("TIMING INVALID — tunnel jitter swamped the measurement",
              file=sys.stderr)
        exact = False

    value = report["gbases_per_sec"]
    baseline_gbps = 1.0
    extra = {}
    # r5 (VERDICT item 8): the graded config-2 band — canonical k=11 —
    # is regression-tracked by the driver, not just by BENCHMARKS.md
    # prose: a second two-size differential of the canonical encode
    # program rides along in the headline JSON line. BENCH_CANONICAL=0
    # skips it (CPU smoke runs).
    if k >= 9 and os.environ.get("BENCH_CANONICAL") != "0":
        rep11 = run_sparse_bench(
            k=11,
            canonical=True,
            total_bases=total,
            batch_bases=batch,
            row_len=row_len,
            device_sort=False,
        )
        print(json.dumps(rep11), file=sys.stderr)
        if rep11.get("timing_valid") and (
            rep11["windows_counted"] == rep11["windows_expected"]
        ):
            extra["canonical_k11_gbases"] = rep11["gbases_per_sec"]
    print(
        json.dumps(
            {
                "metric": f"count_throughput_k{k}",
                "value": value,
                "unit": "Gbase/s/chip",
                "vs_baseline": round(value / baseline_gbps, 4),
                **extra,
            }
        )
    )
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
