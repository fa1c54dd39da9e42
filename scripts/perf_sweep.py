#!/usr/bin/env python
"""Full single-chip performance sweep (run on the TPU; slow first compiles).

Writes one JSON line per measurement to stdout; details to stderr.
Usage: python scripts/perf_sweep.py [quick|full]
"""

import json
import os
import sys


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dna_kmeres_parallel_tpu.models import benchmarks as B

    total = (32 << 20) if mode == "full" else (16 << 20)

    for r in B.run_impl_matrix_bench(ks=(4, 8, 11), total_bases=total):
        print(json.dumps(r), flush=True)
    # Sparse: >= 4 dispatches per measurement (single-dispatch timings are
    # tunnel-latency-dominated), 16M-base batches when the budget allows.
    sparse_total = max(total, 64 << 20)
    for k in (13, 21, 31):
        # (device_sort, row_len): production no-sort route first, then the
        # row-sorted and flat device_sort=True fallbacks.
        for device_sort, row_len in ((False, 0), (True, 2048), (True, 0)):
            r = B.run_sparse_bench(
                k=k,
                total_bases=sparse_total,
                batch_bases=sparse_total // 4,
                row_len=row_len,
                device_sort=device_sort,
            )
            print(json.dumps(r), flush=True)
    print(
        json.dumps(B.run_distance_bench(n_seqs=2048, seq_len=1024, k=3)),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
