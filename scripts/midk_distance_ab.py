#!/usr/bin/env python
"""Same-input A/B of the mid-k distance routes (VERDICT r3 Weak #2 /
r4 item 4): dense [S, 4^k] (min,+) on device vs per-sequence sparse
tables + host two-pointer, at the pinned shape k=11, S=256, 1-Kbase.

Both routes must produce the identical packed float32 vector; the wall
ratio validates the cost model behind
sparse_engine.dense_distance_preferred.

Usage: python scripts/midk_distance_ab.py [k] [S] [L]
"""

import json
import os
import sys
import time


def main() -> int:
    os.environ.setdefault("KMER_TPU_PLATFORM", "axon")
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from dna_kmeres_parallel_tpu.models import sparse_engine
    from dna_kmeres_parallel_tpu.models.engine import KmerEngine
    from dna_kmeres_parallel_tpu.utils.config import KmerConfig

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    rng = np.random.default_rng(5)
    seqs = [
        "".join(rng.choice(list("ACGT"), size=L)) for _ in range(S)
    ]
    n_pairs = S * (S - 1) // 2

    # Dense route (what the pre-r4 memory-only gate picked when it fit).
    # Warm the compiles on a DISTINCT same-shape input, then time ONE run
    # on the real input — never two identical dispatches (tunnel dedupe
    # trap, CLAUDE.md).
    warm = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(S)]
    eng = KmerEngine(KmerConfig(k=k))
    eng.distance_sequences(warm)
    t0 = time.perf_counter()
    dense = eng.distance_sequences(seqs).packed
    dense_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    sparse = sparse_engine.distance_sparse_packed(seqs, k, False)
    sparse_s = time.perf_counter() - t0

    routed_sparse = not sparse_engine.dense_distance_preferred(
        S, k, [L] * S
    )
    print(
        json.dumps(
            {
                "k": k,
                "S": S,
                "L": L,
                "n_pairs": n_pairs,
                "dense_s": round(dense_s, 3),
                "sparse_s": round(sparse_s, 3),
                "dense_pairs_per_sec": round(n_pairs / dense_s, 1),
                "sparse_pairs_per_sec": round(n_pairs / sparse_s, 1),
                "sparse_speedup": round(dense_s / sparse_s, 2),
                "identical": bool(np.array_equal(dense, sparse)),
                "router_picks_sparse": routed_sparse,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
