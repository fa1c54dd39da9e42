#!/usr/bin/env python
"""Hardware A/B: union-indexed dense distance route vs host two-pointer.

High-sharing fixture (reads sliced from one genome — the union of
distinct k-mers stays near the genome length). Two datasets with the
same shape buckets: A warms the compile cache, B is the timed fresh
dispatch (distinct inputs — the tunnel dedups identical dispatches,
CLAUDE.md "Benchmark traps"). The union min-sums are asserted equal to
the native two-pointer's.

Usage: python scripts/union_distance_ab.py [S] [genome_len] [k] [read_len]
"""

import os
import sys
import time

cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from dna_kmeres_parallel_tpu import native  # noqa: E402
from dna_kmeres_parallel_tpu.models import sparse_engine  # noqa: E402


def reads(seed: int, genome_len: int, S: int, L: int) -> list[str]:
    rng = np.random.default_rng(seed)
    genome = "".join(
        np.array(list("ACGT"))[rng.integers(0, 4, genome_len)]
    )
    starts = rng.integers(0, genome_len - L + 1, size=S)
    return [genome[s : s + L] for s in starts]


def main() -> int:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 21
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 150
    print(f"S={S} genome={G} k={k} read_len={L} "
          f"device={jax.devices()[0].platform}", flush=True)
    tabs = {}
    for name, seed in (("A", 1), ("B", 2)):
        t0 = time.perf_counter()
        tabs[name] = sparse_engine.build_pair_tables(
            reads(seed, G, S, L), k
        )
        print(f"tables {name}: {time.perf_counter() - t0:.2f}s", flush=True)

    codes, cnts, offs = tabs["B"]
    pairs = S * (S - 1) // 2
    t0 = time.perf_counter()
    host_sums = native.min_sum_pairs_native(codes, cnts, offs)
    t_host = time.perf_counter() - t0
    print(
        f"host two-pointer (threads={os.cpu_count()}): {t_host:.3f}s  "
        f"{pairs / t_host / 1e6:.2f}M pairs/s",
        flush=True,
    )

    os.environ["KMER_TPU_DIST_UNION"] = "1"
    t_union = None
    for nm in ("A", "B"):
        c2, n2, o2 = tabs[nm]
        plan = sparse_engine.union_dense_plan(c2, n2, o2)
        assert plan is not None, "union plan refused"
        t0 = time.perf_counter()
        u = sparse_engine.union_dense_min_sums(c2, n2, o2, plan)
        dt = time.perf_counter() - t0
        tag = "warm/compile" if nm == "A" else "TIMED"
        print(
            f"union[{nm}] ({tag}): impl={plan['impl']} D={plan['D']} "
            f"Dp={plan['Dp']} cmax={plan['cmax']} {dt:.3f}s  "
            f"{pairs / dt / 1e6:.2f}M pairs/s",
            flush=True,
        )
        if nm == "B":
            t_union = dt
            exact = bool(np.array_equal(u, host_sums))
            print(
                f"exact vs host: {exact}  "
                f"route speedup {t_host / dt:.2f}x",
                flush=True,
            )
            assert exact
    print(
        f"RESULT S={S} D_union k={k}: host {t_host:.3f}s vs union "
        f"{t_union:.3f}s ({t_host / t_union:.2f}x), exact",
        flush=True,
    )

    # Device-compute-only rate (what a PCIe host approaches): resident
    # matrix, in-program lax.scan of row-rolled reps (distinct work per
    # rep — rolls are pair permutations, so nothing dedups/hoists), one
    # dispatch amortizing the tunnel latency.
    import functools

    import jax.numpy as jnp
    from jax import lax

    from dna_kmeres_parallel_tpu.ops import distance as dist_ops

    @functools.partial(jax.jit, static_argnames=("cmax", "reps"))
    def chain_reps(mat, cmax, reps):
        def body(acc, r):
            m = jnp.roll(mat, r, axis=0)
            return acc + dist_ops.min_sum_matrix_mxu(m, cmax), None

        acc0 = jnp.zeros((mat.shape[0], mat.shape[0]), jnp.int32)
        out, _ = lax.scan(body, acc0, jnp.arange(1, reps + 1))
        return out

    reps = 8
    for nm, seed_tag in (("A", "warm"), ("B", "timed")):
        c2, n2, o2 = tabs[nm]
        plan = sparse_engine.union_dense_plan(c2, n2, o2)
        mat = np.zeros((plan["Sp"], plan["Dp"]), dtype=np.int8)
        rows = np.repeat(
            np.arange(o2.shape[0] - 1, dtype=np.int64), np.diff(o2)
        )
        mat[rows, np.searchsorted(plan["union"], c2)] = n2.astype(np.int8)
        dmat = jnp.asarray(mat)
        dmat.block_until_ready()
        t0 = time.perf_counter()
        out = chain_reps(dmat, plan["cmax"], reps)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        if nm == "B":
            rate = pairs * reps / dt
            print(
                f"device-compute only ({reps} in-program reps): "
                f"{dt:.3f}s = {rate / 1e6:.1f}M pairs/s "
                f"({rate * plan['cmax'] * plan['Dp'] / 1e12:.2f} T "
                f"thresh-MAC/s)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
