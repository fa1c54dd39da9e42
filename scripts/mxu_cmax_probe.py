#!/usr/bin/env python
"""Crossover probe: MXU threshold chain vs Pallas tri at mid cmax.

The r4 cost-based gate routes the MXU route past the old cmax<=16
crossover wherever the measured models predict a win (at 64K bins the
breakeven sits near cmax ~40). This probe measures both routes on the
same synthetic counts matrix (Poisson counts clipped to CMAX, max
pinned) with in-program row-rolled reps (distinct work per rep; one
dispatch amortizes tunnel latency), and asserts the min-sums agree on
the strict upper triangle (the tri kernel defines only i < j).

Usage: python scripts/mxu_cmax_probe.py [S] [bins] [cmax] [reps]
"""

import functools
import os
import sys
import time

cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from dna_kmeres_parallel_tpu.ops import distance as dist_ops  # noqa: E402
from dna_kmeres_parallel_tpu.ops import distance_pallas  # noqa: E402


@functools.partial(jax.jit, static_argnames=("cmax", "reps"))
def mxu_reps(mat, cmax, reps):
    def body(acc, r):
        m = jnp.roll(mat, r, axis=0)
        return acc + dist_ops.min_sum_matrix_mxu(m, cmax), None

    acc0 = jnp.zeros((mat.shape[0], mat.shape[0]), jnp.int32)
    return lax.scan(body, acc0, jnp.arange(1, reps + 1))[0]


@functools.partial(jax.jit, static_argnames=("reps",))
def tri_reps(mat, reps):
    def body(acc, r):
        m = jnp.roll(mat, r, axis=0)
        return acc + distance_pallas.min_sum_matrix_pallas_tri(m), None

    acc0 = jnp.zeros((mat.shape[0], mat.shape[0]), jnp.int32)
    return lax.scan(body, acc0, jnp.arange(1, reps + 1))[0]


def main() -> int:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    bins = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    cmax = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    pairs = S * (S - 1) // 2
    print(
        f"S={S} bins={bins} cmax={cmax} reps={reps} "
        f"pred mxu {dist_ops.mxu_time_per_pair(bins, cmax)*1e9:.1f} "
        f"vs tri {dist_ops.tri_time_per_pair(bins)*1e9:.1f} ns/pair",
        flush=True,
    )
    mats = {}
    for nm, seed in (("A", 3), ("B", 4)):
        rng = np.random.default_rng(seed)
        c = rng.poisson(cmax / 4.0, size=(S, bins)).astype(np.int32)
        c = np.clip(c, 0, cmax)
        c[0, 0] = cmax
        mats[nm] = jnp.asarray(c)
        mats[nm].block_until_ready()
    results = {}
    for route, fn in (
        ("tri", lambda m: tri_reps(m, reps)),
        ("mxu", lambda m: mxu_reps(m, cmax, reps)),
    ):
        for nm in ("A", "B"):
            # Time THROUGH the host fetch: block_until_ready on the
            # tunneled backend has been observed returning before the
            # pallas execution completes (a 0.3 ms "timing" of 550 Gop);
            # np.asarray cannot lie. Both routes pay the same 16 MB D2H,
            # reported separately below via the dispatch-only stamp.
            t0 = time.perf_counter()
            out = fn(mats[nm])
            out.block_until_ready()
            t_disp = time.perf_counter() - t0
            host = np.asarray(out)
            dt = time.perf_counter() - t0
            tag = "warm/compile" if nm == "A" else "TIMED"
            print(
                f"{route}[{nm}] ({tag}): {dt:.3f}s (dispatch-only "
                f"{t_disp:.3f}s)  {pairs * reps / dt / 1e6:.1f}M pairs/s",
                flush=True,
            )
            if nm == "B":
                results[route] = (dt, host)
    iu, ju = np.triu_indices(S, k=1)
    agree = bool(
        np.array_equal(
            results["tri"][1][iu, ju], results["mxu"][1][iu, ju]
        )
    )
    print(
        f"RESULT cmax={cmax} bins={bins}: tri {results['tri'][0]:.3f}s "
        f"vs mxu {results['mxu'][0]:.3f}s "
        f"({results['tri'][0] / results['mxu'][0]:.2f}x), "
        f"triu agree={agree}",
        flush=True,
    )
    assert agree
    return 0


if __name__ == "__main__":
    sys.exit(main())
