#!/usr/bin/env python
"""Probe: XLA sort cost of one flat [N] array vs R independent rows [R, N/R].

Hypothesis (STATUS.md roadmap #1): the sparse path's dominant cost is the
flat full-array sort; a bitonic-style sort's work scales with log^2(segment),
and segments that fit VMEM avoid HBM round trips per exchange step, so
sorting [R, N/R] rows independently should be much cheaper. The final
k-way merge of R sorted runs then moves to the host compactor (already
multithreaded, already making a pass over the bytes).

Timing discipline per CLAUDE.md: in-program lax.scan repetition over
distinct inputs inside ONE dispatch; order-dependent signature consumed so
XLA cannot elide the sort.

Usage: python scripts/rowsort_probe.py [N] [Rep]
"""

import json
import os
import sys
import time


def main():
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    N = int(sys.argv[1]) if len(sys.argv) > 1 else (16 << 20)
    Rep = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    rng_keys = jax.random.split(jax.random.PRNGKey(7), Rep)
    stack = jax.device_put(
        jnp.stack(
            [
                jax.random.bits(kk, (N,), jnp.uint32)
                for kk in rng_keys
            ]
        )
    )

    def sig(a2d):
        # order-dependent signature over a few columns: forces the sorted
        # ORDER to be observed (sum alone is permutation-invariant and XLA
        # elides the sort entirely).
        first = a2d[..., 0]
        mid = a2d[..., a2d.shape[-1] // 2]
        last = a2d[..., -1]
        return jnp.sum((first ^ (mid >> 1) ^ (last >> 2)).astype(jnp.int32))

    def timed(name, per_item):
        try:

            @jax.jit
            def prog(st):
                def body(c, x):
                    return c + per_item(x), None

                out, _ = jax.lax.scan(body, jnp.int32(0), st)
                return out

            s0 = int(prog(stack))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                s1 = int(prog(stack))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                assert s1 == s0
            dt = best / Rep
            print(
                json.dumps(
                    {
                        "probe": name,
                        "N": N,
                        "ms_per_iter": round(dt * 1e3, 3),
                        "melem_per_ms": round(N / dt / 1e9, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    # Flat baseline.
    timed("flat_u32", lambda x: sig(jax.lax.sort((x,), num_keys=1)[0][None, :]))

    # Row decompositions.
    for rows in (16, 64, 256, 1024, 4096):
        m = N // rows
        if m < 1024:
            continue

        def rowsort(x, rows=rows, m=m):
            a = x.reshape(rows, m)
            (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
            return sig(s)

        timed(f"rows{rows}_m{m}_u32", rowsort)

    # Two-word key (k in 17..23 shape: u16 hi + u32 lo), rows variant.
    h16 = jax.device_put(
        jnp.stack(
            [
                jax.random.bits(kk, (N,), jnp.uint32).astype(jnp.uint16)
                for kk in jax.random.split(jax.random.PRNGKey(9), Rep)
            ]
        )
    )

    def timed2(name, per_item):
        try:

            @jax.jit
            def prog(st, ht):
                def body(c, xs):
                    return c + per_item(xs[0], xs[1]), None

                out, _ = jax.lax.scan(body, jnp.int32(0), (st, ht))
                return out

            s0 = int(prog(stack, h16))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                s1 = int(prog(stack, h16))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                assert s1 == s0
            dt = best / Rep
            print(
                json.dumps(
                    {
                        "probe": name,
                        "N": N,
                        "ms_per_iter": round(dt * 1e3, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    timed2(
        "flat_u16u32",
        lambda l, h: sig(jax.lax.sort((h, l), num_keys=2)[1][None, :]),
    )
    for rows in (64, 256, 1024):
        m = N // rows

        def rowsort2(l, h, rows=rows, m=m):
            a = l.reshape(rows, m)
            b = h.reshape(rows, m)
            hs, ls = jax.lax.sort((b, a), num_keys=2, dimension=-1)
            return sig(ls)

        timed2(f"rows{rows}_u16u32", rowsort2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
