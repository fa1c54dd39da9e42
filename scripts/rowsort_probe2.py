#!/usr/bin/env python
"""Probe 2: deeper row counts, value-range sensitivity, fused encode+rowsort.

Follow-up to rowsort_probe.py (which established rows4096 u32 = 13.8ms vs
flat 41.9ms per 16M). Questions answered here:
  1. Does going past 4096 rows keep helping (8192, 16384)?
  2. Is XLA TPU sort value-dependent (18-bit-masked vs full-range u32)?
     Production codes for k<=15 use <= 30 bits.
  3. Production fused shape: Pallas encode -> reshape -> row sort, k=13/21.

Usage: python scripts/rowsort_probe2.py [T] [Rep]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from dna_kmeres_parallel_tpu.ops.encode_pallas import rolling_codes_split_pallas

    N = int(sys.argv[1]) if len(sys.argv) > 1 else (16 << 20)
    Rep = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    keys = jax.random.split(jax.random.PRNGKey(7), Rep)
    stack = jax.device_put(
        jnp.stack([jax.random.bits(kk, (N,), jnp.uint32) for kk in keys])
    )

    def sig(a2d):
        first = a2d[..., 0]
        mid = a2d[..., a2d.shape[-1] // 2]
        last = a2d[..., -1]
        return jnp.sum((first ^ (mid >> 1) ^ (last >> 2)).astype(jnp.int32))

    def timed(name, per_item, arg=stack):
        try:

            @jax.jit
            def prog(st):
                def body(c, x):
                    return c + per_item(x), None

                out, _ = jax.lax.scan(body, jnp.int32(0), st)
                return out

            s0 = int(prog(arg))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                s1 = int(prog(arg))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                assert s1 == s0
            dt = best / Rep
            print(
                json.dumps({"probe": name, "N": N, "ms_per_iter": round(dt * 1e3, 3)}),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    # Q1: deeper rows, u32.
    for rows in (8192, 16384, 32768):
        m = N // rows

        def rowsort(x, rows=rows, m=m):
            a = x.reshape(rows, m)
            (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
            return sig(s)

        timed(f"rows{rows}_m{m}_u32", rowsort)

    # Q2: value-range sensitivity (18-bit masked = k=9-ish code range).
    def masked_flat(x):
        (s,) = jax.lax.sort((x & jnp.uint32(0x3FFFF),), num_keys=1)
        return sig(s[None, :])

    timed("flat_u32_18bit", masked_flat)

    def masked_rows4096(x):
        a = (x & jnp.uint32(0x3FFFF)).reshape(4096, N // 4096)
        (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
        return sig(s)

    timed("rows4096_u32_18bit", masked_rows4096)

    # Q1b: deeper rows for the two-word key.
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
                json.dumps({"probe": name, "N": N, "ms_per_iter": round(dt * 1e3, 3)}),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    for rows in (4096, 8192):
        m = N // rows

        def rowsort2(l, h, rows=rows, m=m):
            a = l.reshape(rows, m)
            b = h.reshape(rows, m)
            hs, ls = jax.lax.sort((b, a), num_keys=2, dimension=-1)
            return sig(ls)

        timed2(f"rows{rows}_u16u32", rowsort2)

    # Q3: fused production shapes (encode -> reshape -> row sort).
    bstack = jax.device_put(
        jnp.stack(
            [
                jax.random.randint(kk, (N,), 0, 4, jnp.int32).astype(jnp.uint8)
                for kk in jax.random.split(jax.random.PRNGKey(3), Rep)
            ]
        )
    )

    for k, rows in ((13, 4096), (21, 4096), (21, 8192)):
        n_own = jnp.int32(N - k + 1)

        def fused(x, k=k, rows=rows):
            hi, lo = rolling_codes_split_pallas(x, n_own, k, False)
            n = lo.shape[0]
            m = n // rows  # encoder pads to tile multiples; trim remainder
            cut = rows * m
            if k <= 15:
                a = lo[:cut].reshape(rows, m)
                (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
                return sig(s)
            h = jnp.where(
                hi[:cut] == jnp.uint32(0xFFFFFFFF),
                jnp.uint16(0xFFFF),
                hi[:cut].astype(jnp.uint16),
            ).reshape(rows, m)
            l = lo[:cut].reshape(rows, m)
            hs, ls = jax.lax.sort((h, l), num_keys=2, dimension=-1)
            return sig(ls)

        timed(f"fused_k{k}_rows{rows}", fused, arg=bstack)
    return 0


if __name__ == "__main__":
    sys.exit(main())
