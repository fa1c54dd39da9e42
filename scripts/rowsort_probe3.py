#!/usr/bin/env python
"""Probe 3: u64 single-key vs (u16,u32) two-key row sorts; row_len and
batch scaling of the fused k=21 path.

Usage: python scripts/rowsort_probe3.py
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

    N = 16 << 20
    Rep = 6

    def sig(a2d):
        first = a2d[..., 0]
        mid = a2d[..., a2d.shape[-1] // 2]
        last = a2d[..., -1]
        return jnp.sum(
            (first ^ (mid >> 1) ^ (last >> 2)).astype(jnp.int32)
        )

    def timed(name, per_item, arg):
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
                json.dumps({"probe": name, "ms_per_iter": round(dt * 1e3, 3)}),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    keys = jax.random.split(jax.random.PRNGKey(7), Rep)
    stack = jax.device_put(
        jnp.stack([jax.random.bits(kk, (N,), jnp.uint32) for kk in keys])
    )

    # u64 single key vs (u16, u32) two-key at the k=21 bit budget (42 bits).
    for rows in (4096, 8192):
        m = N // rows

        def u64sort(x, rows=rows, m=m):
            lo = x
            hi = (x >> 22).astype(jnp.uint16)  # ~10 significant hi bits
            key = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(
                jnp.uint64
            )
            a = key.reshape(rows, m)
            (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
            return sig(s).astype(jnp.int32)

        timed(f"rows{rows}_u64key", u64sort, stack)

    # Fused k=21 with finer rows and bigger batch.
    bstack = jax.device_put(
        jnp.stack(
            [
                jax.random.randint(kk, (N,), 0, 4, jnp.int32).astype(jnp.uint8)
                for kk in jax.random.split(jax.random.PRNGKey(3), Rep)
            ]
        )
    )

    def fused(x, k, rows):
        n_own = jnp.int32(x.shape[0] - k + 1)
        hi, lo = rolling_codes_split_pallas(x, n_own, k, False)
        n = lo.shape[0]
        m = n // rows
        cut = rows * m
        h = jnp.where(
            hi[:cut] == jnp.uint32(0xFFFFFFFF),
            jnp.uint16(0xFFFF),
            hi[:cut].astype(jnp.uint16),
        ).reshape(rows, m)
        l = lo[:cut].reshape(rows, m)
        hs, ls = jax.lax.sort((h, l), num_keys=2, dimension=-1)
        return sig(ls)

    for rows in (16384, 32768):
        timed(f"fused_k21_rows{rows}", lambda x, r=rows: fused(x, 21, r), bstack)

    # Batch scaling: 32M bases, rows sized for m=2048.
    N2 = 32 << 20
    bstack2 = jax.device_put(
        jnp.stack(
            [
                jax.random.randint(kk, (N2,), 0, 4, jnp.int32).astype(jnp.uint8)
                for kk in jax.random.split(jax.random.PRNGKey(5), 3)
            ]
        )
    )

    def timed2(name, per_item, arg, rep):
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
            dt = best / rep
            print(
                json.dumps({"probe": name, "ms_per_iter": round(dt * 1e3, 3)}),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    timed2(
        "fused_k21_32M_rows16384",
        lambda x: fused(x, 21, 16384),
        bstack2,
        3,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
