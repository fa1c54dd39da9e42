#!/usr/bin/env python
"""Stage-level probe of the sparse (k>=13) count path on the real TPU.

Per-dispatch tunnel latency here is tens of ms — comparable to the compute
being measured — so every variant is timed with IN-PROGRAM repetition: a
lax.scan over a stack of distinct inputs inside ONE jitted dispatch,
accumulating a scalar. Per-iteration cost = (elapsed - fetch) / R.

Usage: python scripts/sort_probe.py [T_bases] [k] [R]
One JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops
    from dna_kmeres_parallel_tpu.ops.encode_pallas import rolling_codes_split_pallas

    T = int(sys.argv[1]) if len(sys.argv) > 1 else (16 << 20)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    keys = jax.random.split(jax.random.PRNGKey(0), R)
    stack = jax.device_put(
        jnp.stack(
            [
                jax.random.randint(kk, (T,), 0, 4, jnp.int32).astype(jnp.uint8)
                for kk in keys
            ]
        )
    )
    n_own = jnp.int32(T - k + 1)

    def timed(name, per_item, arg=stack):
        """per_item(x) -> int32 scalar; scanned over arg's rows in ONE jit."""
        try:
            import functools

            @jax.jit
            def prog(st):
                def body(c, x):
                    return c + per_item(x), None

                out, _ = jax.lax.scan(body, jnp.int32(0), st)
                return out

            s0 = int(prog(arg))  # warmup/compile + sync
            t0 = time.perf_counter()
            s1 = int(prog(arg))
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            s2 = int(prog(arg))
            dt2 = time.perf_counter() - t0
            dt = min(dt1, dt2) / R  # latency amortized over R in-program iters
            print(
                json.dumps(
                    {
                        "probe": name,
                        "k": k,
                        "T": T,
                        "R": R,
                        "ms_per_iter": round(dt * 1e3, 3),
                        "gbases_per_sec": round(T / dt / 1e9, 4),
                        "check": s0,
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    # Floor: one HBM pass over the input (sum).
    timed("floor_sum_u8", lambda x: jnp.sum(x.astype(jnp.int32)) & 0xFFFF)

    # Stage 1: fused Pallas encode.
    def enc(x):
        hi, lo = rolling_codes_split_pallas(x, n_own, k, False)
        return jnp.sum((hi ^ lo).astype(jnp.int32)) & 0xFFFF

    timed("encode_pallas", enc)

    # Stage 1+2: encode + two-key sort.
    def enc_sort(x):
        hi, lo = rolling_codes_split_pallas(x, n_own, k, False)
        a, b = jax.lax.sort((hi, lo), num_keys=2)
        return (a[0] ^ b[0] ^ a[-1]).astype(jnp.int32)

    timed("encode+sort2", enc_sort)

    # Full production path.
    def full(x):
        hi, lo, counts, starts = sparse_ops.sort_unique_counts(
            x, n_own, k, False, pallas="compiled"
        )
        return jnp.sum(jnp.where(starts, counts, 0))

    timed("full_sort_unique", full)

    # Pure sort formulations on pre-encoded codes (stacked once).
    his, los = [], []
    for i in range(R):
        hi, lo = rolling_codes_split_pallas(stack[i], n_own, k, False)
        his.append(hi)
        los.append(lo)
    hstack = jax.device_put(jnp.stack(his))
    lstack = jax.device_put(jnp.stack(los))
    hl = (hstack, lstack)

    def timed2(name, per_item):
        try:

            @jax.jit
            def prog(hs, ls):
                def body(c, x):
                    return c + per_item(x[0], x[1]), None

                out, _ = jax.lax.scan(body, jnp.int32(0), (hs, ls))
                return out

            s0 = int(prog(*hl))
            t0 = time.perf_counter()
            _ = int(prog(*hl))
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = int(prog(*hl))
            dt2 = time.perf_counter() - t0
            dt = min(dt1, dt2) / R
            print(
                json.dumps(
                    {
                        "probe": name,
                        "k": k,
                        "T": T,
                        "R": R,
                        "ms_per_iter": round(dt * 1e3, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    timed2(
        "sort2_u32u32",
        lambda h, l: (lambda ab: (ab[0][0] ^ ab[1][0] ^ ab[0][-1]).astype(jnp.int32))(
            jax.lax.sort((h, l), num_keys=2)
        ),
    )
    timed2(
        "sort1_u32",
        lambda h, l: jax.lax.sort((l,), num_keys=1)[0][0].astype(jnp.int32),
    )
    timed2(
        "sort1_u32+payload",
        lambda h, l: (lambda ab: (ab[0][0] ^ ab[1][0]).astype(jnp.int32))(
            jax.lax.sort((l, h), num_keys=1)
        ),
    )
    if 2 * k - 32 <= 16:
        timed2(
            "sort2_u16u32",
            lambda h, l: (
                lambda ab: (ab[0][0].astype(jnp.uint32) ^ ab[1][0]).astype(jnp.int32)
            )(jax.lax.sort((h.astype(jnp.uint16), l), num_keys=2)),
        )
        timed2(
            "sort2_u8u32" if 2 * k - 32 <= 8 else "skip",
            lambda h, l: (
                lambda ab: (ab[0][0].astype(jnp.uint32) ^ ab[1][0]).astype(jnp.int32)
            )(jax.lax.sort((h.astype(jnp.uint8), l), num_keys=2)),
        ) if 2 * k - 32 <= 8 else None

    # RLE on pre-sorted codes.
    def rle(h, l):
        n = h.shape[0]
        sentinel = jnp.uint32(0xFFFFFFFF)
        prev_h = jnp.concatenate([jnp.full((1,), sentinel, jnp.uint32), h[:-1]])
        prev_l = jnp.concatenate([jnp.full((1,), sentinel, jnp.uint32), l[:-1]])
        is_valid = h != sentinel
        starts = ((h != prev_h) | (l != prev_l)) & is_valid
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        flagged = jnp.where(starts | ~is_valid, idx, n)
        next_start = jax.lax.cummin(flagged, reverse=True)
        after = jnp.concatenate([next_start[1:], jnp.full((1,), n, jnp.int32)])
        return jnp.sum(jnp.where(starts, after - idx, 0)) & 0xFFFF

    timed2("rle_cummin", rle)
    return 0


if __name__ == "__main__":
    sys.exit(main())
