#!/usr/bin/env python
"""Probe 4: can row-sorted u16 keys beat the fused Pallas histogram for
the small-k dense band (k <= 8, codes <= 16 bits)?

Pipeline sketch: encode (k<=8 codes fit u16) -> row sort u16 -> host
compacts rows straight into the dense 4^k histogram. The fused MXU kernel
does ~1.5 Gb/s; sort cost at u16 width may be lower.

Also: u16 vs u32 row-sort width scaling (does halving key width halve sort
time, i.e. is XLA's sort bandwidth-bound?).
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

    N = 16 << 20
    Rep = 6

    def sig(a2d):
        first = a2d[..., 0].astype(jnp.int32)
        mid = a2d[..., a2d.shape[-1] // 2].astype(jnp.int32)
        last = a2d[..., -1].astype(jnp.int32)
        return jnp.sum(first ^ (mid >> 1) ^ (last >> 2))

    def timed(name, per_item, arg, rep=Rep):
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
                json.dumps(
                    {
                        "probe": name,
                        "ms_per_iter": round(dt * 1e3, 3),
                        "gbases_per_sec": round(N / dt / 1e9, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    keys = jax.random.split(jax.random.PRNGKey(7), Rep)
    stack16 = jax.device_put(
        jnp.stack(
            [jax.random.bits(kk, (N,), jnp.uint32).astype(jnp.uint16) for kk in keys]
        )
    )
    stack32 = jax.device_put(
        jnp.stack([jax.random.bits(kk, (N,), jnp.uint32) for kk in keys])
    )

    for rows in (8192, 32768):
        m = N // rows

        def s16(x, rows=rows, m=m):
            a = x.reshape(rows, m)
            (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
            return sig(s)

        def s32(x, rows=rows, m=m):
            a = x.reshape(rows, m)
            (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
            return sig(s)

        timed(f"rows{rows}_u16", s16, stack16)
        timed(f"rows{rows}_u32", s32, stack32)

    # Production-shaped k=8: fused Pallas encode+histogram vs encode+rowsort16.
    bstack = jax.device_put(
        jnp.stack(
            [
                jax.random.randint(kk, (N,), 0, 4, jnp.int32).astype(jnp.uint8)
                for kk in jax.random.split(jax.random.PRNGKey(3), Rep)
            ]
        )
    )
    k = 8
    n_own = jnp.int32(N - k + 1)

    from dna_kmeres_parallel_tpu.models.engine import _count_batch
    from dna_kmeres_parallel_tpu.ops import encode as encode_ops

    def fused_hist(x):
        h = _count_batch(x, n_own, k, 1 << 16, False, "compiled")
        return (h[0] ^ h[-1] ^ h[1234]).astype(jnp.int32)

    timed("fused_pallas_hist_k8", fused_hist, bstack)

    def enc_rowsort16(x):
        codes, valid = encode_ops.rolling_codes(x, k)
        n = codes.shape[0]
        own = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_own
        c16 = jnp.where(valid & own, codes, 1 << 16).astype(jnp.uint32)
        # u16 cannot hold the 65536 sentinel for k=8; use u32 rows instead
        rows = 8192
        m = n // rows
        a = c16[: rows * m].reshape(rows, m)
        (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
        return sig(s)

    timed("enc_rowsort32_k8", enc_rowsort16, bstack)
    return 0


if __name__ == "__main__":
    sys.exit(main())
