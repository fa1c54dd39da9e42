#!/usr/bin/env python
"""Probe sort-path throughput vs batch size, and fused-histogram chunk size.

In-program repetition (lax.scan over distinct inputs in ONE dispatch) —
see sort_probe.py for why. Usage: python scripts/batch_probe.py
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

    from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops

    def timed(name, per_item, stack, T, extra=None):
        R = stack.shape[0]
        try:

            @jax.jit
            def prog(st):
                def body(c, x):
                    return c + per_item(x), None

                out, _ = jax.lax.scan(body, jnp.int32(0), st)
                return out

            s0 = int(prog(stack))
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                _ = int(prog(stack))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            dt = best / R
            rec = {
                "probe": name,
                "T": T,
                "R": R,
                "ms_per_iter": round(dt * 1e3, 3),
                "gbases_per_sec": round(T / dt / 1e9, 4),
                "check": s0,
            }
            if extra:
                rec.update(extra)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    k = 21

    # --- sort-path throughput vs batch size ------------------------------
    for T, R in ((4 << 20, 8), (16 << 20, 4), (32 << 20, 3)):
        keys = jax.random.split(jax.random.PRNGKey(T), R)
        stack = jax.device_put(
            jnp.stack(
                [
                    jax.random.randint(kk, (T,), 0, 4, jnp.int32).astype(jnp.uint8)
                    for kk in keys
                ]
            )
        )
        n_own = jnp.int32(T - k + 1)

        def full(x):
            words, starts = sparse_ops.sort_unique_starts(
                x, n_own, k, False, pallas="compiled"
            )
            major = words[0]
            sent = jnp.asarray(jnp.iinfo(major.dtype).max, major.dtype)
            n = major.shape[0]
            # Permutation-VARIANT signature — an invariant reduction lets
            # XLA elide the sort (see benchmarks.run_sparse_bench).
            idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
            n_valid = jnp.sum((major != sent).astype(jnp.int32))
            return n_valid + jnp.sum(jnp.where(starts, idx, 0))

        timed(f"sparse_k21_T{T>>20}M", full, stack, T)
        del stack

    # --- fused dense histogram chunk sweep (k=4 and k=8) ------------------
    from dna_kmeres_parallel_tpu.ops import histogram_pallas
    import importlib

    T, R = 16 << 20, 4
    keys = jax.random.split(jax.random.PRNGKey(99), R)
    stack = jax.device_put(
        jnp.stack(
            [
                jax.random.randint(kk, (T,), 0, 4, jnp.int32).astype(jnp.uint8)
                for kk in keys
            ]
        )
    )
    for kk_ in (4, 8):
        bins = 1 << (2 * kk_)
        n_own = jnp.int32(T - kk_ + 1)
        for chunk in (512, 1024, 2048):
            os.environ["KMER_TPU_HIST_CHUNK"] = str(chunk)
            # chunk is read at trace time from the env — drop cached traces
            # or every setting would silently reuse the first one's kernel.
            histogram_pallas.histogram_pallas.clear_cache()

            def hist(x, _b=bins, _k=kk_, _n=n_own):
                h = histogram_pallas.histogram_pallas(x, _n, _k, _b, False)
                return (jnp.sum(h) & 0xFFFF).astype(jnp.int32)

            timed(
                f"hist_k{kk_}_chunk{chunk}",
                hist,
                stack,
                T,
                extra={"chunk": chunk},
            )
    os.environ["KMER_TPU_HIST_CHUNK"] = "512"
    return 0


if __name__ == "__main__":
    sys.exit(main())
