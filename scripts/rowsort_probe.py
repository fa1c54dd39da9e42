#!/usr/bin/env python
"""Device-sort probe (consolidated; supersedes rowsort_probe{2,3,4}.py —
their findings are recorded in docs/BENCHMARKS.md "Device sort findings").

One parameterized tool for every sort-shape question the sparse path asked:

  suite=sort    flat [N] vs rows [R, N/R] XLA sorts, key layouts u16 / u32 /
                u64 / u16+u32 two-key, optional bit-masked value range.
  suite=fused   production shape: fused Pallas encode -> reshape -> row
                sort at given k / rows (the device_sort=True fallback path).
  suite=smallk  dense-band check: fused Pallas histogram vs encode+rowsort
                at k <= 8 (answer on record: the histogram wins).

Timing discipline per CLAUDE.md: in-program lax.scan repetition over
distinct inputs inside ONE dispatch; an order-dependent signature is
consumed so XLA cannot elide the sorts.

Usage:
  python scripts/rowsort_probe.py sort  [--n 16M] [--rows 16,64,...,32768]
         [--layouts u32,u16u32,u64,u16] [--mask-bits 18]
  python scripts/rowsort_probe.py fused [--k 13,21] [--rows 8192,16384]
  python scripts/rowsort_probe.py smallk [--k 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _size(s: str) -> int:
    for suffix, m in (("G", 1 << 30), ("M", 1 << 20), ("K", 1 << 10)):
        if s.upper().endswith(suffix):
            return int(float(s[:-1]) * m)
    return int(s)


def _ints(s: str):
    return [int(x) for x in s.split(",") if x]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("suite", choices=("sort", "fused", "smallk"))
    ap.add_argument("--n", default="16M", help="elements / bases per rep")
    ap.add_argument("--rep", type=int, default=6)
    ap.add_argument("--rows", default="")
    ap.add_argument("--k", default="")
    ap.add_argument(
        "--layouts", default="u32,u16u32", help="sort suite key layouts"
    )
    ap.add_argument(
        "--mask-bits", type=int, default=0,
        help="sort suite: also probe keys masked to this many bits "
        "(value-range sensitivity; 0 = skip)",
    )
    args = ap.parse_args()

    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from dna_kmeres_parallel_tpu.ops.runtime import apply_platform_env

    apply_platform_env()  # sitecustomize force-registers the TPU backend;
    # honor KMER_TPU_PLATFORM/JAX_PLATFORMS=cpu for off-device smoke runs
    import jax.numpy as jnp

    N = _size(args.n)
    Rep = args.rep

    def sig(a2d):
        # order-dependent signature over a few columns: forces the sorted
        # ORDER to be observed (sum alone is permutation-invariant and XLA
        # elides the sort entirely).
        first = a2d[..., 0].astype(jnp.int32)
        mid = a2d[..., a2d.shape[-1] // 2].astype(jnp.int32)
        last = a2d[..., -1].astype(jnp.int32)
        return jnp.sum(first ^ (mid >> 1) ^ (last >> 2))

    def timed(name, per_item, arg, rep=Rep, extra=None):
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
            rec = {"probe": name, "n": N, "ms_per_iter": round(dt * 1e3, 3)}
            if extra:
                rec.update(extra)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:300]}), flush=True)

    def u32_stack(seed, rep=Rep):
        keys = jax.random.split(jax.random.PRNGKey(seed), rep)
        return jax.device_put(
            jnp.stack([jax.random.bits(kk, (N,), jnp.uint32) for kk in keys])
        )

    def base_stack(seed, rep=Rep):
        keys = jax.random.split(jax.random.PRNGKey(seed), rep)
        return jax.device_put(
            jnp.stack(
                [
                    jax.random.randint(kk, (N,), 0, 4, jnp.int32).astype(
                        jnp.uint8
                    )
                    for kk in keys
                ]
            )
        )

    if args.suite == "sort":
        rows_list = _ints(args.rows) or [0, 16, 64, 256, 1024, 4096, 8192, 16384, 32768]
        layouts = args.layouts.split(",")
        stack = u32_stack(7)

        def prep(x, layout):
            if layout == "u16":
                return (x.astype(jnp.uint16),)
            if layout == "u32":
                return (x,)
            if layout == "u64":
                hi = (x >> 22).astype(jnp.uint64)  # k=21-ish hi bits
                return ((hi << jnp.uint64(32)) | x.astype(jnp.uint64),)
            if layout == "u16u32":
                return ((x >> 16).astype(jnp.uint16), x)
            raise ValueError(layout)

        for layout in layouts:
            for rows in rows_list:
                if rows and N // max(rows, 1) < 1024:
                    continue

                def run(x, rows=rows, layout=layout):
                    ops = prep(x, layout)
                    if rows:
                        m = N // rows
                        ops = tuple(o[: rows * m].reshape(rows, m) for o in ops)
                        out = jax.lax.sort(
                            ops, num_keys=len(ops), dimension=-1
                        )
                        return sig(out[-1])
                    out = jax.lax.sort(ops, num_keys=len(ops))
                    return sig(out[-1][None, :])

                name = f"{'flat' if not rows else f'rows{rows}'}_{layout}"
                timed(name, run, stack)
                if args.mask_bits:
                    mask = jnp.uint32((1 << args.mask_bits) - 1)

                    def run_m(x, rows=rows, layout=layout, mask=mask):
                        return run(x & mask)

                    timed(f"{name}_{args.mask_bits}bit", run_m, stack)

    elif args.suite == "fused":
        from dna_kmeres_parallel_tpu.ops.encode_pallas import (
            rolling_codes_split_pallas,
        )

        ks = _ints(args.k) or [13, 21]
        rows_list = _ints(args.rows) or [8192, 16384, 32768]
        bstack = base_stack(3)

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

        for k in ks:
            for rows in rows_list:
                timed(
                    f"fused_k{k}_rows{rows}",
                    lambda x, k=k, r=rows: fused(x, k, r),
                    bstack,
                    extra={"gbases_per_sec_hint": None},
                )

    else:  # smallk
        from dna_kmeres_parallel_tpu.models.engine import _count_batch
        from dna_kmeres_parallel_tpu.ops import encode as encode_ops

        k = (_ints(args.k) or [8])[0]
        bins = 1 << (2 * k)
        bstack = base_stack(3)
        n_own = jnp.int32(N - k + 1)

        def fused_hist(x):
            h = _count_batch(x, n_own, k, bins, False, "compiled")
            return (h[0] ^ h[-1] ^ h[min(1234, bins - 1)]).astype(jnp.int32)

        timed(f"fused_pallas_hist_k{k}", fused_hist, bstack)

        def enc_rowsort(x):
            codes, valid = encode_ops.rolling_codes(x, k)
            n = codes.shape[0]
            own = (
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
                < n_own
            )
            c = jnp.where(valid & own, codes, bins).astype(jnp.uint32)
            rows = 8192
            m = n // rows
            a = c[: rows * m].reshape(rows, m)
            (s,) = jax.lax.sort((a,), num_keys=1, dimension=-1)
            return sig(s)

        timed(f"enc_rowsort32_k{k}", enc_rowsort, bstack)
    return 0


if __name__ == "__main__":
    sys.exit(main())
