#!/usr/bin/env python
"""Dense-histogram kernel shoot-out on the real TPU (VERDICT r1 item 3).

Compares the two dense-histogram Pallas kernels at k <= 8 with the
two-size lax.scan differential timer (dispatch/fetch roundtrip cancels;
every dispatch is salted so the tunnel cannot dedupe):

  twolevel : ops/histogram_pallas.histogram_pallas — one-hot compares,
             H=1 VPU branch at bins <= 2048, two-level MXU outer product
             above (compare cost H+W per window).
  bitplane : ops/histogram_pallas.histogram_bitplane_pallas — code bits as
             +-1 planes, ONE int8 [W,16]x[16,chunk] MXU matmul per 8-row
             tile builds the one-hot in natural [bins, windows] layout
             (no relayouts, lane-parallel accumulate).

Usage: python scripts/dense_hist_probe.py [k ...] [--chunks 512,1024]
Writes one JSON line per (k, impl, chunk) to stdout.
"""

import argparse
import functools
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ks", nargs="*", type=int, default=None)
    ap.add_argument("--chunks", default="512,1024")
    ap.add_argument("--mbases", type=int, default=16, help="bases per batch (M)")
    ap.add_argument("--impls", default="", help="comma list; empty = all")
    args = ap.parse_args()
    ks = args.ks or [3, 4, 6, 7]
    chunks = [int(c) for c in args.chunks.split(",")]

    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from dna_kmeres_parallel_tpu.ops.runtime import apply_platform_env

    apply_platform_env()  # sitecustomize force-registers the TPU backend;
    # honor KMER_TPU_PLATFORM/JAX_PLATFORMS=cpu for off-device smoke runs
    import jax.numpy as jnp
    import numpy as np

    from dna_kmeres_parallel_tpu.models.benchmarks import _two_size_differential
    from dna_kmeres_parallel_tpu.ops import histogram_pallas as hp
    from dna_kmeres_parallel_tpu.utils import codec

    batch = args.mbases << 20
    n_distinct = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n_distinct)
    stack = jnp.stack(
        [
            jax.random.randint(kk, (batch,), 0, 4, jnp.int32).astype(jnp.uint8)
            for kk in keys
        ]
    )

    def make_prog(fn, k, bins, inner):
        n_own = jnp.int32(batch - k + 1)

        @jax.jit
        def prog(xs, salt0):
            def body(acc, i):
                x = (
                    xs[i % n_distinct]
                    + (salt0 + i // n_distinct).astype(jnp.uint8)
                ) & jnp.uint8(3)
                return acc + fn(x, n_own, k, bins), None

            acc, _ = jax.lax.scan(
                body,
                jnp.zeros((bins,), jnp.int32),
                jnp.arange(inner, dtype=jnp.int32),
            )
            return acc

        return prog

    impls = {
        "twolevel": lambda b, n, k, bins: hp.histogram_pallas(b, n, k, bins),
        "bitplane": lambda b, n, k, bins: hp.histogram_bitplane_pallas(
            b, n, k, bins
        ),
        "bp2": lambda b, n, k, bins: hp.histogram_bp2_pallas(b, n, k, bins),
        "bp2cmp": lambda b, n, k, bins: hp.histogram_bp2_pallas(
            b, n, k, bins, mode="cmp"
        ),
    }
    inner_hi, inner_lo = 24, 6
    for k in ks:
        bins = codec.num_bins(k)
        for chunk in chunks:
            os.environ["KMER_TPU_HIST_CHUNK"] = str(chunk)
            os.environ["KMER_TPU_HIST_CHUNK_BP"] = str(chunk)
            os.environ["KMER_TPU_HIST_CHUNK_BP2"] = str(chunk)
            # chunk is read at trace time — drop cached traces so it bites
            hp.histogram_pallas.clear_cache()
            hp.histogram_bitplane_pallas.clear_cache()
            hp.histogram_bp2_pallas.clear_cache()
            only = [s for s in args.impls.split(",") if s]
            for name, fn in impls.items():
                if only and name not in only:
                    continue
                if name.startswith("bitplane") and bins > hp._BP_MAX_BINS:
                    continue
                if name.startswith("bp2") and bins > hp._BP2_MAX_BINS:
                    continue
                try:
                    # fresh closures per chunk so jit keys differ
                    f = functools.partial(fn)
                    elapsed, counted, valid = _two_size_differential(
                        lambda inner: make_prog(f, k, bins, inner),
                        stack,
                        inner_hi,
                        inner_lo,
                    )
                    measured = (inner_hi - inner_lo) * batch
                    expected = (inner_hi - inner_lo) * (batch - k + 1)
                    rec = {
                        "k": k,
                        "impl": name,
                        "chunk": chunk,
                        "gbases_per_sec": 0.0
                        if not valid
                        else round(measured / elapsed / 1e9, 4),
                        "timing_valid": bool(valid),
                        "exact": int(counted) == expected,
                    }
                except Exception as e:  # pragma: no cover - probe
                    rec = {
                        "k": k,
                        "impl": name,
                        "chunk": chunk,
                        "error": repr(e)[:200],
                    }
                print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
