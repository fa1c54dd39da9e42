"""Hardware A/B: dense k<=8 bp2 histogram fed from u8 bases (current
routed best, compare-built one-hots) vs the r5 packed-plane front end
(host-staged u32 planes, SWAR funnel extraction — VERDICT weak #4).

Both arms run the SAME two-size scan differential with per-iteration
XLA data salting (valid-preserving alphabet permutation; ~0.01-0.04 ms
of extra traffic per 16M-base batch, negligible at these rates).

Usage: python scripts/bp2_packed_probe.py [k ...]   (default: 4 8)
"""
import json
import os
import sys

cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from dna_kmeres_parallel_tpu.models.benchmarks import _two_size_differential
from dna_kmeres_parallel_tpu.ops.encode_pallas import host_planes_from_packfmt
from dna_kmeres_parallel_tpu.ops.histogram_pallas import (
    histogram_bp2_packed_pallas,
    histogram_bp2_pallas,
)
from dna_kmeres_parallel_tpu.utils import codec

BATCH = int(os.environ.get("PROBE_BATCH", str(16 << 20)))
INNER_HI = int(os.environ.get("PROBE_INNER", "24"))


def probe(k: int) -> dict:
    bins = 4**k
    rng = np.random.default_rng(k)
    bases = rng.integers(0, 4, BATCH).astype(np.uint8)
    n_own = jnp.int32(BATCH - k + 1)
    xs = jax.device_put(jnp.asarray(bases))
    data, mask, _ = codec.pack_bases(bases)
    w_le, iv_be = host_planes_from_packfmt(data, mask)
    wd = jax.device_put(jnp.asarray(w_le))
    ivd = jax.device_put(jnp.asarray(iv_be))

    def make_u8(inner):
        @jax.jit
        def prog(x, salt0):
            def body(acc, i):
                xi = (x + (salt0 + i).astype(jnp.uint8)) & jnp.uint8(3)
                h = histogram_bp2_pallas(
                    xi, n_own, k, bins, mode="cmp"
                )
                return acc + jnp.sum(h), None

            acc, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(inner, dtype=jnp.int32)
            )
            return acc

        return prog

    def make_packed(inner):
        @jax.jit
        def prog(ds, salt0):
            w, iv = ds

            def body(acc, i):
                s = (salt0.astype(jnp.uint32) + i.astype(jnp.uint32)) & 3
                wi = w ^ (s * jnp.uint32(0x55555555))
                h = histogram_bp2_packed_pallas(
                    wi, iv, n_own, k, bins, mode="cmp"
                )
                return acc + jnp.sum(h), None

            acc, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(inner, dtype=jnp.int32)
            )
            return acc

        return prog

    out = {"k": k, "batch": BATCH}
    for name, make, stack in (
        ("u8_cmp", make_u8, xs),
        ("packed", make_packed, (wd, ivd)),
    ):
        el, counted, valid = _two_size_differential(
            make, stack, INNER_HI, max(INNER_HI // 4, 1),
            counted_of=lambda h: int(np.asarray(h)),
        )
        iters = INNER_HI - max(INNER_HI // 4, 1)
        expect = iters * (BATCH - k + 1)
        gbps = 0.0 if not valid else iters * BATCH / el / 1e9
        out[name] = {
            "gbases_per_sec": round(gbps, 3),
            "elapsed_s": round(el, 4),
            "windows_ok": counted % (1 << 32) == expect % (1 << 32),
            "timing_valid": valid,
        }
    if out["u8_cmp"]["gbases_per_sec"]:
        out["speedup"] = round(
            out["packed"]["gbases_per_sec"]
            / out["u8_cmp"]["gbases_per_sec"],
            3,
        )
    return out


for karg in [int(a) for a in sys.argv[1:]] or [4, 8]:
    print(json.dumps(probe(karg)), flush=True)
