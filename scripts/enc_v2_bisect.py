#!/usr/bin/env python
"""Stage bisection for the v2 packed encoder on hardware: times the
production program (planes+sig) against diagnostic variants via the
two-size differential. Variants: 'full', 'sigonly' (all compute, no
plane stores), 'prepass' (XLA plane conversion only, no kernel)."""
import json
import os
import sys

os.environ.setdefault("KMER_TPU_PLATFORM", "axon")
cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from dna_kmeres_parallel_tpu.models.benchmarks import _two_size_differential
from dna_kmeres_parallel_tpu.ops.encode_pallas import (
    be_planes_from_packfmt,
    rolling_codes_split_packed_pallas,
)

k = int(sys.argv[1]) if len(sys.argv) > 1 else 21
batch_bases = 16 << 20
n_distinct = 4
keys = jax.random.split(jax.random.PRNGKey(0), n_distinct)
stack = jnp.stack([
    jax.random.randint(kk, (batch_bases,), 0, 4, jnp.int32).astype(jnp.uint8)
    for kk in keys
])


@jax.jit
def _pack(xs):
    bits = (xs & 3).astype(jnp.uint32)
    b4 = bits.reshape(xs.shape[0], -1, 4)
    data = (b4[..., 0] | (b4[..., 1] << 2) | (b4[..., 2] << 4)
            | (b4[..., 3] << 6)).astype(jnp.uint8)
    v = (xs < 4).astype(jnp.uint32).reshape(xs.shape[0], -1, 8)
    mask = jnp.zeros_like(v[..., 0])
    for j in range(8):
        mask = mask | (v[..., j] << j)
    return data, mask.astype(jnp.uint8)


data_stack, mask_stack = _pack(stack)
n_own = jnp.int32(batch_bases - k + 1)


# 'kernelonly': planes pre-staged on device OUTSIDE the timed scan —
# isolates the Pallas kernel (the in-kernel XOR salt still gives every
# iteration distinct data, dodging the tunnel dedupe trap).
planes = [
    be_planes_from_packfmt(data_stack[i], mask_stack[i])
    for i in range(n_distinct)
]
wstack = jax.device_put(jnp.stack([w for w, _ in planes]))
istack = jax.device_put(jnp.stack([iv for _, iv in planes]))


def make_maker(variant):
    def make(inner):
        @jax.jit
        def prog(ds, salt0):
            dstack, mstack = ds

            def body(acc, i):
                salt = salt0.astype(jnp.int32) + i // n_distinct
                if variant == "kernelonly":
                    wbe = wstack[i % n_distinct]
                    ibe = istack[i % n_distinct]
                else:
                    wbe, ibe = be_planes_from_packfmt(
                        dstack[i % n_distinct], mstack[i % n_distinct]
                    )
                if variant == "prepass":
                    sx = salt.astype(jnp.uint32) * jnp.uint32(0x55555555)
                    w = wbe ^ sx
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, w.shape, 0
                    )
                    s1 = jnp.sum(
                        jax.lax.bitcast_convert_type(w, jnp.int32) * idx
                    )
                    s2 = jnp.sum(
                        jax.lax.bitcast_convert_type(ibe, jnp.int32) * idx
                    )
                    return acc + jnp.stack([s1, s2]), None
                *_, sig = rolling_codes_split_packed_pallas(
                    wbe, ibe, n_own, k, False,
                    salt=salt, want_sig=True,
                    _diag_sigonly=(variant == "sigonly"),
                )
                n_valid = jnp.sum(sig[:, :128], dtype=jnp.int32)
                sg = jnp.sum(sig[:, 128:], dtype=jnp.int32)
                return acc + jnp.stack([n_valid, sg]), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros(2, jnp.int32),
                jnp.arange(inner, dtype=jnp.int32),
            )
            return acc

        return prog
    return make


for variant in sys.argv[2:] or ["sigonly", "prepass", "full"]:
    elapsed, counted, valid = _two_size_differential(
        make_maker(variant), (data_stack, mask_stack), 48, 12,
        counted_of=lambda h: int(np.asarray(h)[0]),
    )
    measured = 36 * batch_bases
    print(json.dumps({
        "k": k, "variant": variant,
        "gbps": 0.0 if not valid else round(measured / elapsed / 1e9, 4),
        "timing_valid": valid,
    }))
