#!/usr/bin/env python
"""Same-window A/B: old bench program (XLA salt pass + full plane re-read
signature) vs the new fused-sig encode program (salt + reduction inside the
Pallas kernel — the production device program's exact memory traffic).

Run on the TPU. One process, both variants measured back to back per k, so
the tunnel-window error cancels in the ratio.
"""

import json
import os
import sys


def main():
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from dna_kmeres_parallel_tpu.models.benchmarks import (
        _two_size_differential,
    )
    from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops
    from dna_kmeres_parallel_tpu.ops.encode_pallas import (
        rolling_codes_split_pallas,
    )

    batch_bases = 16 << 20
    n_distinct = 4
    ks = [int(x) for x in sys.argv[1:]] or [21]

    for k in ks:
        keys = jax.random.split(jax.random.PRNGKey(0), n_distinct)
        stack = jnp.stack(
            [
                jax.random.randint(kk, (batch_bases,), 0, 4, jnp.int32).astype(
                    jnp.uint8
                )
                for kk in keys
            ]
        )
        n_own = jnp.int32(batch_bases - k + 1)
        inner_hi, inner_lo = 48, 12

        def make_old(inner):
            @jax.jit
            def prog(xs, salt0):
                def body(acc, i):
                    x = (
                        xs[i % n_distinct]
                        + (salt0 + i // n_distinct).astype(jnp.uint8)
                    ) & jnp.uint8(3)
                    words = sparse_ops._encode_words(
                        x, n_own, k, False, "compiled"
                    )
                    major = words[0]
                    sent = jnp.asarray(jnp.iinfo(major.dtype).max, major.dtype)
                    idx = jax.lax.broadcasted_iota(jnp.int32, major.shape, 0)
                    valid = major != sent
                    n_valid = jnp.sum(valid.astype(jnp.int32))
                    sig = jnp.sum(jnp.where(valid, idx, 0))
                    for w in words:
                        wv = (
                            jnp.where(valid, w, 0).astype(jnp.uint32)
                            & jnp.uint32(0xFFFF)
                        ).astype(jnp.int32)
                        sig = sig + jnp.sum(wv * idx)
                    return acc + jnp.stack([n_valid, sig]), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros(2, jnp.int32),
                    jnp.arange(inner, dtype=jnp.int32),
                )
                return acc

            return prog

        def make_new(inner):
            @jax.jit
            def prog(xs, salt0):
                def body(acc, i):
                    salt = salt0.astype(jnp.int32) + i // n_distinct
                    *_, sig = rolling_codes_split_pallas(
                        xs[i % n_distinct], n_own, k, False,
                        salt=salt, want_sig=True,
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

        results = {}
        for name, mk in (("old", make_old), ("new", make_new)):
            elapsed, delta, valid = _two_size_differential(
                mk, stack, inner_hi, inner_lo,
                counted_of=lambda h: int(np.asarray(h)[0]),
            )
            measured = (inner_hi - inner_lo) * batch_bases
            expect = (inner_hi - inner_lo) * (batch_bases - k + 1)
            ok = int(np.uint32(np.int64(delta) & 0xFFFFFFFF)) == int(
                np.uint32(expect & 0xFFFFFFFF)
            )
            gbps = 0.0 if not valid else measured / elapsed / 1e9
            results[name] = gbps
            print(
                json.dumps(
                    {
                        "k": k,
                        "variant": name,
                        "gbases_per_sec": round(gbps, 3),
                        "elapsed_s": round(elapsed, 4),
                        "timing_valid": bool(valid),
                        "exact": bool(ok),
                    }
                ),
                flush=True,
            )
        if results.get("old"):
            print(
                json.dumps(
                    {"k": k, "speedup_new_over_old": round(
                        results["new"] / results["old"], 3)}
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
