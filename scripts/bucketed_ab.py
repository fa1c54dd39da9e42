#!/usr/bin/env python
"""Same-window A/B of the bucketed exchange DEVICE program: v1 base-shard
encode vs v2 plane-staged encode (r4), on a 1-device mesh on the real chip.

The graded config-5 device program is exchange_words_bucket_sharded
(encode -> owner sort -> fixed-cap all_to_all). A 1-device mesh keeps the
program shape (the all_to_all degenerates to a copy) while running on the
single available chip, so the A/B isolates exactly what r4 changed: the
per-shard encode route. Inputs are pre-staged on device; each timed
dispatch gets a DISTINCT input (tunnel dedupe trap, CLAUDE.md); timing is
device-only (block_until_ready on the device outputs, no fetch).

Usage: python scripts/bucketed_ab.py [k ...]   (default: 21 31)
"""

import json
import os
import sys
import time


def main() -> int:
    os.environ.setdefault("KMER_TPU_PLATFORM", "axon")
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from dna_kmeres_parallel_tpu.parallel import bucketed
    from dna_kmeres_parallel_tpu.parallel.mesh import make_mesh
    from dna_kmeres_parallel_tpu.parallel.sharded_sparse import (
        stage_shard_planes,
    )

    ks = [int(a) for a in sys.argv[1:]] or [21, 31]
    total = int(os.environ.get("AB_BASES", str(16 << 20)))
    reps = int(os.environ.get("AB_REPS", "4"))
    owner_mode = os.environ.get("AB_OWNER", "prefix")
    # AB_SCAN=R: measure at POD-SHARD sizes — R distinct small inputs
    # consumed by ONE in-program lax.scan (per-dispatch tunnel latency
    # would otherwise swamp a ~ms program; an order-dependent signature
    # keeps XLA from eliding the sorts).
    scan_reps = int(os.environ.get("AB_SCAN", "0"))
    mesh = make_mesh(1)
    rng = np.random.default_rng(7)

    if scan_reps:
        import jax.numpy as jnp2

        for k in ks:
            stacks = {"b": [], "w": [], "iv": [], "n": []}
            for _ in range(scan_reps):
                flat = rng.integers(0, 4, total, dtype=np.int64).astype(
                    np.uint8
                )
                shards, n_own = bucketed.shard_stream_with_halo(
                    flat, k, mesh
                )
                w_le, iv_be = stage_shard_planes(shards)
                stacks["b"].append(shards)
                stacks["w"].append(w_le)
                stacks["iv"].append(iv_be)
                stacks["n"].append(n_own)
            st = {kk: jnp2.asarray(np.stack(v)) for kk, v in stacks.items()}

            def sig(words):
                s = jnp2.int32(0)
                for wpl in words:
                    v = wpl.astype(jnp2.int32)
                    pos = jax.lax.broadcasted_iota(
                        jnp2.int32, v.shape, len(v.shape) - 1
                    )
                    s = s + jnp2.sum(v * (pos | 1))
                return s

            out = {}
            for label, staged in (("v2", True), ("v1", False)):

                @jax.jit
                def prog(st, base):
                    # `base` differs per dispatch: byte-identical
                    # dispatches get deduped in the tunnel (CLAUDE.md).
                    def body(acc, xs):
                        if staged:
                            inp = (xs["w"], xs["iv"])
                        else:
                            inp = xs["b"]
                        words, ov = bucketed.exchange_words_bucket_sharded(
                            inp, xs["n"], k, False, mesh,
                            owner_mode=owner_mode, pallas="compiled",
                            staged_planes=staged,
                        )
                        return acc + sig(words) + ov.astype(jnp2.int32), None

                    acc, _ = jax.lax.scan(body, base, st)
                    return acc

                _ = int(prog(st, jnp2.int32(100)))  # compile + warm
                best = None
                for r in range(3):
                    t0 = time.perf_counter()
                    _ = int(prog(st, jnp2.int32(r)))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                gbps = total * scan_reps / best / 1e9
                out[label] = gbps
                print(
                    json.dumps(
                        {"k": k, "enc": label, "scan": scan_reps,
                         "bases_per_iter": total,
                         "best_s": round(best, 4),
                         "gbases_per_sec": round(gbps, 3)}
                    ),
                    file=sys.stderr,
                )
            print(
                json.dumps(
                    {
                        "k": k, "owner_mode": owner_mode,
                        "shard_bases": total, "scan_reps": scan_reps,
                        "v2_gbps": round(out["v2"], 3),
                        "v1_gbps": round(out["v1"], 3),
                        "speedup": round(
                            out["v2"] / max(out["v1"], 1e-9), 3
                        ),
                    }
                )
            )
        return 0

    for k in ks:
        # Distinct shard grids per dispatch (dedupe trap): fresh random
        # bases each rep, staged up front.
        shard_sets = []
        for _ in range(reps + 1):  # +1 warmup
            flat = rng.integers(0, 4, total, dtype=np.int64).astype(np.uint8)
            shards, n_own = bucketed.shard_stream_with_halo(flat, k, mesh)
            w_le, iv_be = stage_shard_planes(shards)
            shard_sets.append(
                (
                    jnp.asarray(shards),
                    (jnp.asarray(w_le), jnp.asarray(iv_be)),
                    jnp.asarray(n_own),
                )
            )

        out = {}
        for label, staged in (("v2", True), ("v1", False)):

            def run(i):
                b, planes, n_own = shard_sets[i]
                words, ov = bucketed.exchange_words_bucket_sharded(
                    planes if staged else b,
                    n_own,
                    k,
                    False,
                    mesh,
                    owner_mode=owner_mode,
                    pallas="compiled",
                    staged_planes=staged,
                )
                jax.block_until_ready(words)
                return words, ov

            words, ov = run(0)  # warmup/compile
            assert not bool(ov), "overflow in warmup"
            best = None
            for i in range(1, reps + 1):
                t0 = time.perf_counter()
                run(i)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            gbps = total / best / 1e9
            out[label] = gbps
            print(
                json.dumps(
                    {"k": k, "enc": label, "best_s": round(best, 4),
                     "gbases_per_sec": round(gbps, 3)}
                ),
                file=sys.stderr,
            )
        print(
            json.dumps(
                {
                    "k": k,
                    "owner_mode": owner_mode,
                    "total_bases": total,
                    "v2_gbps": round(out["v2"], 3),
                    "v1_gbps": round(out["v1"], 3),
                    "speedup": round(out["v2"] / max(out["v1"], 1e-9), 3),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
