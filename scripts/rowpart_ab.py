"""Hardware A/B: raw bucketed exchange — global single-operand owner
sort (r4 prefix-fast) vs the r5 ROW-PARTITION route (per-row sort +
Pallas dynamic-roll segment extraction, KMER_TPU_ROW_PARTITION=1).

1-device mesh on the real chip (program shape preserved; the all_to_all
degenerates to a copy — same as scripts/bucketed_ab.py). Two-size scan
differential with an order-dependent signature (sorts can't be elided),
median of paired deltas, distinct inputs per iteration.

Usage: python scripts/rowpart_ab.py [k ...]   (default: 31 21)
"""
import json
import os
import sys
import time

cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from dna_kmeres_parallel_tpu.parallel import bucketed
from dna_kmeres_parallel_tpu.parallel.mesh import make_mesh
from dna_kmeres_parallel_tpu.parallel.sharded_sparse import stage_shard_planes

TOTAL = int(os.environ.get("AB_BASES", str(16 << 20)))
OWNER = os.environ.get("AB_OWNER", "prefix")
INNER_HI = int(os.environ.get("AB_INNER", "6"))
N_DISTINCT = 2
mesh = make_mesh(1)
rng = np.random.default_rng(11)


def sig(words):
    s = jnp.int32(0)
    for wpl in words:
        v = wpl.astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
        s = s + jnp.sum(v * (pos | 1))
    return s


def run_k(k: int) -> dict:
    ws, ivs, ns = [], [], []
    for _ in range(N_DISTINCT):
        flat = rng.integers(0, 4, TOTAL, dtype=np.int64).astype(np.uint8)
        shards, n_own = bucketed.shard_stream_with_halo(flat, k, mesh)
        w_le, iv_be = stage_shard_planes(shards)
        ws.append(w_le)
        ivs.append(iv_be)
        ns.append(n_own)
    st = {
        "w": jnp.asarray(np.stack(ws)),
        "iv": jnp.asarray(np.stack(ivs)),
        "n": jnp.asarray(np.stack(ns)),
    }

    out = {"k": k, "shard_bases": TOTAL, "owner_mode": OWNER}
    for label, env in (("global_sort", "0"), ("row_partition", "1")):
        os.environ["KMER_TPU_ROW_PARTITION"] = env

        def make(inner):
            @jax.jit
            def prog(st, salt0):
                def body(acc, i):
                    j = i % N_DISTINCT
                    words, ov = bucketed.exchange_words_bucket_sharded(
                        (st["w"][j], st["iv"][j]),
                        st["n"][j],
                        k,
                        False,
                        mesh,
                        owner_mode=OWNER,
                        pallas="compiled",
                        staged_planes=True,
                    )
                    return (
                        acc
                        + sig(words)
                        + ov.astype(jnp.int32)
                        + salt0.astype(jnp.int32),
                        None,
                    )

                acc, _ = jax.lax.scan(
                    body, jnp.int32(0), jnp.arange(inner, dtype=jnp.int32)
                )
                return acc

            return prog

        hi_p, lo_p = make(INNER_HI), make(max(INNER_HI // 3, 1))
        int(np.asarray(hi_p(st, jnp.uint8(101))))
        int(np.asarray(lo_p(st, jnp.uint8(102))))
        deltas = []
        for j in range(4):
            t0 = time.perf_counter()
            int(np.asarray(hi_p(st, jnp.uint8(2 * j))))
            th = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(np.asarray(lo_p(st, jnp.uint8(2 * j + 1))))
            tl = time.perf_counter() - t0
            deltas.append(th - tl)
        el = float(np.median(deltas))
        iters = INNER_HI - max(INNER_HI // 3, 1)
        out[label] = {
            "gbases_per_sec": round(TOTAL * iters / el / 1e9, 4)
            if el > 0
            else 0.0,
            "s_per_shard": round(el / iters, 4),
        }
    out["speedup"] = round(
        out["row_partition"]["gbases_per_sec"]
        / max(out["global_sort"]["gbases_per_sec"], 1e-9),
        3,
    )
    return out


for karg in [int(a) for a in sys.argv[1:]] or [31, 21]:
    print(json.dumps(run_k(karg)), flush=True)
