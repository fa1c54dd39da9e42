"""Design-scale kill-and-resume distance run (r4 task-3 capstone):
54,018 seqs, checkpointed; interrupted after 8 panels with a simulated
mid-write kill (garbage appended past the durable offset), resumed to
completion; sampled rows verified byte-for-byte against the oracle.

Needs ~14 GB free in /tmp (the 13.13 GB CSV). Measured on TPU v5e,
2026-08-21: interrupted leg 470.7 s (750.8M pairs), resumed leg
450.5 s, rows_byte_exact=true — ~5% over the single-shot 875 s
(docs/BENCHMARKS.md "Design-scale distance run is preemption-safe")."""
import json, os, time
cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from dna_kmeres_parallel_tpu.models.engine import KmerEngine
from dna_kmeres_parallel_tpu.models import oracle
from dna_kmeres_parallel_tpu.ops import distance as dist_ops
from dna_kmeres_parallel_tpu.utils.config import KmerConfig

S, k = 54018, 3
rng = np.random.default_rng(54018)
lengths = rng.integers(180, 521, S)
alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
seqs = [alphabet[rng.integers(0, 4, L)].tobytes().decode() for L in lengths]
out, ck = "/tmp/design54k_resume.csv", "/tmp/design54k_resume.ckpt"
for p in (out, ck):
    if os.path.exists(p):
        os.unlink(p)
eng = KmerEngine(KmerConfig(k=k))
t0 = time.perf_counter()
r1 = eng.distance_stream_to_csv(seqs, out, panel_rows=2048,
                                checkpoint_path=ck, max_panels=8)
print(json.dumps({"phase": "interrupted", **{k2: r1[k2] for k2 in
      ("n_pairs", "completed", "elapsed_s")}}), flush=True)
assert not r1["completed"]
with open(out, "ab") as f:
    f.write(b"garbage-from-a-panel-killed-mid-write")
t1 = time.perf_counter()
r2 = eng.distance_stream_to_csv(seqs, out, panel_rows=2048,
                                checkpoint_path=ck)
print(json.dumps({"phase": "resumed", **{k2: r2[k2] for k2 in
      ("n_pairs", "completed", "resumed", "elapsed_s")}}), flush=True)
n_pairs = r2["n_pairs"]
assert r2["completed"] and r2["resumed"] and n_pairs == S * (S - 1) // 2
size = os.path.getsize(out)
assert size == 9 * n_pairs, (size, 9 * n_pairs)  # fixed-width "d.dddddd\n"
counts = oracle.counts_matrix(seqs, k).astype(np.int64)
L = np.array([len(s) for s in seqs], dtype=np.int64)
ok = True
with open(out, "rb") as f:
    for i in sorted(int(x) for x in rng.choice(S - 1, size=6, replace=False)):
        start_pair = i * (S - 1) - i * (i - 1) // 2
        row_pairs = S - 1 - i
        sums = np.minimum(counts[i][None, :], counts[i + 1:]).sum(axis=1)
        d = dist_ops.finish_distances_panel(sums[None, :], L[i:i+1], L[i+1:], k)[0]
        want = ("".join("%f\n" % v for v in d)).encode()
        f.seek(9 * start_pair)
        ok = ok and f.read(9 * row_pairs) == want
print(json.dumps({"phase": "summary", "rows_byte_exact": ok,
                  "csv_bytes": size, "n_pairs": n_pairs,
                  "total_wall_s": round(time.perf_counter() - t0, 1)}))
assert ok
