#!/usr/bin/env python
"""Same-window A/B of the sparse encoder kernels on the real device:
v1 (uint8 doubling ladder) vs v2 (packed-word SWAR extraction), via the
same two-size lax.scan differential the bench uses. KMER_TPU_ENC_V2
selects the route inside run_sparse_bench; everything else is identical.

Usage: python scripts/encoder_v2_probe.py [k ...]
"""

import json
import os
import sys


def main() -> int:
    os.environ.setdefault("KMER_TPU_PLATFORM", "axon")
    cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dna_kmeres_parallel_tpu.models.benchmarks import run_sparse_bench

    ks = [int(a) for a in sys.argv[1:]] or [21]
    for k in ks:
        for canonical in (False, True) if len(ks) == 1 else (False,):
            out = {}
            for label, v2 in (("v2", "1"), ("v1", "0")):
                os.environ["KMER_TPU_ENC_V2"] = v2
                r = run_sparse_bench(
                    k=k, canonical=canonical,
                    total_bases=64 << 20, batch_bases=16 << 20,
                    device_sort=False,
                )
                ok = r["windows_counted"] == r["windows_expected"]
                out[label] = (r["gbases_per_sec"], r["timing_valid"], ok)
                print(json.dumps({"k": k, "canonical": canonical,
                                  "enc": label, **r}), file=sys.stderr)
            print(json.dumps({
                "k": k, "canonical": canonical,
                "v2_gbps": out["v2"][0], "v1_gbps": out["v1"][0],
                "speedup": round(out["v2"][0] / max(out["v1"][0], 1e-9), 3),
                "both_exact": out["v2"][2] and out["v1"][2],
                "timing_valid": out["v2"][1] and out["v1"][1],
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
