"""Subprocess worker for the true multi-process multihost test.

Runs one 'host' of a 2-process jax.distributed CPU job (gloo collectives)
and counts its record-aligned byte range of a shared FASTA through
count_file_multihost — the exact config-4 code path (per-host ingest,
make_array_from_process_local_data, psum merge over the global mesh).

Usage: python mp_worker.py <pid> <nprocs> <port> <fasta> <k> <out.npz>
"""

import os
import sys


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    fasta_path, k, out_path = sys.argv[4], int(sys.argv[5]), sys.argv[6]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from dna_kmeres_parallel_tpu.parallel import multihost

    multihost.init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs

    import numpy as np
    from jax.sharding import Mesh

    from dna_kmeres_parallel_tpu.utils.config import KmerConfig

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    hist, total_bases, n_seqs = multihost.count_file_multihost(
        fasta_path, KmerConfig(k=k), mesh
    )
    np.savez(
        out_path, hist=hist, total_bases=total_bases, n_seqs=n_seqs
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
