"""dna_kmeres_parallel_tpu — a TPU-native k-mer counting / k-mer distance framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA project ``axlwild/dna-kmeres-parallel`` (see /root/reference): FASTA
ingestion, exact k-mer counting over the ACGT alphabet, and pairwise fractional
common-k-mer-count distance matrices — extended with 2-bit packed encoding,
rolling k-mer codes, reverse-complement canonicalization, dense and sparse
(sorted) histograms for large k, and multi-chip data-parallel sharding with
exact integer collective merges.

Layout
------
- ``utils/``     host-side primitives: codec, FASTA parsing, triangular index
                 math, config, CSV/reporting IO, checkpointing.
- ``models/``    engines: the NumPy golden oracle (exact reference semantics)
                 and the TPU engine / streaming pipeline built on top of ops.
- ``ops/``       device compute: rolling-code encoding, histograms
                 (one-hot-MXU / scatter / sort-based), pairwise (min,+)
                 distance reductions, and their Pallas TPU kernels.
- ``parallel/``  meshes, shard_map data-parallel counting with psum merges,
                 bucket-sharded histograms with all_to_all exchange,
                 multi-host glue.
- ``native/``    C++ FASTA parser + 2-bit packer (ctypes extension) — the
                 host-side hot path.

Correctness contract: every accelerated path must match
``models.oracle`` count-for-count and distance-for-distance (float32); the
oracle itself reproduces the reference semantics documented in SURVEY.md §2.4.
"""

__version__ = "0.1.0"

from dna_kmeres_parallel_tpu.utils.config import KmerConfig  # noqa: F401

__all__ = ["KmerConfig", "__version__"]
