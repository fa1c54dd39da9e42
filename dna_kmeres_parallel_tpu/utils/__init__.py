"""Host-side primitives: codec, FASTA ingest, index math, config, IO."""
