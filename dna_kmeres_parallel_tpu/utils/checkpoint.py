"""Checkpoint / resume for streamed counting runs.

The reference is a single-shot batch job with no recovery (SURVEY.md §5:
exit-on-error only). Streamed counting is naturally checkpointable: the
state is (partial histogram or sparse table) + (stream cursor). Checkpoints
are .npz files written atomically (tmp + rename); resume reloads the
histogram and seeks the cursor.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass

import numpy as np

FORMAT_VERSION = 1


@dataclass
class CountCheckpoint:
    k: int
    canonical: bool
    cursor: int  # bases of the flat stream fully counted
    total_bases: int  # cumulative real bases represented in the state
    hist: np.ndarray | None = None  # dense int64 [4^k]
    sparse_codes: np.ndarray | None = None  # uint64 sorted distinct codes
    sparse_counts: np.ndarray | None = None  # int64

    @property
    def dense(self) -> bool:
        return self.hist is not None


def save_checkpoint(path: str, ckpt: CountCheckpoint) -> None:
    meta = {
        "format_version": FORMAT_VERSION,
        "k": ckpt.k,
        "canonical": ckpt.canonical,
        "cursor": ckpt.cursor,
        "total_bases": ckpt.total_bases,
        "dense": ckpt.dense,
    }
    arrays = {"meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)}
    if ckpt.dense:
        arrays["hist"] = ckpt.hist
    else:
        arrays["sparse_codes"] = (
            ckpt.sparse_codes
            if ckpt.sparse_codes is not None
            else np.zeros(0, np.uint64)
        )
        arrays["sparse_counts"] = (
            ckpt.sparse_counts
            if ckpt.sparse_counts is not None
            else np.zeros(0, np.int64)
        )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    # Uncompressed beyond 16 MB: sparse code tables are near-incompressible
    # and gzip dominated checkpoint time (70 s on a 100 MB-input run).
    total_bytes = sum(
        a.nbytes for a in arrays.values() if isinstance(a, np.ndarray)
    )
    save = np.savez_compressed if total_bytes < (16 << 20) else np.savez
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            save(f, **arrays)
        os.replace(tmp, path)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> CountCheckpoint:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {meta.get('format_version')}"
            )
        if meta["dense"]:
            return CountCheckpoint(
                k=meta["k"],
                canonical=meta["canonical"],
                cursor=meta["cursor"],
                total_bases=meta["total_bases"],
                hist=z["hist"],
            )
        return CountCheckpoint(
            k=meta["k"],
            canonical=meta["canonical"],
            cursor=meta["cursor"],
            total_bases=meta["total_bases"],
            sparse_codes=z["sparse_codes"],
            sparse_counts=z["sparse_counts"],
        )
