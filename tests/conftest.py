"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so every shard_map / collective
path is exercised without TPU hardware (SURVEY.md §4 "distributed without a
cluster"). Environment must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Small encoder tiles in CI: interpret-mode Pallas pads inputs to the tile
# span (8 * chunk); the production default (16384) would make every tiny
# fixture a 128K-element interpreted loop. 2048 is the v2 packed encoder's
# minimum lane geometry (chunk/16 lanes must be a 128-multiple) — smaller
# values would silently route every Pallas test back to the v1 kernel.
os.environ.setdefault("KMER_TPU_ENC_CHUNK", "2048")
# The v2 packed kernel (host-plane-staged route) is the production
# default; pinned explicitly so test runs are insensitive to ambient env.
os.environ.setdefault("KMER_TPU_ENC_V2", "1")
# Routing calibration (r5): never auto-measure in tests, and never read
# a developer-machine calibration cache — gates must run on the frozen
# constants unless a test injects its own file.
os.environ.setdefault("KMER_TPU_CALIBRATE", "0")
os.environ.setdefault("KMER_TPU_CAL_DIR", "/tmp/kmer_tpu_test_cal_none")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize force-registers the "axon" TPU backend and
# prepends it to jax_platforms regardless of JAX_PLATFORMS; pin CPU explicitly
# so tests never silently run over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD9A)


def random_dna(rng, length: int, invalid_frac: float = 0.0) -> str:
    """Random ACGT string with an optional fraction of invalid 'N' bases."""
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    idx = rng.integers(0, 4, size=length)
    out = alphabet[idx]
    if invalid_frac > 0:
        mask = rng.random(length) < invalid_frac
        out = np.where(mask, np.uint8(ord("N")), out)
    return out.tobytes().decode("ascii")


@pytest.fixture
def make_dna(rng):
    def _make(length, invalid_frac=0.0):
        return random_dna(rng, length, invalid_frac)

    return _make
