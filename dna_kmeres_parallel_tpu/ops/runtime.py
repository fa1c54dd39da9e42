"""Runtime backend introspection: where are we actually running?"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU (including the tunneled
    'axon' PJRT plugin, whose platform name is not 'tpu')."""
    import jax

    dev = jax.devices()[0]
    if dev.platform in ("tpu",):
        return True
    return "tpu" in getattr(dev, "device_kind", "").lower()


def pallas_mode() -> str | None:
    """How Pallas kernels should run here:
    'compiled' on TPU, 'interpret' if forced (tests), else None (use jnp).
    """
    if os.environ.get("KMER_TPU_PALLAS_INTERPRET") == "1":
        return "interpret"
    if is_tpu_backend():
        return "compiled"
    return None
