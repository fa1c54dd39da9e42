"""Runtime backend introspection: where are we actually running?"""

from __future__ import annotations

import functools
import os


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS / KMER_TPU_PLATFORM explicitly.

    This environment's sitecustomize prepends its TPU plugin to
    ``jax_platforms`` regardless of JAX_PLATFORMS, so the env var alone does
    not select a backend; entry points call this to re-assert it."""
    want = os.environ.get("KMER_TPU_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
        is_tpu_backend.cache_clear()


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
