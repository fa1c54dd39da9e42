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


def degradable_compile_error(e: BaseException) -> bool:
    """Whether an exception from a device (min,+)/kernel dispatch should
    DEGRADE to a fallback route rather than propagate: Mosaic/VMEM/
    remote-compile failures (spellings differ across toolchain layers —
    match case-insensitively) and host allocation failures (a route that
    needs big transients must not crash where a near-zero-memory
    fallback exists). Shared by every routing site so a new toolchain
    error spelling is added in ONE place."""
    if isinstance(e, MemoryError):
        return True
    msg = str(e).lower()
    return any(
        t in msg
        for t in (
            "vmem",
            "mosaic",
            "remote_compile",
            "resource_exhausted",
            "out of memory",
        )
    )
