"""Self-calibrating routing constants (r5 — VERDICT weak #2).

Every distance/transfer routing gate used to run on constants hand-fitted
to one v5e + one 2-vCPU dev VM (ops/distance.py time models,
sparse_engine's host-rate and H2D defaults). On any other backend — or on
this repo's own degraded dev tunnel, where H2D moves ~30-50 MB/s against
the 1 GB/s default — those constants are fiction, and the union-distance
gate measurably misroutes (S=2048-4096 ran 0.81x end-to-end without a
hand-set KMER_TPU_H2D_BPS).

This module measures the machine it runs on, once per backend
fingerprint, and persists the result next to the XLA compile cache:

- **link calibration** (automatic, cheap — no compiles): H2D and D2H
  bytes/sec via a two-size differential (the fixed dispatch+fetch
  roundtrip cancels; distinct random payloads defeat the tunnel's
  dispatch dedupe, CLAUDE.md), plus the small-fetch roundtrip floor that
  bounds any device job. Runs lazily the first time a gate asks on a
  real TPU backend; cached forever after.
- **compute calibration** (explicit — `kmer-tpu calibrate`, pays remote
  compiles): measured pair rates for the MXU-threshold / Pallas-tri /
  jnp (min,+) routes and the native host two-pointer, stored as the same
  model constants the frozen defaults provide.

Consumers (ops/distance time models, sparse_engine gates) read through
``get_calibration()`` and fall back to the frozen constants for any
missing key, so behavior without a calibration file is exactly r4's.

Env:
- KMER_TPU_CALIBRATE=0 disables measurement (cached files still load);
  =1 forces link measurement even off-TPU (tests/CPU).
- KMER_TPU_CALIBRATION_FILE points at an explicit calibration JSON
  (tests inject fakes to pin gate decisions both ways).
- KMER_TPU_CAL_DIR overrides the cache directory.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_CAL: dict | None = None  # per-process cache
_CAL_KEY: str | None = None


def cache_dir() -> str:
    return os.environ.get(
        "KMER_TPU_CAL_DIR",
        os.path.expanduser("~/.cache/dna_kmeres_tpu_xla"),
    )


def backend_fingerprint() -> str:
    """Stable per-backend identity: platform + device kind (+ device
    count bucket — link rates differ between 1-chip and pod hosts)."""
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "?")
    return (
        f"{d.platform}_{kind}_{len(jax.devices())}dev".replace(" ", "-")
        .replace("/", "-")
    )


def _cal_path() -> str:
    explicit = os.environ.get("KMER_TPU_CALIBRATION_FILE")
    if explicit:
        return explicit
    return os.path.join(
        cache_dir(), f"calibration_{backend_fingerprint()}.json"
    )


def reset() -> None:
    """Drop the per-process cache (tests)."""
    global _CAL, _CAL_KEY
    _CAL = None
    _CAL_KEY = None


def measure_link(size_bytes: int = 16 << 20, reps: int = 2) -> dict:
    """H2D/D2H bytes/sec + small-fetch roundtrip, two-size differential.

    u32 payloads only (u16 D2H is pathological over the dev tunnel,
    CLAUDE.md) with fresh random data per dispatch (dedupe defense).
    Timing is through a host fetch (np.asarray / int()) — the only
    trustworthy clock on this backend."""
    import jax
    import jax.numpy as jnp

    n_hi = max(size_bytes // 4, 1 << 16)
    n_lo = max(n_hi // 4, 1 << 14)
    rng = np.random.default_rng(0xCA1)

    def h2d_once(n: int) -> float:
        a = rng.integers(0, 1 << 31, size=n, dtype=np.int32)
        t0 = time.perf_counter()
        x = jax.device_put(a)
        # Consume via a scalar fetch so the transfer provably landed.
        int(np.asarray(jnp.sum(x[:: max(n // 128, 1)], dtype=jnp.int32)))
        return time.perf_counter() - t0

    def d2h_once(n: int) -> float:
        a = rng.integers(0, 1 << 31, size=n, dtype=np.int32)
        x = jax.device_put(a)
        int(np.asarray(jnp.sum(x[:: max(n // 128, 1)], dtype=jnp.int32)))
        t0 = time.perf_counter()
        b = np.asarray(x)
        dt = time.perf_counter() - t0
        assert b.shape[0] == n
        return dt

    def best(fn, n):
        return min(fn(n) for _ in range(reps))

    h2d_hi, h2d_lo = best(h2d_once, n_hi), best(h2d_once, n_lo)
    d2h_hi, d2h_lo = best(d2h_once, n_hi), best(d2h_once, n_lo)
    # Small-fetch roundtrip: the dispatch+fetch floor every device job
    # pays at least once.
    rt = []
    for _ in range(3):
        a = rng.integers(0, 1 << 31, size=256, dtype=np.int32)
        t0 = time.perf_counter()
        int(np.asarray(jnp.sum(jax.device_put(a), dtype=jnp.int32)))
        rt.append(time.perf_counter() - t0)
    dbytes = (n_hi - n_lo) * 4
    out = {
        "fingerprint": backend_fingerprint(),
        "roundtrip_s": min(rt),
    }
    if h2d_hi > h2d_lo:
        out["h2d_bps"] = dbytes / (h2d_hi - h2d_lo)
    if d2h_hi > d2h_lo:
        out["d2h_bps"] = dbytes / (d2h_hi - d2h_lo)
    return out


def measure_compute() -> dict:
    """Measured pair rates for the dense (min,+) routes and the native
    host two-pointer — the explicit `kmer-tpu calibrate` step (pays two
    remote compiles per route on TPU; cached by the XLA compile cache).

    Each device rate is a TWO-SIZE differential with scalar-sum
    consumption: the first cut fetched the full [S, S] result and — on
    this repo's ~18 MB/s dev tunnel — measured the TRANSFER, reporting
    "compute" rates 100-250x below the device's (the gates model link
    legs separately, so that would double-count the link and poison
    every device-route decision). Differencing two compute sizes
    cancels the dispatch+fetch roundtrip exactly; a non-positive delta
    drops the key (frozen-constant fallback). Fits the single dominant
    constant of each ops/distance time model at wide shapes (the
    per-pair overhead terms stay frozen — they only matter at skinny
    shapes where the routes are within noise of each other)."""
    import jax
    import jax.numpy as jnp

    from dna_kmeres_parallel_tpu.ops import distance as dist_ops
    from dna_kmeres_parallel_tpu.ops import distance_pallas, runtime

    rng = np.random.default_rng(0xCA2)
    out: dict = {}

    def rate(fn_big, fn_small, work_delta) -> float | None:
        """median of 3 paired (big - small) wall deltas, through a
        device scalar-sum fetch; None when jitter swamps the delta."""
        consume = lambda f: int(
            np.asarray(jnp.sum(f(), dtype=jnp.int32))
        )
        consume(fn_big)  # warm/compile
        consume(fn_small)
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter()
            consume(fn_big)
            tb = time.perf_counter() - t0
            t0 = time.perf_counter()
            consume(fn_small)
            ts = time.perf_counter() - t0
            deltas.append(tb - ts)
        d = float(np.median(deltas))
        return work_delta / d if d > 0 else None

    on_tpu = runtime.pallas_mode() == "compiled"
    # MXU probe: marginal-threshold differential AT THE MODEL'S FIT
    # SHAPE (S=2048, 64K bins — where r4 fit the frozen 2.75e13). The
    # per-threshold cost the model's single constant amortizes is matmul
    # PLUS the [S, bins] threshold-plane builds (2*bins/S element ops
    # per pair per threshold — comparable to the matmul term at wide
    # bins); a narrow-S probe isolates near-peak marginal MACs (3.1e14
    # measured, 78% of v5e int8 peak) and would under-predict MXU time
    # ~10x at application shapes. Matching the fit shape keeps the
    # fitted constant meaning what the model spends it as. Delta work =
    # 2048^2 * 65536 * 6 = 1.65 TMAC ≈ 60 ms — far above tunnel jitter.
    # CPU (tests / smoke) uses small shapes — minutes of emulated
    # matmuls would buy nothing.
    S, bins = (2048, 65536) if on_tpu else (256, 1024)
    cmax_hi = 8
    counts = jnp.asarray(
        rng.integers(0, cmax_hi + 1, size=(S, bins), dtype=np.int32)
    )
    r = rate(
        lambda: dist_ops.min_sum_matrix_mxu(counts, cmax_hi),
        lambda: dist_ops.min_sum_matrix_mxu(counts, 2),
        S * S * bins * (cmax_hi - 2),
    )
    if r:
        out["mxu_macs_per_sec"] = r
    Sb = 1024 if on_tpu else 256
    big = jnp.asarray(
        rng.integers(0, 64, size=(Sb, bins), dtype=np.int32)
    )
    r = rate(
        lambda: dist_ops.min_sum_matrix(big),
        lambda: dist_ops.min_sum_matrix(big[: Sb // 4]),
        (Sb * Sb - (Sb // 4) ** 2) * bins,
    )
    if r:
        out["dense_bin_pairs_per_sec"] = r
    if runtime.pallas_mode() == "compiled":
        try:
            # Tri delta sized ~47 ms at the frozen rate: a [1024, 4096]
            # probe's ~3 ms delta sat inside tunnel jitter and fitted
            # 7.0e11 one round and 1.66e12 the next.
            tb = jnp.asarray(
                rng.integers(0, 64, size=(2048, 16384), dtype=np.int32)
            )
            r = rate(
                lambda: distance_pallas.min_sum_matrix_pallas_tri(tb),
                lambda: distance_pallas.min_sum_matrix_pallas_tri(
                    tb[:512]
                ),
                (2048 * 2049 / 2 - 512 * 513 / 2) * 16384,
            )
            if r:
                out["tri_bin_pairs_per_sec"] = r
        except Exception as e:  # pragma: no cover - backend-specific
            if not runtime.degradable_compile_error(e):
                raise
    from dna_kmeres_parallel_tpu import native

    if native.available():
        # Host two-pointer: synthetic high-sharing tables, per-thread
        # entry-pairs/sec (the threaded engine's scaling unit).
        Sh, table = 64, 4096
        codes = np.sort(
            rng.choice(1 << 40, size=(Sh, table), replace=False), axis=1
        ).astype(np.uint64)
        cnts = rng.integers(1, 8, size=(Sh, table)).astype(np.int64)
        offs = np.arange(Sh + 1, dtype=np.int64) * table
        t0 = time.perf_counter()
        native.min_sum_pairs_native(
            codes.reshape(-1), cnts.reshape(-1), offs
        )
        dt = time.perf_counter() - t0
        threads = max(os.cpu_count() or 1, 1)
        pairs = Sh * (Sh - 1) / 2
        out["sparse_entry_pairs_per_sec_per_thread"] = (
            pairs * table / dt / threads
        )
    return out


def _should_measure_link() -> bool:
    flag = os.environ.get("KMER_TPU_CALIBRATE")
    if flag == "0":
        return False
    if flag == "1":
        return True
    from dna_kmeres_parallel_tpu.ops import runtime

    return runtime.pallas_mode() == "compiled"


def get_calibration() -> dict:
    """The effective calibration dict ({} = frozen constants only).

    Loads the persisted per-backend file when present; otherwise, on a
    real TPU backend (or KMER_TPU_CALIBRATE=1), measures the LINK once
    (seconds) and persists. Compute rates are only ever added by the
    explicit `kmer-tpu calibrate` command."""
    global _CAL, _CAL_KEY
    path = _cal_path()
    if _CAL is not None and _CAL_KEY == path:
        return _CAL
    cal: dict = {}
    if os.path.exists(path):
        try:
            with open(path, "r", encoding="ascii") as f:
                cal = json.load(f)
        except Exception:
            cal = {}
    elif _should_measure_link():
        try:
            cal = measure_link()
            save_calibration(cal)
        except Exception:
            cal = {}
    _CAL = cal
    _CAL_KEY = path
    return cal


def save_calibration(cal: dict) -> str:
    path = _cal_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="ascii") as f:
        json.dump(cal, f, indent=1)
    os.replace(tmp, path)
    reset()
    return path
