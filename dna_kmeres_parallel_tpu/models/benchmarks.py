"""Throughput microbenchmarks (bases/sec/chip).

The framework's replacement for the reference's ad-hoc cudaEvent timing
(/root/reference/main.cu:262-300,326-350): block_until_ready-bracketed wall
timers over the jitted count path, with compile time excluded by a warmup
step, reporting structured JSON.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dna_kmeres_parallel_tpu.models.engine import _count_batch, _count_batch_acc
from dna_kmeres_parallel_tpu.utils import codec


def run_count_bench(
    k: int = 11,
    canonical: bool = False,
    total_bases: int = 64 << 20,
    batch_bases: int = 8 << 20,
    seed: int = 0,
    differential: bool = True,
) -> dict:
    """Time the device count path over synthetic random bases.

    Data is pre-staged on device so the measurement isolates the count
    kernel (encode + histogram), the reference's step-1 analogue.
    differential=True (default) times MANY batches inside ONE dispatch via
    lax.scan at two scan lengths and reports their difference, so the
    tunnel's dispatch+fetch roundtrip cancels exactly (the same scheme as
    the no-device-sort sparse bench; the legacy per-dispatch path kept for
    comparison under differential=False).
    """
    bins = codec.num_bins(k)
    batch_bases = min(batch_bases, total_bases)
    n_batches = max(total_bases // batch_bases, 1)
    if differential:
        return _run_count_bench_differential(
            k, canonical, batch_bases, n_batches, seed, bins
        )

    # Distinct inputs per dispatch (cycled) so no layer of the stack can
    # legally dedupe repeated executions and fake the timing. The LAST
    # input is reserved for the warmup dispatch so no timed dispatch is
    # byte-identical to it (a deduped warmup twin inflates throughput by
    # up to 1/n_batches).
    n_distinct = min(n_batches, 4)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_distinct + 1)
    inputs = [
        jax.device_put(
            jax.random.randint(kk, (batch_bases,), 0, 4, jnp.int32).astype(
                jnp.uint8
            )
        )
        for kk in keys
    ]
    n_own = jnp.int32(batch_bases - k + 1)
    from dna_kmeres_parallel_tpu.ops import runtime

    pallas = runtime.pallas_mode()  # engine-equivalent kernel selection

    # Warmup / compile. NOTE: on the tunneled dev TPU, block_until_ready can
    # return before execution finishes — only a host fetch of a dependent
    # value truly synchronizes. All timings below end with a host fetch, and
    # the fetch-roundtrip baseline is measured and subtracted.
    h0 = _count_batch(inputs[n_distinct], n_own, k, bins, canonical, pallas)
    _ = np.asarray(h0)  # materialize fully
    # Warm the accumulate program too: the timed loop uses BOTH programs,
    # and a first-run compile/first-touch inside the timed region once cost
    # ~6.7 s (reported as 0.01 Gbase/s).
    if n_batches > 1:
        _ = np.asarray(
            _count_batch_acc(
                h0, inputs[n_distinct], n_own, k, bins, canonical, pallas
            )
        )
    t0 = time.perf_counter()
    _ = np.asarray(h0)  # pure result-transfer roundtrip
    t_fetch = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = None
    for i in range(n_batches):
        if acc is None:
            acc = _count_batch(
                inputs[i % n_distinct], n_own, k, bins, canonical, pallas
            )
        else:  # fused accumulate: one dispatch per batch, not two
            acc = _count_batch_acc(
                acc, inputs[i % n_distinct], n_own, k, bins, canonical, pallas
            )
    acc = np.asarray(acc)  # true synchronization point (host fetch)
    elapsed = time.perf_counter() - t0
    # Report compute throughput net of one result-fetch roundtrip (dominant
    # when the dev tunnel link is degraded); raw elapsed stays in the report.
    elapsed_adj = max(elapsed - t_fetch, 1e-9)

    measured = n_batches * batch_bases
    bases_per_sec = measured / elapsed_adj
    # Sanity: every window counted exactly once.
    total_windows = int(np.asarray(acc, dtype=np.int64).sum())
    return {
        "bench": "count",
        "k": k,
        "canonical": canonical,
        "bins": bins,
        "total_bases": measured,
        "batch_bases": batch_bases,
        "n_batches": n_batches,
        "elapsed_s": round(elapsed, 4),
        "fetch_roundtrip_s": round(t_fetch, 4),
        "bases_per_sec": round(bases_per_sec, 1),
        "gbases_per_sec": round(bases_per_sec / 1e9, 4),
        "windows_counted": total_windows,
        "windows_expected": n_batches * (batch_bases - k + 1),
        "device": str(jax.devices()[0]),
    }


def _two_size_differential(make, stack, inner_hi: int, inner_lo: int,
                           counted_of=None):
    """Shared two-size lax.scan differential timer: time make(inner)(stack,
    salt) at two scan lengths and return (elapsed, counted_delta, valid).
    The dispatch+fetch roundtrip cancels in the difference. valid=False
    flags the jitter pathology where the small program out-times the
    large one (a clamp here once reported 6e15 pairs/s in an earlier
    bench; callers must surface an obviously-wrong 0.0, never an
    absurdly-right huge number).

    r5: elapsed is the MEDIAN of 4 back-to-back (hi, lo) paired deltas,
    not min-of-3 each — with the per-batch program at ~0.17 ms/batch a
    single lucky dispatch window under min-of-3 once reported 156-158
    Gbase/s, ABOVE the 134 Gbase/s HBM roofline of the measured program;
    the median of paired deltas discards such outliers in either
    direction (post-change spread on the same tunnel: 104-111).

    make(inner) must return a jitted prog(stack, salt0_u8); counted_of
    extracts the window count from its fetched result (default: int64
    sum). Distinct salts per timed dispatch defeat dedupe; 101/102 warm
    up."""
    if counted_of is None:
        counted_of = lambda h: int(np.asarray(h, dtype=np.int64).sum())

    prog_hi = make(inner_hi)
    prog_lo = make(inner_lo)
    counted_hi = counted_of(prog_hi(stack, jnp.uint8(101)))  # warm/compile
    counted_lo = counted_of(prog_lo(stack, jnp.uint8(102)))

    def timed(prog, salt):
        t0 = time.perf_counter()
        _ = np.asarray(prog(stack, jnp.uint8(salt)))
        return time.perf_counter() - t0

    deltas = []
    for j in range(4):
        t_hi = timed(prog_hi, 2 * j)
        t_lo = timed(prog_lo, 2 * j + 1)
        deltas.append(t_hi - t_lo)
    elapsed = float(np.median(deltas))
    valid = elapsed > 0
    return max(elapsed, 1e-9), counted_hi - counted_lo, valid


def _run_count_bench_differential(
    k: int, canonical: bool, batch_bases: int, n_batches: int, seed: int,
    bins: int,
) -> dict:
    """Two-size lax.scan differential timing of the dense count program.
    NOTE: timing validity needs a >= 24-iteration large scan, so requests
    smaller than 24 batches execute more device work than asked;
    total_bases in the report is what was MEASURED (requested_* preserves
    the ask)."""
    from dna_kmeres_parallel_tpu.ops import runtime

    pallas = runtime.pallas_mode()
    n_distinct = 4
    keys = jax.random.split(jax.random.PRNGKey(seed), n_distinct)
    stack = jnp.stack(
        [
            jax.random.randint(kk, (batch_bases,), 0, 4, jnp.int32).astype(
                jnp.uint8
            )
            for kk in keys
        ]
    )
    n_own = jnp.int32(batch_bases - k + 1)
    inner_hi = max(n_batches, 24)
    inner_lo = max(inner_hi // 4, 1)

    def make(inner):
        @jax.jit
        def prog(xs, salt0):
            def body(acc, i):
                x = (
                    xs[i % n_distinct]
                    + (salt0 + i // n_distinct).astype(jnp.uint8)
                ) & jnp.uint8(3)
                h = _count_batch(x, n_own, k, bins, canonical, pallas)
                return acc + h, None

            acc, _ = jax.lax.scan(
                body,
                jnp.zeros((bins,), jnp.int32),
                jnp.arange(inner, dtype=jnp.int32),
            )
            return acc

        return prog

    elapsed, counted_delta, valid = _two_size_differential(
        make, stack, inner_hi, inner_lo
    )
    measured = (inner_hi - inner_lo) * batch_bases
    expected = (inner_hi - inner_lo) * (batch_bases - k + 1)
    counted = int(np.uint32(np.int64(counted_delta) & 0xFFFFFFFF))
    gbps = 0.0 if not valid else round(measured / elapsed / 1e9, 4)
    return {
        "bench": "count",
        "k": k,
        "canonical": canonical,
        "bins": bins,
        "total_bases": measured,
        "requested_total_bases": n_batches * batch_bases,
        "batch_bases": batch_bases,
        "elapsed_s": round(elapsed, 4),
        "gbases_per_sec": gbps,
        "bases_per_sec": 0.0 if not valid else round(measured / elapsed, 1),
        "timing_valid": valid,
        "windows_counted": counted,
        "windows_expected": int(np.uint32(expected & 0xFFFFFFFF)),
        "device": str(jax.devices()[0]),
    }


def run_impl_matrix_bench(
    ks=(4, 8, 11),
    total_bases: int = 32 << 20,
    seed: int = 0,
    reps: int = 3,
) -> list[dict]:
    """Compare histogram implementations (jnp scatter/onehot vs the Pallas
    two-level MXU kernel) per k on the current device.

    Each repetition uses a DIFFERENT input array and the result feeds an
    accumulating sum, so no layer (XLA, the PJRT plugin, or a remote
    execution tunnel) can legally cache/dedupe the dispatches.
    """
    import numpy as np

    from dna_kmeres_parallel_tpu.models.engine import _count_batch

    # reps timed inputs + ONE reserved warmup input: a timed dispatch
    # byte-identical to the warmup gets deduped in the tunnel (CLAUDE.md),
    # inflating throughput by up to 1/reps.
    keys = jax.random.split(jax.random.PRNGKey(seed), reps + 1)
    inputs = [
        jax.device_put(
            jax.random.randint(kk, (total_bases,), 0, 4, jnp.int32).astype(jnp.uint8)
        )
        for kk in keys
    ]
    import functools

    from dna_kmeres_parallel_tpu.ops import encode as encode_ops
    from dna_kmeres_parallel_tpu.ops import histogram as hist_ops

    @functools.partial(jax.jit, static_argnames=("k", "bins"))
    def _count_sorted(bases, n_own, k, bins):
        codes, valid = encode_ops.rolling_codes(bases, k)
        n = codes.shape[0]
        own = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n_own
        return hist_ops.histogram_sorted(codes, valid & own, bins)

    reports = []
    for k in ks:
        bins = codec.num_bins(k)
        n_own = jnp.int32(total_bases - k + 1)
        for impl, pallas in (
            ("jnp", None),
            ("pallas", "compiled"),
            ("sorted", "sorted"),
        ):
            try:
                if impl == "sorted":
                    fn = lambda b: _count_sorted(b, n_own, k, bins)
                else:
                    fn = lambda b: _count_batch(b, n_own, k, bins, False, pallas)
                h0 = fn(inputs[reps])  # reserved warmup input
                _ = np.asarray(h0)  # warmup; block_until_ready is not a
                # reliable sync on the tunneled dev TPU — host-fetch instead
                t0 = time.perf_counter()
                _ = np.asarray(h0)
                t_fetch = time.perf_counter() - t0
                t0 = time.perf_counter()
                acc = None
                for b in inputs[:reps]:
                    h = fn(b)
                    acc = h if acc is None else acc + h
                acc = np.asarray(acc)
                dt = max(time.perf_counter() - t0 - t_fetch, 1e-9) / reps
                total = int(np.asarray(acc, dtype=np.int64).sum())
                reports.append(
                    {
                        "k": k,
                        "impl": impl,
                        "gbases_per_sec": round(total_bases / dt / 1e9, 4),
                        "exact": total == reps * (total_bases - k + 1),
                    }
                )
            except Exception as e:  # pragma: no cover - perf exploration
                reports.append({"k": k, "impl": impl, "error": repr(e)[:200]})
    return reports


def run_sparse_bench(
    k: int = 21,
    canonical: bool = False,
    total_bases: int = 64 << 20,
    batch_bases: int = 16 << 20,
    seed: int = 0,
    row_len: int = 0,
    device_sort: bool = True,
) -> dict:
    """Throughput of the sparse count path's DEVICE program at large k —
    the k=21 north-star configuration. Device work only (compaction and
    cross-batch merge excluded here; see StreamingCounter metrics for the
    full pipeline split). row_len > 0 measures the row-sorted variant
    (ops/sparse.sort_words_rows) instead of the flat sort; device_sort=False
    measures the production no-device-sort route (encode kernel only — the
    host radix compactor needs no sorted input; KmerConfig.device_sort).
    The Pallas encoder is a custom call, so its word outputs are HBM-
    materialized exactly as the production D2H fetch requires — the
    signature reduction cannot elide the writes."""
    import numpy as np

    from dna_kmeres_parallel_tpu.ops import sparse as sparse_ops

    batch_bases = min(batch_bases, total_bases)
    n_batches = max(total_bases // batch_bases, 1)
    # Last input reserved for warmup (see run_count_bench note: a timed
    # dispatch byte-identical to the warmup can be deduped by the tunnel).
    n_distinct = min(n_batches, 4)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_distinct + 1)
    inputs = [
        jax.device_put(
            jax.random.randint(kk, (batch_bases,), 0, 4, jnp.int32).astype(
                jnp.uint8
            )
        )
        for kk in keys
    ]
    n_own = jnp.int32(batch_bases - k + 1)

    from dna_kmeres_parallel_tpu.ops import runtime

    pallas = runtime.pallas_mode()  # engine-equivalent kernel selection

    if not device_sort:
        # The encode-only program streams at the HBM bound (~1 ms per 16M
        # bases on v5e) — separate dispatches vanish under per-dispatch
        # tunnel jitter (tens of ms). Two defenses: (a) run MANY batches
        # inside ONE dispatch via lax.scan (distinct data each iteration —
        # a rotating salt over the stacked inputs; identical dispatches get
        # deduped by the tunnel), and (b) time the DIFFERENCE between a
        # large and a small scan so the dispatch+fetch roundtrip cancels
        # exactly (min-of-3 each). Measured this way: 604M extra bases in
        # 37.3 ms = 16.2 Gbase/s (2026-08-19 window).
        # r5: the per-batch production program runs ~0.18 ms per 16M-base
        # batch — a 36-iteration delta (~6.5 ms) sits inside this
        # tunnel's few-ms dispatch jitter and once reported 158 Gbase/s,
        # ABOVE the 819 GB/s HBM roofline (~102 MB traffic/batch at k=21
        # caps the program near ~140). Floor the large scan at 192
        # iterations so the measured delta (~26 ms) dominates the jitter;
        # KMER_TPU_BENCH_INNER_HI overrides.
        inner_hi = max(
            n_batches,
            int(os.environ.get("KMER_TPU_BENCH_INNER_HI", "192")),
        )
        inner_lo = max(inner_hi // 4, 1)
        stack = jnp.stack(inputs[:n_distinct])

        from dna_kmeres_parallel_tpu.ops.sparse import _enc_v2_active

        use_v2 = pallas is not None and _enc_v2_active()
        if use_v2:
            # The v2 production program EXACTLY: H2D ships HOST-STAGED
            # u32 planes (words_le view + inval_be;
            # engine.stage_batch_planes), so the device program is the
            # packed SWAR kernel ALONE (in-kernel LE->BE butterfly) +
            # the fused [n_valid | sig] reduction. The XOR salt rotates
            # data inside the kernel per iteration.
            @jax.jit
            def _pack(xs):
                # Pack on device once, outside the timed region: data
                # plane [n, T/4] u8 + mask plane [n, T/8] u8 (the
                # utils.codec.pack_bases wire format).
                bits = (xs & 3).astype(jnp.uint32)
                b4 = bits.reshape(xs.shape[0], -1, 4)
                data = (
                    b4[..., 0]
                    | (b4[..., 1] << 2)
                    | (b4[..., 2] << 4)
                    | (b4[..., 3] << 6)
                ).astype(jnp.uint8)
                v = (xs < 4).astype(jnp.uint32).reshape(xs.shape[0], -1, 8)
                mask = jnp.zeros_like(v[..., 0])
                for j in range(8):
                    mask = mask | (v[..., j] << j)
                return data, mask.astype(jnp.uint8)

            data_stack, mask_stack = _pack(stack)

            from dna_kmeres_parallel_tpu.ops.encode_pallas import (
                host_planes_from_packfmt,
                rolling_codes_split_packed_pallas,
            )

            # Host-staged planes, built once OUTSIDE the timed region
            # (production ships these over H2D; the in-kernel salt keeps
            # every timed iteration's data distinct).
            #
            # r5 (VERDICT weak #1): the timed scan body is the production
            # per-batch device program EXACTLY — the kernel reads the
            # SAME plane operands every iteration (the custom call DMAs
            # straight from the batch buffer, as production does from the
            # H2D-landed planes) and the salt advances EVERY iteration,
            # so no two iterations compute the same thing and no
            # loop-invariant hoisting or tunnel dedupe can elide work.
            # The r3/r4 bench instead dynamic-sliced a [4, Tw] stack per
            # iteration, adding an 8 MB HBM read+write copy per 16M-base
            # batch that production never pays — it measured 54.0 where
            # the kernel alone runs 89.3 Gbase/s. BENCH_STACK_SLICE=1
            # keeps the old program for A/B.
            planes = [
                host_planes_from_packfmt(
                    np.asarray(data_stack[i]), np.asarray(mask_stack[i])
                )
                for i in range(n_distinct)
            ]
            stack_slice = os.environ.get("BENCH_STACK_SLICE") == "1"
            w_stack = jax.device_put(
                jnp.stack([jnp.asarray(w) for w, _ in planes])
            )
            i_stack = jax.device_put(
                jnp.stack([jnp.asarray(v) for _, v in planes])
            )
            if not stack_slice:
                w_one = jax.device_put(jnp.asarray(planes[0][0]))
                i_one = jax.device_put(jnp.asarray(planes[0][1]))

            def make(inner):
                @jax.jit
                def prog(ds, salt0):
                    wstack, istack = ds

                    def body(acc, i):
                        if stack_slice:
                            salt = salt0.astype(jnp.int32) + i // n_distinct
                            w_in = wstack[i % n_distinct]
                            i_in = istack[i % n_distinct]
                        else:
                            salt = salt0.astype(jnp.int32) + i
                            w_in, i_in = wstack, istack
                        *_, sig = rolling_codes_split_packed_pallas(
                            w_in,
                            i_in,
                            n_own,
                            k,
                            canonical,
                            interpret=(pallas == "interpret"),
                            salt=salt,
                            want_sig=True,
                            words_le=True,
                        )
                        n_valid = jnp.sum(sig[:, :128], dtype=jnp.int32)
                        sg = jnp.sum(sig[:, 128:], dtype=jnp.int32)
                        return acc + jnp.stack([n_valid, sg]), None

                    acc, _ = jax.lax.scan(
                        body,
                        jnp.zeros(2, jnp.int32),
                        jnp.arange(inner, dtype=jnp.int32),
                    )
                    return acc

                return prog

            elapsed, counted_delta, valid = _two_size_differential(
                make,
                (w_stack, i_stack) if stack_slice else (w_one, i_one),
                inner_hi,
                inner_lo,
                counted_of=lambda h: int(np.asarray(h)[0]),
            )
            measured = (inner_hi - inner_lo) * batch_bases
            expected = (inner_hi - inner_lo) * (batch_bases - k + 1)
            counted = int(np.uint32(np.int64(counted_delta) & 0xFFFFFFFF))
            return {
                "bench": "sparse_count",
                "k": k,
                "canonical": canonical,
                "device_sort": False,
                "encoder": "v2-packed",
                "program": (
                    "stack-slice" if stack_slice else "per-batch"
                ),
                "row_len": row_len,
                "total_bases": measured,
                "batch_bases": batch_bases,
                "elapsed_s": round(elapsed, 4),
                "gbases_per_sec": (
                    0.0 if not valid else round(measured / elapsed / 1e9, 4)
                ),
                "timing_valid": valid,
                "windows_counted": counted,
                "windows_expected": int(np.uint32(expected & 0xFFFFFFFF)),
                "device": str(jax.devices()[0]),
            }

        def make(inner):
            @jax.jit
            def prog(xs, salt0):
                def body(acc, i):
                    # Rotating salt (advances once per full pass over the
                    # distinct inputs): (input, salt mod 4) pairs repeat
                    # only every 4*n_distinct iterations.
                    salt = salt0.astype(jnp.int32) + i // n_distinct
                    if pallas is not None:
                        # The production device program EXACTLY: read the
                        # u8 stream, write the word planes. The data salt
                        # and the [n_valid | signature] reduction are fused
                        # INTO the encode kernel (zero extra HBM traffic);
                        # the kernel's plane writes cannot be elided — the
                        # sig output is consumed and a Pallas custom call
                        # runs whole. The previous bench salted the input
                        # and re-read both planes in XLA passes, paying
                        # ~2.3x the production program's memory volume
                        # (~240 vs ~112 MB per 16M-base batch at k=21).
                        from dna_kmeres_parallel_tpu.ops.encode_pallas import (
                            rolling_codes_split_pallas,
                        )

                        *_, sig = rolling_codes_split_pallas(
                            xs[i % n_distinct],
                            n_own,
                            k,
                            canonical,
                            interpret=(pallas == "interpret"),
                            salt=salt,
                            want_sig=True,
                        )
                        n_valid = jnp.sum(sig[:, :128], dtype=jnp.int32)
                        sg = jnp.sum(sig[:, 128:], dtype=jnp.int32)
                        return acc + jnp.stack([n_valid, sg]), None
                    x = (
                        xs[i % n_distinct] + salt.astype(jnp.uint8)
                    ) & jnp.uint8(3)
                    words = sparse_ops._encode_words(
                        x, n_own, k, canonical, pallas
                    )
                    major = words[0]
                    sent = jnp.asarray(
                        jnp.iinfo(major.dtype).max, major.dtype
                    )
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, major.shape, 0
                    )
                    valid = major != sent
                    n_valid = jnp.sum(valid.astype(jnp.int32))
                    # The signature folds in EVERY word plane's values
                    # (position-weighted) — a validity-only reduction
                    # would let XLA dead-code-eliminate the lo plane on
                    # the non-Pallas fallback path (the CLAUDE.md
                    # phantom-throughput trap).
                    sig = jnp.sum(jnp.where(valid, idx, 0))
                    for w in words:
                        # Mask to 16 bits before widening: u32 -> s32 of
                        # values above INT32_MAX is implementation-defined.
                        wv = (
                            jnp.where(valid, w, 0).astype(jnp.uint32)
                            & jnp.uint32(0xFFFF)
                        ).astype(jnp.int32)
                        sig = sig + jnp.sum(wv * idx)
                    return acc + jnp.stack([n_valid, sig]), None

                acc, _ = jax.lax.scan(
                    body,
                    jnp.zeros(2, jnp.int32),
                    jnp.arange(inner, dtype=jnp.int32),
                )
                return acc

            return prog

        # The scan fetches the full [n_valid, sig] carry (the sig keeps
        # XLA from dead-coding word planes); the count is element 0.
        elapsed, counted_delta, valid = _two_size_differential(
            make, stack, inner_hi, inner_lo,
            counted_of=lambda h: int(np.asarray(h)[0]),
        )
        measured = (inner_hi - inner_lo) * batch_bases
        # Window counts accumulate in an int32 scan carry: compare them
        # modulo 2^32 so multi-G runs stay a valid exactness check.
        expected = (inner_hi - inner_lo) * (batch_bases - k + 1)
        counted = int(np.uint32(np.int64(counted_delta) & 0xFFFFFFFF))
        expected_wrapped = int(np.uint32(expected & 0xFFFFFFFF))
        return {
            "bench": "sparse_count",
            "k": k,
            "canonical": canonical,
            "device_sort": False,
            "row_len": row_len,
            "total_bases": measured,
            "batch_bases": batch_bases,
            "elapsed_s": round(elapsed, 4),
            "gbases_per_sec": (
                0.0 if not valid else round(measured / elapsed / 1e9, 4)
            ),
            "timing_valid": valid,
            "windows_counted": counted,
            "windows_expected": expected_wrapped,
            "device": str(jax.devices()[0]),
        }

    def one(i):
        # [windows_counted, order-signature]: the signature is a
        # permutation-VARIANT reduction (run-start positions weighted by
        # index) — a permutation-invariant one lets XLA elide the sort
        # entirely (measured: a k=13 "17 Gbase/s" phantom). i < 0 selects
        # the reserved warmup input. Past the distinct pool, a salt keeps
        # every dispatch's bytes unique (dedupe trap, CLAUDE.md).
        x_in = inputs[n_distinct] if i < 0 else inputs[i % n_distinct]
        if i >= n_distinct:
            x_in = (x_in + jnp.uint8(i // n_distinct)) & jnp.uint8(3)
        if row_len:
            words = sparse_ops.sort_words_rows(
                x_in,
                n_own,
                k,
                canonical,
                pallas=pallas,
                row_len=row_len,
            )
            major = words[0]
            sent = jnp.asarray(jnp.iinfo(major.dtype).max, major.dtype)
            neq = jnp.zeros(major.shape[:-1] + (major.shape[-1] - 1,), jnp.bool_)
            for w in words:
                neq = neq | (w[..., 1:] != w[..., :-1])
            starts = jnp.concatenate(
                [(major[..., :1] != sent), neq & (major[..., 1:] != sent)], axis=-1
            )
            idx = jax.lax.broadcasted_iota(jnp.int32, major.shape, 1)
            n_valid = jnp.sum((major != sent).astype(jnp.int32))
            sig = jnp.sum(jnp.where(starts, idx, 0))
            return jnp.stack([n_valid, sig])
        words, starts = sparse_ops.sort_unique_starts(
            x_in, n_own, k, canonical, pallas=pallas
        )
        major = words[0]
        sent = jnp.asarray(jnp.iinfo(major.dtype).max, major.dtype)
        n = major.shape[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        n_valid = jnp.sum((major != sent).astype(jnp.int32))
        sig = jnp.sum(jnp.where(starts, idx, 0))
        return jnp.stack([n_valid, sig])

    c0 = one(-1)  # dedicated warmup input, never timed
    _ = np.asarray(c0)  # warmup + materialize (host fetch is the only true sync)
    t0 = time.perf_counter()
    _ = np.asarray(c0 + jnp.int32(0))
    t_fetch = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = None
    for i in range(n_batches):
        c = one(i)
        acc = c if acc is None else acc + c
    total_counted = int(np.asarray(acc)[0])
    elapsed = max(time.perf_counter() - t0 - t_fetch, 1e-9)

    measured = n_batches * batch_bases
    return {
        "bench": "sparse_count",
        "k": k,
        "canonical": canonical,
        "device_sort": device_sort,
        "row_len": row_len,
        "total_bases": measured,
        "batch_bases": batch_bases,
        "elapsed_s": round(elapsed, 4),
        "gbases_per_sec": round(measured / elapsed / 1e9, 4),
        "windows_counted": total_counted,
        "windows_expected": n_batches * (batch_bases - k + 1),
        "device": str(jax.devices()[0]),
    }


def run_distance_bench(
    n_seqs: int = 1024,
    seq_len: int = 1024,
    k: int = 3,
    seed: int = 0,
    impl: str = "auto",
    reps: int = 8,
) -> dict:
    """Time the pairwise-distance path (the reference's step-2 analogue,
    /root/reference/kernels.h:85-109 generalized to one tiled program).

    impl: 'auto' mirrors engine routing (Pallas tri (min,+) kernel for
    bins <= distance_pallas._ROUTE_MAX_BINS = 65536, i.e. the whole
    k <= 8 dense band — bins past one 256-wide slab accumulate across a
    lax.scan of single-slab calls, see distance_pallas._SLICE_BINS —
    jnp elsewhere);
    'pallas'/'jnp' force a path for A/B comparison. The counts matrix is
    built once outside the timed region; timing is in-program lax.scan
    repetition with distinct inputs per iteration (tunnel dedupe trap)."""
    from dna_kmeres_parallel_tpu.ops import distance as dist_ops
    from dna_kmeres_parallel_tpu.models.engine import _counts_matrix_batch

    from dna_kmeres_parallel_tpu.ops import distance_pallas
    from dna_kmeres_parallel_tpu.ops import runtime

    bins = codec.num_bins(k)
    key = jax.random.PRNGKey(seed)
    grid = jax.random.randint(
        key, (n_seqs, seq_len), 0, 4, dtype=jnp.int32
    ).astype(jnp.uint8)
    lengths = jnp.full((n_seqs,), seq_len, dtype=jnp.int32)

    counts = _counts_matrix_batch(grid, k, bins, False)
    counts.block_until_ready()

    # Device max + 4-byte scalar fetch — np.asarray of the full counts
    # matrix would ship 100s of MB over the ~30-50 MB/s tunnel D2H.
    cmax = int(jnp.max(counts))
    # Production buckets cmax to a power of two (extra thresholds are
    # exact zeros; bounded compiled-program set) — mirror it.
    cmax = 1 << max(cmax - 1, 0).bit_length() if cmax > 0 else 0
    if impl == "auto":
        # Engine-mirroring (incl. the engine's env overrides): the MXU
        # threshold route when the COST models predict it beats the
        # alternative (r4 continuation — engine._mxu_dist_cmax), else
        # Pallas tri, else jnp.
        import os as _os

        tri_ok = (
            runtime.pallas_mode() == "compiled"
            and bins <= distance_pallas._ROUTE_MAX_BINS
        )
        mxu_force = _os.environ.get("KMER_TPU_DIST_MXU")
        limit_env = _os.environ.get("KMER_TPU_MXU_CMAX")
        mxu_limit = (
            int(limit_env) if limit_env else dist_ops.MXU_CMAX_DEFAULT
        )
        mxu_wins = limit_env is not None or (
            dist_ops.mxu_time_per_pair(bins, max(cmax, 1))
            < (
                dist_ops.tri_time_per_pair(bins)
                if tri_ok
                else dist_ops.jnp_time_per_pair(bins)
            )
        )
        if mxu_force != "0" and 0 < cmax <= mxu_limit and mxu_wins and (
            mxu_force == "1" or runtime.pallas_mode() == "compiled"
        ):
            use = "mxu"
        elif tri_ok:
            use = "pallas"
        else:
            use = "jnp"
    else:
        use = impl
    # Engine-equivalent kernel: the symmetric path runs the triangle-only
    # grid (lower tiles are never written, so the signature masks to
    # i <= j — also what the packed-triangle consumer reads).
    if use == "mxu":
        fn = lambda c: dist_ops.min_sum_matrix_mxu(c, cmax)  # noqa: E731
        # The caller's reps heuristic scales with pairs*bins; the MXU
        # route is ~10x faster per rep, so a reps=1 timing is mostly
        # dispatch latency (measured: 50M "bench" vs 105M amortized
        # pairs/s at k=8) — amortize over at least 4 in-program reps.
        reps = max(reps, 4)
    elif use == "pallas":
        fn = lambda c: distance_pallas.min_sum_matrix_pallas_tri(c)  # noqa: E731
    else:
        fn = lambda c: dist_ops.min_sum_matrix(c)  # noqa: E731
    # In-program repetition (lax.scan over distinct offsets in ONE
    # dispatch): per-dispatch tunnel latency is tens of ms — larger than
    # the kernel itself at this size — and a fetch-roundtrip subtraction
    # across separate dispatches can go negative (a clamp once reported
    # 6e15 pairs/s). Every OUTER dispatch also gets a distinct base offset
    # (CLAUDE.md: byte-identical dispatches get deduped in the tunnel).

    @jax.jit
    def prog(c, base):
        def body(acc, i):
            # Distinct inputs per iteration/dispatch via a ROW ROLL
            # (value-preserving — the old +base shift raised every count
            # and would break the mxu route's static cmax bound).
            o = fn(jnp.roll(c, base + i, axis=0))
            r = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
            cx = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
            return acc + jnp.sum(jnp.where(r <= cx, o, 0)), None

        out, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32)
        )
        return out

    _ = int(prog(counts, jnp.int32(100)))  # warmup/compile + sync
    best = None
    for j in range(3):
        t0 = time.perf_counter()
        _ = int(prog(counts, jnp.int32(j)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    # One dispatch+fetch roundtrip amortized over reps in-program iters.
    elapsed = best / reps

    n_pairs = n_seqs * (n_seqs - 1) // 2
    return {
        "bench": "distance",
        "k": k,
        "impl": use,
        "cmax": cmax,
        "n_seqs": n_seqs,
        "seq_len": seq_len,
        "n_pairs": n_pairs,
        "elapsed_s": round(elapsed, 4),
        "pairs_per_sec": round(n_pairs / elapsed, 1),
        "device": str(jax.devices()[0]),
    }
