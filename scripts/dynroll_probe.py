"""Mosaic capability probe for the r5 owner-partition design (VERDICT
weak #3): does pltpu.roll accept a DYNAMIC (traced, SMEM-read) shift on
this toolchain? The per-row segment extraction of the row-partitioned
bucketed exchange needs one dynamic lane-rotation per (row, owner).

Usage: JAX_PLATFORMS=cpu python scripts/dynroll_probe.py   (interpret)
       python scripts/dynroll_probe.py                     (compiled TPU)
"""
import os
import sys

cache = os.path.expanduser("~/.cache/dna_kmeres_tpu_xla")
os.makedirs(cache, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

interpret = jax.devices()[0].platform == "cpu"


def kernel(x_ref, s_ref, o_ref):
    # One dynamic roll per sublane row, shift from SMEM.
    rows = []
    for r in range(8):
        sh = s_ref[r, 0]
        rows.append(
            pltpu.roll(x_ref[r : r + 1, :], 256 - sh, axis=1)
        )
    o_ref[:] = jnp.concatenate(rows, axis=0)


@jax.jit
def run(x, s):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        in_specs=[
            pl.BlockSpec((8, 256), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 256), lambda: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, s)


x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
s = jnp.asarray(np.arange(8, dtype=np.int32).reshape(8, 1) * 3 + 1)
try:
    got = np.asarray(run(x, s))
    want = np.stack(
        [np.roll(np.asarray(x)[r], -(3 * r + 1)) for r in range(8)]
    )
    print("dynamic-roll:", "OK-exact" if np.array_equal(got, want) else
          f"WRONG (got[0][:5]={got[0][:5]} want={want[0][:5]})")
except Exception as e:
    print("dynamic-roll: FAILED:", str(e)[:500])
    sys.exit(1)
