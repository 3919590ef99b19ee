"""Empirical VPU f32 FMA peak on this chip, via a VMEM-resident Pallas
kernel: y = y * a + b chains, statically unrolled, no HBM traffic in the
timed loop beyond one tile read/write.

Purpose: the roofline denominator for the phi-table build (the flagship
objective's dominant stage), which is VPU-compute-bound — MFU against
the MXU peak is meaningless for it. Prints JSON lines for full (8, blk)
and narrow (6, blk) sublane occupancy (the phi ladder runs w=6 buffers).
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 512  # FMA chain length per element per call


def _kernel(reps, x_ref, o_ref):
    x = x_ref[:]
    a = x * 0.999999 + 1e-7
    y = x
    for _ in range(reps):
        y = y * a + x
    o_ref[:] = y


@partial(jax.jit, static_argnames=("reps", "rows", "blk"))
def fma_chain(X, reps, rows, blk):
    grid = (X.shape[-1] // blk,)
    spec = pl.BlockSpec((rows, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(partial(_kernel, reps), grid=grid,
                          in_specs=[spec], out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype))(X)


def main():
    for rows in (8, 6):
        B = 8 * 1024 * 1024 // rows // 4          # ~8 MB working set
        B = B // 512 * 512
        X = jnp.asarray(np.random.default_rng(0).uniform(
            0.5, 1.0, (rows, B)), jnp.float32)
        f = lambda x: fma_chain(x, REPS, rows, 512)
        r = f(X)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            r = f(X)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n
        flops = rows * B * (REPS + 1) * 2
        print(json.dumps({"rows": rows, "gflops": round(flops / dt / 1e9),
                          "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
