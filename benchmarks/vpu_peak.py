"""Empirical VPU f32 peak on this chip, measured honestly.

Two methodology rules, both learned the hard way in round 5:

1. **The compute chain must not be strength-reducible.** The round-4
   version timed ``y = y*a + x`` chains; at long static unrolls the
   compiler collapses the affine recurrence (measured "240 TFLOP/s" —
   impossible, the v5e bf16 MXU peak is 197). This version iterates the
   logistic-like map ``y = y*y + c`` (one FMA per element per step),
   which has no closed form.

2. **``jax.block_until_ready`` is NOT a reliable completion barrier on
   this tunneled platform** — for large-array outputs it returned in
   0.1 ms on a program whose true device time was 462 ms (verified by
   forcing a device->host copy). All timings here (a) reduce the result
   to a scalar inside the jit, (b) force a host fetch, and (c) report
   the SLOPE between two chained-call counts, which cancels the fixed
   dispatch/tunnel overhead (~25 ms here).

ILP matters: a single dependent chain per vreg leaves the VPU's ~4
ALUs/cycle idle (measured 3.0 TF); two independent accumulator chains
at an (8, 2048) block reach the peak. Measured on this chip (TPU v5e,
2026-08-20): **6.8 TFLOP/s f32** (theoretical 8 sublanes x 128 lanes x
4 ALUs x 2 flops @ 940 MHz = 7.7 TF -> 88%).

Prints one JSON line per (nacc, blk) arm plus a final ``peak`` line.
Run on the real TPU:  python benchmarks/vpu_peak.py
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

REPS = 512  # map iterations per element per kernel call


def _kernel(reps, nacc, x_ref, o_ref):
    x = x_ref[:]
    c = x * 1e-6 - 0.1                     # keeps iterates in (-0.1, 1)
    ys = [x * (1.0 + 0.001 * j) for j in range(nacc)]
    for _ in range(reps):
        ys = [y * y + c for y in ys]       # 1 FMA; not strength-reducible
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:] = acc


def sq_chain(X, reps, nacc, blk):
    rows = X.shape[0]
    grid = (X.shape[-1] // blk,)
    spec = pl.BlockSpec((rows, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(partial(_kernel, reps, nacc), grid=grid,
                          in_specs=[spec], out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype))(X)


def slope_tflops(fn, X, flops_per_call, Ks=(8, 24), n=3):
    """Chained data-dependent calls inside ONE jit; scalar host fetch;
    slope between the two K arms cancels dispatch overhead."""
    outs = {}
    for K in Ks:
        @jax.jit
        def chained(x, K=K):
            def body(i, y):
                return fn(y * 0.5 + x * 0.5)
            return jax.lax.fori_loop(0, K, body, x).sum()
        r = chained(X)
        _ = float(r)                       # forced completion
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            r = chained(X)
            _ = float(r)
            ts.append(time.perf_counter() - t0)
        outs[K] = float(np.median(ts))
    per_call = (outs[Ks[1]] - outs[Ks[0]]) / (Ks[1] - Ks[0])
    return flops_per_call / per_call / 1e12


def main():
    rows = 8
    B = 4 * 1024 * 1024 // rows // 4       # 4 MB working set
    B = B // 2048 * 2048
    X = jnp.asarray(np.random.default_rng(0).uniform(0.4, 0.9, (rows, B)),
                    jnp.float32)
    best = 0.0
    for nacc in (1, 2, 4):
        for blk in (512, 2048):
            f = lambda y, nacc=nacc, blk=blk: sq_chain(y, REPS, nacc, blk)
            tf = slope_tflops(f, X, rows * B * REPS * 2 * nacc)
            best = max(best, tf)
            print(json.dumps({"nacc": nacc, "blk": blk,
                              "tflops": round(tf, 3)}), flush=True)
    print(json.dumps({"peak": round(best, 3), "unit": "TFLOP/s f32 VPU"}),
          flush=True)


if __name__ == "__main__":
    main()
