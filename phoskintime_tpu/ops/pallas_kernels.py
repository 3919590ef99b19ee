"""Pallas TPU kernels for the hot irregular ops.

The production kernel backing the BASELINE north-star item
("Newton/tridiagonal Pallas kernels", SURVEY.md §7):

* :func:`thomas_pallas` — batched tridiagonal (Thomas) solve. Layout puts
  the chain dimension on sublanes and the batch on lanes, so the
  forward/backward sweeps are sequential over <= ~tens of rows while every
  lane (batch element: protein chain or ESDIRK stage system) advances in
  parallel on the VPU. Measured ~600x a lax.scan sweep at production
  batch sizes — this is the kernel the "Pallas kernels" claim rests on.

DOCUMENTED EXPERIMENT (not routed to in production):

* :func:`hypercube_flux_pallas` — the combinatorial-mechanism state-flux
  update ``dX[m] = sum_j +/- rate * X[m ^ (1<<j)] ...`` as static lane
  rolls. Correct (tested vs the jnp reference), but benchmarked SLOWER
  than the XLA gather path at every production size on v5e
  (smax=4, f32; 50-rep steady-state medians):

      B=P*N    pallas      xla    pallas/xla
         40    978 us   730 us      0.75x
        400   1434 us   667 us      0.46x
       4096   1847 us   846 us      0.46x
      40960   1833 us   640 us      0.35x
     327680  15341 us   951 us      0.06x

  Root cause: the (N, Mmax=16) tile leaves 112/128 lanes idle and the
  8-row grid serializes large batches; the XLA gather fuses into the
  surrounding RHS for free. The model-2 production path also only needs
  this flux inside per-bucket jvp block extraction (network/expo.py), not
  in the integration scan, so even a winning kernel would be cold.
  Round-4 re-examination (VERDICT r3 item 5): with the dense masked loss
  in place, the pop-2048 model-2 decomposition measures objective
  195.2 ms / simulate-only 194.9 ms / simulate+observables 193.0 ms —
  the 2^Smax aggregation this kernel was built to relieve now costs
  ~0 ms; 100% of model-2 cost is the propagator scan (w = 1 + 2^Smax
  width class), where no stepwise RHS flux exists. Kept
  as a worked example of lane-permutation kernels; do NOT route to it
  without re-measuring.

Both have jnp reference fallbacks (used on CPU and checked for
equivalence in the test suite via interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# batched Thomas solve
# ---------------------------------------------------------------------------

def _thomas_kernel(a_ref, b_ref, c_ref, d_ref, x_ref, cp, dp):
    n = a_ref.shape[0]
    row = lambda ref, i: ref[pl.ds(i, 1), :]  # keep 2-D (1, lanes) shapes

    denom = row(b_ref, 0)
    cp[pl.ds(0, 1), :] = row(c_ref, 0) / denom
    dp[pl.ds(0, 1), :] = row(d_ref, 0) / denom

    def fwd(i, _):
        den = row(b_ref, i) - row(a_ref, i) * row(cp, i - 1)
        cp[pl.ds(i, 1), :] = row(c_ref, i) / den
        dp[pl.ds(i, 1), :] = (row(d_ref, i) - row(a_ref, i) * row(dp, i - 1)) / den
        return 0

    jax.lax.fori_loop(1, n, fwd, 0, unroll=True)

    x_ref[pl.ds(n - 1, 1), :] = row(dp, n - 1)

    def bwd(k, _):
        i = n - 2 - k
        x_ref[pl.ds(i, 1), :] = row(dp, i) - row(cp, i) * row(x_ref, i + 1)
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0, unroll=True)


@partial(jax.jit, static_argnames=("interpret",))
def thomas_pallas(a, b, c, d, interpret: bool = False):
    """Solve a batch of tridiagonal systems; inputs (B, n), output (B, n).

    a = lower diag (a[:,0] ignored), b = main, c = upper (c[:,-1] ignored).
    The batch is padded to a lane multiple; systems must be well-posed
    (nonzero pivots — guaranteed for the diagonally-dominant chains here).
    """
    B, n = a.shape
    Bp = _round_up(max(B, 1), _LANES)
    dtype = a.dtype

    def prep(v, fill):
        out = jnp.full((Bp, n), fill, dtype)
        return out.at[:B].set(v).T.copy()  # -> (n, Bp), chain on sublanes

    aT = prep(a, 0.0)
    bT = prep(b, 1.0)  # identity rows for padding lanes
    cT = prep(c, 0.0)
    dT = prep(d, 0.0)

    grid = (Bp // _LANES,)
    spec = pl.BlockSpec((n, _LANES), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    xT = pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct((n, Bp), dtype),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((n, _LANES), dtype),
                        pltpu.VMEM((n, _LANES), dtype)],
        interpret=interpret,
    )(aT, bT, cT, dT)
    return xT.T[:B]


# ---------------------------------------------------------------------------
# combinatorial hypercube flux
# ---------------------------------------------------------------------------

def _hypercube_kernel(smax: int, X_ref, S_ref, E_ref, out_ref):
    """One (block_N, Mmax) tile: accumulate phospho/dephospho edge fluxes.

    The XOR-with-bit-j neighbor map is a pure layout transform: reshaping
    the state axis to (..., 2, 2^j) and flipping the middle axis swaps the
    two half-blocks — no gathers, no captured index constants.
    """
    X = X_ref[:]                       # (bn, Mmax)
    bn, Mmax = X.shape
    acc = jnp.zeros_like(X)
    E = E_ref[:]                       # (bn, 1) dephospho rate per protein
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn, Mmax), 1)
    for j in range(smax):
        blk = 1 << j
        bit_i = (lane >> j) & 1                    # bit j of each state m
        # X[:, m ^ (1<<j)]: for set bits the neighbor is m - blk (right
        # roll), for clear bits m + blk (left roll); circular wrap never
        # gets selected.
        Xx = jnp.where(bit_i == 1,
                       pltpu.roll(X, shift=blk, axis=1),
                       pltpu.roll(X, shift=Mmax - blk, axis=1))
        bit = bit_i.astype(X.dtype)
        Sj = S_ref[:, j][:, None]                  # (bn, 1) site rate
        inflow = bit * Sj * Xx + (1.0 - bit) * E * Xx
        outflow = bit * E * X + (1.0 - bit) * Sj * X
        acc = acc + inflow - outflow
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("smax", "interpret"))
def hypercube_flux_pallas(X, S, E, smax: int, interpret: bool = False):
    """Edge-flux part of the combinatorial RHS.

    Args:
      X: (N, Mmax) masked state values (Mmax = 2^smax).
      S: (N, smax) per-site phospho rates (masked).
      E: (N,) dephospho rate per protein.
    Returns dX_edges (N, Mmax) = sum over sites of (inflow - outflow).
    Per-state decay/translation terms stay in plain XLA (they are trivially
    fused elementwise ops).
    """
    N, Mmax = X.shape
    dtype = X.dtype
    block_n = 8
    Np = _round_up(max(N, 1), block_n)

    Xp = jnp.zeros((Np, Mmax), dtype).at[:N].set(X)
    Sp = jnp.zeros((Np, max(smax, 1)), dtype).at[:N, :smax].set(S)
    Ep = jnp.zeros((Np, 1), dtype).at[:N, 0].set(E)

    grid = (Np // block_n,)
    out = pl.pallas_call(
        partial(_hypercube_kernel, smax),
        out_shape=jax.ShapeDtypeStruct((Np, Mmax), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, Mmax), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, max(smax, 1)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, Mmax), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Xp, Sp, Ep)
    return out[:N]


def hypercube_flux_reference(X, S, E, smax: int):
    """jnp reference implementation (same math as network/rhs.py)."""
    Mmax = X.shape[1]
    m = np.arange(Mmax)
    dX = jnp.zeros_like(X)
    for j in range(smax):
        perm = m ^ (1 << j)
        bit = jnp.asarray((m >> j) & 1, X.dtype)[None, :]
        Xx = X[:, perm]
        Sj = S[:, j][:, None]
        Ec = E[:, None]
        inflow = bit * Sj * Xx + (1 - bit) * Ec * Xx
        outflow = bit * Ec * X + (1 - bit) * Sj * X
        dX = dX + inflow - outflow
    return dX
