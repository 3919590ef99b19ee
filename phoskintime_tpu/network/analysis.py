"""Long-horizon steady-state analysis.

Spec: reference ``global_model/analysis.py:29-399`` — simulate 7 days on a
log-spaced grid, check rate-of-change convergence per protein
(rtol=1e-6/atol=1e-8), and report per-protein steady-state levels and
kinase dominance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from phoskintime_tpu.network.simulate import extract_observables, simulate

MINUTES_7_DAYS = 7 * 24 * 60.0


class SteadyStateReport(NamedTuple):
    times: np.ndarray
    tot: np.ndarray            # (T, N) total protein
    rna: np.ndarray            # (T, N)
    converged: np.ndarray      # (N,) bool
    final_rate: np.ndarray     # (N,) |d(tot)/dt| at the end
    ss_value: np.ndarray       # (N,) final level


def simulate_until_steady(system, params, *, t_final=MINUTES_7_DAYS,
                          n_points=120, rtol=1e-6, atol=1e-8,
                          max_steps=200_000, y0=None,
                          conv_rtol=1e-6, conv_atol=1e-8) -> SteadyStateReport:
    """Log-spaced 7-day simulation + convergence check per protein."""
    times = np.unique(np.concatenate([
        [0.0], np.logspace(np.log10(0.5), np.log10(t_final), n_points)]))
    res = simulate(system, params, jnp.asarray(times), rtol=rtol, atol=atol,
                   max_steps=max_steps, y0=y0, dt_max=float(t_final))
    obs = extract_observables(system, res.ys, res.success)
    tot = np.asarray(obs.TOT)
    rna = np.asarray(obs.R)

    # rate of change over the last interval, relative criterion
    dt = times[-1] - times[-2]
    rate = np.abs(tot[-1] - tot[-2]) / dt
    converged = rate <= (conv_atol + conv_rtol * np.abs(tot[-1]))
    return SteadyStateReport(times, tot, rna, converged, rate, tot[-1])


def kinase_dominance(system, params) -> np.ndarray:
    """Share of each kinase in the total phospho-drive per protein:
    contribution_{i,k} = sum_j W[i,j,k] * c_k[k] (row-normalized)."""
    W = np.asarray(system.topo.W_pad)
    ck = np.asarray(params["c_k"])
    contrib = (W * ck[None, None, :]).sum(axis=1)   # (N, K)
    total = contrib.sum(axis=1, keepdims=True)
    return contrib / np.where(total > 0, total, 1.0)
