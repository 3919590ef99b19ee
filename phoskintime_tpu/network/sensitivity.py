"""Global-model Morris sensitivity.

Spec: reference ``global_model/sensitivity.py:41-516`` — Morris over the
*fitted* raw parameter vector (+/-5% hypercube, 100 trajectories x 40
levels), each sample one full-network simulation (reference: process-pool
workers), scalar metric over the measured fold-changes, perturbation-cloud
outputs. Here the design evaluates as vmapped batches of the jitted
simulate+measure program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phoskintime_tpu.network.params import unpack_params
from phoskintime_tpu.network.simulate import extract_observables, fold_changes, simulate
from phoskintime_tpu.ops.morris import MorrisResult, morris_analyze, morris_sample


class GlobalSensitivityOutput(NamedTuple):
    morris: MorrisResult
    samples: np.ndarray
    Y: np.ndarray
    fc_clouds: dict   # {"rna"|"protein"|"phospho": (n_keep, T, ...)}


def run_sensitivity_analysis(system, slices, theta_best: np.ndarray,
                             time_grid: np.ndarray,
                             perturbation: float = 0.05,
                             n_trajectories: int = 100,
                             num_levels: int = 40,
                             metric: str = "total_signal",
                             top_curves: int = 20,
                             rtol: float = 1e-5, atol: float = 1e-7,
                             max_steps: int = 5000,
                             y0=None, seed: int = 42,
                             batch_size: int = 128) -> GlobalSensitivityOutput:
    theta_best = np.asarray(theta_best, float)
    d = len(theta_best)
    lo = theta_best - perturbation * np.abs(theta_best) - 1e-9
    hi = theta_best + perturbation * np.abs(theta_best) + 1e-9
    bounds = np.stack([lo, hi], axis=1)

    rng = np.random.default_rng(seed)
    X = morris_sample(bounds, n_trajectories, num_levels, rng)
    t_eval = jnp.asarray(time_grid)

    def run_one(theta):
        p = unpack_params(theta, slices, system.topo)
        res = simulate(system, p, t_eval, rtol=rtol, atol=atol,
                       max_steps=max_steps, y0=y0)
        obs = extract_observables(system, res.ys, res.success)
        fc_r, fc_p, fc_ph = fold_changes(obs, t_eval)
        return fc_r, fc_p, fc_ph

    run_batch = jax.jit(jax.vmap(run_one))

    frs, fps, fphs = [], [], []
    for i in range(0, len(X), batch_size):
        fr, fp, fph = run_batch(jnp.asarray(X[i:i + batch_size]))
        frs.append(np.asarray(fr)); fps.append(np.asarray(fp)); fphs.append(np.asarray(fph))
    fc_r = np.concatenate(frs); fc_p = np.concatenate(fps); fc_ph = np.concatenate(fphs)

    stacked = np.concatenate([fc_r.reshape(len(X), -1),
                              fc_p.reshape(len(X), -1),
                              fc_ph.reshape(len(X), -1)], axis=1)
    if metric == "total_signal":
        Y = stacked.sum(axis=1)
    elif metric == "mean":
        Y = stacked.mean(axis=1)
    elif metric == "variance":
        Y = stacked.var(axis=1)
    elif metric == "l2_norm":
        Y = np.sqrt((stacked ** 2).sum(axis=1))
    else:
        raise ValueError(f"Unknown metric {metric}")

    res = morris_analyze(bounds, X, Y, num_levels, seed=seed)

    keep = min(top_curves, len(X))
    order = np.argsort(np.abs(Y - np.median(Y)), kind="stable")[:keep]
    clouds = {"rna": fc_r[order], "protein": fc_p[order], "phospho": fc_ph[order]}
    return GlobalSensitivityOutput(res, X, Y, clouds)
