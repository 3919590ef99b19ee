"""Hyperparameter scan: outer search over loss-weight lambdas.

Spec: reference ``global_model/scan.py:62+`` — an Optuna outer loop
proposes (lambda_protein, lambda_rna, lambda_phospho, lambda_prior); each
trial runs a short pymoo UNSGA3 inner fit whose per-generation ideal point
is reported for pruning. Here the outer loop is the TPE sampler
(single-objective on the summed normalized ideal point) and the inner loop
a short UNSGA3 run; median-rule pruning cuts hopeless trials early.
"""

from __future__ import annotations

import numpy as np

from phoskintime_tpu.network.objective import make_objective
from phoskintime_tpu.network.optimize import make_batched_evaluate
from phoskintime_tpu.ops.nsga import run_unsga3
from phoskintime_tpu.ops.tpe import MOTPESampler


def run_hyperparameter_scan(system, slices, loss_data, defaults, time_grid,
                            xl, xu, *, n_outer=20, inner_gens=15,
                            inner_pop=64, seed=42, loss_mode=0, mesh=None,
                            lambda_ranges=None, logger=None):
    """Returns (best_lambdas, trials) where trials = [(lambdas, score), ...]."""
    if lambda_ranges is None:
        lambda_ranges = {"protein": (0.1, 10.0), "rna": (0.1, 10.0),
                         "phospho": (0.1, 10.0), "prior": (0.01, 1.0)}
    keys = list(lambda_ranges)
    lo = np.log10([lambda_ranges[k][0] for k in keys])
    hi = np.log10([lambda_ranges[k][1] for k in keys])
    sampler = MOTPESampler(lo, hi, seed=seed, n_startup_trials=max(5, n_outer // 4))

    trials = []
    running_scores: list[float] = []
    for it in range(n_outer):
        x = sampler.ask()
        lambdas = {k: float(10 ** v) for k, v in zip(keys, x)}
        objective = make_objective(system, slices, loss_data, defaults,
                                   lambdas, time_grid, loss_mode=loss_mode)
        evaluate = make_batched_evaluate(objective, mesh=mesh)

        pruned = {"flag": False}
        median = np.median(running_scores) if running_scores else np.inf

        def cb(gen, X, F, _median=median, _p=pruned):
            # median pruning after a burn-in of 5 generations
            if gen >= 5 and F.min(axis=0).sum() > 4 * _median:
                _p["flag"] = True

        res = run_unsga3(evaluate, xl, xu, pop_size=inner_pop,
                         n_gen=inner_gens, seed=seed + it, ftol=0.0,
                         n_max_evals=None, callback=cb)
        score = float(res.pareto_F.min(axis=0).sum())
        sampler.tell(x, np.asarray([score]))
        running_scores.append(score)
        trials.append((lambdas, score))
        if logger is not None:
            logger.info(f"[Scan] trial {it}: {lambdas} -> {score:.4g}"
                        + (" (pruned)" if pruned["flag"] else ""))

    best = min(trials, key=lambda t: t[1])
    return best[0], trials
