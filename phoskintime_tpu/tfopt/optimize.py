"""tfopt optimizers: local multistart (projected Adam) and evolutionary
3-objective search.

Spec: reference ``tfopt/local/__main__.py:60-75`` (48-start joblib SLSQP
multistart + polish) and ``tfopt/evol/opt/optrun.py:41-120`` (UNSGA3 /
SMSEMOA / AGEMOEA over (loss, alpha-viol^2, beta-viol^2), pop = 2*n_var,
1000 gens). All three reference optimizer codes run their REAL
algorithms: 0 UNSGA3, 1 steady-state SMS-EMOA (exact 3-obj hypervolume
survival), 2 AGE-MOEA (adaptive p-norm geometry survival).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phoskintime_tpu.ops.constrained import project_sum_box, projected_adam
from phoskintime_tpu.ops.nsga import (run_agemoea, run_nsga2, run_smsemoa,
                                      run_unsga3)
from phoskintime_tpu.tfopt.model import TfoptProblem, tfopt_loss, violation_sq


class TfoptResult(NamedTuple):
    alpha: np.ndarray
    beta: np.ndarray
    loss: float
    all_losses: np.ndarray
    feasible: bool


def _project(prob: TfoptProblem):
    am = jnp.asarray(prob.alpha_mask)
    bm = jnp.asarray(prob.beta_mask)
    # TFs without psites: single beta slot pinned to 1 by the projection
    def proj(x):
        a, b = x
        a = project_sum_box(a, 0.0, 1.0, am)
        b = project_sum_box(b, prob.lb, prob.ub, bm)
        return a, b
    return proj


def _random_start(prob: TfoptProblem, rng: np.random.Generator):
    """Uniform starts normalized per group (reference utils/params.py:40-66)."""
    a = rng.random(prob.alpha_mask.shape) * prob.alpha_mask
    a /= np.maximum(a.sum(axis=1, keepdims=True), 1e-12)
    b = rng.uniform(prob.lb, prob.ub, prob.beta_mask.shape) * prob.beta_mask
    s = b.sum(axis=1, keepdims=True)
    b = np.where(np.abs(s) > 1e-9, b / np.where(np.abs(s) > 1e-9, s, 1.0), b)
    b[prob.no_psite_tf, 0] = 1.0
    return a, b


def run_local(prob: TfoptProblem, loss_type: int = 0, n_starts: int = 48,
              steps: int = 800, lr: float = 0.02, seed: int = 42,
              lam1: float = 1e-6, lam2: float = 1e-6) -> TfoptResult:
    rng = np.random.default_rng(seed)
    starts = [_random_start(prob, rng) for _ in range(n_starts)]
    A0 = jnp.asarray(np.stack([s[0] for s in starts]))
    B0 = jnp.asarray(np.stack([s[1] for s in starts]))

    proj = _project(prob)
    loss_fn = lambda x: tfopt_loss(prob, x[0], x[1], loss_type, lam1, lam2)

    def fit_one(a0, b0):
        x, loss = projected_adam(loss_fn, (a0, b0), proj, steps=steps, lr=lr)
        return x[0], x[1], loss

    A, B, losses = jax.jit(jax.vmap(fit_one))(A0, B0)
    losses = np.asarray(losses)
    i = int(np.nanargmin(losses))
    a, b = np.asarray(A[i]), np.asarray(B[i])
    av, bv = violation_sq(prob, jnp.asarray(a), jnp.asarray(b))
    return TfoptResult(a, b, float(losses[i]), losses,
                       bool(float(av) + float(bv) < 1e-8))


def run_evolutionary(prob: TfoptProblem, optimizer: int = 0,
                     loss_type: int = 0, pop_size: int | None = None,
                     n_gen: int = 200, seed: int = 42,
                     lam1: float = 1e-3, lam2: float = 1e-3,
                     gens_per_dispatch: int = 1) -> TfoptResult:
    """3-objective evolutionary fit; optimizer 0/1/2 per reference codes.

    gens_per_dispatch > 1 (optimizer 0 only): the all-device GA loop —
    at the reference's 1000-generation tfopt budget this cuts the
    dispatch count by that factor (see ops/nsga_device.py)."""
    n = prob.n_alpha + prob.n_beta
    if pop_size is None:
        pop_size = min(2 * n, 400)
    xl = np.concatenate([np.zeros(prob.n_alpha), np.full(prob.n_beta, prob.lb)])
    xu = np.concatenate([np.ones(prob.n_alpha), np.full(prob.n_beta, prob.ub)])

    amask_flat = np.where(prob.alpha_mask)
    bmask_flat = np.where(prob.beta_mask)

    @jax.jit
    def eval_multi(X):
        X = jnp.asarray(X)
        A = jnp.zeros((X.shape[0],) + prob.alpha_mask.shape, X.dtype)
        B = jnp.zeros((X.shape[0],) + prob.beta_mask.shape, X.dtype)
        A = A.at[:, amask_flat[0], amask_flat[1]].set(X[:, :prob.n_alpha])
        B = B.at[:, bmask_flat[0], bmask_flat[1]].set(X[:, prob.n_alpha:])

        def one(a, b):
            l = tfopt_loss(prob, a, b, loss_type, lam1, lam2)
            av, bv = violation_sq(prob, a, b)
            return jnp.stack([l, av, bv])
        return jax.vmap(one)(A, B)

    evaluate = lambda X: np.asarray(eval_multi(jnp.asarray(X)))
    if optimizer == 0 and gens_per_dispatch > 1:
        from phoskintime_tpu.ops.nsga_device import run_unsga3_device

        res = run_unsga3_device(eval_multi, xl, xu, pop_size=pop_size,
                                n_gen=n_gen, n_obj=3, n_partitions=12,
                                seed=seed, ftol=0.0, n_max_evals=None,
                                gens_per_block=gens_per_dispatch)
    elif optimizer == 0:
        res = run_unsga3(evaluate, xl, xu, pop_size=pop_size, n_gen=n_gen,
                         n_obj=3, n_partitions=12, seed=seed, ftol=0.0,
                         n_max_evals=None)
    elif optimizer == 1:
        # generational (n_offsprings = pop_size), matching the pymoo
        # configuration the reference runs — n_gen carries the same
        # evaluation budget as the other codes
        res = run_smsemoa(evaluate, xl, xu, pop_size=pop_size,
                          n_gen=n_gen, seed=seed)
    elif optimizer == 2:
        res = run_agemoea(evaluate, xl, xu, pop_size=pop_size, n_gen=n_gen,
                          seed=seed)
    else:
        res = run_nsga2(evaluate, xl, xu, pop_size=pop_size, n_gen=n_gen,
                        seed=seed)

    pf = res.pareto_F
    viol = pf[:, 1] + pf[:, 2]
    feas = viol <= max(1e-6, float(np.quantile(viol, 0.25)))
    cand = np.where(feas)[0]
    x_best = res.pareto_X[cand[np.argmin(pf[cand, 0])]]
    a, b = prob.unpack(x_best)
    loss = float(tfopt_loss(prob, jnp.asarray(a), jnp.asarray(b), loss_type,
                            lam1, lam2))
    return TfoptResult(a, b, loss,
                       np.asarray([h[1] for h in res.history] or [loss]),
                       bool(viol[cand[np.argmin(pf[cand, 0])]] < 1e-3))
