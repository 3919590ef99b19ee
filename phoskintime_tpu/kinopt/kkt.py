"""KKT optimality post-checks for the constrained kinopt/tfopt fits.

Spec: reference ``kinopt/optimality/KKT.py:10-254`` — after optimization,
verify primal feasibility of the sum-to-one constraints, estimate Lagrange
multipliers / stationarity residuals, and summarize active box constraints.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KKTReport(NamedTuple):
    primal_feasible: bool
    max_violation: float
    group_sums_alpha: np.ndarray
    group_sums_beta: np.ndarray
    stationarity_residual: float
    lagrange_alpha: np.ndarray      # per alpha group multiplier estimate
    lagrange_beta: np.ndarray
    n_active_box: int


def kkt_check(prob, alpha_pad: np.ndarray, beta_pad: np.ndarray,
              loss_fn, tol: float = 1e-5) -> KKTReport:
    """Evaluate KKT conditions at (alpha, beta).

    loss_fn: (alpha_pad, beta_pad) -> scalar (jax-differentiable).
    The equality multipliers are estimated per group as the mean in-group
    gradient (stationarity requires grad - lambda * 1 = 0 on free coords);
    the residual is the remaining in-group gradient dispersion over
    non-active coordinates.
    """
    a = jnp.asarray(alpha_pad)
    b = jnp.asarray(beta_pad)
    ga, gb = jax.grad(loss_fn, argnums=(0, 1))(a, b)
    ga, gb = np.asarray(ga), np.asarray(gb)

    gm, km = prob.gp_mask, prob.k_mask
    sums_a = (alpha_pad * gm).sum(axis=1)
    sums_b = (beta_pad * km).sum(axis=1)
    viol = max(np.abs(sums_a - 1).max(initial=0.0),
               np.abs(sums_b - 1).max(initial=0.0))

    # active box constraints
    act = 0
    for arr, msk in [(alpha_pad, gm), (beta_pad, km)]:
        v = arr[msk]
        act += int(((np.abs(v - prob.lb) < tol) | (np.abs(v - prob.ub) < tol)).sum())

    def group_stats(grad, vals, msk):
        lams, resid = [], 0.0
        for i in range(msk.shape[0]):
            m = msk[i]
            if not m.any():
                lams.append(0.0)
                continue
            free = m & (np.abs(vals[i] - prob.lb) > tol) & (np.abs(vals[i] - prob.ub) > tol)
            g = grad[i][free if free.any() else m]
            lam = float(g.mean())
            lams.append(lam)
            resid = max(resid, float(np.abs(g - lam).max(initial=0.0)))
        return np.asarray(lams), resid

    lam_a, res_a = group_stats(ga, alpha_pad, gm)
    lam_b, res_b = group_stats(gb, beta_pad, km)

    return KKTReport(bool(viol <= tol * 10), float(viol), sums_a, sums_b,
                     float(max(res_a, res_b)), lam_a, lam_b, act)
