"""Batched bounded Levenberg-Marquardt least squares.

This replaces the reference's per-process ``scipy.optimize.curve_fit`` (TRF,
``x_scale='jac'``, reference ``paramest/normest.py:79-89,276-289``): one LM
instance per batch lane, vmapped over (genes x starts x weights x lambdas),
so an entire multistart grid is a single XLA program.

Design notes:
* Jacobians via ``jax.jacfwd`` through the exact expm solve (tiny systems,
  forward mode is cheap and exact).
* Marquardt scaling ``diag(J^T J)`` reproduces TRF's ``x_scale='jac'``
  behaviour of equilibrating badly scaled parameters.
* Bounds by projection (clip) after each trial step.
* Control flow is a fixed-count ``fori_loop`` with accept/reject by
  ``jnp.where`` — fully batchable, no per-lane divergence.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    p: jnp.ndarray          # (n,) best parameters
    cost: jnp.ndarray       # () 0.5 * sum(r^2) at best
    pcov: jnp.ndarray       # (n, n) inv(J^T J) at best (curve_fit absolute_sigma=True)
    n_accepted: jnp.ndarray  # () int32


def levenberg_marquardt(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    p0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    max_iters: int = 60,
    lam0: float = 1e-3,
    lam_up: float = 3.0,
    lam_down: float = 0.5,
    lam_min: float = 1e-10,
    lam_max: float = 1e8,
) -> LMResult:
    """Minimize 0.5*||residual_fn(p)||^2 subject to box bounds."""
    dtype = p0.dtype
    p0 = jnp.clip(p0, lower, upper)

    def cost_of(p):
        r = residual_fn(p)
        return 0.5 * jnp.sum(r * r), r

    jac = jax.jacfwd(residual_fn)

    c0, _ = cost_of(p0)

    def body(_, carry):
        p, lam, cost, n_acc = carry
        r = residual_fn(p)
        J = jac(p)
        g = J.T @ r
        H = J.T @ J
        diagH = jnp.diag(H)
        scale = jnp.where(diagH > 1e-14, diagH, 1.0)  # x_scale='jac'
        A = H + lam * jnp.diag(scale)
        # robust solve: fall back to steepest descent scaling on failure
        delta = jnp.linalg.solve(A + 1e-14 * jnp.eye(p.shape[0], dtype=dtype), g)
        p_new = jnp.clip(p - delta, lower, upper)
        c_new, _ = cost_of(p_new)
        ok = jnp.isfinite(c_new) & (c_new < cost)
        p = jnp.where(ok, p_new, p)
        cost = jnp.where(ok, c_new, cost)
        lam = jnp.clip(jnp.where(ok, lam * lam_down, lam * lam_up),
                       lam_min, lam_max)
        return p, lam, cost, n_acc + ok.astype(jnp.int32)

    p, _, cost, n_acc = jax.lax.fori_loop(
        0, max_iters, body,
        (p0, jnp.asarray(lam0, dtype), c0, jnp.asarray(0, jnp.int32)))

    # covariance at the optimum: pinv(J^T J) (matches curve_fit with
    # absolute_sigma=True; downstream CI code rescales by MSE when needed)
    Jf = jac(p)
    H = Jf.T @ Jf
    pcov = jnp.linalg.pinv(H)
    return LMResult(p, cost, pcov, n_acc)


def lm_batched(residual_fn, p0s, lower, upper, **kw):
    """vmap over a leading batch of starting points (shared bounds)."""
    return jax.vmap(lambda p0: levenberg_marquardt(residual_fn, p0, lower, upper, **kw))(p0s)
