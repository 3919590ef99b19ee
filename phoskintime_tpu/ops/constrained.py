"""Projected optimization under per-group sum-to-one + box constraints.

kinopt/tfopt both constrain parameter groups to sum to 1 inside box bounds
(reference ``kinopt/evol/objfn/minfndiffevo.py:320-386``,
``tfopt/local/optcon/construct.py`` linear constraints). The reference
enforces these via SLSQP / +/-eps inequality pairs; here we use **exact
Euclidean projection** onto {sum(x) = 1, lo <= x <= hi} computed by
bisection on the dual shift — a vectorized, vmappable O(iters * n) kernel —
inside a projected-Adam loop. Feasibility is exact at every iterate, so the
KKT primal check passes by construction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def project_sum_box(y: jnp.ndarray, lo, hi, mask: jnp.ndarray,
                    target: float = 1.0, iters: int = 60) -> jnp.ndarray:
    """Project each row of y (G, W) onto {sum(x*mask) = target, lo<=x<=hi}.

    Off-mask entries are zeroed. Rows with EMPTY masks come back all-zero
    (y * mask); no production mask row is empty — kinopt/tfopt groups
    always carry at least one valid slot.
    lo/hi may be scalars or arrays broadcastable to y.
    """
    mask_f = mask.astype(y.dtype)
    n_valid = mask_f.sum(axis=-1, keepdims=True)

    lo_b = jnp.broadcast_to(jnp.asarray(lo, y.dtype), y.shape)
    hi_b = jnp.broadcast_to(jnp.asarray(hi, y.dtype), y.shape)

    def g(tau):
        x = jnp.clip(y - tau, lo_b, hi_b) * mask_f
        return x.sum(axis=-1, keepdims=True) - target

    # bisection bounds for the shift
    t_lo = jnp.min(jnp.where(mask, y - hi_b, jnp.inf), axis=-1, keepdims=True) - 1.0
    t_hi = jnp.max(jnp.where(mask, y - lo_b, -jnp.inf), axis=-1, keepdims=True) + 1.0

    def body(_, carry):
        a, b = carry
        m = 0.5 * (a + b)
        gm = g(m)
        a = jnp.where(gm > 0, m, a)
        b = jnp.where(gm > 0, b, m)
        return a, b

    a, b = jax.lax.fori_loop(0, iters, body, (t_lo, t_hi))
    tau = 0.5 * (a + b)
    x = jnp.clip(y - tau, lo_b, hi_b) * mask_f
    return jnp.where(n_valid > 0, x, y * mask_f)


def projected_adam(loss_fn: Callable, x0, project_fn: Callable,
                   steps: int = 500, lr: float = 0.02,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Adam with projection after every step; returns (x, loss).

    x0 is any pytree; project_fn maps a pytree to the feasible set.
    Fixed-step loop -> fully vmappable over multistarts.
    """
    grad_fn = jax.grad(loss_fn)
    x0 = project_fn(x0)

    def body(i, carry):
        x, m, v = carry
        g = grad_fn(x)
        m = jax.tree.map(lambda mm, gg: b1 * mm + (1 - b1) * gg, m, g)
        v = jax.tree.map(lambda vv, gg: b2 * vv + (1 - b2) * gg * gg, v, g)
        t = i + 1
        mhat = jax.tree.map(lambda mm: mm / (1 - b1 ** t), m)
        vhat = jax.tree.map(lambda vv: vv / (1 - b2 ** t), v)
        x = jax.tree.map(lambda xx, mh, vh: xx - lr * mh / (jnp.sqrt(vh) + eps),
                         x, mhat, vhat)
        x = project_fn(x)
        return x, m, v

    zeros = jax.tree.map(jnp.zeros_like, x0)
    x, _, _ = jax.lax.fori_loop(0, steps, body, (x0, zeros, zeros))
    return x, loss_fn(x)
