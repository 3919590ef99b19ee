"""Robust loss kernels.

Spec: reference ``global_model/lossfn.py:28-110`` — eight robust losses
selected by ``LOSS_MODE`` (0 sq, 1 huber, 2 pseudo-huber-on-logs, 3 log-cosh,
4 cauchy, 5 poisson-scaled MSE, 6 geman-mcclure, else charbonnier).

Here each loss is a vectorized pure function of (diff, pred, obs); dispatch
is by a static integer at trace time (the mode is a config constant, so no
runtime switch is needed — XLA sees only one branch).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9


def sq(diff, pred=None, obs=None):
    return diff * diff


def huber(diff, pred=None, obs=None, delta=0.5):
    a = jnp.abs(diff)
    return jnp.where(a <= delta, 0.5 * diff * diff, delta * (a - 0.5 * delta))


def pseudo_huber_log(diff, pred, obs, delta=0.5):
    """Pseudo-Huber on the LOG-SPACE residual log(pred) - log(obs).

    Requires POSITIVE pred/obs (fold-change signals): values are clamped
    to a positive floor, so a negative input is treated as ~0 rather than
    by magnitude (an |x| fold would score sign-flipped pairs of equal
    magnitude as a zero residual — advisor r2 finding).

    DEVIATION (documented): the reference's LOSS_MODE==2 computes
    log(diff + EPS) with diff the raw residual (lossfn.py:168) — NaN for
    every overshooting prediction, which poisons the whole objective to
    fail_value and makes the mode unusable. The evident intent (and what
    this implements) is the log-ratio residual."""
    d = jnp.log(jnp.maximum(pred, EPS)) - jnp.log(jnp.maximum(obs, EPS))
    x = d / delta
    return (delta * delta) * (jnp.sqrt(1.0 + x * x) - 1.0)


def log_cosh(diff, pred=None, obs=None):
    s = jnp.abs(diff)
    return jnp.where(s > 20.0, s - 0.69314718056, jnp.log(jnp.cosh(jnp.minimum(s, 20.0))))


def cauchy(diff, pred=None, obs=None, c=1.0):
    return jnp.log1p((diff / c) ** 2)


def poisson_scaled_mse(diff, pred, obs=None, eps=1e-6):
    return (diff * diff) / (jnp.abs(pred) + eps)


def geman_mcclure(diff, pred=None, obs=None, delta=1.0):
    x2 = diff * diff
    return x2 / (x2 + delta * delta)


def charbonnier(diff, pred=None, obs=None, eps=1e-3):
    return jnp.sqrt(diff * diff + eps * eps) - eps


_LOSSES = {0: sq, 1: huber, 2: pseudo_huber_log, 3: log_cosh, 4: cauchy,
           5: poisson_scaled_mse, 6: geman_mcclure}


def robust_loss(mode: int):
    """Return the elementwise loss fn for a static LOSS_MODE integer."""
    return _LOSSES.get(int(mode), charbonnier)
