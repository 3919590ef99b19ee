"""Composite fit score.

Spec: reference ``config/config.py:176-226`` —
score = delta*MSE + alpha*RMSE + beta*MAE + gamma*Var + mu*L2(params)/n
computed over |target - prediction| / target.size scaled residuals.
"""

from __future__ import annotations

import jax.numpy as jnp


def future_times(n_new: int, ratio: float | None = None, tp=None):
    """Extend a time grid by ``n_new`` geometrically-spaced points
    (reference ``config/config.py:228-248``): each new interval is the
    previous interval times ``ratio`` (inferred from the last two points
    when None). Used by the extrapolation fit (Plotter.plot_future_fit)."""
    import numpy as np

    if tp is None:
        from phoskintime_tpu.config.loader import PhosKinConfig
        tp = PhosKinConfig.time_points_protein
    times = list(np.asarray(tp, float))
    if ratio is None:
        ratio = times[-1] / times[-2]
    for _ in range(n_new):
        times.append(times[-1] * ratio)
    return np.asarray(times)


def score_fit(params: jnp.ndarray, target: jnp.ndarray, prediction: jnp.ndarray,
              alpha: float = 1.0, beta: float = 1.0, gamma: float = 1.0,
              delta: float = 1.0, mu: float = 1.0) -> jnp.ndarray:
    residual = jnp.abs(target - prediction) / target.size
    mse = jnp.sum(residual ** 2)
    rmse = jnp.sqrt(jnp.mean(residual ** 2))
    mae = jnp.mean(residual)
    variance = jnp.var(residual)
    l2_norm = jnp.linalg.norm(params) / params.shape[0]
    return delta * mse + alpha * rmse + beta * mae + gamma * variance + mu * l2_norm
