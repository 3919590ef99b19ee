"""Composite fit score.

Spec: reference ``config/config.py:176-226`` —
score = delta*MSE + alpha*RMSE + beta*MAE + gamma*Var + mu*L2(params)/n
computed over |target - prediction| / target.size scaled residuals.
"""

from __future__ import annotations

import jax.numpy as jnp


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
