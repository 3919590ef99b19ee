"""Tridiagonal (Thomas) solver — vectorized and batched.

Spec: reference ``global_model/steadystate.py:362-394`` uses a Python Thomas
algorithm for the sequential-model steady state. Here the forward/backward
sweeps are ``lax.scan``s, and a batch of independent chains (one per protein
or per optimizer candidate) vmaps into one program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-300


def thomas_solve(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                 d: jnp.ndarray) -> jnp.ndarray:
    """Solve a tridiagonal system: a=lower (a[0] ignored), b=main,
    c=upper (c[-1] ignored), d=rhs. All shape (n,)."""
    def safe(x):
        return jnp.where(jnp.abs(x) < _TINY, jnp.where(x < 0, -_TINY, _TINY), x)

    denom0 = safe(b[0])
    cp0 = c[0] / denom0
    dp0 = d[0] / denom0

    def fwd(carry, x):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = x
        denom = safe(bi - ai * cp_prev)
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    _, (cps, dps) = jax.lax.scan(fwd, (cp0, dp0), (a[1:], b[1:], c[1:], d[1:]))
    cp = jnp.concatenate([cp0[None], cps])
    dp = jnp.concatenate([dp0[None], dps])

    def bwd(x_next, z):
        cpi, dpi = z
        x = dpi - cpi * x_next
        return x, x

    _, xs_rev = jax.lax.scan(bwd, dp[-1], (cp[:-1][::-1], dp[:-1][::-1]))
    return jnp.concatenate([xs_rev[::-1], dp[-1][None]])


thomas_solve_batched = jax.vmap(thomas_solve, in_axes=(0, 0, 0, 0))
