"""Implicit stiff integrator: ESDIRK4(3) (Kvaerno-style) with Newton inner
solves — vmap-safe companion to the explicit RK45.

The reference leans on LSODA's implicit BDF mode for stiff regimes
(``global_model/simulate.py:69-79``); LSODA's per-sample method switching
cannot be batched. Following the survey's design (SURVEY.md §7 "Hard
parts"), we instead use a *fixed* L-stable ESDIRK scheme whose adaptive dt
lives per batch lane inside ``lax.while_loop``:

* Kvaerno(4) ESDIRK tableau: stiffly-accurate, L-stable, embedded 3rd-order
  error estimate, FSAL-like first explicit stage.
* Newton inner iterations share one LU factorization of (I - h*gamma*J)
  per step (J via ``jax.jacfwd`` — exact, replacing the reference's
  finite-difference Jacobians in ``jacspeedup.py:397-588``).
* Dense output by cubic Hermite, bucket boundaries handled exactly as in
  :mod:`phoskintime_tpu.ops.integrators`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from phoskintime_tpu.ops.integrators import ODEResult, _hermite

# Kvaerno 4/3 ESDIRK tableau (gamma = 0.4358665215)
_G = 0.435866521508459
_C = (0.0, 2 * _G, 1.0, 1.0)
_A = (
    (0.0, 0.0, 0.0, 0.0),
    (_G, _G, 0.0, 0.0),
    (0.490563388419108, 0.073570090080892, _G, 0.0),
    (0.308809969973036, 1.490563388254106, -1.235239879727145, _G),
)
_B = (0.308809969973036, 1.490563388254106, -1.235239879727145, _G)       # 3rd/stiffly acc
_BHAT = (0.490563388419108, 0.073570090080892, _G, 0.0)                   # embedded
_E = tuple(b - bh for b, bh in zip(_B, _BHAT))
_ORDER = 3.0

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 5.0
_NEWTON_ITERS = 6


def odeint_esdirk(
    rhs: Callable,
    y0: jnp.ndarray,
    t_eval: jnp.ndarray,
    boundaries: jnp.ndarray | None = None,
    max_steps: int = 20_000,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    dt0: float = 1e-2,
    dt_min: float = 1e-7,
    dt_max: float = 64.0,
) -> ODEResult:
    """Integrate a stiff system with adaptive ESDIRK4(3).

    Same contract as :func:`odeint_rk45` (rhs takes (t, y) or (t, y, jb)
    when boundaries are given).
    """
    dtype = y0.dtype
    d = y0.shape[0]
    t_eval = t_eval.astype(dtype)
    t0 = jnp.asarray(0.0, dtype)
    t_end = t_eval[-1]
    eye = jnp.eye(d, dtype=dtype)

    if boundaries is None:
        bnds = jnp.asarray([jnp.inf], dtype)
        rhs_b = lambda t, y, jb: rhs(t, y)
        jb0 = jnp.asarray(0, jnp.int32)
    else:
        bnds = jnp.concatenate([boundaries.astype(dtype),
                                jnp.full((1,), jnp.inf, dtype)])
        rhs_b = rhs
        jb0 = jnp.asarray(jnp.clip(jnp.searchsorted(bnds, t0, "right") - 1, 0,
                                   bnds.shape[0] - 1), jnp.int32)

    jac = jax.jacfwd(lambda y, t, jb: rhs_b(t, y, jb))
    f0 = rhs_b(t0, y0, jb0)

    T = t_eval.shape[0]
    ys = jnp.zeros((T, d), dtype)
    ys = jnp.where((t_eval <= t0)[:, None], y0[None, :], ys)

    class Carry(NamedTuple):
        t: jnp.ndarray
        y: jnp.ndarray
        f: jnp.ndarray
        dt: jnp.ndarray
        jb: jnp.ndarray
        ys: jnp.ndarray
        n_steps: jnp.ndarray
        n_acc: jnp.ndarray
        failed: jnp.ndarray

    def cond(c: Carry):
        return (c.t < t_end) & (c.n_steps < max_steps) & (~c.failed)

    def newton_stage(t_s, y_base, k_init, lu, c: Carry, dt):
        """Solve k = f(t_s, y_base + h*g*k) by simplified Newton.
        ``lu`` is the once-per-step LU factorization of M = I - h*g*J —
        each iteration is a back-substitution, not a fresh O(d^3)
        factorization (review: solve(M, r) re-factorized 18x per step)."""
        def body(_, k):
            r = k - rhs_b(t_s, y_base + dt * _G * k, c.jb)
            dk = jax.scipy.linalg.lu_solve(lu, r)
            return k - dk

        return jax.lax.fori_loop(0, _NEWTON_ITERS, body, k_init)

    def body(c: Carry):
        # dt_min floors only the controller's free step — a boundary gap
        # below dt_min integrates over the ACTUAL gap (see integrators.py)
        nb = bnds[jnp.minimum(c.jb + 1, bnds.shape[0] - 1)]
        limit = jnp.minimum(nb, t_end)
        dt_free = jnp.maximum(c.dt, dt_min)
        hit = dt_free >= (limit - c.t)
        dt = jnp.where(hit, limit - c.t, dt_free)
        t_new = jnp.where(hit, limit, c.t + dt)

        J = jac(c.y, c.t, c.jb)
        M = eye - dt * _G * J  # shared Newton matrix for all implicit stages
        lu = jax.scipy.linalg.lu_factor(M)  # ONE factorization per step

        k1 = c.f  # explicit first stage
        ks = [k1]
        for i in range(1, 4):
            t_s = c.t + _C[i] * dt
            y_base = c.y + dt * sum(_A[i][j] * ks[j] for j in range(i))
            k_guess = ks[-1]
            ks.append(newton_stage(t_s, y_base, k_guess, lu, c, dt))

        y_new = c.y + dt * sum(_B[i] * ks[i] for i in range(4))
        err_vec = dt * sum(_E[i] * ks[i] for i in range(4))
        scale = atol + rtol * jnp.maximum(jnp.abs(c.y), jnp.abs(y_new))
        err = jnp.sqrt(jnp.mean((err_vec / scale) ** 2) + 1e-300)

        finite = jnp.all(jnp.isfinite(y_new)) & jnp.isfinite(err)
        accept = (err <= 1.0) & finite

        err_c = jnp.maximum(err, 1e-10)
        factor = jnp.clip(_SAFETY * err_c ** (-1.0 / (_ORDER + 1.0)),
                          _MIN_FACTOR, _MAX_FACTOR)
        factor = jnp.where(accept, factor, jnp.minimum(factor, 1.0))
        factor = jnp.where(finite, factor, _MIN_FACTOR)
        dt_next = jnp.clip(dt * factor, dt_min, dt_max)

        mask = (t_eval > c.t) & (t_eval <= t_new) & accept
        # stiffly accurate: k4 = f(t_new, y_new)
        y_interp = _hermite(t_eval, c.t, t_new, c.y, y_new, c.f, ks[3])
        ys_new = jnp.where(mask[:, None], y_interp, c.ys)

        crossed = accept & hit & (nb <= t_end)
        jb_next = jnp.where(crossed, c.jb + 1, c.jb)
        f_fresh = rhs_b(t_new, y_new, jb_next)
        t_next = jnp.where(accept, t_new, c.t)
        y_next = jnp.where(accept, y_new, c.y)
        f_next = jnp.where(accept, jnp.where(crossed, f_fresh, ks[3]), c.f)

        failed = (~finite) & (dt <= dt_min * 1.0000001)
        return Carry(t_next, y_next, f_next, dt_next, jb_next, ys_new,
                     c.n_steps + 1, c.n_acc + accept.astype(jnp.int32), failed)

    init = Carry(t0, y0, f0, jnp.asarray(dt0, dtype), jb0, ys,
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                 jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, init)
    success = (out.t >= t_end) & (~out.failed) & jnp.all(jnp.isfinite(out.ys))
    return ODEResult(out.ys, success, out.n_steps, out.n_acc)
