"""Per-gene kinetic model tests: exact-LTI solutions vs independent scipy
integrations of the published model equations, plus steady-state checks."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import odeint as scipy_odeint

from phoskintime_tpu.models.kinetics import (
    fit_vector,
    initial_condition,
    n_params,
    solve_ode,
    solve_ode_batched,
    state_dim,
    system_matrices_dist,
    system_matrices_rand,
    system_matrices_succ,
)

T = np.array([0.0, 0.5, 0.75, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 60.0, 120.0,
              240.0, 480.0, 960.0])


def dist_rhs_np(y, t, A, B, C, D, S, Dd):
    """Distributive model equations (independent re-derivation of the
    published model: dR=A-BR; dP=CR-(D+sum S)P+sum Pi; dPi=SiP-(1+Di)Pi)."""
    R, P, Ps = y[0], y[1], y[2:]
    dR = A - B * R
    dP = C * R - (D + S.sum()) * P + Ps.sum()
    dPs = S * P - (1 + Dd) * Ps
    return np.concatenate([[dR, dP], dPs])


def succ_rhs_np(y, t, A, B, C, D, S, Dd):
    """Successive chain equations."""
    n = len(S)
    R, P = y[0], y[1]
    dy = np.zeros_like(y)
    dy[0] = A - B * R
    dy[1] = C * R - D * P
    if n > 0:
        dy[1] += -S[0] * P + y[2]
    for i in range(n):
        if n == 1:
            dy[2] = S[0] * P - (1 + Dd[0]) * y[2]
        elif i == 0:
            dy[2] = S[0] * P - (1 + S[1] + Dd[0]) * y[2] + y[3]
        elif i < n - 1:
            dy[2 + i] = S[i] * y[1 + i] - (1 + S[i + 1] + Dd[i]) * y[2 + i] + y[3 + i]
        else:
            dy[2 + i] = S[i] * y[1 + i] - (1 + Dd[i]) * y[2 + i]
    return dy


def rand_rhs_np(y, t, A, B, C, D, S, Ddeg, n):
    """Random bitmask-state equations."""
    m = (1 << n) - 1
    R, P, X = y[0], y[1], y[2:]
    dR = A - B * R
    dP = C * R - D * P
    dX = np.zeros(m)
    for j in range(n):
        rate = S[j] * P
        dX[(1 << j) - 1] += rate
        dP -= rate
    for s in range(1, m + 1):
        xi = X[s - 1]
        for j in range(n):
            bit = 1 << j
            if s & bit:
                lower = s ^ bit
                if lower == 0:
                    dP += xi
                else:
                    dX[lower - 1] += xi
                dX[s - 1] -= xi
            else:
                rate = S[j] * xi
                dX[(s | bit) - 1] += rate
                dX[s - 1] -= rate
        dX[s - 1] -= Ddeg[s - 1] * X[s - 1]
    return np.concatenate([[dR, dP], dX])


class TestDistributive:
    @pytest.mark.parametrize("n", [0, 1, 3])
    def test_vs_scipy(self, n):
        rng = np.random.default_rng(10 + n)
        params = rng.uniform(0.2, 2.0, 4 + 2 * n)
        y0 = rng.uniform(0.5, 1.5, 2 + n)
        A, B, C, D = params[:4]
        S, Dd = params[4:4 + n], params[4 + n:]
        ref = scipy_odeint(dist_rhs_np, y0, T, args=(A, B, C, D, S, Dd),
                           rtol=1e-11, atol=1e-12)
        sol, fit = solve_ode(jnp.asarray(params), jnp.asarray(y0), n,
                             jnp.asarray(T), model="distmod")
        np.testing.assert_allclose(np.asarray(sol), np.clip(ref, 0, None),
                                   rtol=1e-7, atol=1e-9)
        # fit vector layout: [R[5:], P, sites site-major]
        assert fit.shape[0] == (len(T) - 5) + len(T) + n * len(T)

    def test_steady_state_closed_form(self):
        # params = 1: R = 1, P = 1/(1 + n/2), P_i = P/2
        for n in [1, 2, 4]:
            y = np.asarray(initial_condition(n, "distmod"))
            assert y[0] == pytest.approx(1.0, rel=1e-10)
            P = 1.0 / (1.0 + n / 2.0)
            assert y[1] == pytest.approx(P, rel=1e-10)
            np.testing.assert_allclose(y[2:], P / 2.0, rtol=1e-10)

    def test_steady_state_is_equilibrium(self):
        for model in ["distmod", "succmod", "randmod"]:
            n = 3
            y = initial_condition(n, model)
            p = jnp.ones(n_params(model, n))
            builder = {"distmod": system_matrices_dist,
                       "succmod": system_matrices_succ,
                       "randmod": system_matrices_rand}[model]
            M, b = builder(p, n)
            dy = M @ y + b
            np.testing.assert_allclose(np.asarray(dy), 0.0, atol=1e-9)


class TestSuccessive:
    @pytest.mark.parametrize("n", [1, 2, 4])
    def test_vs_scipy(self, n):
        rng = np.random.default_rng(20 + n)
        params = rng.uniform(0.2, 2.0, 4 + 2 * n)
        y0 = rng.uniform(0.5, 1.5, 2 + n)
        A, B, C, D = params[:4]
        S, Dd = params[4:4 + n], params[4 + n:]
        ref = scipy_odeint(succ_rhs_np, y0, T, args=(A, B, C, D, S, Dd),
                           rtol=1e-11, atol=1e-12)
        sol, _ = solve_ode(jnp.asarray(params), jnp.asarray(y0), n,
                           jnp.asarray(T), model="succmod")
        np.testing.assert_allclose(np.asarray(sol), np.clip(ref, 0, None),
                                   rtol=1e-7, atol=1e-9)


class TestRandom:
    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_vs_scipy(self, n):
        rng = np.random.default_rng(30 + n)
        m = (1 << n) - 1
        params = rng.uniform(0.2, 2.0, 4 + n + m)
        y0 = rng.uniform(0.5, 1.5, 2 + m)
        A, B, C, D = params[:4]
        S, Ddeg = params[4:4 + n], params[4 + n:]
        ref = scipy_odeint(rand_rhs_np, y0, T, args=(A, B, C, D, S, Ddeg, n),
                           rtol=1e-11, atol=1e-12)
        sol, _ = solve_ode(jnp.asarray(params), jnp.asarray(y0), n,
                           jnp.asarray(T), model="randmod")
        np.testing.assert_allclose(np.asarray(sol), np.clip(ref, 0, None),
                                   rtol=1e-7, atol=1e-9)

    def test_param_count(self):
        assert n_params("randmod", 3) == 4 + 3 + 7
        assert state_dim("randmod", 3) == 2 + 7
        assert n_params("distmod", 3) == 10


class TestBatched:
    def test_vmap_over_starts(self):
        n = 2
        rng = np.random.default_rng(7)
        batch = jnp.asarray(rng.uniform(0.2, 2.0, (16, 4 + 2 * n)))
        y0 = initial_condition(n, "distmod")
        sols, fits = solve_ode_batched(batch, y0, n, jnp.asarray(T), "distmod")
        assert sols.shape == (16, len(T), 2 + n)
        # each batch element must equal its individual solve
        s0, f0 = solve_ode(batch[3], y0, n, jnp.asarray(T), "distmod")
        np.testing.assert_allclose(np.asarray(sols[3]), np.asarray(s0), rtol=1e-12)

    def test_fit_vector_site_major(self):
        sol = jnp.arange(14 * 4, dtype=jnp.float64).reshape(14, 4)
        fv = fit_vector(sol, 2)
        # sites flattened site-major: site0 all times then site1 all times
        np.testing.assert_allclose(np.asarray(fv[9 + 14:9 + 28]), np.asarray(sol[:, 2]))
        np.testing.assert_allclose(np.asarray(fv[9 + 28:]), np.asarray(sol[:, 3]))
