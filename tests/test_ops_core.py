"""Unit tests for the core numeric primitives (linear solve, RK45, Thomas, Frechet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import odeint as scipy_odeint

from phoskintime_tpu.ops.frechet import frechet_distance
from phoskintime_tpu.ops.integrators import odeint_rk45
from phoskintime_tpu.ops.linear import solve_lti, solve_lti_batched
from phoskintime_tpu.ops.tridiag import thomas_solve


class TestSolveLTI:
    def test_scalar_decay(self):
        # dy = -2y + 1, y0 = 3 -> y(t) = 0.5 + 2.5 e^{-2t}
        M = jnp.array([[-2.0]])
        b = jnp.array([1.0])
        y0 = jnp.array([3.0])
        t = jnp.array([0.5, 1.0, 2.0, 5.0])
        ys = solve_lti(M, b, y0, t)
        expected = 0.5 + 2.5 * np.exp(-2 * np.asarray(t))
        np.testing.assert_allclose(np.asarray(ys[:, 0]), expected, rtol=1e-10)

    def test_matches_scipy_on_random_system(self):
        rng = np.random.default_rng(0)
        d = 6
        M = -np.eye(d) * 2.0 + rng.normal(0, 0.3, (d, d))
        b = rng.uniform(0.1, 1.0, d)
        y0 = rng.uniform(0.5, 2.0, d)
        t = np.array([0.5, 1.0, 4.0, 30.0, 120.0, 960.0])
        ys = solve_lti(jnp.asarray(M), jnp.asarray(b), jnp.asarray(y0), jnp.asarray(t))
        ref = scipy_odeint(lambda y, _t: M @ y + b, y0, np.concatenate([[0.0], t]),
                           rtol=1e-12, atol=1e-12)[1:]
        np.testing.assert_allclose(np.asarray(ys), ref, rtol=1e-8, atol=1e-10)

    def test_batched(self):
        Ms = jnp.stack([jnp.array([[-1.0]]), jnp.array([[-3.0]])])
        bs = jnp.zeros((2, 1))
        y0s = jnp.ones((2, 1))
        t = jnp.array([1.0])
        ys = solve_lti_batched(Ms, bs, y0s, t)
        np.testing.assert_allclose(np.asarray(ys[:, 0, 0]),
                                   [np.exp(-1.0), np.exp(-3.0)], rtol=1e-10)


class TestRK45:
    def test_exponential_decay(self):
        rhs = lambda t, y: -y
        y0 = jnp.array([1.0, 2.0])
        t_eval = jnp.array([0.0, 0.5, 1.0, 2.0, 4.0])
        res = odeint_rk45(rhs, y0, t_eval, rtol=1e-8, atol=1e-10)
        assert bool(res.success)
        expected = np.outer(np.exp(-np.asarray(t_eval)), np.asarray(y0))
        np.testing.assert_allclose(np.asarray(res.ys), expected, rtol=1e-6)

    def test_nonlinear_vs_scipy(self):
        # van-der-Pol-ish mildly nonlinear system
        def rhs(t, y):
            return jnp.array([y[1], (1 - y[0] ** 2) * y[1] - y[0]])

        y0 = jnp.array([2.0, 0.0])
        t_eval = jnp.linspace(0.0, 10.0, 21)[1:]
        res = odeint_rk45(rhs, y0, t_eval, rtol=1e-9, atol=1e-11, dt_max=10.0)
        assert bool(res.success)
        ref = scipy_odeint(
            lambda y, _t: [y[1], (1 - y[0] ** 2) * y[1] - y[0]],
            np.asarray(y0), np.concatenate([[0.0], np.asarray(t_eval)]),
            rtol=1e-11, atol=1e-13)[1:]
        np.testing.assert_allclose(np.asarray(res.ys), ref, rtol=1e-5, atol=1e-7)

    def test_bucketed_input(self):
        # dy = k(t), k piecewise-constant: exact integral must be recovered
        grid = jnp.array([0.0, 1.0, 2.5, 4.0])
        vals = jnp.array([1.0, -2.0, 0.5, 3.0])

        def rhs(t, y, jb):
            return jnp.array([vals[jnp.clip(jb, 0, 3)]])

        t_eval = jnp.array([1.0, 2.0, 2.5, 3.0, 5.0])
        res = odeint_rk45(rhs, jnp.array([0.0]), t_eval, boundaries=grid,
                          rtol=1e-10, atol=1e-12, dt_max=10.0)
        assert bool(res.success)
        # exact: cumulative piecewise-linear integral
        expected = np.array([1.0,                      # t=1
                             1.0 - 2.0,                # t=2: 1 + (-2)*1
                             1.0 - 3.0,                # t=2.5
                             1.0 - 3.0 + 0.5 * 0.5,    # t=3
                             1.0 - 3.0 + 0.5 * 1.5 + 3.0 * 1.0])  # t=5
        np.testing.assert_allclose(np.asarray(res.ys[:, 0]), expected, rtol=1e-8, atol=1e-9)

    def test_vmap_over_params(self):
        ks = jnp.array([0.5, 1.0, 2.0, 4.0])

        def solve_one(k):
            rhs = lambda t, y: -k * y
            return odeint_rk45(rhs, jnp.array([1.0]), jnp.array([1.0]),
                               rtol=1e-8, atol=1e-10).ys[0, 0]

        out = jax.vmap(solve_one)(ks)
        np.testing.assert_allclose(np.asarray(out), np.exp(-np.asarray(ks)), rtol=1e-6)

    def test_failure_flag_on_blowup(self):
        rhs = lambda t, y: y * y  # finite-time blowup at t=1 for y0=1
        res = odeint_rk45(rhs, jnp.array([1.0]), jnp.array([2.0]),
                          max_steps=2000, rtol=1e-6, atol=1e-8)
        assert not bool(res.success)


class TestThomas:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(1)
        n = 12
        a = rng.normal(0, 1, n); a[0] = 0.0
        c = rng.normal(0, 1, n); c[-1] = 0.0
        b = np.abs(rng.normal(0, 1, n)) + 4.0  # diagonally dominant
        d = rng.normal(0, 1, n)
        A = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
        x = thomas_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, d), rtol=1e-9)


class TestFrechet:
    def test_identical_curves(self):
        c = jnp.asarray(np.random.default_rng(2).normal(0, 1, (10, 2)))
        assert float(frechet_distance(c, c)) == pytest.approx(0.0, abs=1e-12)

    def test_known_value(self):
        # parallel horizontal segments distance 1 apart
        a = jnp.stack([jnp.linspace(0, 1, 5), jnp.zeros(5)], axis=1)
        b = jnp.stack([jnp.linspace(0, 1, 5), jnp.ones(5)], axis=1)
        assert float(frechet_distance(a, b)) == pytest.approx(1.0, abs=1e-12)

    def test_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        A = rng.normal(0, 1, (7, 2))
        B = rng.normal(0, 1, (9, 2))

        def brute(P, Q):
            n, m = len(P), len(Q)
            dist = np.linalg.norm(P[:, None] - Q[None, :], axis=-1)
            cost = np.full((n, m), np.inf)
            cost[0, 0] = dist[0, 0]
            for i in range(1, n):
                cost[i, 0] = max(cost[i - 1, 0], dist[i, 0])
            for j in range(1, m):
                cost[0, j] = max(cost[0, j - 1], dist[0, j])
            for i in range(1, n):
                for j in range(1, m):
                    cost[i, j] = max(min(cost[i - 1, j], cost[i, j - 1],
                                         cost[i - 1, j - 1]), dist[i, j])
            return cost[-1, -1]

        got = float(frechet_distance(jnp.asarray(A), jnp.asarray(B)))
        assert got == pytest.approx(brute(A, B), rel=1e-12)


class TestBoundaryGapRegression:
    """Review repro: a bucket boundary closer than dt_min must integrate
    over the ACTUAL gap — flooring dt while snapping t desynchronized
    state and time by up to dt_min per boundary."""

    def test_rk45_tiny_boundary_gap(self):
        from phoskintime_tpu.ops.integrators import odeint_rk45

        rhs = lambda t, y, jb: jnp.ones_like(y)          # y(t) = t
        bnds = jnp.asarray([0.0, 0.5, 0.5 + 1e-9])
        res = odeint_rk45(rhs, jnp.zeros(1), jnp.asarray([1.0]),
                          boundaries=bnds, dt_min=1e-6)
        assert bool(res.success)
        np.testing.assert_allclose(float(res.ys[-1, 0]), 1.0, atol=1e-8)

    def test_esdirk_tiny_boundary_gap(self):
        from phoskintime_tpu.ops.stiff import odeint_esdirk

        rhs = lambda t, y, jb: jnp.ones_like(y)
        bnds = jnp.asarray([0.0, 0.5, 0.5 + 1e-9])
        res = odeint_esdirk(rhs, jnp.zeros(1), jnp.asarray([1.0]),
                            boundaries=bnds, dt_min=1e-6)
        assert bool(res.success)
        np.testing.assert_allclose(float(res.ys[-1, 0]), 1.0, atol=1e-7)


class TestParzenBandwidths:
    def test_sorted_components_positive_gaps(self):
        """Review repro: prepending the mid-range prior to pre-sorted
        samples produced negative neighbor gaps below mid-range."""
        from phoskintime_tpu.ops.tpe import ParzenEstimator1D

        samples = np.linspace(0.05, 0.45, 9)             # all below prior
        pe = ParzenEstimator1D(samples, 0.0, 1.0)
        assert np.all(np.diff(pe.mus) >= 0)              # sorted
        assert np.all(pe.sigmas > 0)
        # the prior component (mu = 0.5) keeps the full-span bandwidth
        i = int(np.argmin(np.abs(pe.mus - 0.5)))
        assert pe.sigmas[i] == pytest.approx(1.0)
        # interior sample bandwidth equals its neighbor span (0.1), NOT
        # the clip floor — pre-fix, every below-prior sample was floored
        j = int(np.argmin(np.abs(pe.mus - 0.25)))
        assert pe.sigmas[j] == pytest.approx(0.1)
