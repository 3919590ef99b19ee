"""ESDIRK stiff-solver tests: accuracy, stiffness robustness, vmap safety."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import odeint as scipy_odeint

from phoskintime_tpu.ops.integrators import odeint_rk45
from phoskintime_tpu.ops.stiff import odeint_esdirk


class TestESDIRK:
    def test_exponential_decay(self):
        rhs = lambda t, y: -y
        res = odeint_esdirk(rhs, jnp.array([1.0]), jnp.array([0.5, 1.0, 2.0]),
                            rtol=1e-8, atol=1e-10)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.ys[:, 0]),
                                   np.exp(-np.array([0.5, 1.0, 2.0])),
                                   rtol=1e-6)

    def test_stiff_robertson_like(self):
        # classic stiff system with rate ratio 1e4
        def rhs(t, y):
            return jnp.array([
                -1e4 * y[0] + 1e4 * y[1],
                y[0] - y[1] - y[1] * y[1],
            ])

        y0 = jnp.array([1.0, 0.0])
        t_eval = jnp.array([0.1, 1.0, 10.0])
        res = odeint_esdirk(rhs, y0, t_eval, rtol=1e-7, atol=1e-9,
                            dt_max=10.0)
        assert bool(res.success)
        ref = scipy_odeint(lambda y, t: [-1e4 * y[0] + 1e4 * y[1],
                                         y[0] - y[1] - y[1] ** 2],
                           np.asarray(y0), np.concatenate([[0], t_eval]),
                           rtol=1e-10, atol=1e-12)[1:]
        np.testing.assert_allclose(np.asarray(res.ys), ref, rtol=1e-4,
                                   atol=1e-7)
        # implicit solver should need FAR fewer steps than explicit RK45
        res_exp = odeint_rk45(rhs, y0, t_eval, rtol=1e-7, atol=1e-9,
                              dt_max=10.0, max_steps=200_000)
        assert int(res.n_steps) < int(res_exp.n_steps) / 10

    def test_bucketed_input(self):
        grid = jnp.array([0.0, 1.0, 2.5])
        vals = jnp.array([1.0, -0.5, 2.0])
        rhs = lambda t, y, jb: jnp.array([vals[jnp.clip(jb, 0, 2)]]) - 0.0 * y
        res = odeint_esdirk(rhs, jnp.zeros(1), jnp.array([1.0, 2.0, 3.0]),
                            boundaries=grid, rtol=1e-9, atol=1e-11)
        assert bool(res.success)
        expected = np.array([1.0, 0.5, 0.25 + 0.5 * 2.0])
        np.testing.assert_allclose(np.asarray(res.ys[:, 0]), expected,
                                   rtol=1e-6, atol=1e-8)

    def test_vmap(self):
        ks = jnp.array([1.0, 100.0, 10000.0])

        def solve_one(k):
            rhs = lambda t, y: -k * (y - jnp.cos(t))
            return odeint_esdirk(rhs, jnp.array([0.0]), jnp.array([1.0]),
                                 rtol=1e-7, atol=1e-9).ys[0, 0]

        out = np.asarray(jax.vmap(solve_one)(ks))
        # for large k the solution tracks cos(t)
        assert abs(out[2] - np.cos(1.0)) < 1e-3
        assert np.all(np.isfinite(out))
