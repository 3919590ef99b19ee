"""Optimizer tests on standard benchmark problems (ZDT1, DTLZ2, sphere)."""

import numpy as np
import pytest

from phoskintime_tpu.ops.nsga import (
    crowding_distance,
    das_dennis,
    fast_non_dominated_sort,
    lhs_sampling,
    run_de,
    run_nsga2,
    run_unsga3,
)


class TestPrimitives:
    def test_das_dennis_count_and_sum(self):
        rd = das_dennis(3, 20)
        assert rd.shape == (231, 3)  # C(22, 2)
        np.testing.assert_allclose(rd.sum(axis=1), 1.0, rtol=1e-12)
        assert np.all(rd >= 0)

    def test_non_dominated_sort(self):
        F = np.array([[1.0, 1.0], [2.0, 2.0], [0.5, 3.0], [3.0, 0.5], [2.5, 2.5]])
        fronts = fast_non_dominated_sort(F)
        assert sorted(fronts[0].tolist()) == [0, 2, 3]
        assert sorted(fronts[1].tolist()) == [1]
        assert sorted(fronts[2].tolist()) == [4]

    def test_crowding_boundary_infinite(self):
        F = np.array([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
        cd = crowding_distance(F)
        assert np.isinf(cd[0]) and np.isinf(cd[2])
        assert np.isfinite(cd[1])

    def test_lhs_stratified(self):
        rng = np.random.default_rng(0)
        X = lhs_sampling(100, np.zeros(2), np.ones(2), rng)
        # one sample per decile per dim
        for j in range(2):
            counts, _ = np.histogram(X[:, j], bins=10, range=(0, 1))
            assert np.all(counts == 10)


def zdt1(X):
    f1 = X[:, 0]
    g = 1 + 9 * X[:, 1:].mean(axis=1)
    f2 = g * (1 - np.sqrt(f1 / g))
    return np.stack([f1, f2], axis=1)


def dtlz2(X, n_obj=3):
    k = X.shape[1] - n_obj + 1
    g = ((X[:, -k:] - 0.5) ** 2).sum(axis=1)
    F = np.empty((len(X), n_obj))
    for i in range(n_obj):
        f = 1 + g
        for j in range(n_obj - 1 - i):
            f = f * np.cos(X[:, j] * np.pi / 2)
        if i > 0:
            f = f * np.sin(X[:, n_obj - 1 - i] * np.pi / 2)
        F[:, i] = f
    return F


class TestAlgorithms:
    def test_nsga2_zdt1(self):
        res = run_nsga2(zdt1, np.zeros(8), np.ones(8), pop_size=80, n_gen=120,
                        seed=1)
        # Pareto front of ZDT1: f2 = 1 - sqrt(f1); mean deviation small
        f1, f2 = res.pareto_F[:, 0], res.pareto_F[:, 1]
        dev = np.abs(f2 - (1 - np.sqrt(np.clip(f1, 0, 1)))).mean()
        assert dev < 0.05
        assert len(res.pareto_F) > 10

    def test_unsga3_dtlz2(self):
        res = run_unsga3(dtlz2, np.zeros(7), np.ones(7), pop_size=92,
                         n_gen=150, n_obj=3, n_partitions=12, seed=2,
                         ftol=0.0, n_max_evals=None)
        # DTLZ2 front: ||F|| = 1
        norms = np.linalg.norm(res.pareto_F, axis=1)
        assert np.abs(norms - 1).mean() < 0.05
        # diverse spread across the sphere octant
        assert res.pareto_F.shape[0] > 30

    def test_unsga3_ftol_early_stop(self):
        # constant objective -> terminates after the ftol window
        const = lambda X: np.tile([1.0, 2.0, 3.0], (len(X), 1))
        res = run_unsga3(const, np.zeros(4), np.ones(4), pop_size=24,
                         n_gen=500, n_partitions=6, seed=3,
                         ftol=0.0025, ftol_period=10)
        assert res.n_gen <= 12

    def test_de_sphere(self):
        sphere = lambda X: (X ** 2).sum(axis=1)
        res = run_de(sphere, -np.ones(6) * 5, np.ones(6) * 5, pop_size=60,
                     n_gen=200, seed=4)
        assert float(res.pareto_F[0, 0]) < 1e-6

    def test_de_with_constraints(self):
        sphere = lambda X: ((X - 2.0) ** 2).sum(axis=1)
        # constraint: sum(x) <= 1  ->  g = sum(x) - 1 <= 0
        con = lambda X: (X.sum(axis=1) - 1.0)[:, None]
        res = run_de(sphere, -np.ones(3) * 5, np.ones(3) * 5, pop_size=60,
                     n_gen=300, seed=5, constraint_fn=con)
        x = res.pareto_X[0]
        assert x.sum() <= 1.0 + 1e-6
        # optimum on the constraint boundary: x_i = 1/3
        np.testing.assert_allclose(x, 1 / 3, atol=0.05)

    def test_warm_start(self):
        sphere3 = lambda X: np.stack([((X - c) ** 2).sum(axis=1)
                                      for c in (0.0, 0.5, 1.0)], axis=1)
        x0 = np.full((20, 4), 0.5)
        res = run_unsga3(sphere3, np.zeros(4), np.ones(4), pop_size=20,
                         n_gen=5, n_partitions=4, seed=6, x0=x0, ftol=0.0)
        assert res.n_evals >= 20 * 6


class TestHypervolume:
    def test_single_point(self):
        from phoskintime_tpu.ops.nsga import hv3d

        # one point at origin-ish, ref (1,1,1): volume of its dominated box
        assert hv3d(np.array([[0.2, 0.3, 0.4]]), np.ones(3)) == pytest.approx(
            0.8 * 0.7 * 0.6)

    def test_union_vs_monte_carlo(self):
        from phoskintime_tpu.ops.nsga import hv3d

        rng = np.random.default_rng(0)
        F = rng.uniform(0, 1, (12, 3))
        ref = np.ones(3)
        got = hv3d(F, ref)
        pts = rng.uniform(0, 1, (200_000, 3))
        dominated = np.any(np.all(pts[:, None, :] >= F[None], axis=2), axis=1)
        mc = dominated.mean()
        assert got == pytest.approx(mc, abs=0.01)

    def test_contributions_sum_and_order(self):
        from phoskintime_tpu.ops.nsga import hv3d, hv_contributions_3d

        # three mutually non-dominated points
        F = np.array([[0.1, 0.5, 0.5], [0.5, 0.1, 0.5], [0.5, 0.5, 0.1]])
        ref = np.ones(3)
        c = hv_contributions_3d(F, ref)
        assert np.all(c > 0)
        # removing any one point loses exactly its contribution
        for i in range(3):
            assert hv3d(np.delete(F, i, 0), ref) == pytest.approx(
                hv3d(F, ref) - c[i])

    def test_dominated_point_contributes_nothing(self):
        from phoskintime_tpu.ops.nsga import hv_contributions_3d

        F = np.array([[0.2, 0.2, 0.2], [0.5, 0.5, 0.5]])
        c = hv_contributions_3d(F, np.ones(3))
        assert c[1] == pytest.approx(0.0, abs=1e-12)


class TestSMSEMOAandAGEMOEA:
    def test_smsemoa_steady_state_dtlz2(self):
        from phoskintime_tpu.ops.nsga import run_smsemoa

        res = run_smsemoa(dtlz2, np.zeros(7), np.ones(7), pop_size=60,
                          n_gen=1500, n_offsprings=1, seed=2)
        norms = np.linalg.norm(res.pareto_F, axis=1)
        assert np.abs(norms - 1).mean() < 0.12
        assert res.n_evals == 60 + 1500  # steady state: one eval per iter

    def test_smsemoa_generational_dtlz2(self):
        from phoskintime_tpu.ops.nsga import run_smsemoa

        res = run_smsemoa(dtlz2, np.zeros(7), np.ones(7), pop_size=48,
                          n_gen=60, seed=2)
        norms = np.linalg.norm(res.pareto_F, axis=1)
        assert np.abs(norms - 1).mean() < 0.06
        assert res.n_evals == 48 + 48 * 60  # pymoo parity: pop offspring/gen

    def test_agemoea_dtlz2(self):
        from phoskintime_tpu.ops.nsga import run_agemoea

        res = run_agemoea(dtlz2, np.zeros(7), np.ones(7), pop_size=80,
                          n_gen=120, seed=3)
        norms = np.linalg.norm(res.pareto_F, axis=1)
        assert np.abs(norms - 1).mean() < 0.06
        assert res.pareto_F.shape[0] > 20

    def test_hv3d_matches_general_indicator(self):
        from phoskintime_tpu.ops.indicators import hypervolume
        from phoskintime_tpu.ops.nsga import hv3d

        rng = np.random.default_rng(3)
        F = rng.uniform(0, 1, (15, 3))
        ref = np.array([1.2, 1.1, 1.3])
        assert hv3d(F, ref) == pytest.approx(hypervolume(F, ref), rel=1e-10)


class TestDuplicateMask:
    def test_f32_clone_of_f64_parent_detected(self):
        """Regression: SBX emits f32 offspring; an f64-keyed dup check
        never matches a cloned parent (review finding, round 2)."""
        from phoskintime_tpu.ops.nsga import _duplicate_mask

        rng = np.random.default_rng(0)
        X = rng.random((10, 50))                    # f64 population
        off = X[:3].astype(np.float32)              # exact f32 clones
        off = np.vstack([off, rng.random((2, 50)).astype(np.float32)])
        dup = _duplicate_mask(off, X)
        assert dup.tolist() == [True, True, True, False, False]

    def test_native_contributions_match_python(self):
        from phoskintime_tpu.native import hv3d_contrib_native
        from phoskintime_tpu.ops.nsga import hv3d

        rng = np.random.default_rng(5)
        F = rng.uniform(0, 1, (60, 3))
        ref = np.ones(3) * 1.1
        native = hv3d_contrib_native(F, ref)
        if native is None:
            pytest.skip("native library unavailable")
        total = hv3d(F, ref)
        py = np.array([total - hv3d(np.delete(F, i, 0), ref)
                       for i in range(len(F))])
        np.testing.assert_allclose(native, py, atol=1e-12)
