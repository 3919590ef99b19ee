"""End-to-end global-fit, Morris, TPE, refinement and analysis tests."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded from the <5-min smoke run

from phoskintime_tpu.network import (
    GlobalSystem,
    build_kinase_matrix,
    build_topology,
    default_params,
    init_raw_params,
    prepare_loss_data,
    simulate_and_measure,
    unpack_params,
)
from phoskintime_tpu.network.analysis import kinase_dominance, simulate_until_steady
from phoskintime_tpu.network.optimize import (
    create_multistart_population,
    get_refined_bounds,
    run_global_fit,
)
from phoskintime_tpu.network.sensitivity import run_sensitivity_analysis
from phoskintime_tpu.ops.morris import compute_bound, morris_analyze, morris_sample
from phoskintime_tpu.ops.tpe import MOTPESampler, run_motpe

GRID = np.array([0.0, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 60.0, 240.0, 960.0])
RNA_GRID = np.array([4.0, 8.0, 16.0, 60.0, 240.0, 960.0])


def tiny_problem(seed=0):
    """2-protein network with synthetic observations from known params."""
    inter = pd.DataFrame({
        "protein": ["GA", "GA", "GB"],
        "psite": ["S1", "S2", "S1"],
        "kinase": ["K1", "K1", "K2"],
    })
    tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})
    topo = build_topology(inter, tf)
    Kmat = build_kinase_matrix(topo.kinases, None, GRID)
    Kmat *= 1.0 + 0.2 * np.sin(np.arange(len(GRID)))[None, :]
    sys = GlobalSystem(topo, GRID, Kmat)

    rng = np.random.default_rng(seed)
    true = default_params(topo)
    for k in ["c_k", "A_i", "B_i", "C_i", "D_i", "E_i"]:
        true[k] = rng.uniform(0.1, 0.6, true[k].shape)
    true["Dp_i"] = rng.uniform(0.2, 1.0, true["Dp_i"].shape) * topo.site_mask()
    true["tf_scale"] = 2.5
    pj = {k: jnp.asarray(v) for k, v in true.items()}

    dfp, dfr, dfph = simulate_and_measure(sys, pj, GRID, RNA_GRID, GRID)
    dfp = dfp.rename(columns={"pred_fc": "fc"})
    dfr = dfr.rename(columns={"pred_fc": "fc"})
    dfph = dfph.rename(columns={"pred_fc": "fc"})
    grid = np.unique(np.concatenate([GRID, RNA_GRID]))
    ld = prepare_loss_data(topo, dfp, dfr, dfph, grid)
    return sys, topo, true, dfp, dfr, dfph, ld, grid


class TestGlobalFit:
    def test_unsga3_reduces_loss_and_picks_solution(self):
        sys, topo, true, dfp, dfr, dfph, ld, grid = tiny_problem()
        defaults = default_params(topo)
        bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
                  "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
                  "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        lambdas = {"protein": 1.0, "rna": 1.0, "phospho": 1.0, "prior": 0.0}

        res = run_global_fit(sys, slices, ld, defaults, lambdas, grid, xl, xu,
                             pop=32, n_gen=12, seed=0, ftol=0.0,
                             frechet_pick=True, df_prot=dfp, df_rna=dfr,
                             df_pho=dfph, t_points=(GRID, RNA_GRID, GRID))
        assert res.pareto_F.shape[1] == 3
        # must improve on the default-parameter objective
        from phoskintime_tpu.network.objective import make_objective
        obj = make_objective(sys, slices, ld, defaults, lambdas, grid)
        F0 = np.asarray(obj(jnp.asarray(theta0)))
        assert res.pareto_F.min(axis=0).sum() < F0.sum()
        assert 0 <= res.best_idx < len(res.pareto_X)
        assert np.all(np.isfinite(res.frechet_scores))

    def test_motpe_backend(self):
        sys, topo, true, dfp, dfr, dfph, ld, grid = tiny_problem()
        defaults = default_params(topo)
        bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
                  "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
                  "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        lambdas = {"protein": 1.0, "rna": 1.0, "phospho": 1.0, "prior": 0.0}
        res = run_global_fit(sys, slices, ld, defaults, lambdas, grid, xl, xu,
                             optimizer="optuna", n_trials=40, seed=1,
                             frechet_pick=False)
        assert len(res.pareto_X) >= 1
        assert np.all(np.isfinite(res.pareto_F))

    def test_callback_early_stop_propagates(self):
        """Regression (round-3 review): run_global_fit's callback wrapper
        must forward the user callback's truthy return so the GA actually
        stops early (the scan's pruning protocol)."""
        sys, topo, true, dfp, dfr, dfph, ld, grid = tiny_problem()
        defaults = default_params(topo)
        bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
                  "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
                  "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        lambdas = {"protein": 1.0, "rna": 1.0, "phospho": 1.0, "prior": 0.0}
        gens_seen = []

        def stop_at_2(gen, X, F):
            gens_seen.append(gen)
            return gen >= 2

        res = run_global_fit(sys, slices, ld, defaults, lambdas, grid, xl,
                             xu, pop=16, n_gen=30, seed=0, ftol=0.0,
                             frechet_pick=False, callback=stop_at_2)
        assert max(gens_seen) <= 3          # stopped right after gen 2
        assert res.history[-1][0] <= 3      # GA really terminated early

    def test_refined_fit_counts_all_evals(self):
        """Regression: after bound-zoom refinement n_evals must sum every
        round, not just the last (review finding, round 2)."""
        sys, topo, true, dfp, dfr, dfph, ld, grid = tiny_problem()
        defaults = default_params(topo)
        bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
                  "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
                  "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        lambdas = {"protein": 1.0, "rna": 1.0, "phospho": 1.0, "prior": 0.0}
        res = run_global_fit(sys, slices, ld, defaults, lambdas, grid, xl, xu,
                             pop=16, n_gen=8, seed=0, ftol=0.0,
                             refine=True, num_refinements=1,
                             frechet_pick=False)
        # main run: 16 x (8+1); refinement round adds at least one 16-batch
        assert res.n_evals > 16 * 9

    def test_refinement_helpers(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(0.4, 0.6, (10, 5))
        xl, xu = np.zeros(5), np.ones(5)
        nl, nu = get_refined_bounds(X, xl, xu, padding=0.2)
        assert np.all(nl >= xl) and np.all(nu <= xu)
        assert np.all(nl < nu)
        pop = create_multistart_population(X, 20, nl, nu, rng)
        assert pop.shape == (20, 5)
        assert np.all(pop >= nl - 1e-12) and np.all(pop <= nu + 1e-12)


class TestMorris:
    def test_linear_model_effects(self):
        # Y = 5 x0 + 1 x1 + 0 x2 -> mu* ranks follow coefficients
        bounds = np.array([[0.0, 1.0]] * 3)
        rng = np.random.default_rng(0)
        X = morris_sample(bounds, 50, 8, rng)
        assert X.shape == (50 * 4, 3)
        assert X.min() >= 0 and X.max() <= 1
        Y = 5 * X[:, 0] + 1 * X[:, 1]
        res = morris_analyze(bounds, X, Y, 8)
        np.testing.assert_allclose(res.mu_star, [5.0, 1.0, 0.0], atol=1e-8)
        np.testing.assert_allclose(res.sigma, 0.0, atol=1e-8)

    def test_interaction_raises_sigma(self):
        bounds = np.array([[0.0, 1.0]] * 2)
        rng = np.random.default_rng(1)
        X = morris_sample(bounds, 80, 8, rng)
        Y = X[:, 0] * X[:, 1]  # pure interaction
        res = morris_analyze(bounds, X, Y, 8)
        assert res.sigma[0] > 0.1 and res.sigma[1] > 0.1

    def test_compute_bound(self):
        assert compute_bound(2.0, 0.5) == (1.0, 3.0)
        assert compute_bound(0.0, 0.5) == (0.0, 0.1)
        lb, ub = compute_bound(-1.0, 0.5)
        assert lb >= 0.0 and ub > lb  # negative values clamped at 0


class TestTPE:
    def test_motpe_improves_over_random(self):
        def f(X):
            X = np.atleast_2d(X)
            f1 = ((X - 0.2) ** 2).sum(axis=1)
            f2 = ((X - 0.8) ** 2).sum(axis=1)
            return np.stack([f1, f2], axis=1)

        pX, pF, sampler = run_motpe(f, np.zeros(3), np.ones(3),
                                    n_trials=120, batch_size=10, seed=0)
        # Pareto set should lie near the segment between 0.2 and 0.8
        assert len(pX) >= 3
        assert np.all(pX.mean(axis=0) > 0.05) and np.all(pX.mean(axis=0) < 0.95)
        # state round-trip
        st = sampler.state_dict()
        s2 = MOTPESampler(np.zeros(3), np.ones(3))
        s2.load_state_dict(st)
        assert len(s2.X) == len(sampler.X)

    def test_rejects_nonfinite(self):
        s = MOTPESampler(np.zeros(2), np.ones(2))
        s.tell(np.array([0.5, 0.5]), np.array([np.inf, 1.0]))
        assert len(s.X) == 0


class TestAnalysisAndSensitivity:
    def test_steady_state_report(self):
        sys, topo, true, *_ = tiny_problem()
        pj = {k: jnp.asarray(v) for k, v in true.items()}
        rep = simulate_until_steady(sys, pj, n_points=40, rtol=1e-6, atol=1e-8)
        assert rep.tot.shape[1] == topo.N
        assert np.all(np.isfinite(rep.final_rate))
        dom = kinase_dominance(sys, true)
        assert dom.shape == (topo.N, topo.K)
        np.testing.assert_allclose(dom.sum(axis=1)[topo.n_sites > 0], 1.0,
                                   rtol=1e-9)

    def test_global_morris_runs(self):
        sys, topo, true, dfp, dfr, dfph, ld, grid = tiny_problem()
        defaults = default_params(topo)
        bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
                  "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
                  "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        out = run_sensitivity_analysis(sys, slices, theta0, grid,
                                       n_trajectories=4, num_levels=6,
                                       top_curves=3)
        assert out.morris.mu_star.shape == (len(theta0),)
        assert np.all(np.isfinite(out.morris.mu_star))
        assert out.fc_clouds["protein"].shape[0] == 3


class TestDenseLossPath:
    """The dense masked-tensor loss (round 4) must agree with the gather
    path exactly and fall back to gathers on duplicate observation keys."""

    def _setup(self):
        sys, topo, true, dfp, dfr, dfph, ld, grid = tiny_problem()
        defaults = default_params(topo)
        bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
                  "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
                  "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        lambdas = {"protein": 1.0, "rna": 1.0, "phospho": 1.0, "prior": 0.1}
        return sys, topo, ld, grid, defaults, theta0, slices, lambdas

    def test_dense_equals_gather(self, monkeypatch):
        import phoskintime_tpu.network.objective as objmod

        sys, topo, ld, grid, defaults, theta0, slices, lambdas = self._setup()
        dense = objmod._dense_loss_tensors(ld, len(grid), topo.N,
                                           topo.max_sites)
        assert dense is not None
        thetas = jnp.asarray(
            theta0[None]
            + 0.05 * np.random.default_rng(0).normal(size=(8, len(theta0))))
        F_dense = np.asarray(objmod.make_population_objective(
            sys, slices, ld, defaults, lambdas, grid)(thetas))
        monkeypatch.setattr(objmod, "_dense_loss_tensors",
                            lambda *a, **k: None)
        F_gather = np.asarray(objmod.make_population_objective(
            sys, slices, ld, defaults, lambdas, grid)(thetas))
        np.testing.assert_allclose(F_dense, F_gather, rtol=5e-6)

    def test_duplicate_keys_fall_back(self):
        from phoskintime_tpu.network.objective import _dense_loss_tensors

        sys, topo, ld, grid, *_ = self._setup()
        dup = ld._replace(
            t_prot=np.concatenate([np.asarray(ld.t_prot),
                                   np.asarray(ld.t_prot[:1])]),
            p_prot=np.concatenate([np.asarray(ld.p_prot),
                                   np.asarray(ld.p_prot[:1])]),
            obs_prot=np.concatenate([np.asarray(ld.obs_prot),
                                     np.asarray(ld.obs_prot[:1])]),
            w_prot=np.concatenate([np.asarray(ld.w_prot),
                                   np.asarray(ld.w_prot[:1])]))
        assert _dense_loss_tensors(dup, len(grid), topo.N,
                                   topo.max_sites) is None
