"""Tests for less-exercised paths: hyperparameter scan, mechanism
comparison, global knockouts, plotter methods, io utils."""

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from phoskintime_tpu.network import (
    GlobalSystem,
    build_kinase_matrix,
    build_topology,
    default_params,
    init_raw_params,
    prepare_loss_data,
    simulate_and_measure,
)

GRID = np.array([0.0, 1.0, 4.0, 16.0, 60.0, 240.0, 960.0])
RNA_GRID = np.array([4.0, 16.0, 60.0, 240.0, 960.0])


@pytest.fixture(scope="module")
def tiny():
    inter = pd.DataFrame({"protein": ["GA", "GB"], "psite": ["S1", "S1"],
                          "kinase": ["K1", "K1"]})
    tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})
    topo = build_topology(inter, tf)
    Kmat = build_kinase_matrix(topo.kinases, None, GRID)
    sys_ = GlobalSystem(topo, GRID, Kmat)
    pj = {k: jnp.asarray(v) for k, v in default_params(topo).items()}
    dfp, dfr, dfph = simulate_and_measure(sys_, pj, GRID, RNA_GRID, GRID)
    dfp = dfp.rename(columns={"pred_fc": "fc"})
    dfr = dfr.rename(columns={"pred_fc": "fc"})
    dfph = dfph.rename(columns={"pred_fc": "fc"})
    grid = np.unique(np.concatenate([GRID, RNA_GRID]))
    ld = prepare_loss_data(topo, dfp, dfr, dfph, grid)
    return sys_, topo, dfp, dfr, dfph, ld, grid


class TestHyperparameterScan:
    def test_front_score_single_weighting(self):
        """Trial scores must NOT re-apply the lambdas: make_objective
        already multiplies each component by its lambda, so the aggregate
        is a plain row-sum (double weighting biased the scan toward small
        lambdas — round-3 review finding)."""
        from phoskintime_tpu.network.scan import _weighted_score

        F = np.array([[3.0, 1.0, 1.0], [1.0, 1.0, 1.0], [2.0, 2.0, 5.0]])
        s, i = _weighted_score(F)
        assert i == 1 and s == pytest.approx(3.0)

    @pytest.mark.slow
    def test_scan_returns_best(self, tiny):
        from phoskintime_tpu.network.scan import run_hyperparameter_scan

        sys_, topo, dfp, dfr, dfph, ld, grid = tiny
        defaults = default_params(topo)
        bounds = {k: (1e-3, 4.0) for k in
                  ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i",
                   "tf_scale"]}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        best, trials = run_hyperparameter_scan(
            sys_, slices, ld, defaults, grid, xl, xu,
            n_outer=3, inner_gens=3, inner_pop=12, seed=0)
        assert set(best) == {"protein", "rna", "phospho", "prior"}
        assert len(trials) == 3
        assert all(np.isfinite(s) for _, s in trials)


class TestMechanismComparison:
    def test_compare(self, tiny):
        from phoskintime_tpu.analysis.mechanisms import compare_mechanisms

        sys_, topo, dfp, dfr, dfph, ld, grid = tiny
        inter = pd.DataFrame({"protein": ["GA", "GB"], "psite": ["S1", "S1"],
                              "kinase": ["K1", "K1"]})
        tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})

        def ld_fn(topo2):
            return prepare_loss_data(topo2, dfp, dfr, dfph, grid)

        cmp_ = compare_mechanisms(inter, tf, dfp, dfr, dfph, ld_fn,
                                  grid=grid, tp=(GRID, RNA_GRID, GRID),
                                  models=(0, 1))
        assert set(cmp_.losses) == {0, 1}
        assert cmp_.best_model in (0, 1)
        for m, (p, r, ph) in cmp_.trajectories.items():
            assert len(p) > 0

    def test_knockout_scan_global(self, tiny):
        from phoskintime_tpu.analysis.mechanisms import knockout_scan_global

        sys_, topo, *_ = tiny
        params = default_params(topo)
        out = knockout_scan_global(
            sys_, params,
            [{"kinase": "K1", "factor": 0.0},
             {"protein": "GA", "param": "A_i", "factor": 0.0},
             {"site": ("GA", "S1"), "factor": 0.0}],
            GRID, RNA_GRID, GRID)
        assert len(out) == 3
        for dfp_ko, dfr_ko, dfph_ko in out:
            assert np.isfinite(dfp_ko["pred_fc"]).all()


class TestPlotterMethods:
    def test_remaining_methods(self, tiny, tmp_path):
        from phoskintime_tpu.report.plotter import Plotter

        rng = np.random.default_rng(0)
        pl = Plotter("GENE", str(tmp_path))
        t = GRID
        sol = np.abs(rng.normal(1, 0.2, (len(t), 4)))
        samples = np.abs(rng.normal(1, 0.3, (30, 6)))
        assert os.path.exists(pl.plot_tsne(samples))
        k, ev = pl.plot_scree(samples)
        assert 1 <= k <= samples.shape[1]
        assert os.path.getsize(tmp_path / "GENE_scree_plot.png") > 5000
        assert os.path.exists(pl.plot_error_summary({"mse": 0.1, "mae": 0.2}))
        assert os.path.exists(pl.plot_perturbation_cloud(
            t, np.abs(rng.normal(1, 0.2, (5, len(t), 4))), sol))

    def test_param_series_and_profiles(self, tmp_path):
        from phoskintime_tpu.report.plotter import Plotter

        rng = np.random.default_rng(1)
        pl = Plotter("GENE", str(tmp_path))
        t = GRID
        est = np.abs(rng.normal(1, 0.3, (len(t), 5)))
        p = pl.plot_param_series(est, ["A", "B", "C", "D", "S1"], t)
        assert os.path.getsize(p) > 5000
        df = pd.DataFrame(est, columns=["A", "B", "C", "D", "S1"])
        df["Time"] = t
        p = pl.plot_profiles(df)
        assert os.path.getsize(p) > 5000

    def test_param_scatter_and_heatmap(self, tmp_path):
        from phoskintime_tpu.report.plotter import Plotter

        rng = np.random.default_rng(2)
        pl = Plotter("GENE", str(tmp_path))
        t = GRID
        est = np.abs(rng.normal(1, 0.3, (len(t), 6)))  # A B C D S1 S2
        paths = pl.plot_param_scatter(est, 2, t)
        assert len(paths) == 8  # scatter + density for A, B, C, D
        for p in paths:
            assert os.path.getsize(p) > 5000
        df = pd.DataFrame(np.abs(rng.normal(1, 0.3, (5, 6))))
        df.insert(0, "Protein", [f"G{i}" for i in range(5)])
        p = pl.plot_heatmap(df)
        assert os.path.getsize(p) > 5000

    def test_top_param_pairs(self, tmp_path):
        from phoskintime_tpu.report.plotter import Plotter

        rng = np.random.default_rng(3)
        pl = Plotter("GENE", str(tmp_path))
        a = rng.normal(1, 0.3, 40)
        pert = {"GENE": pd.DataFrame({"A": a, "B": 2 * a + rng.normal(0, 0.05, 40),
                                      "C": rng.normal(1, 0.3, 40),
                                      "RMSE": rng.uniform(0, 1, 40)})}
        paths = pl.plot_top_param_pairs(pert, max_pairs_per_gene=2)
        assert len(paths) == 2
        # strongest-correlated pair (A, B) must come first
        assert "A_vs_B" in paths[0]
        for p in paths:
            assert os.path.getsize(p) > 5000

    def test_future_fit_and_future_times(self, tmp_path):
        from phoskintime_tpu.fit.score import future_times
        from phoskintime_tpu.report.plotter import Plotter

        t = np.asarray(
            [0.0, 0.5, 0.75, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 60.0, 120.0,
             240.0, 480.0, 960.0])
        ext = future_times(3, tp=t)
        assert len(ext) == len(t) + 3
        # each new interval = previous interval * (960/480)
        assert ext[-1] == pytest.approx(960.0 * 8)
        assert np.allclose(ext[: len(t)], t)

        rng = np.random.default_rng(4)
        pl = Plotter("GENE", str(tmp_path))
        n_sites = 2
        sol = np.abs(rng.normal(1, 0.2, (len(ext), 2 + n_sites)))
        P_data = np.abs(rng.normal(1, 0.2, (n_sites, len(t))))
        R_data = np.abs(rng.normal(1, 0.2, 9))
        rna_t = np.asarray([4.0, 8.0, 15.0, 30.0, 60.0, 120.0, 240.0,
                            480.0, 960.0])
        p = pl.plot_future_fit(P_data, R_data, sol, n_sites, ["S1", "S2"],
                               ext, rna_time_points=rna_t)
        assert os.path.getsize(p) > 5000

    def test_regularization_and_error_bars(self, tmp_path):
        from phoskintime_tpu.report.plotter import Plotter

        pl = Plotter("ALL", str(tmp_path))
        df = pd.DataFrame({"gene": ["G1", "G2", "G3"],
                           "error": [0.3, 0.1, 0.2],
                           "reg_term": [1.5, 0.5, 1.0]})
        p1 = pl.plot_regularization(df, model_name="distributive")
        p2 = pl.plot_model_error(df, model_name="distributive")
        assert os.path.getsize(p1) > 5000 and os.path.getsize(p2) > 5000
        # workbook-path form (CSV fallback schema)
        csv = tmp_path / "res_results.csv"
        df.to_csv(csv, index=False)
        assert pl.plot_model_error(str(csv)) is not None
        # missing column -> graceful None
        assert pl.plot_model_error(pd.DataFrame({"gene": ["G"]})) is None

    def test_latex_report(self, tmp_path):
        from phoskintime_tpu.report.latexit import (dataframe_to_latex,
                                                    write_latex_report)

        df = pd.DataFrame({"gene": ["A_1", "B%"], "err": [0.1, 0.2]})
        tex = dataframe_to_latex(df, caption="fit errors & stats")
        assert r"\_" in tex and r"\%" in tex and r"\&" in tex
        path = write_latex_report(str(tmp_path), {"t": df}, [])
        assert os.path.exists(path)


class TestIOUtils:
    def test_merge_obs_est(self):
        from phoskintime_tpu.io.utils import merge_obs_est

        obs = pd.DataFrame({"protein": ["A", "A"], "time": [0.0, 1.0],
                            "fc": [1.0, 2.0]})
        est = pd.DataFrame({"protein": ["A", "A"], "time": [0.0, 1.0],
                            "pred_fc": [1.1, 1.9]})
        m = merge_obs_est(obs, est)
        np.testing.assert_allclose(m["residual"], [-0.1, 0.1])

    def test_organize(self, tmp_path):
        from phoskintime_tpu.io.utils import organize_output_files

        (tmp_path / "a.png").write_bytes(b"x")
        (tmp_path / "b.csv").write_text("x")
        (tmp_path / "report.html").write_text("x")
        moved = organize_output_files(str(tmp_path))
        assert "a.png" in moved and "b.csv" in moved
        assert (tmp_path / "figures" / "a.png").exists()
        assert (tmp_path / "report.html").exists()  # untouched


class TestSolverVariants:
    def test_network_esdirk_matches_rk45(self, tiny):
        from phoskintime_tpu.network.simulate import simulate

        sys_, topo, *_ = tiny
        pj = {k: jnp.asarray(v) for k, v in default_params(topo).items()}
        r1 = simulate(sys_, pj, jnp.asarray(GRID), rtol=1e-8, atol=1e-10,
                      max_steps=100000)
        r2 = simulate(sys_, pj, jnp.asarray(GRID), rtol=1e-8, atol=1e-10,
                      max_steps=100000, solver="esdirk")
        assert bool(r1.success) and bool(r2.success)
        np.testing.assert_allclose(np.asarray(r2.ys), np.asarray(r1.ys),
                                   rtol=1e-5, atol=1e-7)

    def test_objective_solver_expo_single(self, tiny):
        from phoskintime_tpu.network.objective import make_objective

        sys_, topo, dfp, dfr, dfph, ld, grid = tiny
        defaults = default_params(topo)
        bounds = {k: (1e-3, 4.0) for k in
                  ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i",
                   "tf_scale"]}
        theta0, slices, *_ = init_raw_params(defaults, topo, bounds)
        lam = {"protein": 1.0, "rna": 1.0, "phospho": 1.0, "prior": 0.0}
        F_rk = np.asarray(make_objective(sys_, slices, ld, defaults, lam,
                                         grid)(jnp.asarray(theta0)))
        F_ex = np.asarray(make_objective(sys_, slices, ld, defaults, lam,
                                         grid, solver="expo")(jnp.asarray(theta0)))
        np.testing.assert_allclose(F_ex, F_rk, rtol=1e-3, atol=1e-6)


@pytest.mark.slow
class TestCLIEvol:
    def test_kinopt_tfopt_evol_modes(self, tmp_path):
        import pandas as pd
        from phoskintime_tpu.cli import main as cli_main

        rng = np.random.default_rng(0)
        root = tmp_path
        data = root / "data"
        data.mkdir()
        (root / "config.toml").write_text("""
[paths]
data_dir = "data"
[tfopt]
loss_type = 0
[tfopt.modes.evol]
optimizer = 0
[kinopt]
loss_type = "base"
[kinopt.modes.evol]
method = "DE"
""")

        def wide(genes, psites, n=14):
            d = {"GeneID": genes, "Psite": psites}
            for i in range(1, n + 1):
                d[f"x{i}"] = rng.uniform(0.5, 2.0, len(genes))
            return pd.DataFrame(d)

        wide(["GA", "GA", "KIN1", "KIN1"],
             ["", "S_1", "", "S_9"]).to_csv(data / "input1.csv", index=False)
        pd.DataFrame({"GeneID": ["GA"], "Psite": ["S_1"],
                      "Kinase": ["{KIN1}"]}).to_csv(data / "input2.csv",
                                                    index=False)
        wide(["GA", "KIN1"], ["", ""], n=9).drop(columns=["Psite"]).to_csv(
            data / "input3.csv", index=False)
        pd.DataFrame({"Source": ["KIN1"], "Target": ["GA"]}).to_csv(
            data / "input4.csv", index=False)

        cwd = os.getcwd()
        os.chdir(root)
        try:
            cli_main(["kinopt", "--mode", "evol"])
            cli_main(["tfopt", "--mode", "evol"])
        finally:
            os.chdir(cwd)
        assert any(f.startswith("kinopt_results") for f in os.listdir(data))
        assert any(f.startswith("tfopt_results") for f in os.listdir(data))


class TestMechanisticInsights:
    def test_full_discovery(self, tiny, tmp_path):
        from phoskintime_tpu.analysis.insights import run_mechanistic_discovery

        sys_, topo, *_ = tiny
        tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})
        params = {k: jnp.asarray(v)
                  for k, v in __import__(
                      "phoskintime_tpu.network", fromlist=["default_params"]
                  ).default_params(topo).items()}
        tables = run_mechanistic_discovery(sys_, params, tf,
                                           out_dir=str(tmp_path))
        assert set(tables) == {"1_refractory_period", "2_kinetic_lag",
                               "3_saturation", "4_feedback_gain"}
        ref = tables["1_refractory_period"]
        assert set(ref["protein"]) == set(topo.proteins)
        assert np.all(np.isfinite(ref["flash_index"]))
        assert len(list(tmp_path.iterdir())) > 0

    def test_kinetic_lag_recovers_known_shift(self):
        from phoskintime_tpu.analysis.insights import kinetic_lag

        t = np.linspace(0, 120, 61)
        rna_sig = 1.0 + np.exp(-0.5 * ((t - 30) / 8.0) ** 2)
        prot_sig = 1.0 + np.exp(-0.5 * ((t - 50) / 8.0) ** 2)  # 20 min later
        dfr = pd.DataFrame({"protein": "GX", "time": t, "pred_fc": rna_sig})
        dfp = pd.DataFrame({"protein": "GX", "time": t, "pred_fc": prot_sig})
        out = kinetic_lag(dfp, dfr, t)
        assert len(out) == 1
        assert out["lag_minutes"].iloc[0] == pytest.approx(20.0, abs=2.0)

    def test_feedback_gain_loop_detected(self, tiny):
        from phoskintime_tpu.analysis.insights import feedback_gain
        from phoskintime_tpu.network import default_params

        sys_, topo, *_ = tiny
        params = default_params(topo)
        # K1 is a kinase; if it is also a protein target of a TF edge and
        # phosphorylates the TF, a loop exists. Build that df_tf directly.
        df_tf = pd.DataFrame({"tf": ["GA"], "target": ["K1"]})
        out = feedback_gain(topo, params, df_tf)
        # K1 is not a modeled protein in the tiny fixture -> no loop rows,
        # but the frame must have the schema
        assert list(out.columns) == ["tf", "kinase", "loop_gain",
                                     "efficacy_alpha", "signaling_beta"]


class TestThermalVariant:
    def test_standard_limit_matches_base_model(self, tiny):
        """At T far below every Tm, f -> 1 and the thermal system must
        reproduce the standard trajectories."""
        from phoskintime_tpu.analysis.thermal import thermalize
        from phoskintime_tpu.network import default_params
        from phoskintime_tpu.network.simulate import simulate

        sys_, topo, *_ = tiny
        params = {k: jnp.asarray(v) for k, v in default_params(topo).items()}
        sys_T, p_T = thermalize(sys_, params, T=0.0,
                                Tm_i=np.full(topo.N, 40.0))
        t = jnp.asarray(GRID)
        r0 = simulate(sys_, params, t)
        rT = simulate(sys_T, {k: jnp.asarray(v) for k, v in p_T.items()}, t)
        np.testing.assert_allclose(np.asarray(rT.ys), np.asarray(r0.ys),
                                   rtol=1e-5, atol=1e-7)

    def test_heat_shock_reduces_protein(self, tiny, tmp_path):
        """Above Tm, faster clearance + slower phospho-flux must lower the
        late total-protein signal; comparison figure is written."""
        from phoskintime_tpu.analysis.thermal import compare_thermal_standard
        from phoskintime_tpu.network import default_params

        sys_, topo, *_ = tiny
        params = default_params(topo)
        out = compare_thermal_standard(sys_, params,
                                       Tm_i=np.full(topo.N, 40.0),
                                       t_eval=np.linspace(0, 240, 25),
                                       out_dir=str(tmp_path))
        cold = out["standard_20C"][0]
        hot = out["heat_shock_42C"][0]
        assert hot["pred_fc"].iloc[-1] < cold["pred_fc"].iloc[-1]
        assert (tmp_path / "thermal_comparison.png").exists()

    def test_expo_path_valid_for_thermal_system(self, tiny):
        """The thermal transform keeps the RHS affine-per-bucket: the
        exponential fast path must agree with RK45 on the thermal system."""
        from phoskintime_tpu.analysis.thermal import thermalize
        from phoskintime_tpu.network import default_params
        from phoskintime_tpu.network.expo import exponential_simulate
        from phoskintime_tpu.network.simulate import simulate

        sys_, topo, *_ = tiny
        params = {k: jnp.asarray(v) for k, v in default_params(topo).items()}
        sys_T, p_T = thermalize(sys_, params, T=39.0,
                                Tm_i=np.full(topo.N, 40.0))
        p_T = {k: jnp.asarray(v) for k, v in p_T.items()}
        t = jnp.asarray(GRID)
        ref = simulate(sys_T, p_T, t, rtol=1e-9, atol=1e-11,
                       max_steps=200000)
        res = exponential_simulate(sys_T, p_T, GRID)
        err = np.max(np.abs(np.asarray(res.ys) - np.asarray(ref.ys)) /
                     (np.abs(np.asarray(ref.ys)) + 1e-8))
        assert err < 1e-3


@pytest.mark.slow
class TestScanDepth:
    """Round-3 scan features: real pruning, components, resume, report
    (reference global_model/scan.py:62-332)."""

    def _setup(self, tiny):
        from phoskintime_tpu.network import default_params as dp
        from phoskintime_tpu.network import init_raw_params as irp

        sys_, topo, dfp, dfr, dfph, ld, grid = tiny
        defaults = dp(topo)
        bounds = {k: (1e-3, 4.0) for k in
                  ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i",
                   "tf_scale"]}
        theta0, slices, xl, xu = irp(defaults, topo, bounds)
        return sys_, slices, ld, defaults, grid, xl, xu

    def test_pruning_accounting_and_report(self, tiny, tmp_path):
        from phoskintime_tpu.network.scan import run_hyperparameter_scan

        sys_, slices, ld, defaults, grid, xl, xu = self._setup(tiny)
        out_dir = str(tmp_path / "scan")
        # prune_factor 0 => any post-startup trial whose report exceeds 0 x
        # median is cut at its first reporting step (gen_step=2)
        best, trials = run_hyperparameter_scan(
            sys_, slices, ld, defaults, grid, xl, xu,
            n_outer=4, inner_gens=6, inner_pop=12, seed=0,
            gen_step=2, n_startup_prune=2, prune_factor=0.0,
            out_dir=out_dir)
        states = [t.state for t in trials]
        assert states.count("pruned") >= 1
        pruned = [t for t in trials if t.state == "pruned"]
        # a pruned trial actually STOPPED early (fewer gens than budget)
        assert all(t.n_gen < 6 for t in pruned)
        # every trial carries intermediate reports + components
        assert all(t.intermediate for t in trials)
        done = [t for t in trials if t.state == "complete"]
        assert all(t.components is not None and len(t.components) == 3
                   for t in done)
        # best comes from completed trials only
        assert best in [t.lambdas for t in done]
        # report artifacts
        assert os.path.exists(os.path.join(out_dir, "optimization_history.png"))
        files = os.listdir(out_dir)
        assert any(f.startswith("scan_results") for f in files)
        # tuple-unpacking compatibility
        for lams, score in trials:
            assert set(lams) == {"protein", "rna", "phospho", "prior"}
            assert np.isfinite(score)

    def test_resume_from_checkpoint(self, tiny, tmp_path):
        from phoskintime_tpu.network.scan import run_hyperparameter_scan

        sys_, slices, ld, defaults, grid, xl, xu = self._setup(tiny)
        ck = str(tmp_path / "scan_state.json")
        _, t1 = run_hyperparameter_scan(
            sys_, slices, ld, defaults, grid, xl, xu,
            n_outer=2, inner_gens=2, inner_pop=12, seed=0,
            checkpoint_path=ck)
        assert len(t1) == 2 and os.path.exists(ck)
        # resume: asks for 2 MORE trials only (first 2 loaded from disk)
        _, t2 = run_hyperparameter_scan(
            sys_, slices, ld, defaults, grid, xl, xu,
            n_outer=4, inner_gens=2, inner_pop=12, seed=0,
            checkpoint_path=ck)
        assert len(t2) == 4
        assert [t.lambdas for t in t2[:2]] == [t.lambdas for t in t1]


@pytest.mark.slow
class TestMechanismSelection:
    """Round-3 model-selection pipeline: fit all mechanisms on the same
    data, AIC/BIC table + artifacts (reference scripts/compare_mechanisms.py)."""

    def test_fit_all_mechanisms(self, tiny, tmp_path):
        from phoskintime_tpu.analysis.mechanisms import fit_all_mechanisms

        sys_, topo, dfp, dfr, dfph, ld, grid = tiny
        inter = pd.DataFrame({"protein": ["GA", "GB"], "psite": ["S1", "S1"],
                              "kinase": ["K1", "K1"]})
        tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})
        out_dir = str(tmp_path / "mech")
        sel = fit_all_mechanisms(
            inter, tf, dfp, dfr, dfph, (GRID, RNA_GRID, GRID),
            models=(0, 4), pop=8, n_gen=2, seed=0, out_dir=out_dir)

        t = sel.table
        assert set(t["model"]) == {0, 4}
        for col in ["aic", "bic", "aicc", "r2", "n_params", "n_obs",
                    "delta_aic", "akaike_weight"]:
            assert col in t.columns
        # AIC-sorted, weights sum to 1, best is the table's first row
        assert (t["aic"].diff().dropna() >= 0).all()
        assert t["akaike_weight"].sum() == pytest.approx(1.0)
        assert sel.best_model == int(t.iloc[0]["model"])
        assert np.isfinite(t[["aic", "bic", "r2"]].to_numpy(float)).all()
        # per-model fitted trajectories present
        assert set(sel.trajectories) == {0, 4}
        # artifacts
        assert os.path.exists(os.path.join(out_dir,
                                           "mechanism_selection.html"))
        assert os.path.exists(os.path.join(out_dir, "overlay_protein.png"))
        # the table workbook path(s) reported by the writer exist
        tbl = sel.paths["table"]
        for p in (tbl if isinstance(tbl, (list, tuple)) else [tbl]):
            assert os.path.exists(p)

    def test_fit_all_mechanisms_filters_and_grids(self, tiny):
        """Round-3 review regressions: (a) observed proteins absent from
        the topology are filtered like the runner does (not a ValueError),
        (b) the solver grid unions the PHOSPHO timepoints too,
        (c) loss_mode is forwarded to the per-mechanism fits."""
        from phoskintime_tpu.analysis.mechanisms import fit_all_mechanisms

        sys_, topo, dfp, dfr, dfph, ld, grid = tiny
        inter = pd.DataFrame({"protein": ["GA", "GB"], "psite": ["S1", "S1"],
                              "kinase": ["K1", "K1"]})
        tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})
        # a measured protein with no kinase-network edges (the normal case
        # the runner filters for)
        extra = pd.DataFrame({"protein": ["ZZ"], "time": [1.0], "fc": [1.2]})
        dfp2 = pd.concat([dfp, extra], ignore_index=True)
        dfr2 = pd.concat([dfr, extra], ignore_index=True)
        # phospho timepoints NOT a subset of the protein/RNA grids
        tp_p, tp_r = GRID[:3], RNA_GRID[:2]
        tp_ph = np.array([0.0, 1.0, 4.0, 60.0])       # 60 only via tp_ph
        dfp3 = dfp2[dfp2["time"].isin(tp_p) | (dfp2["protein"] == "ZZ")]
        dfr3 = dfr2[dfr2["time"].isin(tp_r) | (dfr2["protein"] == "ZZ")]
        dfph3 = dfph[dfph["time"].isin(tp_ph)]
        sel = fit_all_mechanisms(inter, tf, dfp3, dfr3, dfph3,
                                 (tp_p, tp_r, tp_ph),
                                 models=(0,), pop=8, n_gen=2, seed=0,
                                 loss_mode=1)
        assert np.isfinite(sel.table["aic"]).all()
