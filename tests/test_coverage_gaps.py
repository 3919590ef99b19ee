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
        assert os.path.exists(pl.plot_error_summary({"mse": 0.1, "mae": 0.2}))
        assert os.path.exists(pl.plot_perturbation_cloud(
            t, np.abs(rng.normal(1, 0.2, (5, len(t), 4))), sol))

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
