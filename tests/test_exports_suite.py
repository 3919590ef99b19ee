"""Export-suite depth tests: S-rate CSV + PDF report, convergence
history/animation, and per-gene observed-vs-predicted time series
(reference global_model/export.py:146-1634)."""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded from the <5-min smoke run

from phoskintime_tpu.io.export import (
    create_convergence_video,
    export_S_rates,
    plot_s_rates_report,
    process_convergence_history,
    save_all_gene_timeseries,
    save_gene_timeseries_plots,
)
from phoskintime_tpu.network import (
    GlobalSystem,
    build_kinase_matrix,
    build_topology,
    default_params,
)

GRID = np.array([0.0, 1.0, 4.0, 8.0, 16.0, 60.0, 120.0])


def small_system(model=0):
    inter = pd.DataFrame({
        "protein": ["GA", "GA", "GB", "KIN1"],
        "psite": ["S10", "T20", "S5", "S99"],
        "kinase": ["KIN1", "KIN2", "KIN1", "KIN2"],
    })
    tf = pd.DataFrame({"tf": ["GA", "GB"], "target": ["GB", "GA"]})
    topo = build_topology(inter, tf, model=model)
    Kmat = build_kinase_matrix(topo.kinases, None, GRID)
    Kmat = Kmat * (1.0 + 0.2 * np.arange(len(GRID))[None, :])
    return GlobalSystem(topo, GRID, Kmat)


class TestSRates:
    def test_long_format_values(self, tmp_path):
        sys = small_system()
        params = default_params(sys.topo)
        params["c_k"] = np.array([2.0, 0.5])
        df = export_S_rates(sys, params, str(tmp_path))
        assert os.path.exists(tmp_path / "S_rates_picked.csv")
        assert set(df.columns) == {"protein", "psite", "time", "S"}
        assert len(df) == sys.topo.total_sites * len(GRID)
        # oracle: S = sum_k W[n,s,k] * Kmat[k,t] * c_k for one site
        topo = sys.topo
        i = topo.p2i["GA"]
        s = topo.sites[i].index("S10")
        expect = (np.asarray(topo.W_pad)[i, s]
                  @ (np.asarray(sys.Kmat) * params["c_k"][:, None]))
        got = df[(df.protein == "GA") & (df.psite == "S10")]["S"].to_numpy()
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_wide_format(self, tmp_path):
        sys = small_system()
        df = export_S_rates(sys, default_params(sys.topo), str(tmp_path),
                            filename="S_wide.csv", long=False)
        assert df.shape == (sys.topo.total_sites, 2 + len(GRID))
        assert list(df.columns[:2]) == ["protein", "psite"]

    def test_pdf_report(self, tmp_path):
        sys = small_system()
        export_S_rates(sys, default_params(sys.topo), str(tmp_path))
        out = plot_s_rates_report(tmp_path / "S_rates_picked.csv",
                                  tmp_path / "S_rates_report.pdf")
        assert os.path.getsize(out) > 5000  # multi-page, non-trivial


class TestConvergenceHistory:
    def _history(self, n_gen=12):
        rng = np.random.default_rng(0)
        hist, pop = [], []
        for g in range(1, n_gen + 1):
            F = np.abs(rng.normal(1.0 / g, 0.1, size=(20, 3))) + 1e-3
            hist.append((g, F.min(axis=0), F.mean(axis=0)))
            pop.append((g, F))
        return hist, pop

    def test_history_csv_and_plot(self, tmp_path):
        hist, _ = self._history()
        df = process_convergence_history(hist, str(tmp_path))
        assert list(df.columns) == ["gen", "min_prot_mse", "min_rna_mse",
                                    "min_phos_mse"]
        assert len(df) == 12
        assert os.path.exists(tmp_path / "convergence_history.csv")
        assert os.path.getsize(tmp_path / "convergence_plot.png") > 5000

    def test_empty_history_is_noop(self, tmp_path):
        assert process_convergence_history([], str(tmp_path)) is None

    def test_video_gif_fallback(self, tmp_path):
        _, pop = self._history(8)
        pareto_F = pop[-1][1][:5]
        out = create_convergence_video(pop, pareto_F, str(tmp_path),
                                       max_frames=6, dpi=60)
        # no ffmpeg in the image -> pillow GIF fallback
        assert out.endswith((".mp4", ".gif"))
        assert os.path.getsize(out) > 10000


class TestGeneTimeseries:
    def _frames(self):
        t = GRID
        obs_p = pd.DataFrame({"protein": "GA", "time": t,
                              "fc": 1 + 0.1 * t / t.max()})
        pre_p = obs_p.rename(columns={"fc": "pred_fc"}).assign(
            pred_fc=lambda d: d.pred_fc * 1.02)
        obs_r = obs_p.copy()
        pre_r = pre_p.copy()
        rows = []
        for ps in ["S10", "T20"]:
            for tt in t:
                rows.append(("GA", ps, tt, 1.0 + 0.05 * tt / t.max()))
        obs_ph = pd.DataFrame(rows, columns=["protein", "psite", "time", "fc"])
        pre_ph = obs_ph.rename(columns={"fc": "pred_fc"})
        return obs_p, pre_p, obs_r, pre_r, obs_ph, pre_ph

    def test_three_panel_per_psite(self, tmp_path):
        out = save_gene_timeseries_plots("GA", *self._frames(), str(tmp_path))
        assert out is not None and os.path.getsize(out) > 10000

    def test_mean_mode_and_missing_gene(self, tmp_path):
        frames = self._frames()
        out = save_gene_timeseries_plots("GA", *frames, str(tmp_path),
                                         phos_mode="mean")
        assert out is not None
        assert save_gene_timeseries_plots("NOPE", *frames,
                                          str(tmp_path)) is None

    def test_save_all(self, tmp_path):
        paths = save_all_gene_timeseries(*self._frames(), str(tmp_path))
        assert len(paths) == 1 and paths[0].endswith("ts_GA.png")


class TestScanPriorReg:
    def test_scan_semantics(self, tmp_path):
        from phoskintime_tpu.io.export import scan_prior_reg

        rng = np.random.default_rng(0)
        F = np.abs(rng.normal(1.0, 0.5, (12, 3))) + 0.01
        np.save(tmp_path / "pareto_F.npy", F)
        df, uniq, rec = scan_prior_reg(str(tmp_path))
        assert len(df) == 9 ** 4
        assert os.path.exists(tmp_path / "lambda_scan.csv")
        assert os.path.exists(tmp_path / "lambda_scan_unique_picks.csv")
        assert os.path.exists(tmp_path / "lambda_scan_recommended.json")
        # oracle: re-derive one combo's pick directly
        row = df.iloc[1234]
        score = (row.lambda_prot * F[:, 0] + row.lambda_rna * F[:, 1]
                 + row.lambda_phospho * F[:, 2])
        assert int(row.best_i) == int(np.argmin(score))
        # lambda_prior must not change the pick
        g = df.groupby(["lambda_prot", "lambda_rna", "lambda_phospho"])
        assert (g["best_i"].nunique() == 1).all()
        assert rec["best_i"] in set(uniq["best_i"])


class TestParetoTrajectoriesGOF:
    def test_export_and_gof(self, tmp_path):
        from phoskintime_tpu.io.export import (export_pareto_trajectories,
                                               plot_gof_solutions)
        from phoskintime_tpu.io.load import read_table
        from phoskintime_tpu.network import init_raw_params
        from phoskintime_tpu.network.bounds import calculate_bio_bounds
        from phoskintime_tpu.network import default_params

        sys = small_system()
        topo = sys.topo
        defaults = default_params(topo, np.float32)
        bounds = {k: (1e-3, 4.0) for k in
                  ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i",
                   "tf_scale"]}
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
        rng = np.random.default_rng(0)
        X = theta0[None] + 0.1 * rng.normal(size=(4, len(theta0)))

        path = str(tmp_path / "pareto_trajectories.xlsx")
        export_pareto_trajectories(sys, slices, X, (GRID, GRID), path,
                                   top_idx=[0, 2])
        tp = read_table(path, sheet_name="traj_protein")
        assert set(tp["sol_id"]) == {0, 2}
        assert {"protein", "time", "pred_fc"} <= set(tp.columns)
        assert np.isfinite(tp["pred_fc"]).all()

        tr = read_table(path, sheet_name="traj_rna")
        tph = read_table(path, sheet_name="traj_phospho")
        obs_p = tp[tp.sol_id == 0][["protein", "time"]].assign(
            fc=1.0 + 0.05 * np.arange(len(tp[tp.sol_id == 0])))
        obs_r = tr[tr.sol_id == 0][["protein", "time"]].assign(fc=1.0)
        obs_ph = tph[tph.sol_id == 0][["protein", "psite", "time"]].assign(
            fc=1.0)
        paths = plot_gof_solutions(tp, tr, tph, obs_p, obs_r, obs_ph,
                                   str(tmp_path / "gof"))
        assert len(paths) == 2
        assert all(os.path.getsize(p) > 10000 for p in paths)


class TestParetoInteractive:
    def test_explorer_from_frames(self, tmp_path):
        import json

        from phoskintime_tpu.io.export import export_pareto_trajectories
        from phoskintime_tpu.io.load import read_table
        from phoskintime_tpu.network import default_params, init_raw_params
        from phoskintime_tpu.report.interactive import (
            pareto_explorer_from_frames)

        sys = small_system()
        defaults = default_params(sys.topo, np.float32)
        bounds = {k: (1e-3, 4.0) for k in
                  ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i",
                   "tf_scale"]}
        theta0, slices, *_ = init_raw_params(defaults, sys.topo, bounds)
        rng = np.random.default_rng(0)
        X = theta0[None] + 0.1 * rng.normal(size=(4, len(theta0)))
        F = np.abs(rng.normal(1, 0.3, (4, 3)))

        path = str(tmp_path / "pareto_trajectories.xlsx")
        export_pareto_trajectories(sys, slices, X, (GRID, GRID), path,
                                   top_idx=[0, 2])
        tp = read_table(path, sheet_name="traj_protein")
        tr = read_table(path, sheet_name="traj_rna")
        tph = read_table(path, sheet_name="traj_phospho")
        obs_p = pd.DataFrame({"protein": "GA", "time": GRID,
                              "fc": 1.0 + 0.1 * GRID / GRID.max()})
        out = pareto_explorer_from_frames(
            str(tmp_path / "pareto_interactive.html"), F, 0, tp, tr, tph,
            obs_p, None, None)
        html_text = open(out).read()
        assert "__PARETODATA__" in html_text
        data = json.loads(html_text.split("window.__PARETODATA__ = ", 1)[1]
                          .split(";</script>", 1)[0])
        assert len(data["F"]) == 4
        assert set(data["sols"]) == {"0", "2"}
        n_curves = len(data["curve_names"])
        assert all(len(data["sols"][k]) == n_curves for k in data["sols"])
        # GA protein curve carries the observed points
        gi = data["curve_names"].index("GA (protein)")
        assert data["obs"][gi] is not None and len(data["obs"][gi]) == len(GRID)


class TestSchematics:
    """Optimization-network schematics (reference
    scripts/make_kinopt_diagram.py): six figures + the data-driven
    fitted-network diagram."""

    def test_render_all(self, tmp_path):
        from phoskintime_tpu.report.schematic import render_all_schematics

        paths = render_all_schematics(tmp_path, kin_psites=2, tf_psites=2)
        assert sorted(paths) == ["global_constraints", "global_diagram",
                                 "kinopt_constraints", "kinopt_diagram",
                                 "tfopt_constraints", "tfopt_diagram"]
        for p in paths.values():
            assert os.path.getsize(p) > 10_000   # real rendered figure

    def test_fitted_network(self, tmp_path):
        from phoskintime_tpu.report.schematic import fitted_network_schematic

        rng = np.random.default_rng(0)
        rows = [(g, s, k, float(rng.normal(0.3, 0.4)))
                for g in ["GA", "GB"] for s in ["S1", "T2"]
                for k in ["K1", "K2", "K3"]]
        alpha = pd.DataFrame(rows,
                             columns=["Gene", "Psite", "Kinase", "Alpha"])
        beta = pd.DataFrame({"Kinase": ["K1", "K2", "K3"],
                             "Psite": ["", "", ""],
                             "Beta": [0.5, 0.3, 0.2]})
        out = fitted_network_schematic(alpha, beta,
                                       str(tmp_path / "fitted.png"),
                                       top_edges=8)
        assert os.path.getsize(out) > 10_000
        # top-N filter drops the weakest edges loudly (title annotation),
        # never errors on an empty beta sheet
        out2 = fitted_network_schematic(
            alpha, beta.iloc[:0], str(tmp_path / "fitted2.png"),
            top_edges=4)
        assert os.path.getsize(out2) > 10_000
