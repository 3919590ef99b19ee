"""kinopt / tfopt tests: prediction semantics, projection exactness,
recovery of known mixing weights, constraint feasibility, KKT checks."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded from the <5-min smoke run

from phoskintime_tpu.kinopt import (
    KinoptProblem,
    build_problem,
    kinopt_loss,
    kkt_check,
    predict as kin_predict,
)
from phoskintime_tpu.kinopt.optimize import run_evolutionary as kin_evol
from phoskintime_tpu.kinopt.optimize import run_local as kin_local
from phoskintime_tpu.ops.constrained import project_sum_box
from phoskintime_tpu.tfopt import TfoptProblem, predict as tf_predict, tfopt_loss
from phoskintime_tpu.tfopt.optimize import run_evolutionary as tf_evol
from phoskintime_tpu.tfopt.optimize import run_local as tf_local

T = 14


def kin_problem(seed=0):
    """3 sites, 2 kinases with known ground-truth weights."""
    rng = np.random.default_rng(seed)
    K_array = rng.uniform(0.5, 2.0, (4, T))       # 4 source rows
    kinase_rows = [[0, 1], [2, 3]]                # kinase j <- rows
    site_kinases = [[0], [1], [0, 1]]             # site i <- kinases
    beta_true = np.array([[0.7, 0.3], [0.4, 0.6]])
    alpha_true_pad = np.array([[1.0, 0.0], [1.0, 0.0], [0.35, 0.65]])
    signal = np.stack([beta_true[j] @ K_array[kinase_rows[j]] for j in range(2)])
    P_obs = np.stack([
        signal[0],
        signal[1],
        0.35 * signal[0] + 0.65 * signal[1],
    ])
    prob = build_problem(P_obs, site_kinases, kinase_rows, K_array)
    return prob, alpha_true_pad, beta_true


class TestProjection:
    def test_exact_simplex_projection(self):
        y = jnp.asarray([[0.9, 0.8, -0.2], [5.0, 5.0, 5.0]])
        mask = jnp.asarray([[True, True, True], [True, True, False]])
        x = project_sum_box(y, -4.0, 4.0, mask)
        np.testing.assert_allclose(np.asarray(x).sum(axis=1), 1.0, atol=1e-9)
        assert np.all(np.asarray(x) >= -4.0) and np.all(np.asarray(x) <= 4.0)
        assert float(x[1, 2]) == 0.0  # masked slot zeroed

    def test_projection_idempotent(self):
        y = jnp.asarray([[0.2, 0.3, 0.5]])
        mask = jnp.ones((1, 3), bool)
        x = project_sum_box(y, 0.0, 1.0, mask)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-9)


class TestKinopt:
    def test_prediction_semantics(self):
        prob, a_true, b_true = kin_problem()
        pred = kin_predict(prob, jnp.asarray(a_true),
                           jnp.asarray(np.asarray(b_true)))
        np.testing.assert_allclose(np.asarray(pred), prob.P_obs, rtol=1e-12)
        loss = kinopt_loss(prob, jnp.asarray(a_true), jnp.asarray(b_true))
        assert float(loss) == pytest.approx(0.0, abs=1e-20)

    def test_local_recovers_weights(self):
        prob, a_true, b_true = kin_problem()
        res = kin_local(prob, n_starts=16, steps=1500, lr=0.05, seed=0)
        assert res.feasible
        assert res.loss < 1e-4
        np.testing.assert_allclose(res.beta, b_true, atol=0.1)

    def test_evolutionary_de(self):
        prob, *_ = kin_problem()
        res = kin_evol(prob, method="DE", pop_size=60, n_gen=150, seed=1)
        assert res.loss < 1e-2
        assert res.feasible

    def test_evolutionary_nsga2_device_loop(self):
        """gens_per_dispatch>1: the whole NSGA-II loop (crowding survival
        + simplex-projection repair) runs on device."""
        prob, *_ = kin_problem()
        res = kin_evol(prob, method="NSGA-II", n_gen=40, pop_size=48,
                       seed=1, gens_per_dispatch=10)
        assert np.isfinite(res.loss)

    def test_evolutionary_nsga2(self):
        prob, *_ = kin_problem()
        res = kin_evol(prob, method="NSGA-II", pop_size=60, n_gen=120, seed=2)
        assert np.isfinite(res.loss)

    def test_kkt_report(self):
        prob, a_true, b_true = kin_problem()
        res = kin_local(prob, n_starts=8, steps=800, lr=0.05, seed=3)
        loss_fn = lambda a, b: kinopt_loss(prob, a, b)
        rep = kkt_check(prob, res.alpha, res.beta, loss_fn)
        assert rep.primal_feasible
        np.testing.assert_allclose(rep.group_sums_alpha, 1.0, atol=1e-4)
        np.testing.assert_allclose(rep.group_sums_beta, 1.0, atol=1e-4)
        # at an interior optimum the stationarity residual is small
        assert rep.stationarity_residual < 0.05


def tf_problem(seed=0):
    rng = np.random.default_rng(seed)
    n_genes, n_TF, n_reg, n_ps = 4, 3, 2, 2
    protein = rng.uniform(0.5, 2.0, (n_TF, T))
    psites = rng.uniform(0.2, 1.5, (n_TF, n_ps, T))
    num_psites = np.array([2, 1, 0])
    psites[1, 1:] = 0.0
    psites[2, :] = 0.0
    regulators = np.array([[0, 1], [1, 2], [0, 2], [2, -1]])
    beta_true = np.zeros((n_TF, 1 + n_ps))
    beta_true[0] = [0.5, 0.3, 0.2]
    beta_true[1] = [0.6, 0.4, 0.0]
    beta_true[2] = [1.0, 0.0, 0.0]
    alpha_true = np.array([[0.7, 0.3], [0.5, 0.5], [0.4, 0.6], [1.0, 0.0]])
    effect = beta_true[:, :1] * protein + np.einsum("fk,fkt->ft",
                                                    beta_true[:, 1:], psites)
    mRNA = np.zeros((n_genes, T))
    for g in range(n_genes):
        for r in range(n_reg):
            tf = regulators[g, r]
            if tf >= 0:
                mRNA[g] += alpha_true[g, r] * effect[tf]
    prob = TfoptProblem(mRNA, regulators, protein, psites, num_psites)
    return prob, alpha_true, beta_true


class TestTfopt:
    def test_prediction_semantics(self):
        prob, a_true, b_true = tf_problem()
        pred = tf_predict(prob, jnp.asarray(a_true), jnp.asarray(b_true))
        np.testing.assert_allclose(np.asarray(pred), prob.mRNA_mat, rtol=1e-12)
        assert float(tfopt_loss(prob, jnp.asarray(a_true),
                                jnp.asarray(b_true))) == pytest.approx(0.0, abs=1e-20)

    def test_local_fit(self):
        prob, a_true, b_true = tf_problem()
        res = tf_local(prob, n_starts=16, steps=1500, lr=0.05, seed=0)
        assert res.loss < 1e-3
        # per-group sums hold (no-psite TF beta pinned at 1)
        np.testing.assert_allclose(res.beta[prob.no_psite_tf, 0], 1.0, atol=1e-6)

    @pytest.mark.parametrize("loss_type", [1, 2, 3, 4, 5, 6])
    def test_loss_variants_finite(self, loss_type):
        prob, a_true, b_true = tf_problem()
        val = tfopt_loss(prob, jnp.asarray(a_true) + 0.1,
                         jnp.asarray(b_true) + 0.1, loss_type)
        assert np.isfinite(float(val))

    def test_evolutionary(self):
        prob, *_ = tf_problem()
        res = tf_evol(prob, optimizer=0, n_gen=60, pop_size=60, seed=1)
        assert np.isfinite(res.loss)
        av = np.abs((res.alpha * prob.alpha_mask).sum(axis=1) - 1.0)
        has_reg = prob.alpha_mask.sum(axis=1) > 0
        assert av[has_reg].max() < 0.2  # evol path approaches feasibility

    def test_evolutionary_device_loop(self):
        """gens_per_dispatch>1 routes through the all-device GA loop
        with the same objective and comparable quality."""
        prob, *_ = tf_problem()
        res = tf_evol(prob, optimizer=0, n_gen=60, pop_size=60, seed=1,
                      gens_per_dispatch=10)
        assert np.isfinite(res.loss)
        av = np.abs((res.alpha * prob.alpha_mask).sum(axis=1) - 1.0)
        has_reg = prob.alpha_mask.sum(axis=1) > 0
        assert av[has_reg].max() < 0.2

    @pytest.mark.parametrize("optimizer", [1, 2])
    def test_smsemoa_agemoea_codes(self, optimizer):
        """Reference optimizer codes 1 (SMS-EMOA) / 2 (AGE-MOEA) run their
        real algorithms (tfopt/evol/opt/optrun.py:57-59)."""
        prob, *_ = tf_problem()
        res = tf_evol(prob, optimizer=optimizer, n_gen=120, pop_size=40,
                      seed=1)
        assert np.isfinite(res.loss)
        av = np.abs((res.alpha * prob.alpha_mask).sum(axis=1) - 1.0)
        has_reg = prob.alpha_mask.sum(axis=1) > 0
        assert av[has_reg].max() < 0.5


class TestKinoptLossVariants:
    @pytest.mark.parametrize("loss_type", ["base", "weighted", "softl1",
                                           "cauchy", "arctan", "huber",
                                           "mape", "autocorrelation"])
    def test_all_losses_finite_and_zero_at_truth(self, loss_type):
        prob, a_true, b_true = kin_problem()
        at, bt = jnp.asarray(a_true), jnp.asarray(b_true)
        v0 = float(kinopt_loss(prob, at, bt, loss_type))
        assert np.isfinite(v0)
        if loss_type != "autocorrelation":
            assert v0 == pytest.approx(0.0, abs=1e-12)
            v1 = float(kinopt_loss(prob, at + 0.1, bt, loss_type))
            assert v1 > v0


class TestFitAnalysisPanels:
    def test_kinopt_full_panel_suite(self, tmp_path):
        import os

        from phoskintime_tpu.analysis.fitpanels import kinopt_fit_analysis

        prob, a_true, b_true = kin_problem()
        res = kin_local(prob, n_starts=4, steps=200, seed=0)
        out = kinopt_fit_analysis(prob, res, str(tmp_path))
        # reference postfit.py panel set
        for f in ["Goodness_of_Fit.png", "kld.png", "PCA.png",
                  "distribution_parameters.png", "boxplot_parameters.png",
                  "cdf_parameters.png", "violin_parameters.png",
                  "time_residuals.png", "variance_residuals.png",
                  "error_trends.png", "residual_profiles.png",
                  "important_connections.png"]:
            assert os.path.getsize(tmp_path / f) > 500, f
        assert os.path.getsize(tmp_path / "important_connections.csv") > 50
        html = open(out["sankey"]).read()
        assert "<svg" in html and "path" in html
        # ribbons carry the kinase -> substrate flows
        assert "K" in html and "→" in html

    def test_tfopt_full_panel_suite(self, tmp_path):
        import os

        from phoskintime_tpu.analysis.fitpanels import tfopt_fit_analysis

        prob, a_true, b_true = tf_problem()
        res = tf_local(prob, n_starts=4, steps=200, seed=0)
        out = tfopt_fit_analysis(prob, res, str(tmp_path))
        for f in ["Goodness_of_Fit.png", "kld.png", "PCA.png",
                  "time_residuals.png", "network_sankey.html"]:
            assert os.path.getsize(tmp_path / f) > 500, f
        # per-mRNA alpha strips + per-TF beta bars (tfopt helper.py:46-135)
        assert len(out["alpha_strips"]) == prob.n_genes
        assert len(out["beta_bars"]) == prob.n_TF
        for p in out["alpha_strips"] + out["beta_bars"]:
            assert os.path.getsize(p) > 500


class TestResultApps:
    def test_kinopt_app(self, tmp_path):
        from phoskintime_tpu.report import render_kinopt_app

        prob, a_true, b_true = kin_problem()
        res = kin_local(prob, n_starts=4, steps=150, seed=0)
        path = render_kinopt_app(prob, res, str(tmp_path))
        html = open(path).read()
        assert "Kinase network readout" in html
        assert "Knockout preview" in html
        import os
        for f in ["identity_band.png", "breadth_load.png", "network_dag.png"]:
            assert os.path.getsize(tmp_path / f) > 1000
        # interactive explorer: embedded data + the three JS components
        ihtml = open(tmp_path / "kinopt_interactive.html").read()
        assert "__FITDATA__" in ihtml
        import json as _json
        payload = ihtml.split("window.__FITDATA__ = ", 1)[1]
        data = _json.loads(payload.split(";</script>", 1)[0])
        assert len(data["curves"]) == prob.n_gp
        assert len(data["knockouts"]) == prob.n_k
        # knockout entries carry exact re-predicted series per top target
        k0 = data["knockouts"][0]
        assert len(k0["top"][0]["ko"]) == len(data["times"])
        assert data["network"]["edges"] and data["network"]["nodes"]

    def test_tfopt_app(self, tmp_path):
        from phoskintime_tpu.report import render_tfopt_app

        prob, a_true, b_true = tf_problem()
        res = tf_local(prob, n_starts=4, steps=150, seed=0)
        path = render_tfopt_app(prob, res, str(tmp_path))
        html = open(path).read()
        assert "TF network readout" in html
        # knockout preview must rank a real TF with nonzero effect first
        assert "Knockout preview" in html
        import os
        ihtml = open(os.path.join(str(tmp_path),
                                  "tfopt_interactive.html")).read()
        assert "__FITDATA__" in ihtml and "Knockout simulator" in ihtml


class TestWorkbookFitAnalysis:
    def test_kinopt_reanalysis_from_saved_workbook(self, tmp_path):
        import os

        """`cli fitanalysis` contract: re-run the dashboard from saved
        sheets without refitting (reference kinopt/fitanalysis/__main__)."""
        from phoskintime_tpu.analysis.fitpanels import (
            fit_analysis_from_workbook)
        from phoskintime_tpu.io.export import export_kinopt_results

        prob, a_true, b_true = kin_problem()
        res = kin_local(prob, n_starts=4, steps=150, seed=0)
        wb = str(tmp_path / "kinopt_results.xlsx")
        export_kinopt_results(wb, prob, res)
        out = fit_analysis_from_workbook(wb, str(tmp_path / "fa"), "kinopt")
        assert {"gof", "kld", "params", "residuals",
                "top_connections"} <= set(out)
        assert os.path.getsize(tmp_path / "fa" / "Goodness_of_Fit.png") > 5000

    def test_unknown_kind_raises(self, tmp_path):
        from phoskintime_tpu.analysis.fitpanels import (
            fit_analysis_from_workbook)

        with pytest.raises(ValueError):
            fit_analysis_from_workbook("x.xlsx", str(tmp_path), "nope")


class TestKKTSuite:
    def test_full_suite_artifacts(self, tmp_path):
        """kkt_suite writes the reference KKT.py:60-254 artifact set."""
        from phoskintime_tpu.kinopt.kkt import kkt_suite

        prob, a_true, b_true = kin_problem()
        res = kin_local(prob, n_starts=8, steps=600, lr=0.05, seed=4)
        out = kkt_suite(prob, res, str(tmp_path), loss_type="base")

        rep = out["report"]
        assert rep.primal_feasible
        for key in ["violations_png", "sensitivity_png", "tex",
                    "active_constraints", "lagrange_multipliers",
                    "high_sensitivity_sites", "json"]:
            assert os.path.exists(out["paths"][key]), key
        tex = open(out["paths"]["tex"]).read()
        assert "Residual Summary" in tex
        assert "KKT Stationarity Summary" in tex
        import json as _json
        rj = _json.load(open(out["paths"]["json"]))
        assert rj["primal_feasible"] is True
        assert "residuals" in rj and "Max Residual" in rj["residuals"]
        # lagrange table covers every group constraint
        import pandas as _pd
        lam = _pd.read_csv(out["paths"]["lagrange_multipliers"])
        assert len(lam) == prob.n_gp + prob.n_k
        sens = out["sensitivity"]
        assert set(["GeneID", "Psite", "Sensitivity Mean"]).issubset(sens.columns)


class TestSignalReadouts:
    """Time-resolved network readouts (reference
    scripts/kinopt_network_readout.py / tfopt_network_readout.py)."""

    def test_kinopt_readout_semantics(self):
        from phoskintime_tpu.analysis.network_tools import (
            kinopt_signal_readout)

        prob, a_true, b_true = kin_problem()
        tabs = kinopt_signal_readout(prob, a_true, b_true)
        kl, frag = tabs["kinase_load"], tabs["target_fragility"]
        ko = tabs["knockout_effects"]
        assert len(kl) == 2 and len(frag) == 3
        assert len(ko) == int(prob.gp_mask.sum())
        # single-kinase sites: knocking the sole kinase removes ALL signal
        # and the dominant share is exactly 1
        single = frag[frag.n_kinases == 1]
        assert len(single) == 2
        np.testing.assert_allclose(single.dominant_share, 1.0)
        for _, r in single.iterrows():
            d = ko[(ko.gene == r.gene) & (ko.psite == r.psite)]
            np.testing.assert_allclose(d.delta_auc_abs, r.pred_auc_abs,
                                       rtol=1e-10)
        # knockout deltas for the truth fit are non-negative (all
        # contributions are positive here)
        assert (ko.delta_auc_abs >= -1e-12).all()

    def test_tfopt_readout_semantics(self):
        from phoskintime_tpu.analysis.network_tools import (
            tfopt_signal_readout)

        prob, a_true, b_true = tf_problem()[:3]
        tabs = tfopt_signal_readout(prob, a_true, b_true)
        assert len(tabs["tf_load"]) == prob.n_TF
        assert len(tabs["gene_fragility"]) == prob.n_genes
        assert (tabs["gene_fragility"].dominant_share <= 1.0 + 1e-12).all()
        assert len(tabs["knockout_effects"]) == int(prob.alpha_mask.sum())

    def test_plots_written(self, tmp_path):
        from phoskintime_tpu.analysis.network_tools import (
            kinopt_signal_readout, plot_signal_readout)

        prob, a_true, b_true = kin_problem()
        tabs = kinopt_signal_readout(prob, a_true, b_true)
        paths = plot_signal_readout(tabs, str(tmp_path), which="kinopt")
        import os

        assert len(paths) >= 4 and all(os.path.exists(p) for p in paths)
