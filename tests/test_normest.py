"""Parameter-recovery tests for the batched per-gene estimator."""

import jax.numpy as jnp
import numpy as np
import pytest

from phoskintime_tpu.fit.normest import build_bounds, normest
from phoskintime_tpu.models.kinetics import initial_condition, solve_ode
from phoskintime_tpu.models.knockout import (
    generate_knockout_combinations,
    knockout_mask_matrix,
)
from phoskintime_tpu.models.weights import early_emphasis, get_weight_options

TIME_POINTS = np.array([0.0, 0.5, 0.75, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0,
                        60.0, 120.0, 240.0, 480.0, 960.0])
BOUNDS = {"A": (0.0, 20.0), "B": (0.0, 20.0), "C": (0.0, 20.0),
          "D": (0.0, 20.0), "S(i)": (0.0, 20.0), "D(i)": (0.0, 20.0)}


def synth_gene(model: str, n: int, seed: int):
    """Generate noise-free synthetic data from known parameters."""
    rng = np.random.default_rng(seed)
    if model == "randmod":
        npar = 4 + n + (1 << n) - 1
    else:
        npar = 4 + 2 * n
    true = rng.uniform(0.3, 2.5, npar)
    y0 = initial_condition(n, model)
    sol, fit = solve_ode(jnp.asarray(true), y0, n, jnp.asarray(TIME_POINTS),
                         model=model)
    fit = np.asarray(fit)
    T = len(TIME_POINTS)
    r_data = fit[:T - 5]
    pr_data = fit[T - 5:T - 5 + T]
    p_data = fit[T - 5 + T:].reshape(n, T)
    return true, np.asarray(y0), pr_data, p_data, r_data


class TestNormest:
    @pytest.mark.slow
    def test_recovers_distributive_params(self):
        n = 2
        true, y0, pr, p, r = synth_gene("distmod", n, 5)
        res = normest("GENEA", pr, p, r, y0, n, TIME_POINTS, BOUNDS,
                      model="distmod", use_regularization=False,
                      n_starts=24, lm_iters=120)
        # noise-free data -> prediction must match target closely
        assert res.error < 1e-8
        np.testing.assert_allclose(res.params, true, rtol=5e-2)

    @pytest.mark.slow
    def test_regularized_fit_runs_and_reports(self):
        n = 1
        true, y0, pr, p, r = synth_gene("distmod", n, 6)
        res = normest("GENEB", pr, p, r, y0, n, TIME_POINTS, BOUNDS,
                      model="distmod", use_regularization=True,
                      n_starts=8, lm_iters=60)
        assert res.lambda_reg in set(np.logspace(-2, 0, 10))
        assert res.weight_name
        assert res.ci is not None
        assert np.all(res.ci["upr_ci"] >= res.ci["lwr_ci"])
        assert res.error < 1e-2

    @pytest.mark.slow
    def test_randmod_log_space(self):
        n = 1
        true, y0, pr, p, r = synth_gene("randmod", n, 7)
        res = normest("GENEC", pr, p, r, y0, n, TIME_POINTS, BOUNDS,
                      model="randmod", use_regularization=False,
                      n_starts=16, lm_iters=120)
        # n=1 has a near-degenerate (D, Ddeg) direction: accept a good fit
        assert res.error < 1e-4
        # popt_raw in log space, params = exp(popt_raw)
        np.testing.assert_allclose(res.params, np.exp(res.popt_raw), rtol=1e-12)

    @pytest.mark.slow
    def test_bootstrap_axis(self):
        n = 1
        true, y0, pr, p, r = synth_gene("distmod", n, 8)
        res = normest("GENED", pr, p, r, y0, n, TIME_POINTS, BOUNDS,
                      model="distmod", use_regularization=False,
                      n_starts=4, bootstraps=5, lm_iters=40)
        assert res.boot_params is not None and res.boot_params.shape[0] == 5

    def test_bounds_randmod_log(self):
        lb, ub = build_bounds(BOUNDS, 2, "randmod")
        assert lb.shape[0] == 4 + 2 + 3
        assert np.all(lb < ub)
        assert np.all(np.isfinite(lb))  # log(max(0, eps)) = log(eps), finite


class TestWeights:
    def test_scheme_lengths_consistent(self):
        n = 2
        T = len(TIME_POINTS)
        target = np.abs(np.random.default_rng(0).normal(1, 0.3, 9 + T + n * T))
        ew = early_emphasis(np.ones(T), np.ones((n, T)), TIME_POINTS, n)
        opts = get_weight_options(target, TIME_POINTS, n, True, 8, ew,
                                  ms_gauss_weights=np.ones(T * (n + 1)),
                                  use_custom_weights=True)
        assert len(opts) == 17
        m = len(target) + 8
        for name, w in opts.items():
            assert w.shape[0] == m, name
            assert np.all(np.isfinite(w)), name

    def test_default_only_data_uncertainties(self):
        target = np.ones(9 + 14)
        ew = early_emphasis(np.ones(14), np.ones((0, 14)), TIME_POINTS, 0)
        opts = get_weight_options(target, TIME_POINTS, 0, False, 0, ew,
                                  ms_gauss_weights=np.ones(14),
                                  use_custom_weights=False)
        assert list(opts) == ["uncertainties_from_data"]


class TestKnockout:
    def test_combination_count(self):
        assert len(generate_knockout_combinations(3)) == 2 * 2 * (2 + 3)

    def test_mask_matrix(self):
        masks, combos = knockout_mask_matrix(2, 8)
        assert masks.shape == (len(combos), 8)
        # find all-knockout row: transcription+translation+all-phospho
        idx = next(i for i, c in enumerate(combos)
                   if c["transcription"] and c["translation"]
                   and c["phosphorylation"] is True)
        row = masks[idx]
        assert row[0] == 0 and row[2] == 0 and row[4] == 0 and row[5] == 0
        assert row[1] == 1 and row[3] == 1  # degradation untouched


@pytest.mark.slow
class TestNormestBatch:
    def test_matches_single_gene_path(self):
        """Cohort-batched fit must reproduce the per-gene fit exactly
        (same seeds, same stages)."""
        from phoskintime_tpu.fit.normest import normest_batch

        n = 2
        genes, prs, ps, rs = [], [], [], []
        for seed, name in [(5, "GENEA"), (11, "GENEX")]:
            true, y0, pr, p, r = synth_gene("distmod", n, seed)
            genes.append(name); prs.append(pr); ps.append(p); rs.append(r)
        y0 = initial_condition(n, "distmod")

        batch = normest_batch(genes, np.stack(prs), np.stack(ps), np.stack(rs),
                              np.asarray(y0), n, TIME_POINTS, BOUNDS,
                              model="distmod", use_regularization=True,
                              n_starts=6, lm_iters=40)
        assert set(batch) == set(genes)
        single = normest("GENEA", prs[0], ps[0], rs[0], np.asarray(y0), n,
                         TIME_POINTS, BOUNDS, model="distmod",
                         use_regularization=True, n_starts=6, lm_iters=40)
        np.testing.assert_allclose(batch["GENEA"].params, single.params,
                                   rtol=1e-6)
        assert batch["GENEA"].lambda_reg == single.lambda_reg
        assert batch["GENEA"].weight_name == single.weight_name

    def test_batch_bootstrap(self):
        """Bootstrap lanes: boot_params populated, mean near point fit."""
        from phoskintime_tpu.fit.normest import normest_batch

        n = 1
        true, y0, pr, p, r = synth_gene("distmod", n, 3)
        y0 = initial_condition(n, "distmod")
        kw = dict(model="distmod", use_regularization=True, n_starts=4,
                  lm_iters=40)
        base = normest_batch(["G1"], pr[None], p[None], r[None],
                             np.asarray(y0), n, TIME_POINTS, BOUNDS, **kw)
        boot = normest_batch(["G1"], pr[None], p[None], r[None],
                             np.asarray(y0), n, TIME_POINTS, BOUNDS,
                             bootstraps=8, **kw)
        bres = boot["G1"]
        assert bres.boot_params is not None and bres.boot_params.shape == (
            8, len(bres.params))
        assert np.all(np.isfinite(bres.boot_params))
        # bootstrap mean should stay in the neighbourhood of the point fit
        np.testing.assert_allclose(bres.params, base["G1"].params,
                                   rtol=0.5, atol=0.5)

    def test_pipeline_batched_grouping(self, tmp_path):
        """run_model_pipeline groups by site count and produces outputs."""
        import pandas as pd
        from phoskintime_tpu.fit.pipeline import run_model_pipeline

        rows_p, rows_ph, rows_r = [], [], []
        for seed, name, n in [(5, "GA", 2), (11, "GB", 2), (7, "GC", 1)]:
            true, y0, pr, p, r = synth_gene("distmod", n, seed)
            for t, v in zip(TIME_POINTS, pr):
                rows_p.append((name, t, v))
            for j in range(n):
                for t, v in zip(TIME_POINTS, p[j]):
                    rows_ph.append((name, f"S{j+1}", t, v))
            for t, v in zip(TIME_POINTS[5:], r):
                rows_r.append((name, t, v))
        df_p = pd.DataFrame(rows_p, columns=["protein", "time", "fc"])
        df_ph = pd.DataFrame(rows_ph, columns=["protein", "psite", "time", "fc"])
        df_r = pd.DataFrame(rows_r, columns=["protein", "time", "fc"])
        out = run_model_pipeline(df_p, df_ph, df_r, time_points=TIME_POINTS,
                                 rna_time_points=TIME_POINTS[5:],
                                 bounds=BOUNDS, model="distmod",
                                 out_dir=None, make_plots=False,
                                 run_knockouts=False,
                                 normest_kw=dict(n_starts=4, lm_iters=30))
        assert set(out) == {"GA", "GB", "GC"}
        for g in out:
            assert np.isfinite(out[g].result.error)
