"""Auxiliary subsystem tests: checkpointing, Sobol, analysis tools,
dashboard bundle, mesh helpers."""

import os

import numpy as np
import pandas as pd
import pytest

from phoskintime_tpu.analysis import (
    cluster_curves,
    curve_similarity_matrix,
    export_subnetwork,
    find_protein_accumulators,
    kinopt_network_readout,
)
from phoskintime_tpu.ops.nsga import run_unsga3
from phoskintime_tpu.ops.sobol import saltelli_sample, sobol_analyze, temporal_sobol
from phoskintime_tpu.parallel import (
    GACheckpointer,
    load_checkpoint,
    pad_to_devices,
    population_mesh,
    save_checkpoint,
)
from phoskintime_tpu.report.dashboard import (
    load_dashboard_bundle,
    render_dashboard,
    save_dashboard_bundle,
)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "c.ckpt")
        save_checkpoint(p, {"a": np.arange(5), "b": "x"})
        st = load_checkpoint(p)
        np.testing.assert_array_equal(st["a"], np.arange(5))
        assert load_checkpoint(str(tmp_path / "missing")) is None

    def test_ga_resume(self, tmp_path):
        f3 = lambda X: np.stack([((X - c) ** 2).sum(axis=1)
                                 for c in (0.0, 0.5, 1.0)], axis=1)
        p = str(tmp_path / "ga.ckpt")
        ck = GACheckpointer(p, every=2)
        res1 = run_unsga3(f3, np.zeros(4), np.ones(4), pop_size=16, n_gen=6,
                          n_partitions=4, seed=0, ftol=0.0, callback=ck)
        assert ck.resume_x0() is None  # the instance loaded before running

        ck2 = GACheckpointer(p, every=2)
        x0 = ck2.resume_x0()
        assert x0 is not None and x0.shape == (16, 4)
        res2 = run_unsga3(f3, np.zeros(4), np.ones(4), pop_size=16, n_gen=3,
                          n_partitions=4, seed=1, ftol=0.0, x0=x0, callback=ck2)
        # resumed run should not regress below the checkpointed quality
        assert res2.pareto_F.min() <= res1.F.min() + 1e-6


class TestSobol:
    def test_additive_model_indices(self):
        # Y = x0 + 2 x1 (+ no x2): analytic S1 = (1, 4, 0)/5, ST = S1
        bounds = np.array([[0.0, 1.0]] * 3)
        X = saltelli_sample(bounds, 256, seed=0)
        Y = X[:, 0] + 2 * X[:, 1]
        res = sobol_analyze(3, Y)
        np.testing.assert_allclose(res.S1, [0.2, 0.8, 0.0], atol=0.05)
        np.testing.assert_allclose(res.ST, [0.2, 0.8, 0.0], atol=0.05)

    def test_interaction_total_exceeds_first(self):
        bounds = np.array([[0.0, 1.0]] * 2)
        X = saltelli_sample(bounds, 512, seed=1)
        Y = X[:, 0] * X[:, 1]
        res = sobol_analyze(2, Y)
        assert res.ST[0] > res.S1[0] + 0.05

    def test_temporal(self):
        bounds = np.array([[0.0, 1.0]] * 2)

        def evaluate(X):
            t = np.linspace(0, 1, 5)[None, :]
            return X[:, :1] * (1 - t) + X[:, 1:2] * t

        S1, ST, _ = temporal_sobol(evaluate, bounds, n_base=128, seed=2)
        assert S1.shape == (5, 2)
        # influence shifts from param 0 to param 1 over time
        assert S1[0, 0] > S1[0, 1]
        assert S1[-1, 1] > S1[-1, 0]


class TestAnalysisTools:
    def test_curve_similarity_and_clusters(self):
        t = np.linspace(0, 1, 10)
        curves = {
            "a": np.stack([t, np.sin(t)], 1),
            "b": np.stack([t, np.sin(t) + 0.01], 1),
            "c": np.stack([t, 5 + np.cos(t)], 1),
        }
        D = curve_similarity_matrix(curves)
        assert D.loc["a", "b"] < D.loc["a", "c"]
        labels = cluster_curves(D, n_clusters=2)
        assert labels["a"] == labels["b"] != labels["c"]

    def test_kinopt_readout(self):
        alpha = pd.DataFrame({"Gene": ["G1", "G1", "G2"],
                              "Psite": ["S1", "S2", "S1"],
                              "Kinase": ["K1", "K1", "K2"],
                              "Alpha": [0.5, 0.5, 1.0]})
        beta = pd.DataFrame({"Kinase": ["K1", "K2"], "Psite": ["", ""],
                             "Beta": [1.0, 2.0]})
        out = kinopt_network_readout(alpha, beta)
        assert set(out["Kinase"]) == {"K1", "K2"}
        k1 = out[out["Kinase"] == "K1"].iloc[0]
        assert k1["n_targets"] == 1 and k1["n_sites"] == 2
        assert k1["total_alpha"] == pytest.approx(1.0)
        k2 = out[out["Kinase"] == "K2"].iloc[0]
        assert k2["beta"] == pytest.approx(2.0)

    def test_subnetwork(self):
        import pandas as pd
        from phoskintime_tpu.network import build_topology

        inter = pd.DataFrame({"protein": ["GA", "GB"], "psite": ["S1", "S1"],
                              "kinase": ["K1", "K2"]})
        tf = pd.DataFrame({"tf": ["GA"], "target": ["GB"]})
        topo = build_topology(inter, tf)
        df, nodes = export_subnetwork(topo, "GA", radius=1)
        assert "GA" in nodes
        assert (df["kind"] == "tf").any()

    def test_accumulators(self):
        from phoskintime_tpu.network.analysis import SteadyStateReport

        rep = SteadyStateReport(
            times=np.array([0.0, 1.0]),
            tot=np.array([[1.0, 1.0], [5.0, 1.1]]),
            rna=np.zeros((2, 2)),
            converged=np.array([True, True]),
            final_rate=np.zeros(2),
            ss_value=np.array([5.0, 1.1]))
        df = find_protein_accumulators(rep, ["P1", "P2"], threshold=2.0)
        assert bool(df[df["protein"] == "P1"]["accumulator"].iloc[0])
        assert not bool(df[df["protein"] == "P2"]["accumulator"].iloc[0])


class TestDashboard:
    def test_bundle_and_render(self, tmp_path):
        p = str(tmp_path / "bundle.pkl")
        save_dashboard_bundle(
            p, pareto_X=np.random.rand(5, 3), pareto_F=np.random.rand(5, 3),
            best_idx=2, history=[(1, np.ones(3), np.ones(3))],
            topo_summary={"N": 4, "K": 2})
        b = load_dashboard_bundle(p)
        assert b["best_idx"] == 2
        out = render_dashboard(b, str(tmp_path / "dash"))
        assert out.endswith("dashboard.html")
        import os
        assert os.path.exists(out)


class TestMesh:
    def test_population_mesh_cpu8(self):
        mesh = population_mesh()
        assert mesh is not None  # conftest forces 8 CPU devices
        assert pad_to_devices(10, mesh) == 16
        assert pad_to_devices(16, mesh) == 16
        assert pad_to_devices(5, None) == 5


class TestNativeKernels:
    def test_nd_sort_matches_numpy(self):
        from phoskintime_tpu.native import nd_sort_ranks
        from phoskintime_tpu.ops.nsga import fast_non_dominated_sort

        rng = np.random.default_rng(0)
        F = rng.normal(0, 1, (300, 3))
        ranks = nd_sort_ranks(F)
        if ranks is None:
            pytest.skip("no C++ toolchain")
        fronts = fast_non_dominated_sort(F)  # n<=512 -> numpy path
        for r, fr in enumerate(fronts):
            assert np.all(ranks[fr] == r)

    def test_large_population_sort(self):
        from phoskintime_tpu.ops.nsga import fast_non_dominated_sort

        rng = np.random.default_rng(1)
        F = rng.normal(0, 1, (2000, 3))
        fronts = fast_non_dominated_sort(F)  # routes through native
        seen = np.concatenate(fronts)
        assert sorted(seen.tolist()) == list(range(2000))
        # front 0 is mutually non-dominated
        f0 = F[fronts[0]]
        dom = ((f0[:, None] <= f0[None]).all(-1) &
               (f0[:, None] < f0[None]).any(-1))
        assert not dom.any()

    def test_associate_native_matches(self):
        from phoskintime_tpu.native import associate_native
        from phoskintime_tpu.ops.nsga import associate_to_refs, das_dennis

        rng = np.random.default_rng(2)
        Fn = np.abs(rng.normal(0, 1, (200, 3)))
        refs = das_dennis(3, 8)
        unit = refs / np.linalg.norm(refs, axis=1)[:, None]
        out = associate_native(Fn, unit)
        if out is None:
            pytest.skip("no C++ toolchain")
        niche_ref, dist_ref = associate_to_refs(Fn, refs)
        np.testing.assert_array_equal(out[0], niche_ref)
        np.testing.assert_allclose(out[1], dist_ref, rtol=1e-10)


class TestIndicators:
    def test_hypervolume_known(self):
        from phoskintime_tpu.ops.indicators import hypervolume

        # single point (1,1) vs ref (2,2): HV = 1
        assert hypervolume(np.array([[1.0, 1.0]]), np.array([2.0, 2.0])) == \
            pytest.approx(1.0)
        # two staircase points
        F = np.array([[1.0, 2.0], [2.0, 1.0]])
        # HV vs (3,3): union of 2x1 and 1x2 boxes = 2+2-1 = 3
        assert hypervolume(F, np.array([3.0, 3.0])) == pytest.approx(3.0)
        # 3-objective cube
        assert hypervolume(np.array([[0.0, 0.0, 0.0]]),
                           np.array([1.0, 1.0, 1.0])) == pytest.approx(1.0)
        # dominated point contributes nothing
        F3 = np.array([[1.0, 1.0], [1.5, 1.5]])
        assert hypervolume(F3, np.array([2.0, 2.0])) == pytest.approx(1.0)

    def test_igd_plus(self):
        from phoskintime_tpu.ops.indicators import igd_plus

        Z = np.array([[0.0, 1.0], [1.0, 0.0]])
        assert igd_plus(Z, Z) == pytest.approx(0.0)
        F = Z + 0.1
        assert igd_plus(F, Z) == pytest.approx(np.sqrt(2 * 0.01), rel=1e-9)

    def test_asf_and_pseudo_weights(self):
        from phoskintime_tpu.ops.indicators import (asf_pick, pseudo_weights,
                                                    pseudo_weight_pick)

        F = np.array([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
        # equal weights -> the balanced middle point
        assert asf_pick(F, np.array([1.0, 1.0])) == 1
        pw = pseudo_weights(F)
        np.testing.assert_allclose(pw.sum(axis=1), 1.0)
        assert pseudo_weight_pick(F, np.array([0.5, 0.5])) == 1

    def test_postfit_summary(self):
        from phoskintime_tpu.analysis.postfit import (goodness_of_fit,
                                                      optimization_performance,
                                                      residual_summary)
        from phoskintime_tpu.ops.nsga import MOOResult

        obs = np.array([[1.0, 2.0, 3.0], [2.0, 2.0, 2.0]])
        gof = goodness_of_fit(obs, obs + 0.01, labels=["a", "b"])
        assert gof["rmse"].iloc[0] == pytest.approx(0.01)

        res = MOOResult(np.zeros((3, 2)), np.zeros((3, 3)),
                        np.zeros((3, 2)),
                        np.array([[0.1, 0.9, 0.5], [0.9, 0.1, 0.5],
                                  [0.5, 0.5, 0.5]]),
                        [(1, np.array([0.5, 0.5, 0.5]), None)], 1, 10)
        perf = optimization_performance(res)
        assert perf["hypervolume"] > 0
        assert 0 <= perf["asf_pick"] < 3
        rs = residual_summary(np.array([0.1, -0.1, 0.05]))
        assert np.isfinite(rs["std"])


class TestLiveMonitor:
    def test_serves_state_and_page(self):
        import json
        import urllib.request

        from phoskintime_tpu.report.live import LiveMonitor

        rng = np.random.default_rng(0)
        with LiveMonitor(port=0) as mon:
            for g in range(3):
                mon(g, None, np.abs(rng.normal(1, 0.3, (8, 3))))
            url = f"http://127.0.0.1:{mon.port}"
            state = json.loads(
                urllib.request.urlopen(url + "/state.json").read())
            assert len(state["history"]) == 3
            assert state["n_evals"] == 24
            assert len(state["history"][0]["f_min"]) == 3
            page = urllib.request.urlopen(url + "/").read().decode()
            assert "live fit" in page
            with pytest.raises(Exception):
                urllib.request.urlopen(url + "/nope")


class TestNetworkViz:
    def test_all_three_figures(self, tmp_path):
        from phoskintime_tpu.analysis import (plot_breadth_vs_load,
                                              plot_identity_band,
                                              plot_network_dag)

        rng = np.random.default_rng(0)
        obs = rng.uniform(0.5, 2.0, 40)
        est = obs + rng.normal(0, 0.08, 40)
        p1 = plot_identity_band(obs, est, str(tmp_path / "ident.png"),
                                labels=[f"G{i} S1" for i in range(40)])
        readout = pd.DataFrame({"Kinase": ["K1", "K2", "K3"],
                                "n_targets": [3, 9, 1],
                                "total_alpha": [0.4, 2.1, 0.2]})
        p2 = plot_breadth_vs_load(readout, str(tmp_path / "load.png"))
        edges = pd.DataFrame({"source": ["K1", "K1", "K2"],
                              "target": ["GA", "GB", "GA"],
                              "weight": [0.8, -0.3, 1.5]})
        p3 = plot_network_dag(edges, str(tmp_path / "dag.png"))
        import os
        for p in (p1, p2, p3):
            assert os.path.exists(p) and os.path.getsize(p) > 1000


class TestInfluenceNetworks:
    """State-dependent functional-influence analysis
    (reference scripts/compare_mechanisms.py:1063-2100)."""

    def _system(self):
        import pandas as pd

        from phoskintime_tpu.network import (GlobalSystem,
                                             build_kinase_matrix,
                                             build_topology, default_params)

        grid = np.array([0.0, 1.0, 4.0, 16.0, 60.0, 120.0])
        inter = pd.DataFrame({
            "protein": ["GA", "GA", "GB", "KIN1"],
            "psite": ["S10", "T20", "S5", "S99"],
            "kinase": ["KIN1", "KIN2", "KIN1", "KIN2"],
        })
        tf = pd.DataFrame({"tf": ["GA", "GB"], "target": ["GB", "GA"]})
        topo = build_topology(inter, tf, model=0)
        Kmat = build_kinase_matrix(topo.kinases, None, grid)
        Kmat = Kmat * (1.0 + 0.2 * np.arange(len(grid))[None, :])
        sys_ = GlobalSystem(topo, grid, Kmat)
        import jax.numpy as jnp

        params = {k: jnp.asarray(v)
                  for k, v in default_params(topo).items()}
        return sys_, params, grid

    def test_edge_weights_match_direct_flux(self):
        from phoskintime_tpu.analysis.influence import (
            influence_edges_sweep, state_sweep)

        sys_, params, grid = self._system()
        times, Y = state_sweep(sys_, params, grid[:3])
        edges = influence_edges_sweep(sys_, params, times, Y)
        assert set(edges["kind"]) == {"phospho", "tf"}
        # oracle one edge: KIN1 -> GA:S10 at t=grid[1]
        topo = sys_.topo
        i = topo.p2i["GA"]
        j = topo.sites[i].index("S10")
        k = topo.k2i["KIN1"]
        t = float(times[1])
        jb = int(np.clip(np.searchsorted(
            np.asarray(sys_.kin_grid, float), t, side="right") - 1, 0,
            np.asarray(sys_.Kmat).shape[1] - 1))
        Kt = np.asarray(sys_.Kmat)[k, jb] * float(np.asarray(params["c_k"])[k])
        expect = float(np.asarray(topo.W_pad)[i, j, k]) * Kt * Y[1, i, 1]
        row = edges[(edges.time == t) & (edges.kind == "phospho")
                    & (edges.src == "KIN1") & (edges.dst == "GA")
                    & (edges.site == "S10")]
        assert len(row) == 1
        assert float(row["weight"].iloc[0]) == pytest.approx(expect, rel=1e-9)

    def test_cascade_and_exports(self, tmp_path):
        import os

        from phoskintime_tpu.analysis.influence import (
            cascade_from_seed, export_influence_sweep)

        sys_, params, grid = self._system()
        out = export_influence_sweep(sys_, params, str(tmp_path),
                                     times=grid[:4], seeds=["KIN1"],
                                     depth=3)
        assert os.path.getsize(out["sweep_csv"]) > 200
        import pandas as pd

        cas = pd.read_csv(out["cascades"]["KIN1"])
        assert len(cas) > 0
        # depth-1 edges all start at the seed; influence decays with depth
        assert set(cas[cas.depth == 1]["src"]) == {"KIN1"}
        assert cas["influence"].max() <= 1.0 + 1e-12
        html = open(out["html"]).read()
        assert "__INFLDATA__" in html and "t-slider" in html

    def test_global_knockout_explorer(self, tmp_path):
        import json
        import os

        from phoskintime_tpu.analysis.influence import (
            export_global_knockout_explorer)

        sys_, params, grid = self._system()
        out = export_global_knockout_explorer(
            sys_, params, str(tmp_path / "global_knockouts.html"),
            times=grid)
        html = open(out).read()
        data = json.loads(html.split("window.__FITDATA__ = ", 1)[1]
                          .split(";</script>", 1)[0])
        topo = sys_.topo
        n_curves = 2 * topo.N + topo.total_sites
        assert len(data["curves"]) == n_curves
        assert len(data["knockouts"]) == topo.K
        assert all(c["obs"] is None for c in data["curves"])
        # a kinase knockout must change at least one curve it drives
        k0 = data["knockouts"][0]
        assert k0["total"] > 0


class TestLogconfFileHandler:
    def test_file_handler_attaches_after_console_setup(self, tmp_path):
        """Review repro: an import-time console-only setup permanently
        blocked the rotating file handler."""
        import logging
        import os

        from phoskintime_tpu.config.logconf import setup_logger

        name = "phoskintime_tpu_test_fh"
        lg1 = setup_logger(name)                       # console only
        lg2 = setup_logger(name, log_dir=tmp_path)     # must add the file
        lg2.info("file line")
        for h in lg2.handlers:
            h.flush()
        logfile = tmp_path / f"{name}.log"
        assert logfile.exists() and "file line" in logfile.read_text()
        # idempotent on repeat setup
        n = len(lg2.handlers)
        setup_logger(name, log_dir=tmp_path)
        assert len(lg2.handlers) == n


class TestEagerX64:
    """PHOSKINTIME_DTYPE=float64 must flip jax_enable_x64 at PACKAGE IMPORT
    (config/numerics.py module top), not lazily at the first
    working_dtype() call — arrays created in between would otherwise get
    f32 semantics silently (round-2/3 advisor finding)."""

    @pytest.mark.slow
    def test_array_created_before_first_working_dtype_call_is_f64(self):
        import subprocess
        import sys

        code = (
            "import os\n"
            "os.environ['PHOSKINTIME_DTYPE'] = 'float64'\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "import phoskintime_tpu  # noqa: F401  (flip happens here)\n"
            "import jax.numpy as jnp\n"
            "x = jnp.asarray([1.0, 2.0])\n"
            "assert x.dtype == jnp.float64, x.dtype\n"
            "from phoskintime_tpu.config.numerics import working_dtype\n"
            "assert working_dtype() == jnp.float64\n"
            "print('OK')\n"
        )
        env = {k: v for k, v in os.environ.items()
               if k not in ("PHOSKINTIME_DTYPE", "JAX_PLATFORMS")}
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr
        assert "OK" in out.stdout
