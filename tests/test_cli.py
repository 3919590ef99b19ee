"""End-to-end CLI integration test on a tiny synthetic project."""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded from the <5-min smoke run

from phoskintime_tpu.cli import main as cli_main, parse_bound_pair

CONFIG = """
[paths]
data_dir = "data"
results_dir = "results"
logs_dir = "results/logs"

[tfopt]
input1 = "input1.csv"
input3 = "input3.csv"
input4 = "input4.csv"
out_file = "tfopt_results.xlsx"
loss_type = 0

[kinopt]
input1 = "input1.csv"
input2 = "input2.csv"
out_file = "kinopt_results.xlsx"
loss_type = "base"
estimate_missing_kinases = true
scaling_method = "none"

[ode]
model = "distmod"
[ode.bounds]
mRNA_prod = 10
[ode.inputs]
protein_excel = "data/input1.csv"
psite_excel = "data/kinopt_results.xlsx"
rna_excel = "data/tfopt_results.xlsx"

[global_model]
kinase_net = "data/input2.csv"
tf_net = "data/input4.csv"
ms = "data/input1.csv"
rna = "data/input3.csv"
kinopt = "data/kinopt_results.xlsx"
tfopt = "data/tfopt_results.xlsx"
output_dir = "results_global"
optimizer = "pymoo"
pop = 16
n_gen = 4
seed = 42
sensitivity_analysis = true
sensitivity_trajectories = 2
sensitivity_levels = 4
[global_model.solver]
use_custom_solver = true
"""


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    data = root / "data"
    data.mkdir()
    (root / "config.toml").write_text(CONFIG)

    rng = np.random.default_rng(0)

    def wide(genes, psites, n=14, lo=0.5, hi=2.0):
        d = {"GeneID": genes, "Psite": psites}
        for i in range(1, n + 1):
            d[f"x{i}"] = rng.uniform(lo, hi, len(genes))
        return pd.DataFrame(d)

    # input1: MS data — proteins GA, GB, KIN1 with sites
    input1 = wide(
        ["GA", "GA", "GA", "GB", "GB", "KIN1", "KIN1"],
        ["", "S_10", "T_20", "", "S_5", "", "S_99"])
    input1.to_csv(data / "input1.csv", index=False)

    # input2: kinase-substrate network
    pd.DataFrame({
        "GeneID": ["GA", "GA", "GB"],
        "Psite": ["S_10", "T_20", "S_5"],
        "Kinase": ["{KIN1}", "{KIN1}", "{KIN1}"],
    }).to_csv(data / "input2.csv", index=False)

    # input3: RNA (9 timepoints)
    rna = wide(["GA", "GB", "KIN1"], None, n=9).drop(columns=["Psite"])
    rna.to_csv(data / "input3.csv", index=False)

    # input4: TF network
    pd.DataFrame({"Source": ["GA", "GB"], "Target": ["GB", "GA"]}
                 ).to_csv(data / "input4.csv", index=False)
    return root


def _run(project, argv):
    cwd = os.getcwd()
    os.chdir(project)
    try:
        cli_main(argv)
    finally:
        os.chdir(cwd)


class TestCLI:
    def test_parse_bound_pair(self):
        assert parse_bound_pair("0,3") == (0.0, 3.0)
        assert parse_bound_pair("1, infinity") == (1.0, float("inf"))

    def test_tfopt_local(self, project):
        _run(project, ["tfopt", "--mode", "local"])
        assert any(f.startswith("tfopt_results") for f in
                   os.listdir(project / "data"))

    def test_kinopt_local(self, project):
        _run(project, ["kinopt", "--mode", "local"])
        assert any(f.startswith("kinopt_results") for f in
                   os.listdir(project / "data"))

    def test_model(self, project):
        _run(project, ["model", "--model", "distmod"])
        results = project / "results"
        assert results.is_dir()
        assert any("model_results" in f for f in os.listdir(results))
        assert (results / "report.html").exists()

    def test_global_model(self, project):
        _run(project, ["global-model"])
        out = project / "results_global"
        assert (out / "pareto_X.npy").exists()
        assert (out / "steady_state_check.csv").exists()
        assert (out / "report.html").exists()
        assert (out / "pareto_3d.png").exists()
        # round-2 export depth: lambda scan, per-solution trajectories+GOF
        assert (out / "lambda_scan.csv").exists()
        assert (out / "lambda_scan_recommended.json").exists()
        assert any(f.startswith("pareto_trajectories")
                   for f in os.listdir(out))
        gofs = list((out / "gof_solutions").glob("gof_sol*.png"))
        assert len(gofs) >= 1
        assert "__PARETODATA__" in (out / "pareto_interactive.html").read_text()

    def test_diagram(self, project):
        _run(project, ["kinopt", "--mode", "local"])
        _run(project, ["diagram"])
        out = project / "results" / "diagrams"
        names = set(os.listdir(out))
        assert {"kinopt_diagram.png", "kinopt_constraints.png",
                "tfopt_diagram.png", "tfopt_constraints.png",
                "global_diagram.png",
                "global_constraints.png"} <= names
        # data-driven fitted network from the saved workbook
        wb = str(project / "data" / "kinopt_results.xlsx")
        _run(project, ["diagram", "--alpha-file", wb, "--top-edges", "10"])
        assert (out / "fitted_network.png").exists()
        # per-kinase-only Beta sheet (no Psite column — the other workbook
        # layout io/load.py supports) must render, not KeyError
        from phoskintime_tpu.io.export import TableWriter
        from phoskintime_tpu.io.load import read_table

        wb2 = str(project / "data" / "kinopt_results_kin_only.xlsx")
        alpha = read_table(wb, sheet_name="Alpha Values")
        beta = read_table(wb, sheet_name="Beta Values")
        beta = (beta.groupby("Kinase", as_index=False)["Beta"].mean()
                if "Psite" in beta.columns else beta[["Kinase", "Beta"]])
        w = TableWriter(wb2)
        w.add("Alpha Values", alpha)
        w.add("Beta Values", beta)
        w.save()
        (out / "fitted_network.png").unlink()
        _run(project, ["diagram", "--alpha-file", wb2, "--top-edges", "10"])
        assert (out / "fitted_network.png").exists()

    def test_global_model_scan_flag(self, project, monkeypatch):
        """--scan maps to cfg.hyperparam_scan (reference runner.py:124-126
        --scan); intercept the runner to assert the override without a fit."""
        import phoskintime_tpu.network.runner as runner_mod

        seen = {}

        def fake_main(cfg, out_dir=None, **kw):
            seen["scan"] = cfg.hyperparam_scan
            seen["polish"] = cfg.polish_steps

        monkeypatch.setattr(runner_mod, "main", fake_main)
        _run(project, ["global-model", "--scan", "--polish-steps", "7"])
        assert seen == {"scan": True, "polish": 7}

    def test_clean(self, project):
        _run(project, ["clean"])
