"""Full-pipeline integration test: raw reference-format files -> `cli all`
(prep -> tfopt -> kinopt -> model) -> `cli global-model`, asserting artifact
completeness at every stage (reference config/cli.py:195-219 `all`)."""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded from the <5-min smoke run

from phoskintime_tpu.cli import main as cli_main

CONFIG = """
[paths]
data_dir = "data"
results_dir = "results"

[tfopt]
loss_type = 0

[kinopt]
loss_type = "base"
estimate_missing_kinases = true
scaling_method = "none"

[ode]
model = "distmod"

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
n_gen = 5
seed = 7
"""


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """A project whose data/ starts EMPTY: everything flows from raw/."""
    root = tmp_path_factory.mktemp("proj_all")
    raw = root / "raw"
    raw.mkdir()
    (root / "data").mkdir()
    (root / "config.toml").write_text(CONFIG)
    rng = np.random.default_rng(3)

    # --- MS_Gaussian raw (GeneID, site, unit_time, predict_mean/std) ------
    rows = []
    for gene, sites in [("GA", ["", "s_10", "t_20"]), ("GB", ["", "s_5"]),
                        ("KIN1", ["", "s_99"])]:
        for site in sites:
            for ut in range(14):
                rows.append((gene, site or np.nan, ut,
                             rng.normal(0, 0.5), abs(rng.normal(0.1, 0.02))))
    pd.DataFrame(rows, columns=["GeneID", "site", "unit_time",
                                "predict_mean", "predict_std"]
                 ).to_csv(raw / "MS_Gaussian_predictions.csv", index=False)

    # --- kinase-substrate network (already in input2 schema) --------------
    pd.DataFrame({
        "GeneID": ["GA", "GA", "GB"],
        "Psite": ["S_10", "T_20", "S_5"],
        "Kinase": ["{KIN1}", "{KIN1}", "{KIN1}"],
    }).to_csv(raw / "input2.csv", index=False)

    # --- CollecTRI raw (source/source_genesymbol/target_genesymbol) -------
    pd.DataFrame({
        "source": ["P1", "P2", "COMPLEX:AP1"],
        "source_genesymbol": ["GA", "GB", "JUN"],
        "target_genesymbol": ["GB", "GA", "GA"],
    }).to_csv(raw / "CollecTRI.csv", index=False)

    # --- Rout-Limma raw mRNA (GeneID, unit_time, logFC) --------------------
    rows = [(g, ut, rng.normal(0, 0.4))
            for g in ["GA", "GB", "KIN1"] for ut in range(9)]
    pd.DataFrame(rows, columns=["GeneID", "unit_time", "logFC"]
                 ).to_csv(raw / "rout_limma_mrna.csv", index=False)
    return root


def _run(project, argv):
    cwd = os.getcwd()
    os.chdir(project)
    try:
        cli_main(argv)
    finally:
        os.chdir(cwd)


class TestCLIAll:
    def test_all_pipeline(self, project):
        _run(project, ["all", "--base-dir", "raw"])
        data = project / "data"
        # prep artifacts landed in the configured data_dir
        for f in ["input1.csv", "input1_wstd.csv", "input2.csv",
                  "input3.csv", "input4.csv"]:
            assert (data / f).exists(), f"prep did not produce {f}"
        # prep semantics: 2^mean transform, site formatting, COMPLEX drop
        in1 = pd.read_csv(data / "input1.csv")
        assert set(in1["GeneID"]) == {"GA", "GB", "KIN1"}
        assert "S_10" in set(in1["Psite"].fillna(""))
        assert (in1[[c for c in in1.columns if c.startswith("x")]] > 0).all().all()
        in4 = pd.read_csv(data / "input4.csv")
        assert "JUN" not in set(in4["Source"])  # COMPLEX source dropped
        assert set(in4["Target"]) <= {"GA", "GB"}
        # tfopt + kinopt artifacts
        assert any(f.startswith("tfopt_results") for f in os.listdir(data))
        assert any(f.startswith("kinopt_results") for f in os.listdir(data))
        assert (data / "tfopt_fitanalysis").is_dir()
        assert (data / "kinopt_fitanalysis").is_dir()
        # model stage artifacts
        results = project / "results"
        assert results.is_dir()
        assert any("model_results" in f for f in os.listdir(results))
        assert (results / "report.html").exists()

    def test_global_model_after_all(self, project):
        if not (project / "data" / "input1.csv").exists():
            pytest.skip("all-pipeline stage did not run")
        _run(project, ["global-model"])
        out = project / "results_global"
        assert (out / "pareto_X.npy").exists()
        assert (out / "report.html").exists()
        # round-2 export-suite depth: S rates, convergence, gene series
        assert (out / "S_rates_picked.csv").exists()
        assert (out / "S_rates_report.pdf").exists()
        assert (out / "convergence_history.csv").exists()
        assert (out / "convergence_plot.png").exists()
        assert any(f.startswith("optimization_history")
                   for f in os.listdir(out))
        ts_dir = out / "gene_timeseries"
        assert ts_dir.is_dir() and len(list(ts_dir.glob("ts_*.png"))) >= 2
        # mechanistic discovery report (round-3: wired into the runner)
        assert any(f.startswith("mechanistic_discovery_report")
                   for f in os.listdir(out))
