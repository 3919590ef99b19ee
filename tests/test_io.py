"""IO layer tests: scaling, melting, kinase-set explosion, kinopt/tfopt data
construction, preprocessing transforms, export -> prior-merge round trip."""

import numpy as np
import pandas as pd
import pytest

from phoskintime_tpu.io.export import export_kinopt_results, export_tfopt_results
from phoskintime_tpu.io.load import (
    explode_kinase_sets,
    load_data,
    process_and_scale_raw_data,
    read_table,
)
from phoskintime_tpu.io.preprocess import (
    format_site,
    process_collecttri,
    process_msgauss,
    process_msgauss_std,
)
from phoskintime_tpu.kinopt.data import apply_scaling, build_kinopt_problem
from phoskintime_tpu.tfopt.data import build_tfopt_problem

T14 = [0.0, 0.5, 0.75, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 60.0, 120.0, 240.0,
       480.0, 960.0]
T9 = [4.0, 8.0, 15.0, 30.0, 60.0, 120.0, 240.0, 480.0, 960.0]


def wide_frame(genes, psites=None, n=14, seed=0):
    rng = np.random.default_rng(seed)
    rows = {}
    rows["GeneID"] = genes
    if psites is not None:
        rows["Psite"] = psites
    for i in range(1, n + 1):
        rows[f"x{i}"] = rng.uniform(0.5, 3.0, len(genes))
    return pd.DataFrame(rows)


class TestScalingAndMelt:
    def test_fc_start(self):
        df = wide_frame(["A"], n=3)
        tidy = process_and_scale_raw_data(
            df.rename(columns={"GeneID": "protein"}), [0, 1, 2], ["protein"],
            "fc_start")
        first = tidy[tidy["time"] == 0]["fc"].iloc[0]
        assert first == pytest.approx(1.0)

    @pytest.mark.parametrize("method", ["raw", "robust_fc", "max_scale",
                                        "mean_scale", "l2_norm"])
    def test_all_methods_nonneg(self, method):
        df = wide_frame(["A", "B"], n=5).rename(columns={"GeneID": "protein"})
        tidy = process_and_scale_raw_data(df, list(range(5)), ["protein"], method)
        assert (tidy["fc"] >= 0).all()
        assert len(tidy) == 10

    def test_explode_kinase_sets(self):
        df = pd.DataFrame({"protein": ["g1"], "psite": ["S5"],
                           "kinase": ["{K1, K2,K3}"]})
        out = explode_kinase_sets(df, "protein", "psite", "kinase")
        assert sorted(out["kinase"]) == ["K1", "K2", "K3"]
        assert (out["protein"] == "G1").all()

    def test_kinopt_scaling_modes(self):
        df = wide_frame(["A", "B"], psites=["S1", "S2"])
        for m in ["min_max", "log", "temporal", "slope", "cumulative", "none"]:
            out = apply_scaling(df.copy(), method=m, split_point=9)
            assert np.isfinite(out[[f"x{i}" for i in range(1, 15)]].to_numpy()).all()
        seg = apply_scaling(df.copy(), method="segmented",
                            segment_points=[0, 3, 6, 9, 14])
        assert np.isfinite(seg[[f"x{i}" for i in range(1, 15)]].to_numpy()).all()
        with pytest.raises(ValueError):
            apply_scaling(df.copy(), method="bogus")


class TestKinoptData:
    def test_build_from_frames(self):
        full = wide_frame(["GA", "GA", "KIN1", "KIN1"],
                          psites=["S1", "S2", "", "S9"])
        full.loc[2, "Psite"] = np.nan  # protein-level row for KIN1
        inter = pd.DataFrame({
            "GeneID": ["GA", "GA"],
            "Psite": ["S1", "S2"],
            "Kinase": ["{KIN1}", "{KIN1,MISSING}"],
        })
        prob, meta = build_kinopt_problem(full, inter,
                                          estimate_missing_kinases=True)
        assert prob.n_gp == 2
        # KIN1 has one psite row; MISSING gets a synthetic protein-level row
        assert "MISSING" in prob.kinase_names
        assert prob.K_array.shape[1] == 14
        assert prob.gp_mask.sum() >= 3

    def test_missing_kinases_excluded_when_disabled(self):
        full = wide_frame(["GA", "KIN1"], psites=["S1", "S9"])
        inter = pd.DataFrame({
            "GeneID": ["GA", "GA"],
            "Psite": ["S1", "S1"],
            "Kinase": ["{KIN1}", "{GHOST}"],
        })
        prob, _ = build_kinopt_problem(full, inter,
                                       estimate_missing_kinases=False)
        assert "GHOST" not in (prob.kinase_names or [])


class TestTfoptData:
    def test_build(self):
        mrna = wide_frame(["G1", "G2"], n=9)
        prot = wide_frame(["TF1", "TF1", "TF2"], psites=["", "S5", ""])
        prot.loc[0, "Psite"] = np.nan
        prot.loc[2, "Psite"] = np.nan
        net = pd.DataFrame({"Source": ["TF1", "TF2", "TF1"],
                            "Target": ["G1", "G1", "G2"]})
        prob, meta = build_tfopt_problem(mrna, prot, net)
        assert prob.n_genes == 2
        assert prob.n_TF == 2
        assert prob.num_psites[prob.tf_ids.index("TF1")] == 1
        assert prob.num_psites[prob.tf_ids.index("TF2")] == 0
        assert prob.regulators.shape[1] == 2
        # G2 has a single regulator -> second slot = -1
        g2 = prob.gene_ids.index("G2")
        assert prob.regulators[g2, 1] == -1


class TestPreprocess:
    def test_format_site(self):
        assert format_site("s_123") == "S_123"
        assert format_site("") == ""
        assert format_site(np.nan) == ""

    def test_msgauss_fc_transform(self):
        ms = pd.DataFrame({
            "GeneID": ["G1"] * 14 * 2,
            "site": ["S_10"] * 14 + [""] * 14,
            "unit_time": list(range(14)) * 2,
            "predict_mean": [1.0] * 28,
            "predict_std": [0.1] * 28,
        })
        out = process_msgauss(ms)
        assert len(out) == 2
        assert out["x1"].iloc[0] == pytest.approx(2.0)  # 2^1
        wstd = process_msgauss_std(ms)
        # sigma_y = 2^x * ln2 * sigma_x
        assert wstd["x1_std"].iloc[0] == pytest.approx(2.0 * np.log(2) * 0.1)

    def test_collecttri_filter(self):
        ct = pd.DataFrame({
            "source": ["TF1", "COMPLEX:AB", "TF2"],
            "source_genesymbol": ["TF1", "AB", "TF2"],
            "target_genesymbol": ["G1", "G1", "G9"],
        })
        i2 = pd.DataFrame({"GeneID": ["G1"]})
        out = process_collecttri(ct, i2)
        assert len(out) == 1
        assert out.iloc[0]["Source"] == "TF1"


class TestExportRoundTrip:
    def test_kinopt_priors_feed_global_model(self, tmp_path):
        """kinopt results written -> load_data merges them as priors."""
        from phoskintime_tpu.kinopt.data import build_kinopt_problem
        from phoskintime_tpu.kinopt.optimize import run_local

        full = wide_frame(["GA", "GA", "KIN1"], psites=["S1", "S2", "S9"])
        inter = pd.DataFrame({
            "GeneID": ["GA", "GA"], "Psite": ["S1", "S2"],
            "Kinase": ["{KIN1}", "{KIN1}"],
        })
        prob, meta = build_kinopt_problem(full, inter)
        res = run_local(prob, n_starts=4, steps=100, seed=0)
        kin_path = tmp_path / "kinopt_results.xlsx"
        written = export_kinopt_results(str(kin_path), prob, res, meta)
        assert written

        # read back via the prior-merge path
        alpha_df = read_table(str(kin_path), "Alpha Values")
        assert alpha_df is not None
        assert {"Gene", "Psite", "Kinase", "Alpha"} <= set(alpha_df.columns)

        # full load_data round trip with these priors
        kin_net = tmp_path / "input2.csv"
        inter.to_csv(kin_net, index=False)
        tf_net = tmp_path / "input4.csv"
        pd.DataFrame({"Source": ["GA"], "Target": ["KIN1"]}).to_csv(tf_net, index=False)
        ms = tmp_path / "input1.csv"
        full.to_csv(ms, index=False)
        rna = tmp_path / "input3.csv"
        wide_frame(["GA", "KIN1"], n=9, seed=3).to_csv(rna, index=False)

        out = load_data(str(kin_net), str(tf_net), str(ms), str(rna),
                        kinopt_path=str(kin_path),
                        time_points_protein=T14, time_points_rna=T9)
        df_kin_clean = out[0]
        assert "alpha" in df_kin_clean.columns
        # merged alphas come from the fit, not the 1.0 default everywhere
        fitted = alpha_df["Alpha"].to_numpy()
        assert np.allclose(sorted(df_kin_clean["alpha"]), sorted(fitted),
                           atol=1e-9)

    def test_tfopt_export(self, tmp_path):
        from phoskintime_tpu.tfopt.optimize import run_local as tf_local

        mrna = wide_frame(["G1", "G2"], n=9)
        prot = wide_frame(["TF1", "TF1"], psites=["", "S5"])
        prot.loc[0, "Psite"] = np.nan
        net = pd.DataFrame({"Source": ["TF1", "TF1"], "Target": ["G1", "G2"]})
        prob, _ = build_tfopt_problem(mrna, prot, net)
        res = tf_local(prob, n_starts=4, steps=100, seed=0)
        written = export_tfopt_results(str(tmp_path / "tfopt_results.xlsx"),
                                       prob, res)
        assert written
        beta = read_table(str(tmp_path / "tfopt_results.xlsx"), "Beta Values")
        assert {"TF", "PSite", "Value"} <= set(beta.columns)


class TestTfoptDuplicateGenes:
    def test_duplicate_geneid_rows_keep_first(self, tmp_path):
        """Review repro: duplicate GeneID labels fanned out in .loc and
        desynchronized mRNA_mat from regulators."""
        import pandas as pd

        from phoskintime_tpu.tfopt.data import load_tfopt_problem

        rng = np.random.default_rng(0)

        def wide(genes, n=9):
            d = {"GeneID": genes}
            for i in range(1, n + 1):
                d[f"x{i}"] = rng.uniform(0.5, 2.0, len(genes))
            return pd.DataFrame(d)

        mrna = wide(["GA", "GA", "GB"])                 # GA duplicated
        mrna.to_csv(tmp_path / "input3.csv", index=False)
        prot = wide(["TF1"], n=14)
        prot.insert(1, "Psite", [""])
        prot.to_csv(tmp_path / "input1.csv", index=False)
        pd.DataFrame({"Source": ["TF1", "TF1"], "Target": ["GA", "GB"]}
                     ).to_csv(tmp_path / "input4.csv", index=False)

        prob, meta = load_tfopt_problem(tmp_path / "input1.csv",
                                        tmp_path / "input3.csv",
                                        tmp_path / "input4.csv")
        assert prob.mRNA_mat.shape[0] == prob.regulators.shape[0] == 2
        assert prob.gene_ids == ["GA", "GB"]
