"""Result exporters: workbooks (Excel or per-sheet CSV), Pareto tables,
kinopt/tfopt result files, parameter/trajectory dumps.

Spec: reference ``global_model/export.py`` (Pareto -> Excel with all
solutions + trajectories, per-gene series, kinase activities, parameter
correlations, residuals, distributions), ``kinopt/*/exporter`` and
``tfopt/*`` (Observed/Estimated/Alpha/Beta/Residuals sheets),
``utils/iodata.py`` (per-gene results workbook).

When no Excel engine is installed, each sheet lands as
``<stem>_<sheet_slug>.csv`` — the exact pattern ``io.load.read_table``
falls back to, so downstream prior-merging keeps working.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from phoskintime_tpu.config.logconf import setup_logger

logger = setup_logger()


class TableWriter:
    """Multi-sheet writer with CSV fallback."""

    def __init__(self, path: str):
        self.path = str(path)
        self.sheets: dict[str, pd.DataFrame] = {}

    def add(self, sheet_name: str, df: pd.DataFrame):
        self.sheets[sheet_name] = df

    def save(self) -> list[str]:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        try:
            with pd.ExcelWriter(self.path) as xl:
                for name, df in self.sheets.items():
                    df.to_excel(xl, sheet_name=name[:31], index=False)
            logger.info(f"[Export] wrote {self.path} ({len(self.sheets)} sheets)")
            return [self.path]
        except (ImportError, ModuleNotFoundError):
            written = []
            for name, df in self.sheets.items():
                slug = re.sub(r"\W+", "_", name.strip().lower())
                p = re.sub(r"\.xlsx?$", f"_{slug}.csv", self.path)
                df.to_csv(p, index=False)
                written.append(p)
            logger.info(f"[Export] no Excel engine; wrote {len(written)} CSVs "
                        f"for {self.path}")
            return written


# ---------------------------------------------------------------------------
# global-model exports
# ---------------------------------------------------------------------------

def export_pareto(path, pareto_X, pareto_F, param_labels=None):
    """All Pareto solutions + objectives (reference export.py:40-146)."""
    w = TableWriter(path)
    Fdf = pd.DataFrame(np.asarray(pareto_F),
                       columns=["obj_protein", "obj_rna", "obj_phospho"])
    w.add("Objectives", Fdf.reset_index(names="solution"))
    X = np.asarray(pareto_X)
    cols = (param_labels if param_labels is not None
            else [f"theta_{i}" for i in range(X.shape[1])])
    Xdf = pd.DataFrame(X, columns=cols)
    w.add("Solutions", Xdf.reset_index(names="solution"))
    return w.save()


def export_trajectories(path, df_prot, df_rna, df_pho,
                        obs_prot=None, obs_rna=None, obs_pho=None):
    """Predicted (and observed) trajectories per modality."""
    w = TableWriter(path)
    w.add("Pred Protein", df_prot)
    w.add("Pred RNA", df_rna)
    w.add("Pred Phospho", df_pho)
    if obs_prot is not None:
        w.add("Obs Protein", obs_prot)
    if obs_rna is not None:
        w.add("Obs RNA", obs_rna)
    if obs_pho is not None:
        w.add("Obs Phospho", obs_pho)
    return w.save()


def export_global_params(path, topo, params: dict):
    """Fitted physical parameters with biological labels."""
    rows = []
    for k, name in enumerate(topo.kinases):
        rows.append(("c_k", name, "", float(np.asarray(params["c_k"])[k])))
    for i, p in enumerate(topo.proteins):
        for key, label in [("A_i", "synthesis"), ("B_i", "mRNA_deg"),
                           ("C_i", "translation"), ("D_i", "protein_deg"),
                           ("E_i", "dephospho")]:
            rows.append((key, p, label, float(np.asarray(params[key])[i])))
        for j, site in enumerate(topo.sites[i]):
            rows.append(("Dp_i", p, site, float(np.asarray(params["Dp_i"])[i, j])))
    rows.append(("tf_scale", "GLOBAL", "", float(np.asarray(params["tf_scale"]))))
    df = pd.DataFrame(rows, columns=["param", "entity", "detail", "value"])
    w = TableWriter(path)
    w.add("Parameters", df)
    return w.save()


def export_kinase_activities(path, topo, params, Kmat, grid):
    """Kinase activity series Kt = K(t) * c_k (reference export suite)."""
    ck = np.asarray(params["c_k"])
    act = np.asarray(Kmat) * ck[:, None]
    df = pd.DataFrame(act, columns=[f"t{g:g}" for g in np.asarray(grid)])
    df.insert(0, "kinase", topo.kinases)
    w = TableWriter(path)
    w.add("Kinase Activity", df)
    return w.save()


def export_residuals(path, df_obs, df_pred, keys):
    merged = df_obs.merge(df_pred, on=keys + ["time"], how="inner")
    merged["residual"] = merged["fc"] - merged["pred_fc"]
    w = TableWriter(path)
    w.add("Residuals", merged)
    return w.save()


def export_param_distributions(path, pareto_X, slices, topo):
    """Per-parameter-group distribution stats across the Pareto set."""
    from phoskintime_tpu.network.params import softplus
    import jax.numpy as jnp

    X = np.asarray(pareto_X)
    rows = []
    for key, sl in slices.items():
        vals = np.asarray(softplus(jnp.asarray(X[:, sl])))
        rows.append((key, vals.mean(), vals.std(), vals.min(), vals.max()))
    df = pd.DataFrame(rows, columns=["param", "mean", "std", "min", "max"])
    w = TableWriter(path)
    w.add("Param Distributions", df)
    return w.save()


# ---------------------------------------------------------------------------
# kinopt / tfopt result workbooks
# ---------------------------------------------------------------------------

def kinopt_sheets(prob, result, meta=None) -> dict:
    """Observed/Estimated/Alpha/Beta/Residuals sheets as DataFrames
    (reference kinopt/*/exporter schemas; the Alpha/Beta sheets are what
    the global model reads back as priors, io.py:78-127). Shared by the
    workbook exporter and the result-explorer app."""
    import jax.numpy as jnp

    from phoskintime_tpu.kinopt.model import predict

    est = np.asarray(predict(prob, jnp.asarray(result.alpha),
                             jnp.asarray(result.beta)))
    tcols = [f"x{i + 1}" for i in range(prob.P_obs.shape[1])]
    names = prob.gp_names or [(f"G{i}", f"S{i}") for i in range(prob.n_gp)]

    obs_df = pd.DataFrame(prob.P_obs, columns=tcols)
    obs_df.insert(0, "Psite", [s for _, s in names])
    obs_df.insert(0, "Gene", [g for g, _ in names])
    est_df = pd.DataFrame(est, columns=tcols)
    est_df.insert(0, "Psite", [s for _, s in names])
    est_df.insert(0, "Gene", [g for g, _ in names])
    res_df = est_df.copy()
    res_df[tcols] = obs_df[tcols] - est_df[tcols]

    alpha_rows = []
    kn = prob.kinase_names or [f"K{j}" for j in range(prob.n_k)]
    for i, (g, s) in enumerate(names):
        for c in range(prob.gp_mask.shape[1]):
            if prob.gp_mask[i, c]:
                alpha_rows.append((g, s, kn[prob.gp_kin_idx[i, c]],
                                   float(result.alpha[i, c])))
    alpha_df = pd.DataFrame(alpha_rows, columns=["Gene", "Psite", "Kinase", "Alpha"])

    beta_rows = []
    kidx = (meta or {}).get("K_index", {})
    for j, k in enumerate(kn):
        labels = [lbl for lbl, _ in kidx.get(k, [])]
        for c in range(prob.k_mask.shape[1]):
            if prob.k_mask[j, c]:
                lbl = labels[c] if c < len(labels) else f"P{c + 1}"
                beta_rows.append((k, lbl, float(result.beta[j, c])))
    beta_df = pd.DataFrame(beta_rows, columns=["Kinase", "Psite", "Beta"])
    # global per-kinase betas (Psite empty) = sum for prior consumption
    glob = beta_df.groupby("Kinase", as_index=False)["Beta"].sum()
    glob["Psite"] = ""
    beta_df = pd.concat([beta_df, glob[["Kinase", "Psite", "Beta"]]],
                        ignore_index=True)

    return {"Observed": obs_df, "Estimated": est_df,
            "Alpha Values": alpha_df, "Beta Values": beta_df,
            "Residuals": res_df}


def export_kinopt_results(path, prob, result, meta=None):
    """Write the kinopt workbook (Excel, or CSVs without an engine)."""
    w = TableWriter(path)
    for name, df in kinopt_sheets(prob, result, meta).items():
        w.add(name, df)
    return w.save()


def tfopt_sheets(prob, result) -> dict:
    """mRNA/TF sheets in the global-model prior schema
    (mRNA, TF, Value / TF, PSite, Value)."""
    import jax.numpy as jnp

    from phoskintime_tpu.tfopt.model import predict

    est = np.asarray(predict(prob, jnp.asarray(result.alpha),
                             jnp.asarray(result.beta)))
    T = prob.mRNA_mat.shape[1]
    tcols = [f"x{i + 1}" for i in range(T)]
    genes = prob.gene_ids or [f"G{i}" for i in range(prob.n_genes)]
    tfs = prob.tf_ids or [f"TF{i}" for i in range(prob.n_TF)]

    obs_df = pd.DataFrame(prob.mRNA_mat, columns=tcols)
    obs_df.insert(0, "mRNA", genes)
    est_df = pd.DataFrame(est, columns=tcols)
    est_df.insert(0, "mRNA", genes)

    alpha_rows = []
    for g in range(prob.n_genes):
        for r in range(prob.n_reg):
            tf = prob.regulators[g, r]
            if tf >= 0:
                alpha_rows.append((genes[g], tfs[tf], float(result.alpha[g, r])))
    alpha_df = pd.DataFrame(alpha_rows, columns=["mRNA", "TF", "Value"])

    beta_rows = []
    for f in range(prob.n_TF):
        beta_rows.append((tfs[f], "", float(result.beta[f, 0])))  # protein beta
        labels = (prob.psite_labels[f] if prob.psite_labels else [])
        for k in range(int(prob.num_psites[f])):
            lbl = labels[k] if k < len(labels) else f"S{k + 1}"
            beta_rows.append((tfs[f], lbl, float(result.beta[f, 1 + k])))
    beta_df = pd.DataFrame(beta_rows, columns=["TF", "PSite", "Value"])

    return {"Observed": obs_df, "Estimated": est_df,
            "Alpha Values": alpha_df, "Beta Values": beta_df}


def export_tfopt_results(path, prob, result):
    """Write the tfopt workbook (Excel, or CSVs without an engine)."""
    w = TableWriter(path)
    for name, df in tfopt_sheets(prob, result).items():
        w.add(name, df)
    return w.save()


# ---------------------------------------------------------------------------
# per-gene results
# ---------------------------------------------------------------------------

def export_gene_results(path, gene_results: dict):
    """Per-gene fitted parameters/errors workbook
    (reference utils: save_result)."""
    rows = []
    for gene, res in gene_results.items():
        row = {"gene": gene, "error": res.error, "score": res.score,
               "lambda": res.lambda_reg, "weight": res.weight_name,
               "reg_term": res.regularization_term}
        for i, v in enumerate(np.asarray(res.params)):
            row[f"p{i}"] = float(v)
        rows.append(row)
    df = pd.DataFrame(rows)
    w = TableWriter(path)
    w.add("Results", df)
    return w.save()


def export_param_correlations(path, pareto_X, slices, topo,
                              heatmap_path=None):
    """Parameter correlation matrix across the Pareto ensemble — the
    reference's identifiability readout (export.py param-correlation
    family). High |r| between two parameters signals a sloppy/unidentifiable
    direction."""
    from phoskintime_tpu.network.params import softplus
    import jax.numpy as jnp

    X = np.asarray(pareto_X)
    phys = np.asarray(softplus(jnp.asarray(X)))
    labels = []
    for k in topo.kinases:
        labels.append(f"c_k[{k}]")
    for p_i, p in enumerate(topo.proteins):
        labels.append(f"A_i[{p}]")
    for p in topo.proteins:
        labels.append(f"B_i[{p}]")
    for p in topo.proteins:
        labels.append(f"C_i[{p}]")
    for p in topo.proteins:
        labels.append(f"D_i[{p}]")
    for i, p in enumerate(topo.proteins):
        for s in topo.sites[i]:
            labels.append(f"Dp_i[{p}:{s}]")
    for p in topo.proteins:
        labels.append(f"E_i[{p}]")
    labels.append("tf_scale")
    labels = labels[: phys.shape[1]]

    if len(phys) >= 3:
        with np.errstate(invalid="ignore"):
            corr = np.corrcoef(phys, rowvar=False)
        corr = np.nan_to_num(corr)
    else:
        corr = np.eye(phys.shape[1])
    df = pd.DataFrame(corr, index=labels, columns=labels)
    w = TableWriter(path)
    w.add("Param Correlations", df.reset_index(names="param"))
    written = w.save()

    if heatmap_path is not None and corr.shape[0] <= 200:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 7))
        im = ax.imshow(corr, cmap="RdBu_r", vmin=-1, vmax=1)
        ax.set_title("parameter correlations across Pareto ensemble")
        fig.colorbar(im, ax=ax, shrink=0.8)
        fig.savefig(heatmap_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(heatmap_path)
    return written
