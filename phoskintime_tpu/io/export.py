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
    """Write the kinopt workbook (Excel, or CSVs without an engine),
    including the time-resolved network readout sheets (kinase load,
    target fragility, knockout effects — reference
    scripts/kinopt_network_readout.py outputs)."""
    from phoskintime_tpu.analysis.network_tools import kinopt_signal_readout

    w = TableWriter(path)
    for name, df in kinopt_sheets(prob, result, meta).items():
        w.add(name, df)
    for name, df in kinopt_signal_readout(prob, result.alpha,
                                          result.beta).items():
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
    """Write the tfopt workbook (Excel, or CSVs without an engine),
    including the TF-load / gene-fragility / knockout readout sheets
    (reference scripts/tfopt_network_readout.py outputs)."""
    from phoskintime_tpu.analysis.network_tools import tfopt_signal_readout

    w = TableWriter(path)
    for name, df in tfopt_sheets(prob, result).items():
        w.add(name, df)
    for name, df in tfopt_signal_readout(prob, result.alpha,
                                         result.beta).items():
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


def export_S_rates(system, params, output_dir,
                   filename="S_rates_picked.csv", long=True):
    """Per-site phosphorylation drive S(t) = W . (K(t) * c_k) at the
    optimized parameters, one value per (site, kinase-grid bin).

    Spec: reference ``global_model/export.py:1256-1320`` (export_S_rates) —
    sparse CSR W dot dense K matrix there; here ONE dense einsum over the
    padded (N, Smax, K) tensor, then a flat-site gather back to the
    reference's (protein, psite) row order.
    """
    os.makedirs(output_dir, exist_ok=True)
    topo = system.topo
    ck = np.asarray(params["c_k"], float)
    K_scaled = np.asarray(system.Kmat, float) * ck[:, None]      # (K, n_bins)
    W = np.asarray(system.topo.W_pad, float)                     # (N, Smax, K)
    S_pad = np.einsum("nsk,kt->nst", W, K_scaled)                # (N, Smax, T)
    times = np.asarray(system.kin_grid, float)

    proteins, psites, rows = [], [], []
    for i, p in enumerate(topo.proteins):
        for s_idx, s in enumerate(topo.sites[i]):
            proteins.append(p)
            psites.append(s)
            rows.append(S_pad[i, s_idx])
    S_mat = (np.stack(rows) if rows
             else np.zeros((0, len(times))))                      # (sites, T)

    if long:
        n_sites, n_bins = S_mat.shape
        df = pd.DataFrame({
            "protein": np.repeat(np.array(proteins, dtype=object), n_bins),
            "psite": np.repeat(np.array(psites, dtype=object), n_bins),
            "time": np.tile(times, n_sites),
            "S": S_mat.reshape(-1),
        })
    else:
        df = pd.DataFrame(S_mat, columns=[f"S_t{t:g}" for t in times])
        df.insert(0, "psite", psites)
        df.insert(0, "protein", proteins)
    out_path = os.path.join(output_dir, filename)
    df.to_csv(out_path, index=False)
    logger.info(f"[Export] Saved S rates to: {out_path}")
    return df


def plot_s_rates_report(csv_path, out_pdf, *, log_x=True,
                        top_k_sites_per_protein=24, max_sites_per_page=12,
                        ncols=3, heatmap_per_protein=True,
                        heatmap_cap_sites=80, dpi=150):
    """Multi-page PDF report over the S-rate CSV: a global AUC top-sites
    bar, an early-vs-late signaling scatter, then per-protein heatmaps +
    paginated small-multiples of the top-AUC sites.

    Spec: reference ``global_model/export.py:1321-1570``
    (plot_s_rates_report)."""
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    df = pd.read_csv(csv_path)
    df = df.dropna(subset=["protein", "psite", "time", "S"])
    df = (df.groupby(["protein", "psite", "time"], as_index=False)["S"]
          .mean().sort_values(["protein", "psite", "time"]))

    # AUC ranking per (protein, psite)
    auc_rows = []
    for (p, s), g in df.groupby(["protein", "psite"]):
        t = g["time"].to_numpy(float)
        y = g["S"].to_numpy(float)
        auc_rows.append((p, s, float(np.trapezoid(y, t)) if t.size > 1
                         else float(y[0]) if y.size else 0.0))
    auc_df = pd.DataFrame(auc_rows, columns=["protein", "psite", "AUC"])
    auc_df.sort_values("AUC", ascending=False, inplace=True)

    early_cut, late_cut = 2.0, min(120.0, float(df["time"].max()))
    early = (df[df["time"] <= early_cut]
             .groupby(["protein", "psite"])["S"].mean().rename("early_S"))
    late = (df[df["time"] >= late_cut]
            .groupby(["protein", "psite"])["S"].mean().rename("late_S"))
    el = pd.concat([early, late], axis=1).dropna().reset_index()

    def _xscale(ax):
        if log_x:
            ax.set_xscale("symlog" if (df["time"] == 0).any() else "log")

    out_pdf = str(out_pdf)
    os.makedirs(os.path.dirname(out_pdf) or ".", exist_ok=True)
    with PdfPages(out_pdf) as pdf:
        # page 1: global AUC top sites
        top_n = min(30, len(auc_df))
        top = auc_df.head(top_n)
        labels = (top["protein"].astype(str) + " "
                  + top["psite"].astype(str)).tolist()
        fig, ax = plt.subplots(figsize=(11, 0.35 * top_n + 2.5))
        ax.barh(range(top_n)[::-1], top["AUC"].to_numpy()[::-1])
        ax.set_yticks(range(top_n)[::-1])
        ax.set_yticklabels(labels[::-1], fontsize=8)
        ax.set_xlabel("AUC of S over time")
        ax.set_title(f"Top {top_n} sites by total signaling (AUC)")
        ax.grid(True, axis="x", alpha=0.25)
        fig.tight_layout()
        pdf.savefig(fig, dpi=dpi)
        plt.close(fig)

        # page 2: early vs late scatter
        if not el.empty:
            fig, ax = plt.subplots(figsize=(7.5, 6.5))
            x, y = el["early_S"].to_numpy(float), el["late_S"].to_numpy(float)
            ax.scatter(x, y, s=20, alpha=0.7)
            lo, hi = float(min(x.min(), y.min())), float(max(x.max(), y.max()))
            ax.plot([lo, hi], [lo, hi], ls="--", lw=1)
            ax.set_xlabel(f"Early mean S (t <= {early_cut})")
            ax.set_ylabel(f"Late mean S (t >= {late_cut})")
            ax.set_title("Early vs Late signaling per site")
            ax.grid(True, alpha=0.25)
            fig.tight_layout()
            pdf.savefig(fig, dpi=dpi)
            plt.close(fig)

        # per-protein pages
        for prot, sub in df.groupby("protein", sort=True):
            ranked = auc_df[auc_df["protein"] == prot]["psite"].tolist()
            if heatmap_per_protein and ranked:
                sites = ranked[:heatmap_cap_sites]
                piv = (sub[sub["psite"].isin(sites)]
                       .pivot(index="psite", columns="time", values="S")
                       .reindex(sites))
                piv = piv.reindex(sorted(piv.columns), axis=1)
                mat = piv.to_numpy(float)
                fig, ax = plt.subplots(
                    figsize=(10.5, max(3.5, 0.18 * mat.shape[0])))
                im = ax.imshow(mat, aspect="auto", interpolation="nearest")
                ax.set_title(f"{prot} — heatmap (top {len(sites)} sites by AUC)")
                ax.set_yticks(np.arange(len(piv.index)))
                ax.set_yticklabels(piv.index.tolist(), fontsize=7)
                ax.set_xticks(np.arange(len(piv.columns)))
                ax.set_xticklabels([str(c) for c in piv.columns],
                                   rotation=45, ha="right", fontsize=8)
                fig.colorbar(im, ax=ax, label="S")
                fig.tight_layout()
                pdf.savefig(fig, dpi=dpi)
                plt.close(fig)

            chunked = ranked[:top_k_sites_per_protein]
            pages = max(1, math.ceil(len(chunked) / max_sites_per_page))
            for page in range(pages):
                chunk = chunked[page * max_sites_per_page:
                                (page + 1) * max_sites_per_page]
                if not chunk:
                    continue
                nrows = math.ceil(len(chunk) / ncols)
                fig, axes = plt.subplots(nrows, ncols,
                                         figsize=(3.8 * ncols, 2.7 * nrows),
                                         squeeze=False)
                axes = axes.ravel()
                for ax_i, site in enumerate(chunk):
                    g = sub[sub["psite"] == site]
                    ax = axes[ax_i]
                    ax.plot(g["time"].to_numpy(float), g["S"].to_numpy(float),
                            marker="o", lw=1.5, ms=3)
                    _xscale(ax)
                    ax.set_title(f"{prot}  {site}", fontsize=9)
                    ax.grid(True, alpha=0.25)
                    if ax_i % ncols == 0:
                        ax.set_ylabel("S")
                    ax.set_xlabel("time")
                for j in range(len(chunk), len(axes)):
                    axes[j].axis("off")
                fig.suptitle(f"{prot} — site time series"
                             + (f" — page {page + 1}/{pages}"
                                if pages > 1 else ""), fontsize=12)
                fig.tight_layout(rect=[0, 0, 1, 0.96])
                pdf.savefig(fig, dpi=dpi)
                plt.close(fig)
    logger.info(f"[Export] Saved S-rate report to: {out_pdf}")
    return out_pdf


def scan_prior_reg(out_dir):
    """Post-hoc lambda-weight scan over the saved Pareto front: for every
    (lambda_prot, lambda_rna, lambda_phospho, lambda_prior) grid combo,
    pick the front member minimizing the weighted score; write the full
    scan, the unique picks, and a recommended choice.

    Spec: reference ``global_model/export.py:1174-1253`` (scan_prior_reg)
    — same grids, same row schema, same recommendation rule; the triple
    loop collapses to one (combos x front) matmul.
    """
    import itertools
    import json

    F = np.load(os.path.join(out_dir, "pareto_F.npy"))
    if F.ndim != 2 or F.shape[1] != 3:
        raise ValueError(f"Expected F shape (n, 3); got {F.shape}")

    lam_grid = np.logspace(-2, 2, 9)
    lam_prior_grid = np.logspace(-4, 0, 9)
    combos = np.asarray(list(itertools.product(lam_grid, lam_grid, lam_grid)))
    base = combos @ F.T.astype(float)                   # (729, n)
    best_i = base.argmin(axis=1)
    base_best = base[np.arange(len(base)), best_i]

    rows = []
    for c in range(len(combos)):
        for lprior in lam_prior_grid:
            rows.append({
                "lambda_prot": float(combos[c, 0]),
                "lambda_rna": float(combos[c, 1]),
                "lambda_phospho": float(combos[c, 2]),
                "lambda_prior": float(lprior),
                "best_i": int(best_i[c]),
                "best_score": float(lprior * base_best[c]),
                "prot_mse": float(F[best_i[c], 0]),
                "rna_mse": float(F[best_i[c], 1]),
                "phospho_mse": float(F[best_i[c], 2]),
            })
    df = pd.DataFrame(rows).sort_values(
        ["lambda_prot", "lambda_rna", "lambda_phospho", "lambda_prior"],
        ignore_index=True)
    df.to_csv(os.path.join(out_dir, "lambda_scan.csv"), index=False)

    uniq = df.drop_duplicates("best_i").copy()
    uniq.to_csv(os.path.join(out_dir, "lambda_scan_unique_picks.csv"),
                index=False)

    cand = uniq.sort_values(["prot_mse", "rna_mse", "phospho_mse"],
                            ignore_index=True).iloc[0]
    rec = {
        "lambda_prot": float(cand["lambda_prot"]),
        "lambda_rna": float(cand["lambda_rna"]),
        "lambda_phospho": float(cand["lambda_phospho"]),
        "lambda_prior": float(cand["lambda_prior"]),
        "best_i": int(cand["best_i"]),
        "objectives": {"prot_mse": float(cand["prot_mse"]),
                       "rna_mse": float(cand["rna_mse"]),
                       "phospho_mse": float(cand["phospho_mse"])},
        "note": "lambda_prior is a global multiplier; it does not change "
                "best_i for fixed F (only rescales best_score).",
    }
    with open(os.path.join(out_dir, "lambda_scan_recommended.json"), "w") as f:
        json.dump(rec, f, indent=2)
    logger.info("[Export] Lambda scan complete.")
    return df, uniq, rec


def export_pareto_trajectories(system, slices, pareto_X, t_points, path,
                               top_idx=None):
    """Tidy per-solution predicted trajectories for (a subset of) the
    Pareto front: sheets traj_protein / traj_rna / traj_phospho with a
    ``sol_id`` column, plus a summary sheet.

    Spec: reference ``global_model/export.py:220-414``
    (export_pareto_front_to_excel's trajectory sheets). ONE batched
    exponential simulation of all requested members replaces the
    reference's per-solution solve loop.
    """
    import jax
    import jax.numpy as jnp

    from phoskintime_tpu.network.expo import exponential_simulate_batched
    from phoskintime_tpu.network.params import unpack_params
    from phoskintime_tpu.network.simulate import (extract_observables,
                                                  fold_changes)

    topo = system.topo
    X = np.asarray(pareto_X, float)
    if top_idx is None:
        top_idx = np.arange(len(X))
    top_idx = np.asarray(top_idx, int)
    X = X[top_idx]
    times = np.unique(np.concatenate([np.asarray(t, float)
                                      for t in t_points]))

    def simulate_all(thetas):
        params_b = jax.vmap(
            lambda th: unpack_params(th, slices, topo)
        )(jnp.asarray(thetas, system.rhs.W_pad.dtype))
        ys, _ = exponential_simulate_batched(system, params_b, times)

        def fc(Y):
            return fold_changes(extract_observables(system, Y),
                                jnp.asarray(times))
        return jax.vmap(fc)(ys)

    fc_r, fc_p, fc_ph = (np.asarray(a) for a in jax.jit(simulate_all)(X))

    rows_p, rows_r, rows_ph = [], [], []
    for s, sid in enumerate(top_idx):
        for i, prot in enumerate(topo.proteins):
            rows_p.append(pd.DataFrame(
                {"sol_id": int(sid), "protein": prot, "time": times,
                 "pred_fc": fc_p[s, :, i]}))
            rows_r.append(pd.DataFrame(
                {"sol_id": int(sid), "protein": prot, "time": times,
                 "pred_fc": fc_r[s, :, i]}))
            for j, site in enumerate(topo.sites[i]):
                rows_ph.append(pd.DataFrame(
                    {"sol_id": int(sid), "protein": prot, "psite": site,
                     "time": times, "pred_fc": fc_ph[s, :, i, j]}))

    w = TableWriter(path)
    w.add("summary", pd.DataFrame({"sol_id": top_idx.astype(int)}))
    w.add("traj_protein", pd.concat(rows_p, ignore_index=True))
    w.add("traj_rna", pd.concat(rows_r, ignore_index=True))
    w.add("traj_phospho",
          pd.concat(rows_ph, ignore_index=True) if rows_ph
          else pd.DataFrame(columns=["sol_id", "protein", "psite", "time",
                                     "pred_fc"]))
    return w.save()


def plot_gof_solutions(traj_prot, traj_rna, traj_pho, df_prot, df_rna,
                       df_pho, out_dir, dpi=120):
    """Per-solution goodness-of-fit panels (obs vs pred scatter with R^2
    and chi^2 per modality) over the tidy trajectory frames from
    :func:`export_pareto_trajectories`.

    Spec: reference ``global_model/export.py:464-822``
    (plot_goodness_of_fit + plot_gof_from_pareto_excel)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    sol_ids = sorted(set(traj_prot["sol_id"].astype(int)))
    for sid in sol_ids:
        fig, axes = plt.subplots(1, 3, figsize=(15, 4.8))
        for ax, traj, obs, keys, title in [
                (axes[0], traj_prot, df_prot, ["protein"], "Protein"),
                (axes[1], traj_rna, df_rna, ["protein"], "mRNA"),
                (axes[2], traj_pho, df_pho, ["protein", "psite"],
                 "Phospho")]:
            sub = traj[traj["sol_id"] == sid]
            if obs is None or len(obs) == 0 or len(sub) == 0:
                ax.axis("off")
                continue
            m = obs.merge(sub, on=keys + ["time"], how="inner")
            if len(m) == 0:
                ax.axis("off")
                continue
            x = m["fc"].to_numpy(float)
            y = m["pred_fc"].to_numpy(float)
            ss_res = float(np.sum((y - x) ** 2))
            ss_tot = float(np.sum((x - x.mean()) ** 2))
            r2 = 1.0 - ss_res / max(ss_tot, 1e-12)
            chi2 = float(np.sum((y - x) ** 2 / np.maximum(np.abs(x), 1e-6)))
            ax.scatter(x, y, s=14, alpha=0.6)
            lo, hi = float(min(x.min(), y.min())), float(max(x.max(), y.max()))
            ax.plot([lo, hi], [lo, hi], "k--", lw=1)
            ax.set_title(f"{title}  R²={r2:.3f}  χ²={chi2:.3g}")
            ax.set_xlabel("observed FC")
            ax.set_ylabel("predicted FC")
            ax.grid(True, alpha=0.3)
        fig.suptitle(f"Goodness of fit — solution {sid}")
        fig.tight_layout()
        p = os.path.join(out_dir, f"gof_sol{sid}.png")
        fig.savefig(p, dpi=dpi)
        plt.close(fig)
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# convergence history + animation
# ---------------------------------------------------------------------------

def process_convergence_history(history, output_dir):
    """Per-generation best-objective history -> CSV + log-scale plot.

    Spec: reference ``global_model/export.py:1573-1634``
    (process_convergence_history); our GA history is already the
    (gen, F_min, F_mean) triple stream from the UNSGA3 loop, so no
    pymoo-result spelunking is needed.
    """
    if not history:
        logger.info("[Export] no convergence history; skipping")
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gens = [int(h[0]) for h in history]
    mins = np.stack([np.atleast_1d(np.asarray(h[1], float)) for h in history])
    cols = ["min_prot_mse", "min_rna_mse", "min_phos_mse"][: mins.shape[1]]
    df = pd.DataFrame(mins, columns=cols)
    df.insert(0, "gen", gens)
    os.makedirs(output_dir, exist_ok=True)
    df.to_csv(os.path.join(output_dir, "convergence_history.csv"), index=False)

    fig, ax = plt.subplots(figsize=(10, 6))
    for c, lbl in zip(cols, ["Protein MSE", "RNA MSE", "Phospho MSE"]):
        ax.plot(df["gen"], df[c], label=lbl)
    ax.set_yscale("log")
    ax.set_title("Convergence History (Best Error per Gen)")
    ax.set_xlabel("Generation")
    ax.set_ylabel("MSE (Log Scale)")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.savefig(os.path.join(output_dir, "convergence_plot.png"), dpi=150)
    plt.close(fig)
    logger.info("[Export] Saved convergence history and plot.")
    return df


def create_convergence_video(pop_history, pareto_F, output_dir,
                             filename="optimization_history.mp4",
                             max_frames=60, fps=5, dpi=110):
    """Animate the population's objective cloud generation by generation,
    ghosting the final Pareto front; MP4 via ffmpeg with a GIF/pillow
    fallback.

    Spec: reference ``global_model/export.py:146-219``
    (create_convergence_video). ``pop_history`` is a list of
    ``(gen, F (P, 3))`` snapshots collected by the fit callback.
    """
    if not pop_history:
        logger.info("[Export] no population history; skipping video")
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    frames = pop_history
    if len(frames) > max_frames:
        step = int(np.ceil(len(frames) / max_frames))
        frames = frames[::step]
        if frames[-1] is not pop_history[-1]:
            frames = frames + [pop_history[-1]]  # always end on the final gen

    all_F = np.vstack([np.asarray(F, float) for _, F in frames])
    min_f, max_f = all_F.min(axis=0), all_F.max(axis=0)
    span = np.maximum(max_f - min_f, 1e-12)
    pare = np.asarray(pareto_F, float) if pareto_F is not None else None

    fig = plt.figure(figsize=(8, 7))
    ax = fig.add_subplot(111, projection="3d")

    def update(k):
        ax.clear()
        gen, F = frames[k]
        F = np.asarray(F, float)
        ax.scatter(F[:, 0], F[:, 1], F[:, 2], c="blue", s=10, alpha=0.6,
                   label="Population")
        if pare is not None and pare.shape[1] >= 3:
            ax.scatter(pare[:, 0], pare[:, 1], pare[:, 2], c="red", s=5,
                       alpha=0.15)
        ax.set_title(f"Optimization History - Gen {gen}")
        ax.set_xlabel("Prot MSE")
        ax.set_ylabel("RNA MSE")
        ax.set_zlabel("Phospho MSE")
        ax.set_xlim(min_f[0], min_f[0] + span[0])
        ax.set_ylim(min_f[1], min_f[1] + span[1])
        ax.set_zlim(min_f[2], min_f[2] + span[2])
        ax.view_init(elev=45, azim=45)

    ani = animation.FuncAnimation(fig, update, frames=len(frames),
                                  interval=200)
    os.makedirs(output_dir, exist_ok=True)
    save_path = os.path.join(output_dir, filename)
    try:
        ani.save(save_path, writer="ffmpeg", fps=fps, dpi=dpi)
    except Exception:
        save_path = save_path.rsplit(".", 1)[0] + ".gif"
        ani.save(save_path, writer="pillow", fps=fps, dpi=dpi)
    plt.close(fig)
    logger.info(f"[Export] Saved convergence video: {save_path}")
    return save_path


# ---------------------------------------------------------------------------
# per-gene observed-vs-predicted time series
# ---------------------------------------------------------------------------

def save_gene_timeseries_plots(gene, df_prot_obs, df_prot_pred, df_rna_obs,
                               df_rna_pred, df_phos_obs, df_phos_pred,
                               output_dir, filename_prefix="ts", dpi=150,
                               phos_mode="per_psite"):
    """3-panel observed-vs-predicted time series for one protein: Protein,
    mRNA, and Phospho (mean or per-psite lines).

    Spec: reference ``global_model/export.py:979-1171``
    (save_gene_timeseries_plots). Predicted frames carry ``pred_fc``
    (the simulate_and_measure schema); observed carry ``fc``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    def sel(df, col):
        if df is None or len(df) == 0:
            return pd.DataFrame(columns=["time", col])
        out = df[df["protein"] == gene].copy()
        out["time"] = pd.to_numeric(out["time"], errors="coerce")
        out[col] = pd.to_numeric(out[col], errors="coerce")
        return out.dropna(subset=["time", col]).sort_values("time")

    def lighten(color, amount=0.65):
        r, g, b = mcolors.to_rgb(color)
        return tuple((1 - amount) * c + amount for c in (r, g, b))

    p_obs, p_pre = sel(df_prot_obs, "fc"), sel(df_prot_pred, "pred_fc")
    r_obs, r_pre = sel(df_rna_obs, "fc"), sel(df_rna_pred, "pred_fc")
    ph_obs, ph_pre = sel(df_phos_obs, "fc"), sel(df_phos_pred, "pred_fc")
    if all(len(d) == 0 for d in (p_obs, p_pre, r_obs, r_pre, ph_obs, ph_pre)):
        return None

    fig, (ax_p, ax_r, ax_ph) = plt.subplots(1, 3, figsize=(18, 5.5),
                                            sharey=True)
    for ax, obs, pre, col, title in [
            (ax_p, p_obs, p_pre, "C0", "Protein"),
            (ax_r, r_obs, r_pre, "C1", "mRNA")]:
        if len(obs):
            ax.plot(obs["time"], obs["fc"], marker="s", lw=1, label="obs",
                    color=lighten(col), alpha=0.6)
        if len(pre):
            ax.plot(pre["time"], pre["pred_fc"], lw=2, label="pred",
                    color=col)
        ax.set_title(f"{gene} — {title}")
        ax.set_xlabel("Time")
        ax.set_ylabel("FC")
        ax.grid(True, alpha=0.3)
        ax.legend()

    ax_ph.set_title(f"{gene} — Phosphorylation")
    ax_ph.set_xlabel("Time")
    ax_ph.grid(True, alpha=0.3)
    if len(ph_obs) or len(ph_pre):
        if phos_mode == "mean":
            if len(ph_obs):
                m = ph_obs.groupby("time", as_index=False)["fc"].mean()
                ax_ph.plot(m["time"], m["fc"], marker="s", lw=1,
                           label="obs (mean)", color=lighten("C2"), alpha=0.6)
            if len(ph_pre):
                m = ph_pre.groupby("time", as_index=False)["pred_fc"].mean()
                ax_ph.plot(m["time"], m["pred_fc"], lw=2, label="pred (mean)",
                           color="C2")
        else:
            psites = sorted(set(ph_obs.get("psite", pd.Series(dtype=object)))
                            | set(ph_pre.get("psite", pd.Series(dtype=object))))
            for ps_i, ps in enumerate(psites):
                # deterministic color per site (hash() is per-process
                # randomized and would recolor identical figures)
                col = f"C{ps_i % 10}"
                so = ph_obs[ph_obs.get("psite") == ps] if len(ph_obs) else ph_obs
                sp = ph_pre[ph_pre.get("psite") == ps] if len(ph_pre) else ph_pre
                if len(so):
                    ax_ph.plot(so["time"], so["fc"], marker="s", lw=1,
                               label=f"obs {ps}", color=lighten(col), alpha=0.6)
                if len(sp):
                    ax_ph.plot(sp["time"], sp["pred_fc"], lw=2,
                               label=f"pred {ps}", color=col)
        ax_ph.legend(ncol=2, fontsize=7)

    fig.suptitle(f"Observed vs Predicted Time Series — {gene}", y=0.995)
    fig.tight_layout()
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, f"{filename_prefix}_{gene}.png")
    fig.savefig(out_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return out_path


def save_all_gene_timeseries(df_prot_obs, df_prot_pred, df_rna_obs,
                             df_rna_pred, df_phos_obs, df_phos_pred,
                             output_dir, **kw):
    """Run :func:`save_gene_timeseries_plots` for every protein appearing
    in any modality (reference runner loops this per gene)."""
    genes = set()
    for df in (df_prot_obs, df_prot_pred, df_rna_obs, df_rna_pred,
               df_phos_obs, df_phos_pred):
        if df is not None and len(df):
            genes |= set(df["protein"].astype(str))
    paths = []
    for g in sorted(genes):
        p = save_gene_timeseries_plots(g, df_prot_obs, df_prot_pred,
                                       df_rna_obs, df_rna_pred, df_phos_obs,
                                       df_phos_pred, output_dir, **kw)
        if p:
            paths.append(p)
    return paths


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
