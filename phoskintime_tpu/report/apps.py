"""Result-explorer apps for kinopt / tfopt fits.

Behavioral spec: reference ``app/kinopt.py`` and ``app/tfopt.py``
(3,088 LoC Streamlit apps that recompute network readouts from the result
workbooks, render the regulator network, and preview knockouts). Here the
same readouts render to a self-contained static HTML report with zero
extra dependencies (the gravis/graphviz network view becomes the layered
matplotlib DAG), and knockout previews are EXACT: the algebraic model is
re-predicted with the regulator's alpha entries zeroed, instead of
approximating from workbook shares.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _fit_stats(obs: np.ndarray, est: np.ndarray) -> dict:
    resid = est - obs
    ss_res = float(np.sum(resid ** 2))
    ss_tot = float(np.sum((obs - obs.mean()) ** 2))
    return {"rmse": float(np.sqrt(np.mean(resid ** 2))),
            "mae": float(np.mean(np.abs(resid))),
            "r2": 1.0 - ss_res / max(ss_tot, 1e-12)}


def render_kinopt_app(prob, result, out_dir: str, meta=None,
                      top_edges: int = 40) -> str:
    """Static HTML explorer for a kinopt fit (reference app/kinopt.py)."""
    import jax.numpy as jnp

    from phoskintime_tpu.analysis.network_tools import (
        kinopt_network_readout, plot_breadth_vs_load, plot_identity_band,
        plot_network_dag)
    from phoskintime_tpu.io.export import kinopt_sheets
    from phoskintime_tpu.kinopt.model import predict
    from phoskintime_tpu.report.html import create_report

    os.makedirs(out_dir, exist_ok=True)
    sheets = kinopt_sheets(prob, result, meta)
    tcols = [c for c in sheets["Observed"].columns if c.startswith("x")]
    obs = sheets["Observed"][tcols].to_numpy(float)
    est = sheets["Estimated"][tcols].to_numpy(float)
    names = [f"{g} {s}" for g, s in
             zip(sheets["Observed"]["Gene"], sheets["Observed"]["Psite"])]

    readout = kinopt_network_readout(sheets["Alpha Values"],
                                     sheets["Beta Values"])

    plot_identity_band(obs.ravel(), est.ravel(),
                       os.path.join(out_dir, "identity_band.png"),
                       labels=np.repeat(names, len(tcols)),
                       title="observed vs reconstructed P(t)")
    plot_breadth_vs_load(readout, os.path.join(out_dir, "breadth_load.png"))

    a = sheets["Alpha Values"].copy()
    a["weight"] = a["Alpha"]
    a = a.rename(columns={"Kinase": "source"})
    a["target"] = a["Gene"] + " " + a["Psite"]
    # rank by |alpha| — strong inhibitory (negative) edges are as
    # important as activating ones (the tfopt path already did this)
    edges = a.reindex(a["weight"].abs().sort_values(ascending=False).index
                      )[:top_edges][["source", "target", "weight"]]
    plot_network_dag(edges, os.path.join(out_dir, "network_dag.png"),
                     title="kinase -> site control logic (top edges)")

    # exact knockout previews: zero each kinase's alpha entries, re-predict —
    # ONE vmapped batch over all K scenarios instead of a Python loop
    import jax

    kn = prob.kinase_names or [f"K{j}" for j in range(prob.n_k)]
    alpha = jnp.asarray(result.alpha)
    kin_idx = jnp.asarray(prob.gp_kin_idx)
    beta = jnp.asarray(result.beta)
    est_ko = np.asarray(jax.vmap(
        lambda j: predict(prob, alpha * (kin_idx != j), beta)
    )(jnp.arange(len(kn))))                                  # (K, C, T)
    ko_rows = []
    for j, k in enumerate(kn):
        delta = np.abs(est_ko[j] - est)
        i_top = int(np.argmax(delta.mean(axis=1)))
        ko_rows.append({"kinase": k,
                        "total_effect": float(delta.sum()),
                        "max_site_effect": float(delta.mean(axis=1).max()),
                        "most_affected": names[i_top]})
    ko_df = pd.DataFrame(ko_rows).sort_values(
        "total_effect", ascending=False).reset_index(drop=True)

    # interactive single-file explorer (reference app/kinopt.py's curve
    # browser / knockout preview / gravis network, redelivered dependency-
    # free — see report/interactive.py)
    from phoskintime_tpu.report.interactive import write_interactive_explorer

    write_interactive_explorer(
        os.path.join(out_dir, "kinopt_interactive.html"),
        title="kinopt interactive explorer",
        times=np.arange(1, len(tcols) + 1, dtype=float),
        curve_names=names, obs=obs, est=est,
        ko_names=kn, ko_est=est_ko, network_edges=edges,
        source_layer_names=set(kn))

    tables = {
        "Fit statistics": pd.DataFrame([_fit_stats(obs, est)]),
        "Kinase network readout": readout,
        "Knockout preview (exact re-prediction)": ko_df,
        "Residuals (head)": sheets["Residuals"].head(30),
    }
    return create_report(out_dir, output_file="kinopt_app.html",
                         title="kinopt result explorer", tables=tables)


def render_tfopt_app(prob, result, out_dir: str,
                     top_edges: int = 40) -> str:
    """Static HTML explorer for a tfopt fit (reference app/tfopt.py)."""
    import jax.numpy as jnp

    from phoskintime_tpu.analysis.network_tools import (
        plot_breadth_vs_load, plot_identity_band, plot_network_dag,
        tfopt_network_readout)
    from phoskintime_tpu.io.export import tfopt_sheets
    from phoskintime_tpu.report.html import create_report
    from phoskintime_tpu.tfopt.model import predict

    os.makedirs(out_dir, exist_ok=True)
    sheets = tfopt_sheets(prob, result)
    tcols = [c for c in sheets["Observed"].columns if c.startswith("x")]
    obs = sheets["Observed"][tcols].to_numpy(float)
    est = sheets["Estimated"][tcols].to_numpy(float)
    genes = list(sheets["Observed"]["mRNA"])

    readout = tfopt_network_readout(sheets["Alpha Values"],
                                    sheets["Beta Values"])
    plot_identity_band(obs.ravel(), est.ravel(),
                       os.path.join(out_dir, "identity_band.png"),
                       labels=np.repeat(genes, len(tcols)),
                       title="observed vs reconstructed mRNA(t)")
    plot_breadth_vs_load(readout, os.path.join(out_dir, "breadth_load.png"),
                         breadth_col="n_genes")

    a = sheets["Alpha Values"].copy()
    a = a.rename(columns={"TF": "source", "mRNA": "target",
                          "Value": "weight"})
    edges = a.reindex(a["weight"].abs().sort_values(ascending=False).index
                      )[:top_edges][["source", "target", "weight"]]
    plot_network_dag(edges, os.path.join(out_dir, "network_dag.png"),
                     title="TF -> mRNA control logic (top edges)")

    import jax

    tfs = prob.tf_ids or [f"TF{i}" for i in range(prob.n_TF)]
    alpha = jnp.asarray(result.alpha)
    regs = jnp.asarray(prob.regulators)
    beta = jnp.asarray(result.beta)
    est_ko = np.asarray(jax.vmap(
        lambda r: predict(prob, alpha * (regs != r), beta)
    )(jnp.arange(len(tfs))))                                 # (K, C, T)
    ko_rows = []
    for r, tf in enumerate(tfs):
        delta = np.abs(est_ko[r] - est)
        i_top = int(np.argmax(delta.mean(axis=1)))
        ko_rows.append({"tf": tf, "total_effect": float(delta.sum()),
                        "most_affected": genes[i_top]})
    ko_df = pd.DataFrame(ko_rows).sort_values(
        "total_effect", ascending=False).reset_index(drop=True)

    from phoskintime_tpu.report.interactive import write_interactive_explorer

    write_interactive_explorer(
        os.path.join(out_dir, "tfopt_interactive.html"),
        title="tfopt interactive explorer",
        times=np.arange(1, len(tcols) + 1, dtype=float),
        curve_names=genes, obs=obs, est=est,
        ko_names=tfs, ko_est=est_ko, network_edges=edges,
        source_layer_names=set(tfs))

    tables = {
        "Fit statistics": pd.DataFrame([_fit_stats(obs, est)]),
        "TF network readout": readout,
        "Knockout preview (exact re-prediction)": ko_df,
    }
    return create_report(out_dir, output_file="tfopt_app.html",
                         title="tfopt result explorer", tables=tables)
