"""Run-artifact dashboard: reloadable bundle + interactive view.

Spec: reference ``global_model/dashboard_bundle.py:32-79`` (pickled bundle
of run artifacts) and ``dashboard_app.py`` / ``run_dashboard.py``
(Streamlit viewer). The bundle format is preserved; the viewer renders a
static self-contained HTML dashboard by default and upgrades to the
Streamlit app when streamlit is installed.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd


def save_dashboard_bundle(path: str, *, pareto_X, pareto_F, best_idx,
                          df_prot=None, df_rna=None, df_pho=None,
                          pred_prot=None, pred_rna=None, pred_pho=None,
                          params=None, topo_summary=None, history=None,
                          extras=None) -> str:
    bundle = {
        "pareto_X": np.asarray(pareto_X),
        "pareto_F": np.asarray(pareto_F),
        "best_idx": int(best_idx),
        "df_prot": df_prot, "df_rna": df_rna, "df_pho": df_pho,
        "pred_prot": pred_prot, "pred_rna": pred_rna, "pred_pho": pred_pho,
        "params": params, "topo_summary": topo_summary,
        "history": history, "extras": extras or {},
    }
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(str(path), "wb") as fh:
        pickle.dump(bundle, fh, protocol=4)
    return str(path)


def load_dashboard_bundle(path: str) -> dict:
    with open(str(path), "rb") as fh:
        return pickle.load(fh)


def render_dashboard(bundle: dict | str, out_dir: str) -> str:
    """Static HTML dashboard from a bundle (works with zero extra deps)."""
    from phoskintime_tpu.report.html import create_report
    from phoskintime_tpu.report.plotter import (
        plot_convergence,
        plot_parallel_coords_pareto,
        plot_pareto_3d,
    )

    if isinstance(bundle, str):
        bundle = load_dashboard_bundle(bundle)
    out_dir = str(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    plot_pareto_3d(bundle["pareto_F"], os.path.join(out_dir, "pareto_3d.png"),
                   best_idx=bundle["best_idx"])
    plot_parallel_coords_pareto(bundle["pareto_F"],
                                os.path.join(out_dir, "pareto_parallel.png"))
    if bundle.get("history"):
        plot_convergence(bundle["history"],
                         os.path.join(out_dir, "convergence.png"))

    tables = {}
    F = bundle["pareto_F"]
    tables["Pareto objectives"] = pd.DataFrame(
        F, columns=["protein", "rna", "phospho"]).assign(
        picked=[i == bundle["best_idx"] for i in range(len(F))])
    if bundle.get("topo_summary") is not None:
        tables["Topology"] = pd.DataFrame([bundle["topo_summary"]])
    for key, name in [("pred_prot", "Predicted protein FC"),
                      ("pred_rna", "Predicted RNA FC")]:
        if bundle.get(key) is not None:
            tables[name] = bundle[key].head(50)

    return create_report(out_dir, output_file="dashboard.html",
                         title="phoskintime-tpu dashboard", tables=tables)


def run_dashboard(bundle_path: str, out_dir: str = "dashboard",
                  port: int = 8501):
    """Streamlit viewer when available; static HTML otherwise
    (reference run_dashboard.py)."""
    try:
        import streamlit  # noqa: F401
        import subprocess
        import sys

        app = os.path.join(os.path.dirname(__file__), "_streamlit_app.py")
        return subprocess.Popen([sys.executable, "-m", "streamlit", "run",
                                 app, "--server.port", str(port), "--",
                                 bundle_path])
    except ImportError:
        path = render_dashboard(bundle_path, out_dir)
        print(f"streamlit not installed; wrote static dashboard: {path}")
        return path
