"""Streamlit dashboard app (spec: reference ``global_model/dashboard_app.py``).

Run via ``phoskintime_tpu.report.dashboard.run_dashboard`` — only imported
when streamlit is installed; the static HTML dashboard is the default.
"""

import sys

import numpy as np
import pandas as pd
import streamlit as st

from phoskintime_tpu.report.dashboard import load_dashboard_bundle


def main(bundle_path: str):
    st.set_page_config(page_title="phoskintime-tpu", layout="wide")
    st.title("phoskintime-tpu — global model dashboard")
    bundle = load_dashboard_bundle(bundle_path)

    F = np.asarray(bundle["pareto_F"])
    st.subheader("Pareto front")
    df = pd.DataFrame(F, columns=["protein", "rna", "phospho"])
    df["picked"] = [i == bundle["best_idx"] for i in range(len(F))]
    st.dataframe(df)

    col1, col2 = st.columns(2)
    with col1:
        st.scatter_chart(df, x="protein", y="rna")
    with col2:
        st.scatter_chart(df, x="protein", y="phospho")

    if bundle.get("history"):
        st.subheader("Convergence")
        hist = pd.DataFrame(
            [(g, *mins) for g, mins, _ in bundle["history"]],
            columns=["gen", "protein", "rna", "phospho"]).set_index("gen")
        st.line_chart(hist)

    for key, label in [("pred_prot", "Protein predictions"),
                       ("pred_rna", "RNA predictions"),
                       ("pred_pho", "Phospho predictions")]:
        if bundle.get(key) is not None:
            st.subheader(label)
            st.dataframe(bundle[key])

    if bundle.get("params") is not None:
        st.subheader("Fitted parameters")
        st.json({k: np.asarray(v).tolist() if hasattr(v, "shape") else v
                 for k, v in bundle["params"].items()})


if __name__ == "__main__":
    main(sys.argv[1])
