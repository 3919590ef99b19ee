"""Data loading, scaling and reshaping.

Spec: reference ``global_model/io.py:22-279`` and
``global_model/utils.py:107-197`` — CSV/Excel ingest, {K1,K2} set-notation
explosion, kinopt/tfopt Alpha/Beta prior sheet merges, wide (x1..x14) ->
long melt with time mapping, six scaling modes, name normalization.

All host-side pandas; Excel reads fall back to sibling CSVs when no Excel
engine is installed (exports in this framework are CSV-first).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from phoskintime_tpu.config.logconf import setup_logger

logger = setup_logger()


def normalize_columns(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [str(c).strip().lower() for c in out.columns]
    return out


def find_col(df: pd.DataFrame, candidates: list[str]) -> str | None:
    for c in candidates:
        if c in df.columns:
            return c
    return None


def read_table(path: str, sheet_name: str | None = None) -> pd.DataFrame | None:
    """Read xlsx (if an engine exists) or CSV; returns None on failure.

    For an xlsx path with a sheet name, also tries
    ``<stem>_<sheet_slug>.csv`` — the format our own exporters write when
    no Excel engine is available.
    """
    if path is None or not os.path.exists(str(path)):
        # try the CSV sibling of an absent xlsx
        if path and sheet_name and str(path).endswith(".xlsx"):
            alt = _sheet_csv_path(path, sheet_name)
            if os.path.exists(alt):
                return pd.read_csv(alt)
        return None
    p = str(path)
    if p.endswith((".xlsx", ".xls")):
        try:
            return pd.read_excel(p, sheet_name=sheet_name or 0)
        except ImportError:
            alt = _sheet_csv_path(p, sheet_name or "sheet1")
            if os.path.exists(alt):
                return pd.read_csv(alt)
            logger.warning(f"[Data] no Excel engine and no CSV fallback for {p}")
            return None
    return pd.read_csv(p)


def _sheet_csv_path(path: str, sheet_name: str) -> str:
    slug = re.sub(r"\W+", "_", sheet_name.strip().lower())
    return re.sub(r"\.xlsx?$", f"_{slug}.csv", str(path))


# ---------------------------------------------------------------------------
# scaling + melt (reference utils.py:107-197)
# ---------------------------------------------------------------------------

def process_and_scale_raw_data(df, time_points, id_cols,
                               scale_method: str = "fc_start",
                               epsilon: float = 1e-3) -> pd.DataFrame:
    """Wide (x1..xN) -> tidy [id_cols..., time, fc] with non-negative scaling."""
    if df is None or len(df) == 0:
        return pd.DataFrame(columns=list(id_cols) + ["time", "fc"])

    x_cols = sorted([c for c in df.columns if re.fullmatch(r"x\d+", str(c))],
                    key=lambda c: int(str(c)[1:]))
    if not x_cols:
        logger.warning("[Data] no x-columns found; returning empty frame")
        return pd.DataFrame(columns=list(id_cols) + ["time", "fc"])
    x_cols = x_cols[: len(time_points)]
    t_map = {xc: tp for xc, tp in zip(x_cols, np.asarray(time_points, float))}

    work = df.copy()
    for c in x_cols:
        work[c] = pd.to_numeric(work[c], errors="coerce")

    if scale_method in ("raw", "none"):
        pass
    elif scale_method == "fc_start":
        start = work[x_cols[0]].replace(0, epsilon)
        work[x_cols] = work[x_cols].div(start, axis=0)
    elif scale_method == "robust_fc":
        work[x_cols] = work[x_cols].div(work[x_cols[0]] + epsilon, axis=0)
    elif scale_method == "max_scale":
        peaks = work[x_cols].max(axis=1).replace(0, epsilon)
        work[x_cols] = work[x_cols].div(peaks, axis=0)
    elif scale_method == "mean_scale":
        means = work[x_cols].mean(axis=1).replace(0, epsilon)
        work[x_cols] = work[x_cols].div(means, axis=0)
    elif scale_method == "l2_norm":
        l2 = np.sqrt((work[x_cols] ** 2).sum(axis=1)).replace(0, epsilon)
        work[x_cols] = work[x_cols].div(l2, axis=0)
    else:
        raise ValueError(f"Unknown scale_method {scale_method}")

    valid_ids = [c for c in id_cols if c in work.columns]
    melted = work[valid_ids + x_cols].melt(id_vars=valid_ids, value_vars=x_cols,
                                           var_name="xcol", value_name="fc")
    melted["time"] = melted["xcol"].map(t_map)
    melted = melted.dropna(subset=["fc", "time"]).drop(columns=["xcol"])
    if "protein" in melted.columns:
        melted["protein"] = melted["protein"].astype(str).str.strip().str.upper()
    if "psite" in melted.columns:
        melted["psite"] = melted["psite"].fillna("").astype(str).str.strip()
    return melted


def explode_kinase_sets(df, pcol, scol, kcol) -> pd.DataFrame:
    """{K1, K2} cells -> one row per kinase (reference io.py:63-74)."""
    from phoskintime_tpu.io.utils import parse_kinase_set

    rows = []
    for _, r in df.iterrows():
        for k in parse_kinase_set(r[kcol], upper=True):
            rows.append((str(r[pcol]).strip().upper(),
                         str(r[scol]).strip(), k))
    return pd.DataFrame(rows, columns=["protein", "psite", "kinase"]).drop_duplicates()


# ---------------------------------------------------------------------------
# full load (reference io.py load_data)
# ---------------------------------------------------------------------------

def load_data(kinase_net, tf_net, ms, rna, kinopt_path=None, tfopt_path=None,
              time_points_protein=None, time_points_rna=None,
              scaling_method: str = "raw"):
    """Load the complete global-model data bundle.

    Returns (df_kin_clean, df_tf_clean, df_prot, df_pho, df_rna,
    kin_beta_map, tf_beta_map, kin_alpha, tf_edge_weights).
    """
    # --- kinase network + alpha priors ----------------------------------
    df_kin = normalize_columns(pd.read_csv(kinase_net))
    pcol = find_col(df_kin, ["geneid", "protein", "gene"])
    scol = find_col(df_kin, ["psite", "site"])
    kcol = find_col(df_kin, ["kinase", "k"])
    df_kin_clean = explode_kinase_sets(df_kin, pcol, scol, kcol)

    kin_alpha = {}
    kin_beta_map = {}
    df_ka = read_table(kinopt_path, "Alpha Values")
    if df_ka is not None:
        df_ka = df_ka.rename(columns={"Gene": "protein", "Psite": "psite",
                                      "Kinase": "kinase", "Alpha": "alpha"})
        for _, r in df_ka.iterrows():
            key = (str(r["protein"]).strip().upper(), str(r["psite"]).strip(),
                   str(r["kinase"]).strip().upper())
            kin_alpha[key] = float(r["alpha"])
    df_kb = read_table(kinopt_path, "Beta Values")
    if df_kb is not None:
        df_kb = df_kb.rename(columns={"Kinase": "kinase", "Beta": "beta",
                                      "Psite": "psite"})
        if "psite" not in df_kb.columns:
            # per-kinase-only beta sheet (no Psite column) — every row is
            # a global beta, mirroring the tfopt guard below
            df_kb["psite"] = ""
        glob = df_kb["psite"].isna() | (df_kb["psite"].astype(str).str.strip() == "")
        kin_beta_map = dict(zip(df_kb.loc[glob, "kinase"].astype(str).str.upper(),
                                df_kb.loc[glob, "beta"].astype(float)))

    df_kin_clean["alpha"] = [
        kin_alpha.get((r["protein"], r["psite"], r["kinase"]), 1.0)
        for _, r in df_kin_clean.iterrows()]

    # --- TF network + alpha priors ---------------------------------------
    df_tf = normalize_columns(pd.read_csv(tf_net))
    scol_tf = find_col(df_tf, ["source", "tf"])
    tcol = find_col(df_tf, ["target", "gene"])
    df_tf_clean = pd.DataFrame({
        "tf": df_tf[scol_tf].astype(str).str.strip().str.upper(),
        "target": df_tf[tcol].astype(str).str.strip().str.upper(),
    }).drop_duplicates()

    tf_edge_weights = {}
    tf_beta_map = {}
    df_ta = read_table(tfopt_path, "Alpha Values")
    if df_ta is not None:
        df_ta = df_ta.rename(columns={"mRNA": "target", "TF": "tf", "Value": "alpha"})
        for _, r in df_ta.iterrows():
            tf_edge_weights[(str(r["tf"]).strip().upper(),
                             str(r["target"]).strip().upper())] = float(r["alpha"])
    df_tb = read_table(tfopt_path, "Beta Values")
    if df_tb is not None:
        df_tb = df_tb.rename(columns={"TF": "tf", "Value": "beta", "PSite": "psite",
                                      "Psite": "psite"})
        if "psite" in df_tb.columns:
            glob = df_tb["psite"].isna() | (df_tb["psite"].astype(str).str.strip() == "")
            df_tb = df_tb[glob]
        tf_beta_map = dict(zip(df_tb["tf"].astype(str).str.upper(),
                               df_tb["beta"].astype(float)))

    df_tf_clean["alpha"] = [
        tf_edge_weights.get((r["tf"], r["target"]), 1.0)
        for _, r in df_tf_clean.iterrows()]

    # --- MS data (protein + phospho split) --------------------------------
    df_ms_raw = pd.read_csv(ms)
    df_ms_raw = df_ms_raw.rename(columns={c: str(c).strip() for c in df_ms_raw.columns})
    ms_norm = normalize_columns(df_ms_raw)
    gcol = find_col(ms_norm, ["geneid", "protein"])
    ms_norm = ms_norm.rename(columns={gcol: "protein"})
    if "psite" not in ms_norm.columns:
        ms_norm["psite"] = ""
    tidy = process_and_scale_raw_data(ms_norm, time_points_protein,
                                      ["protein", "psite"], scaling_method)
    is_prot = tidy["psite"].str.len().eq(0) | tidy["psite"].isin(["nan", "NaN"])
    df_prot = tidy.loc[is_prot, ["protein", "time", "fc"]].reset_index(drop=True)
    df_pho = tidy.loc[~is_prot, ["protein", "psite", "time", "fc"]].reset_index(drop=True)

    # --- RNA data ----------------------------------------------------------
    df_rna_raw = normalize_columns(pd.read_csv(rna))
    gcol = find_col(df_rna_raw, ["geneid", "mrna", "gene", "protein"])
    df_rna_raw = df_rna_raw.rename(columns={gcol: "protein"})
    df_rna = process_and_scale_raw_data(df_rna_raw, time_points_rna,
                                        ["protein"], scaling_method)

    return (df_kin_clean, df_tf_clean, df_prot, df_pho, df_rna,
            kin_beta_map, tf_beta_map, kin_alpha, tf_edge_weights)
