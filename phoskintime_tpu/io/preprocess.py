"""Raw-data preprocessing: CollecTRI / MS-Gaussian / Rout-Limma -> input CSVs.

Spec: reference ``processing/cleanup.py:21-380`` —
* CollecTRI -> input4.csv (TF network; COMPLEX sources dropped, targets
  filtered to genes present in input2);
* MS-Gaussian -> input1.csv (2^predict_mean fold changes pivoted to
  x1..x14, Psite formatted, filtered to Y_/S_/T_ or protein rows) and
  input1_wstd.csv (error-propagated stds: sigma_y = 2^x ln2 sigma_x);
* Rout-Limma -> input3.csv (mRNA series).
Gene-ID symbol mapping is injectable (the reference queries mygene over
the network; here a mapping dict/CSV can be supplied instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from phoskintime_tpu.config.logconf import setup_logger

logger = setup_logger()


def format_site(site) -> str:
    """Uppercase the residue prefix, preserving the suffix after '_'."""
    if pd.isna(site) or site == "":
        return ""
    site = str(site)
    if "_" in site:
        before, after = site.split("_", 1)
        return before.upper() + "_" + after
    return site.upper()


def process_collecttri(collecttri: pd.DataFrame,
                       input2: pd.DataFrame) -> pd.DataFrame:
    """CollecTRI -> input4 [Source, Target] filtered to input2 genes."""
    df = collecttri[~collecttri["source"].astype(str).str.startswith("COMPLEX")]
    out = df[["source_genesymbol", "target_genesymbol"]].rename(
        columns={"source_genesymbol": "Source", "target_genesymbol": "Target"})
    out = out.dropna()
    out = out[(out["Source"].str.strip() != "") & (out["Target"].str.strip() != "")]
    out = out.drop_duplicates()
    genes = set(input2["GeneID"].dropna().astype(str).str.strip())
    out = out[out["Target"].isin(genes)]
    logger.info(f"[Prep] CollecTRI -> {len(out)} TF-mRNA edges")
    return out.reset_index(drop=True)


def process_msgauss(msgauss: pd.DataFrame) -> pd.DataFrame:
    """MS-Gaussian -> input1 wide FC table (x1..x14)."""
    df = msgauss.copy()
    df["Psite"] = df["site"].fillna("").astype(str)
    df["predict_trans"] = 2.0 ** df["predict_mean"]
    pivot = df.pivot_table(index=["GeneID", "Psite"], columns="unit_time",
                           values="predict_trans", aggfunc="first").reset_index()
    pivot = pivot.rename(columns={i: f"x{i + 1}" for i in range(14)})
    pivot["Psite"] = pivot["Psite"].apply(format_site)
    pivot = pivot[pivot["Psite"].str.startswith(("Y_", "S_", "T_"))
                  | (pivot["Psite"] == "")]
    return pivot.reset_index(drop=True)


def process_msgauss_std(msgauss: pd.DataFrame) -> pd.DataFrame:
    """MS-Gaussian -> input1_wstd with error-propagated stds."""
    df = msgauss.copy()
    df["Psite"] = df["site"].fillna("").astype(str)
    df["predict_trans"] = 2.0 ** df["predict_mean"]
    df["predict_trans_std"] = df["predict_trans"] * np.log(2) * df["predict_std"]

    pm = df.pivot_table(index=["GeneID", "Psite"], columns="unit_time",
                        values="predict_trans", aggfunc="first").reset_index()
    pm = pm.rename(columns={i: f"x{i + 1}" for i in range(14)})
    ps = df.pivot_table(index=["GeneID", "Psite"], columns="unit_time",
                        values="predict_trans_std", aggfunc="first").reset_index()
    ps = ps.rename(columns={i: f"x{i + 1}_std" for i in range(14)})
    out = pd.merge(pm, ps, on=["GeneID", "Psite"])
    out["Psite"] = out["Psite"].apply(format_site)
    out = out[out["Psite"].str.startswith(("Y_", "S_", "T_"))
              | (out["Psite"] == "")]
    return out.reset_index(drop=True)


def process_routlimma(routlimma: pd.DataFrame,
                      value_col: str = "logFC",
                      gene_col: str = "GeneID",
                      time_col: str = "unit_time",
                      log2: bool | None = None) -> pd.DataFrame:
    """Rout-Limma mRNA table -> input3 wide (x1..x9)."""
    df = routlimma.copy()
    if log2 is None:
        # heuristic, logged so a table already in FC space is auditable
        log2 = bool(df[value_col].abs().max() < 20)
        logger.info(f"[Prep] Rout-Limma values treated as "
                    f"{'log2FC' if log2 else 'raw FC'} (max |v| = "
                    f"{df[value_col].abs().max():.3g}); pass log2= to "
                    f"override")
    df["fc"] = 2.0 ** df[value_col] if log2 else df[value_col]
    pivot = df.pivot_table(index=[gene_col], columns=time_col, values="fc",
                           aggfunc="first").reset_index()
    ntime = len([c for c in pivot.columns if c != gene_col])
    pivot = pivot.rename(columns={c: f"x{i + 1}" for i, c in enumerate(
        [c for c in pivot.columns if c != gene_col])})
    logger.info(f"[Prep] Rout-Limma -> {len(pivot)} genes x {ntime} timepoints")
    return pivot


def map_gene_symbols(df: pd.DataFrame, mapping: dict[str, str],
                     column: str = "GeneID") -> pd.DataFrame:
    """Apply an ID -> HGNC symbol mapping (injected; the reference resolves
    via the mygene web service, which is not assumed available here)."""
    out = df.copy()
    out[column] = out[column].map(lambda g: mapping.get(g, g))
    return out


def run_cleanup(base_dir, out_dir=".", gene_mapping: dict | None = None):
    """End-to-end `prep` pipeline over a raw-data directory.

    ``gene_mapping`` is applied to the RAW inputs up front: mapping at
    write time let process_collecttri filter CollecTRI's gene symbols
    against the unmapped input2 IDs — nearly every TF edge was dropped
    and the written files landed in inconsistent ID spaces (review
    finding)."""
    import os

    base_dir = str(base_dir)
    read = lambda name: pd.read_csv(os.path.join(base_dir, name))

    def mapped(df):
        if gene_mapping and "GeneID" in df.columns:
            return map_gene_symbols(df, gene_mapping)
        return df

    input2 = mapped(read("input2.csv"))
    ms_name = next((f for f in os.listdir(base_dir)
                    if f.startswith("MS_Gaussian")), None)
    outputs = {}
    if ms_name:
        ms = mapped(read(ms_name))
        outputs["input1.csv"] = process_msgauss(ms)
        outputs["input1_wstd.csv"] = process_msgauss_std(ms)
    if os.path.exists(os.path.join(base_dir, "CollecTRI.csv")):
        outputs["input4.csv"] = process_collecttri(read("CollecTRI.csv"), input2)
    rout = next((f for f in os.listdir(base_dir) if "limma" in f.lower()), None)
    if rout:
        outputs["input3.csv"] = process_routlimma(mapped(read(rout)))
    outputs["input2.csv"] = input2

    for name, df in outputs.items():
        df.to_csv(os.path.join(str(out_dir), name), index=False)
        logger.info(f"[Prep] wrote {name} ({len(df)} rows)")
    return outputs
