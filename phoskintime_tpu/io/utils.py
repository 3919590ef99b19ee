"""Small result-wrangling utilities.

Spec: reference ``utils/`` — observed/estimated merge for reporting tables,
and the results-directory organizer that groups per-gene artifacts.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd


def merge_obs_est(df_obs: pd.DataFrame, df_est: pd.DataFrame,
                  keys: list[str] | None = None) -> pd.DataFrame:
    """Side-by-side observed vs estimated table with residuals."""
    if keys is None:
        keys = [c for c in ("protein", "psite", "time") if c in df_obs.columns
                and c in df_est.columns]
    out = df_obs.merge(df_est, on=keys, how="inner",
                       suffixes=("_obs", "_est"))
    ocol = "fc" if "fc" in out.columns else "fc_obs"
    ecol = "pred_fc" if "pred_fc" in out.columns else "fc_est"
    out["residual"] = out[ocol] - out[ecol]
    return out


def organize_output_files(out_dir: str, patterns: dict[str, str] | None = None):
    """Group loose files into subfolders by extension/prefix
    (reference utils file organizer)."""
    out_dir = str(out_dir)
    patterns = patterns or {"figures": ".png", "tables": ".csv",
                            "workbooks": ".xlsx", "latex": ".tex"}
    moved = []
    for fname in os.listdir(out_dir):
        src = os.path.join(out_dir, fname)
        if not os.path.isfile(src):
            continue
        for sub, suffix in patterns.items():
            if fname.endswith(suffix) and fname != "report.html":
                dst_dir = os.path.join(out_dir, sub)
                os.makedirs(dst_dir, exist_ok=True)
                shutil.move(src, os.path.join(dst_dir, fname))
                moved.append(fname)
                break
    return moved


def parse_kinase_set(cell, upper: bool = False) -> list[str]:
    """Parse a '{K1, K2}' kinase-set cell into a list of kinase names.

    One shared implementation for every consumer (io.load's prior
    explosion uppercases for ID matching; the kinopt data path preserves
    case to match input1 rows) — review: the brace-split logic was
    hand-rolled in three places and had already diverged on casing.
    """
    out = []
    for k in str(cell).strip("{}").split(","):
        k = k.strip()
        if k:
            out.append(k.upper() if upper else k)
    return out
