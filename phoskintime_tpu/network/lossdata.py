"""Pre-indexed loss data: map every observation to integer grid indices once.

Spec: reference ``global_model/cache.py:19-155`` — (protein idx, site slot,
time idx, observation, weight) int32/float arrays per modality, so the loss
is pure gathers. The padded-layout twist: site indices are slots into the
(N, Smax) phospho observable, which is identical for every mechanism.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class LossData(NamedTuple):
    p_prot: np.ndarray
    t_prot: np.ndarray
    obs_prot: np.ndarray
    w_prot: np.ndarray
    p_rna: np.ndarray
    t_rna: np.ndarray
    obs_rna: np.ndarray
    w_rna: np.ndarray
    p_pho: np.ndarray
    s_pho: np.ndarray
    t_pho: np.ndarray
    obs_pho: np.ndarray
    w_pho: np.ndarray
    prot_base_idx: int
    rna_base_idx: int
    pho_base_idx: int


def prepare_loss_data(topo, df_prot, df_rna, df_pho, time_grid,
                      t0_prot=0.0, t0_rna=4.0, t0_pho=0.0) -> LossData:
    """Index observations against the union time grid and padded layout."""
    time_grid = np.asarray(time_grid, float)
    t_map = {float(t): i for i, t in enumerate(time_grid)}

    def map_times(arr):
        out = np.empty(len(arr), np.int32)
        for i, t in enumerate(np.asarray(arr, float)):
            if t not in t_map:
                raise ValueError(f"Time {t} not in time_grid")
            out[i] = t_map[t]
        return out

    def basic(df):
        p_idx = np.asarray([topo.p2i[p] for p in df["protein"]], np.int32)
        t_idx = map_times(df["time"].values)
        obs = np.ascontiguousarray(df["fc"].values, float)
        w = (np.ascontiguousarray(df["w"].values, float)
             if "w" in df.columns else np.ones(len(df)))
        # NaN weights would poison every objective into fail_value with
        # no diagnostic — same guard the phospho path applies below
        w = np.nan_to_num(w, nan=1.0)
        return p_idx, t_idx, obs, w

    for df in (df_prot, df_rna):
        unknown = set(df["protein"]) - set(topo.p2i)
        if unknown:
            raise ValueError(f"Proteins not in topology: {sorted(unknown)[:5]}")

    p_prot, t_prot, obs_prot, w_prot = basic(df_prot)
    p_rna, t_rna, obs_rna, w_rna = basic(df_rna)

    site_maps = [{s: j for j, s in enumerate(ss)} for ss in topo.sites]
    pp, ss_, tt, oo, ww = [], [], [], [], []
    for _, row in df_pho.iterrows():
        p = row["protein"]
        if p not in topo.p2i:
            continue
        pi = topo.p2i[p]
        s = row["psite"]
        if s not in site_maps[pi]:
            continue  # site in data but not in model structure; ignore
        t_key = float(row["time"])
        if t_key not in t_map:
            raise ValueError(
                f"phospho observation at t={t_key} is not on the solver "
                f"grid {sorted(t_map)} — align the phospho timepoints "
                f"with the union grid")
        pp.append(pi)
        ss_.append(site_maps[pi][s])
        tt.append(t_map[t_key])
        oo.append(float(row["fc"]))
        ww.append(float(row["w"]) if "w" in row and not _isnan(row.get("w")) else 1.0)

    def bidx(t0):
        return int(np.argmin(np.abs(time_grid - float(t0))))

    return LossData(
        p_prot, t_prot, obs_prot, w_prot,
        p_rna, t_rna, obs_rna, w_rna,
        np.asarray(pp, np.int32), np.asarray(ss_, np.int32),
        np.asarray(tt, np.int32), np.asarray(oo, float), np.asarray(ww, float),
        bidx(t0_prot), bidx(t0_rna), bidx(t0_pho),
    )


def _isnan(x):
    try:
        return x is None or np.isnan(x)
    except TypeError:
        return False
