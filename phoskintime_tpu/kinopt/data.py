"""kinopt data construction from input1/input2 CSVs.

Spec: reference ``kinopt/evol/optcon/construct.py:15-357`` — load input1
(HGNC time series x1..x14) + input2 (site -> {kinase set}), apply one of
the kinopt scaling methods, optionally estimate missing kinases (synthetic
protein-level rows, or pseudo-site counts from ``kinase_to_psites``), and
build the padded :class:`KinoptProblem`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from phoskintime_tpu.config.logconf import setup_logger
from phoskintime_tpu.kinopt.model import KinoptProblem, build_problem

logger = setup_logger()

TIME_COLS = [f"x{i}" for i in range(1, 15)]

#: pseudo-site counts for kinases absent from the MS data
#: (reference kinopt/evol/config/__init__.py:7-15)
KINASE_TO_PSITES = {
    "CDK5": 1, "TTK": 7, "GSK3B": 4, "MAP2K4": 4,
    "MAP2K1": 2, "MAP2K3": 1, "CDK4": 2,
}


def _minmax_rows(M: np.ndarray) -> np.ndarray:
    lo = M.min(axis=1, keepdims=True)
    hi = M.max(axis=1, keepdims=True)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    return (M - lo) / span


def _minmax_cols(M: np.ndarray) -> np.ndarray:
    lo = M.min(axis=0, keepdims=True)
    hi = M.max(axis=0, keepdims=True)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    return (M - lo) / span


def apply_scaling(df: pd.DataFrame, time_cols=TIME_COLS, method: str = "none",
                  split_point: int = 9, segment_points=None) -> pd.DataFrame:
    """kinopt scaling modes (reference kinopt/evol/utils/iodata.py:58-125)."""
    df = df.copy()
    cols = [c for c in time_cols if c in df.columns]
    M = np.array(df[cols].to_numpy(float), copy=True)
    if method == "min_max":
        M = _minmax_rows(M)
    elif method == "log":
        M = np.log(M)
    elif method == "temporal":
        M[:, :split_point] = _minmax_cols(M[:, :split_point])
        M[:, split_point:] = _minmax_cols(M[:, split_point:])
    elif method == "segmented":
        if not segment_points:
            raise ValueError("segment_points required for segmented scaling")
        for a, b in zip(segment_points[:-1], segment_points[1:]):
            M[:, a:b] = _minmax_cols(M[:, a:b])
    elif method == "slope":
        d = np.diff(M, axis=1, prepend=M[:, :1])
        d[:, 0] = 0.0
        M = _minmax_cols(d)
    elif method == "cumulative":
        M = _minmax_cols(np.cumsum(M, axis=1))
    elif method == "none":
        pass
    else:
        raise ValueError(f"Invalid scaling method {method}")
    df[cols] = M
    return df


def load_kinopt_problem(input1_path, input2_path, *, scaling_method="none",
                        split_point=9, segment_points=None,
                        estimate_missing_kinases=True,
                        lb=-4.0, ub=4.0,
                        kinase_to_psites: dict | None = None):
    """Build a :class:`KinoptProblem` plus bookkeeping metadata."""
    full = pd.read_csv(input1_path)
    inter = pd.read_csv(input2_path)
    return build_kinopt_problem(full, inter, scaling_method=scaling_method,
                                split_point=split_point,
                                segment_points=segment_points,
                                estimate_missing_kinases=estimate_missing_kinases,
                                lb=lb, ub=ub,
                                kinase_to_psites=kinase_to_psites)


def build_kinopt_problem(full: pd.DataFrame, inter: pd.DataFrame, *,
                         scaling_method="none", split_point=9,
                         segment_points=None, estimate_missing_kinases=True,
                         lb=-4.0, ub=4.0,
                         kinase_to_psites: dict | None = None) -> tuple[KinoptProblem, dict]:
    full = apply_scaling(full, TIME_COLS, scaling_method, split_point,
                         segment_points)
    cols = [c for c in TIME_COLS if c in full.columns]

    inter = inter.copy()
    from phoskintime_tpu.io.utils import parse_kinase_set

    inter["Kinase"] = inter["Kinase"].apply(parse_kinase_set)
    if not estimate_missing_kinases:
        known = set(full["GeneID"].astype(str))
        inter = inter[inter["Kinase"].apply(lambda ks: all(k in known for k in ks))]

    # observed site series P_obs
    gp_names, P_rows = [], []
    site_kinase_names = []
    for _, row in inter.iterrows():
        gene, psite = row["GeneID"], row["Psite"]
        obs = full[(full["GeneID"] == gene) & (full["Psite"] == psite)]
        if obs.empty:
            continue
        gp_names.append((gene, psite))
        P_rows.append(obs.iloc[0][cols].to_numpy(float))
        site_kinase_names.append(list(row["Kinase"]))
    P_obs = np.asarray(P_rows)

    # kinase signal source rows (reference _build_k_array)
    K_rows: list[np.ndarray] = []
    K_index: dict[str, list[tuple[str, int]]] = {}
    unique_kinases = sorted({k for ks in site_kinase_names for k in ks})
    k2p = KINASE_TO_PSITES if kinase_to_psites is None else kinase_to_psites
    for kin in unique_kinases:
        kin_rows = full[full["GeneID"] == kin]
        site_rows = kin_rows[kin_rows["Psite"].notna()
                             & (kin_rows["Psite"].astype(str).str.strip() != "")]
        if len(site_rows):
            for _, r in site_rows.iterrows():
                K_index.setdefault(kin, []).append(
                    (str(r["Psite"]), len(K_rows)))
                K_rows.append(r[cols].to_numpy(float))
        elif estimate_missing_kinases:
            prot = kin_rows[kin_rows["Psite"].isna()
                            | (kin_rows["Psite"].astype(str).str.strip() == "")]
            base = (prot.iloc[0][cols].to_numpy(float) if len(prot)
                    else np.zeros(len(cols)))
            n_pseudo = int(k2p.get(kin, 1))
            for s in range(n_pseudo):
                K_index.setdefault(kin, []).append((f"P{s + 1}", len(K_rows)))
                K_rows.append(base)
        else:
            # kinase has only a protein-level row and estimation is off:
            # it passed the 'known' filter above yet contributes no signal
            # rows — say so instead of silently dropping its sites
            logger.warning(
                f"[kinopt] kinase {kin} has no site rows and "
                f"estimate_missing_kinases=False — sites driven only by "
                f"it will be dropped")
    K_array = np.asarray(K_rows) if K_rows else np.zeros((1, len(cols)))

    kinases = [k for k in unique_kinases if k in K_index]
    k2i = {k: i for i, k in enumerate(kinases)}
    kinase_rows = [[idx for (_, idx) in K_index[k]] for k in kinases]
    site_kinases = [[k2i[k] for k in ks if k in k2i] for ks in site_kinase_names]
    keep = [i for i, sk in enumerate(site_kinases) if sk]
    P_obs = P_obs[keep]
    site_kinases = [site_kinases[i] for i in keep]
    gp_names = [gp_names[i] for i in keep]

    prob = build_problem(P_obs, site_kinases, kinase_rows, K_array,
                         gp_names=gp_names, kinase_names=kinases, lb=lb, ub=ub)
    meta = {"K_index": {k: K_index[k] for k in kinases},
            "time_cols": cols}
    return prob, meta


def check_kinases(full: "pd.DataFrame", inter: "pd.DataFrame") -> dict:
    """Report kinases referenced in input2 but missing from input1
    (spec: reference kinopt/evol/optcon/construct.py:331+)."""
    known = set(full["GeneID"].astype(str))
    from phoskintime_tpu.io.utils import parse_kinase_set

    referenced = set()
    for cell in inter["Kinase"].astype(str):
        referenced.update(parse_kinase_set(cell))
    missing = sorted(referenced - known)
    return {"referenced": sorted(referenced), "missing": missing,
            "n_missing": len(missing)}
