"""tfopt data construction from input1/input3/input4 CSVs.

Spec: reference ``tfopt/{local,evol}/optcon/{filter,construct}.py`` —
align mRNA (9-pt grid) vs TF protein + psite series (14-pt grid), build
the regulator map from the TF network, keep only genes with >= 1 regulator
and TFs that regulate a kept gene, pad psite series into a
(n_TF, n_psite_max, T) tensor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from phoskintime_tpu.tfopt.model import TfoptProblem

PROT_COLS = [f"x{i}" for i in range(1, 15)]
RNA_COLS = [f"x{i}" for i in range(1, 10)]


def load_tfopt_problem(input1_path, input3_path, input4_path, *,
                       lb=-4.0, ub=4.0, T_use=9) -> tuple[TfoptProblem, dict]:
    mrna = pd.read_csv(input3_path)
    prot = pd.read_csv(input1_path)
    net = pd.read_csv(input4_path)
    return build_tfopt_problem(mrna, prot, net, lb=lb, ub=ub, T_use=T_use)


def build_tfopt_problem(mrna: pd.DataFrame, prot: pd.DataFrame,
                        net: pd.DataFrame, *, lb=-4.0, ub=4.0,
                        T_use=9) -> tuple[TfoptProblem, dict]:
    mrna = mrna.copy()
    prot = prot.copy()
    gcol = "GeneID" if "GeneID" in mrna.columns else mrna.columns[0]
    mrna[gcol] = mrna[gcol].astype(str).str.strip().str.upper()
    prot["GeneID"] = prot["GeneID"].astype(str).str.strip().str.upper()

    # regulator map: target gene -> list of TFs (reference load_regulation)
    scol = "Source" if "Source" in net.columns else net.columns[0]
    tcol = "Target" if "Target" in net.columns else net.columns[1]
    reg_map: dict[str, list[str]] = {}
    for _, r in net.iterrows():
        tf = str(r[scol]).strip().upper()
        tgt = str(r[tcol]).strip().upper()
        reg_map.setdefault(tgt, [])
        if tf not in reg_map[tgt]:
            reg_map[tgt].append(tf)

    rna_cols = [c for c in RNA_COLS if c in mrna.columns][:T_use]
    prot_cols = [c for c in PROT_COLS if c in prot.columns]

    # TF series: protein-level row (no psite) + psite rows
    has_site = prot["Psite"].notna() & (prot["Psite"].astype(str).str.strip() != "") \
        if "Psite" in prot.columns else pd.Series(False, index=prot.index)
    tf_protein = {}
    tf_psites: dict[str, list[np.ndarray]] = {}
    tf_psite_labels: dict[str, list[str]] = {}
    for gid, grp in prot.groupby("GeneID"):
        prot_rows = grp[~has_site.loc[grp.index]]
        if len(prot_rows):
            tf_protein[gid] = prot_rows.iloc[0][prot_cols].to_numpy(float)
        site_rows = grp[has_site.loc[grp.index]]
        if len(site_rows):
            tf_psites[gid] = [r[prot_cols].to_numpy(float)
                              for _, r in site_rows.iterrows()]
            tf_psite_labels[gid] = [str(r["Psite"]) for _, r in site_rows.iterrows()]

    # keep genes with >= 1 regulator whose TF has protein data; duplicate
    # GeneID rows keep only the FIRST occurrence (a duplicate label would
    # fan out in .loc and desynchronize mRNA_mat from regulators)
    mrna = mrna.drop_duplicates(subset=gcol, keep="first")
    gene_ids = [g for g in mrna[gcol]
                if g in reg_map and any(tf in tf_protein for tf in reg_map[g])]
    gene_set = set(gene_ids)
    tf_ids = sorted({tf for g in gene_ids for tf in reg_map[g] if tf in tf_protein})
    tf2i = {tf: i for i, tf in enumerate(tf_ids)}

    expr = (mrna.set_index(gcol).loc[gene_ids, rna_cols]
            .to_numpy(float))

    n_TF = len(tf_ids)
    n_ps = max(1, max((len(tf_psites.get(tf, [])) for tf in tf_ids), default=1))
    protein_mat = np.stack([tf_protein[tf][:T_use] for tf in tf_ids]) \
        if n_TF else np.zeros((0, T_use))
    psite_tensor = np.zeros((n_TF, n_ps, T_use))
    num_psites = np.zeros(n_TF, np.int32)
    psite_labels = []
    for i, tf in enumerate(tf_ids):
        rows = tf_psites.get(tf, [])
        num_psites[i] = len(rows)
        psite_labels.append(tf_psite_labels.get(tf, []))
        for j, series in enumerate(rows[:n_ps]):
            psite_tensor[i, j] = series[:T_use]

    n_reg = max(1, max((len([t for t in reg_map[g] if t in tf2i])
                        for g in gene_ids), default=1))
    regulators = -np.ones((len(gene_ids), n_reg), np.int32)
    for gi, g in enumerate(gene_ids):
        tfs = [t for t in reg_map[g] if t in tf2i][:n_reg]
        regulators[gi, :len(tfs)] = [tf2i[t] for t in tfs]

    prob = TfoptProblem(expr, regulators, protein_mat, psite_tensor,
                        num_psites, gene_ids, tf_ids, psite_labels, lb, ub)
    meta = {"reg_map": {g: reg_map[g] for g in gene_set}}
    return prob, meta
