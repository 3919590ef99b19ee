"""Mechanism comparison and knockout exploration.

Spec: reference ``scripts/compare_mechanisms.py`` (2,903 LoC Streamlit KO
explorer that rebuilds the System per mechanism and runs knockout
simulations) — here a library API: fit/simulate the SAME network under all
four mechanistic hypotheses, score each against the data, and run in-silico
knockouts (kinase drives, TF edges, site rates) as batched simulations.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
import pandas as pd

from phoskintime_tpu.network.objective import make_objective
from phoskintime_tpu.network.simulate import simulate_and_measure
from phoskintime_tpu.network.system import GlobalSystem, default_params
from phoskintime_tpu.network.topology import build_topology

MECHANISMS = {0: "distributive", 1: "sequential", 2: "combinatorial",
              4: "saturating"}


@dataclass
class MechanismComparison:
    losses: dict          # model id -> (3,) objectives
    trajectories: dict    # model id -> (df_prot, df_rna, df_pho)
    best_model: int


def compare_mechanisms(df_kin, df_tf, df_prot, df_rna, df_pho, loss_data_fn,
                       params=None, grid=None, tp=(None, None, None),
                       models=(0, 1, 2, 4), max_sites_cap=6) -> MechanismComparison:
    """Evaluate each mechanism on identical data with identical parameters.

    loss_data_fn: topo -> LossData (so indices match each topology).
    """
    from phoskintime_tpu.network.kinase_input import build_kinase_matrix

    losses, trajs = {}, {}
    tp_p, tp_r, tp_ph = tp
    for model in models:
        topo = build_topology(df_kin, df_tf, model=model,
                              max_sites_cap=max_sites_cap if model == 2 else None)
        Kmat = build_kinase_matrix(topo.kinases, df_prot, tp_p)
        system = GlobalSystem(topo, tp_p, Kmat, dtype=np.float32)
        p = default_params(topo, np.float32) if params is None else params(topo)
        pj = {k: jnp.asarray(v) for k, v in p.items()}

        ld = loss_data_fn(topo)
        from phoskintime_tpu.network.params import init_raw_params
        theta0, slices, xl, xu = init_raw_params(
            p, topo, {k: (1e-3, 10.0) for k in
                      ["c_k", "A_i", "B_i", "C_i", "D_i", "Dp_i", "E_i",
                       "tf_scale"]})
        obj = make_objective(system, slices, ld, p,
                             {"protein": 1.0, "rna": 1.0, "phospho": 1.0,
                              "prior": 0.0}, grid)
        losses[model] = np.asarray(obj(jnp.asarray(theta0)))
        trajs[model] = simulate_and_measure(system, pj, tp_p, tp_r, tp_ph)

    best = min(losses, key=lambda m: float(np.sum(losses[m])))
    return MechanismComparison(losses, trajs, best)


def knockout_scan_global(system, params, targets: list[dict], tp_p, tp_r,
                         tp_ph, y0=None) -> list:
    """Global-model in-silico knockouts.

    Each target dict supports:
      {"kinase": name, "factor": f}  — scale the kinase drive c_k
      {"protein": name, "param": "A_i"|"C_i"|..., "factor": f}
      {"site": (protein, psite), "factor": f} — scale that site's S drive
    Returns one (df_prot, df_rna, df_pho) triple per knockout.
    """
    import dataclasses as _dc

    topo = system.topo
    out = []
    for ko in targets:
        sys_ko = system
        p = {k: jnp.asarray(np.array(v, copy=True)) for k, v in params.items()}
        f = float(ko.get("factor", 0.0))
        if "kinase" in ko:
            k = topo.k2i[ko["kinase"]]
            p["c_k"] = p["c_k"].at[k].multiply(f)
        elif "site" in ko:
            # a site knockout removes its kinase drive: scale the W row
            # (static topology -> rebuild the system around the edited W)
            prot, site = ko["site"]
            i = topo.p2i[prot]
            j = topo.sites[i].index(site)
            W = np.array(topo.W_pad, copy=True)
            W[i, j, :] *= f
            topo2 = _dc.replace(topo, W_pad=W)
            sys_ko = GlobalSystem(topo2, system.kin_grid, system.Kmat,
                                  system.custom_y0, system.dtype)
        elif "protein" in ko:
            i = topo.p2i[ko["protein"]]
            key = ko.get("param", "A_i")
            p[key] = p[key].at[i].multiply(f)
        out.append(simulate_and_measure(sys_ko, p, tp_p, tp_r, tp_ph, y0=y0))
    return out


def find_protein_accumulators(report, proteins, threshold: float = 2.0) -> pd.DataFrame:
    """Detect proteins whose 7-day steady level exceeds `threshold` x the
    initial level (reference scripts/find_protein_accumulators.py)."""
    start = report.tot[0]
    ratio = report.ss_value / np.maximum(start, 1e-12)
    return pd.DataFrame({
        "protein": proteins,
        "start": start,
        "steady_state": report.ss_value,
        "ratio": ratio,
        "accumulator": ratio >= threshold,
        "converged": report.converged,
    }).sort_values("ratio", ascending=False).reset_index(drop=True)
