"""Synthetic demo/benchmark network construction.

Builds deterministic, realistically-shaped kinase-substrate/TF networks
(protein counts, site distributions and kinase fan-in mirroring the
reference's data scale) plus synthetic observations generated from known
ground-truth parameters — used by ``__graft_entry__.py``, ``bench.py`` and
the quickstart examples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from phoskintime_tpu.network import (
    GlobalSystem,
    build_kinase_matrix,
    build_topology,
    default_params,
    init_raw_params,
    prepare_loss_data,
    simulate_and_measure,
)

GRID = np.array([0.0, 0.5, 0.75, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 60.0,
                 120.0, 240.0, 480.0, 960.0])
RNA_GRID = np.array([4.0, 8.0, 15.0, 30.0, 60.0, 120.0, 240.0, 480.0, 960.0])


def build_demo_network(n_proteins: int = 40, n_kinases: int = 12,
                       max_sites: int = 4, model: int = 0, seed: int = 0,
                       dtype=np.float32):
    """Deterministic synthetic network + data: returns a dict bundle."""
    rng = np.random.default_rng(seed)
    proteins = [f"P{i:03d}" for i in range(n_proteins)]
    kinases = [f"K{i:02d}" for i in range(n_kinases)]

    rows = []
    for p in proteins[: int(n_proteins * 0.8)]:  # 80% of proteins have sites
        ns = int(rng.integers(1, max_sites + 1))
        for s in range(ns):
            k = kinases[int(rng.integers(n_kinases))]
            rows.append((p, f"S{10 * (s + 1)}", k))
    # kinases are proteins too (self-signaling rows like the real data)
    for k in kinases[: n_kinases // 2]:
        rows.append((k, "S99", kinases[int(rng.integers(n_kinases))]))
    inter = pd.DataFrame(rows, columns=["protein", "psite", "kinase"])

    tf_rows = []
    regs = rng.choice(proteins, size=max(2, n_proteins // 5), replace=False)
    for tf in regs:
        for tgt in rng.choice(proteins, size=3, replace=False):
            if tgt != tf:
                tf_rows.append((tf, tgt))
    tf = pd.DataFrame(tf_rows, columns=["tf", "target"])

    topo = build_topology(inter, tf, model=model)
    Kmat = build_kinase_matrix(topo.kinases, None, GRID)
    Kmat = Kmat * (1.0 + 0.3 * np.abs(np.sin(
        rng.uniform(0, 3, (topo.K, 1)) + 0.05 * GRID[None, :])))
    system = GlobalSystem(topo, GRID, Kmat, dtype=dtype)

    true = default_params(topo, np.float64)
    for k in ["c_k", "A_i", "B_i", "C_i", "D_i", "E_i"]:
        true[k] = rng.uniform(0.05, 0.8, true[k].shape)
    true["Dp_i"] = rng.uniform(0.2, 2.0, true["Dp_i"].shape) * topo.site_mask()
    true["tf_scale"] = 2.0
    true = {k: np.asarray(v, dtype) for k, v in true.items()}

    import jax.numpy as jnp
    pj = {k: jnp.asarray(v) for k, v in true.items()}
    dfp, dfr, dfph = simulate_and_measure(system, pj, GRID, RNA_GRID, GRID)
    dfp = dfp.rename(columns={"pred_fc": "fc"})
    dfr = dfr.rename(columns={"pred_fc": "fc"})
    dfph = dfph.rename(columns={"pred_fc": "fc"})

    grid = np.unique(np.concatenate([GRID, RNA_GRID]))
    loss_data = prepare_loss_data(topo, dfp, dfr, dfph, grid)
    defaults = default_params(topo, dtype)
    bounds = {"c_k": (1e-3, 4.0), "A_i": (1e-3, 4.0), "B_i": (1e-3, 4.0),
              "C_i": (1e-3, 4.0), "D_i": (1e-3, 4.0), "Dp_i": (0.05, 5.0),
              "E_i": (1e-4, 4.0), "tf_scale": (0.5, 6.0)}
    theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)
    # raw-space (inverse-softplus) packing of the synthetic truth — the
    # exact point the recovery experiments measure distance to
    theta_true, _, _, _ = init_raw_params(true, topo, bounds)

    return dict(system=system, topo=topo, true=true, df_prot=dfp, df_rna=dfr,
                df_pho=dfph, loss_data=loss_data, grid=grid,
                defaults=defaults, theta0=np.asarray(theta0, dtype),
                theta_true=np.asarray(theta_true, float),
                slices=slices, xl=xl, xu=xu,
                lambdas={"protein": 1.0, "rna": 1.0, "phospho": 1.0,
                         "prior": 0.1})
