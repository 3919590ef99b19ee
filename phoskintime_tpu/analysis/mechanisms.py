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


# ---------------------------------------------------------------------------
# model-selection pipeline (reference scripts/compare_mechanisms.py core)
# ---------------------------------------------------------------------------

@dataclass
class MechanismSelection:
    """Result of fitting ALL mechanisms to the same dataset."""

    table: pd.DataFrame        # per-model AIC/BIC/GOF, AIC-sorted
    fits: dict                 # model id -> GlobalFitResult
    trajectories: dict         # model id -> (df_prot, df_rna, df_pho) @ best
    best_model: int            # argmin AIC
    paths: dict | None = None  # written artifacts when out_dir given


def _gof_stats(obs_dfs, pred_dfs):
    """Pooled + per-modality goodness of fit from observed/predicted tidy
    frames (merge on protein[/psite]/time)."""
    total_rss, total_tss, total_n = 0.0, 0.0, 0
    per_mod = {}
    for name, obs, pred in zip(("protein", "rna", "phospho"),
                               obs_dfs, pred_dfs):
        if obs is None or not len(obs):
            continue
        keys = [c for c in ("protein", "psite", "time") if c in obs.columns
                and c in pred.columns]
        m = obs.merge(pred, on=keys, how="inner")
        if not len(m):
            continue
        r = m["fc"].to_numpy(float) - m["pred_fc"].to_numpy(float)
        y = m["fc"].to_numpy(float)
        rss = float((r ** 2).sum())
        tss = float(((y - y.mean()) ** 2).sum())
        per_mod[name] = {"rmse": np.sqrt(rss / len(m)),
                         "mae": float(np.abs(r).mean()),
                         "r2": 1.0 - rss / max(tss, 1e-300),
                         "n": len(m)}
        total_rss += rss
        total_tss += tss
        total_n += len(m)
    return total_rss, total_tss, total_n, per_mod


def fit_all_mechanisms(df_kin, df_tf, df_prot, df_rna, df_pho, tp, *,
                       models=(0, 1, 2, 4), pop=48, n_gen=25, seed=0,
                       loss_mode=0, polish_steps=0, max_sites_cap=6,
                       lambdas=None, out_dir=None, mesh=None,
                       logger=None) -> MechanismSelection:
    """Fit every mechanistic hypothesis to the SAME data and rank them.

    The model-selection core of the reference's 2,903-LoC
    ``scripts/compare_mechanisms.py`` (which rebuilds the System per
    mechanism and fits/simulates side-by-side), redesigned as one batched
    global fit per mechanism plus an information-criterion table:
    AIC = n ln(RSS/n) + 2k, AICc, BIC = n ln(RSS/n) + k ln(n), Akaike
    weights, and per-modality R^2/RMSE/MAE at the Frechet-picked solution.

    tp: (t_points_protein, t_points_rna, t_points_phospho).
    With ``out_dir``: writes mechanism_selection.xlsx (selection table +
    per-model trajectory sheets), per-modality overlay plots, and an HTML
    summary that links the KO/influence explorers.
    """
    from phoskintime_tpu.network.bounds import calculate_bio_bounds
    from phoskintime_tpu.network.kinase_input import build_kinase_matrix
    from phoskintime_tpu.network.lossdata import prepare_loss_data
    from phoskintime_tpu.network.optimize import run_global_fit
    from phoskintime_tpu.network.params import init_raw_params, unpack_params

    tp_p, tp_r, tp_ph = tp
    lambdas = lambdas or {"protein": 1.0, "rna": 1.0, "phospho": 1.0,
                          "prior": 0.0}
    grid = np.unique(np.concatenate([np.asarray(tp_p, float),
                                     np.asarray(tp_r, float),
                                     np.asarray(tp_ph, float)]))

    fits, trajs, rows = {}, {}, []
    for model in models:
        topo = build_topology(df_kin, df_tf, model=model,
                              max_sites_cap=(max_sites_cap if model == 2
                                             else None))
        # same observation filtering as the runner: keep only rows whose
        # protein maps into this mechanism's topology (differs per model)
        dfp = df_prot[df_prot["protein"].isin(topo.p2i)]
        dfr = df_rna[df_rna["protein"].isin(topo.p2i)]
        dfh = df_pho[df_pho["protein"].isin(topo.p2i)]
        Kmat = build_kinase_matrix(topo.kinases, dfp, tp_p)
        system = GlobalSystem(topo, tp_p, Kmat, dtype=np.float32)
        ld = prepare_loss_data(topo, dfp, dfr, dfh, grid)
        defaults = default_params(topo, np.float32)
        bounds = calculate_bio_bounds(topo, dfp, dfr, Kmat)
        theta0, slices, xl, xu = init_raw_params(defaults, topo, bounds)

        res = run_global_fit(
            system, slices, ld, defaults, lambdas, grid, xl, xu,
            pop=pop, n_gen=n_gen, seed=seed, loss_mode=loss_mode, mesh=mesh,
            polish_steps=polish_steps, frechet_pick=True,
            df_prot=dfp, df_rna=dfr, df_pho=dfh,
            t_points=(tp_p, tp_r, tp_ph))
        fits[model] = res

        theta_best = jnp.asarray(res.pareto_X[res.best_idx], jnp.float32)
        pj = unpack_params(theta_best, slices, topo)
        pred = simulate_and_measure(system, pj, tp_p, tp_r, tp_ph)
        trajs[model] = pred

        rss, tss, n, per_mod = _gof_stats((df_prot, df_rna, df_pho), pred)
        k = len(theta0)
        aic = n * np.log(max(rss, 1e-300) / n) + 2 * k
        bic = n * np.log(max(rss, 1e-300) / n) + k * np.log(n)
        aicc = aic + (2.0 * k * (k + 1) / (n - k - 1) if n > k + 1
                      else np.inf)
        row = {"model": model, "mechanism": MECHANISMS[model],
               "n_params": k, "n_obs": n, "rss": rss,
               "r2": 1.0 - rss / max(tss, 1e-300),
               "aic": aic, "aicc": aicc, "bic": bic,
               "n_evals": res.n_evals}
        for mname, st in per_mod.items():
            row[f"r2_{mname}"] = st["r2"]
            row[f"rmse_{mname}"] = st["rmse"]
            row[f"mae_{mname}"] = st["mae"]
        rows.append(row)
        if logger is not None:
            logger.info(f"[Mech] {MECHANISMS[model]}: AIC={aic:.1f} "
                        f"BIC={bic:.1f} R2={row['r2']:.3f}")

    table = pd.DataFrame(rows).sort_values("aic").reset_index(drop=True)
    d = table["aic"] - table["aic"].min()
    table["delta_aic"] = d
    w = np.exp(-0.5 * d)
    table["akaike_weight"] = w / w.sum()
    best = int(table.iloc[0]["model"])

    paths = None
    if out_dir:
        paths = _write_selection_artifacts(table, trajs,
                                           (df_prot, df_rna, df_pho),
                                           out_dir)
    return MechanismSelection(table, fits, trajs, best, paths)


def _write_selection_artifacts(table, trajs, obs_dfs, out_dir):
    """mechanism_selection.xlsx + overlay plots + HTML summary."""
    import html as _html
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from phoskintime_tpu.io.export import TableWriter

    os.makedirs(out_dir, exist_ok=True)
    w = TableWriter(os.path.join(out_dir, "mechanism_selection.xlsx"))
    w.add("ModelSelection", table)
    for model, (dfp, dfr, dfph) in trajs.items():
        w.add(f"fit_{MECHANISMS[model][:12]}", dfp)
    paths = {"table": w.save()}

    df_prot, df_rna, df_pho = obs_dfs
    colors = {0: "tab:blue", 1: "tab:orange", 2: "tab:green",
              4: "tab:red"}
    for mod_name, obs, idx in [("protein", df_prot, 0), ("rna", df_rna, 1)]:
        if obs is None or not len(obs):
            continue
        prots = list(obs["protein"].unique())[:6]
        ncol = min(3, len(prots))
        nrow = int(np.ceil(len(prots) / ncol))
        fig, axes = plt.subplots(nrow, ncol,
                                 figsize=(4 * ncol, 3 * nrow),
                                 squeeze=False)
        for ax, prot in zip(axes.ravel(), prots):
            o = obs[obs.protein == prot]
            ax.plot(o.time, o.fc, "ko", ms=4, label="observed")
            for model, pred in trajs.items():
                p = pred[idx]
                pi = p[p.protein == prot]
                ax.plot(pi.time, pi.pred_fc, color=colors.get(model, "gray"),
                        lw=1.5, label=MECHANISMS[model])
            ax.set_title(prot, fontsize=9)
            ax.set_xscale("symlog")
        axes.ravel()[0].legend(fontsize=7)
        for ax in axes.ravel()[len(prots):]:
            ax.axis("off")
        fig.suptitle(f"Mechanism overlay — {mod_name} fold change")
        fig.tight_layout()
        p = os.path.join(out_dir, f"overlay_{mod_name}.png")
        fig.savefig(p, dpi=150)
        plt.close(fig)
        paths[f"overlay_{mod_name}"] = p

    best_row = table.iloc[0]
    rows_html = table.to_html(index=False, float_format=lambda v: f"{v:.4g}")
    html_doc = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>Mechanism model selection</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:4px 8px}}</style></head><body>
<h1>Mechanism model selection</h1>
<p>Best mechanism by AIC: <b>{_html.escape(str(best_row['mechanism']))}</b>
 (&Delta;AIC of runner-up:
 {table['delta_aic'].iloc[1] if len(table) > 1 else 0:.1f};
 Akaike weight {best_row['akaike_weight']:.3f})</p>
{rows_html}
<h2>Overlays</h2>
<p><img src="overlay_protein.png" width="640"></p>
<p><img src="overlay_rna.png" width="640"></p>
<h2>Explorers</h2>
<p>Generate interactive knockout / influence explorers for the winning
mechanism with <code>report.interactive.knockout_explorer</code> and
<code>analysis.influence</code> (CLI: <code>fitanalysis</code>).</p>
</body></html>"""
    paths["html"] = os.path.join(out_dir, "mechanism_selection.html")
    with open(paths["html"], "w") as f:
        f.write(html_doc)
    return paths
