"""KKT optimality post-checks for the constrained kinopt/tfopt fits.

Spec: reference ``kinopt/optimality/KKT.py:10-254`` — after optimization,
verify primal feasibility of the sum-to-one constraints, estimate Lagrange
multipliers / stationarity residuals, and summarize active box constraints;
then render the reporting suite (``KKT.py:60-254``): per-protein
constraint-violation stacked bars with the top-5 offenders highlighted,
min/mean/max sensitivity bars, residual/gradient LaTeX summary tables,
active-constraint tables, and the high-sensitivity site list.

The reporting layer here runs on the IN-MEMORY fitted result (the
reference re-reads its own Excel workbook back from disk) so it composes
with any optimizer backend; :func:`kkt_suite` is wired into the kinopt CLI
path next to ``export_kinopt_results``.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KKTReport(NamedTuple):
    primal_feasible: bool
    max_violation: float
    group_sums_alpha: np.ndarray
    group_sums_beta: np.ndarray
    stationarity_residual: float
    lagrange_alpha: np.ndarray      # per alpha group multiplier estimate
    lagrange_beta: np.ndarray
    n_active_box: int


def kkt_check(prob, alpha_pad: np.ndarray, beta_pad: np.ndarray,
              loss_fn, tol: float = 1e-5) -> KKTReport:
    """Evaluate KKT conditions at (alpha, beta).

    loss_fn: (alpha_pad, beta_pad) -> scalar (jax-differentiable).
    The equality multipliers are estimated per group as the mean in-group
    gradient (stationarity requires grad - lambda * 1 = 0 on free coords);
    the residual is the remaining in-group gradient dispersion over
    non-active coordinates.
    """
    a = jnp.asarray(alpha_pad)
    b = jnp.asarray(beta_pad)
    ga, gb = jax.grad(loss_fn, argnums=(0, 1))(a, b)
    ga, gb = np.asarray(ga), np.asarray(gb)

    gm, km = prob.gp_mask, prob.k_mask
    sums_a = (alpha_pad * gm).sum(axis=1)
    sums_b = (beta_pad * km).sum(axis=1)
    viol = max(np.abs(sums_a - 1).max(initial=0.0),
               np.abs(sums_b - 1).max(initial=0.0))

    # active box constraints
    act = 0
    for arr, msk in [(alpha_pad, gm), (beta_pad, km)]:
        v = arr[msk]
        act += int(((np.abs(v - prob.lb) < tol) | (np.abs(v - prob.ub) < tol)).sum())

    def group_stats(grad, vals, msk):
        lams, resid = [], 0.0
        for i in range(msk.shape[0]):
            m = msk[i]
            if not m.any():
                lams.append(0.0)
                continue
            free = m & (np.abs(vals[i] - prob.lb) > tol) & (np.abs(vals[i] - prob.ub) > tol)
            g = grad[i][free if free.any() else m]
            lam = float(g.mean())
            lams.append(lam)
            resid = max(resid, float(np.abs(g - lam).max(initial=0.0)))
        return np.asarray(lams), resid

    lam_a, res_a = group_stats(ga, alpha_pad, gm)
    lam_b, res_b = group_stats(gb, beta_pad, km)

    return KKTReport(bool(viol <= tol * 10), float(viol), sums_a, sums_b,
                     float(max(res_a, res_b)), lam_a, lam_b, act)


# ---------------------------------------------------------------------------
# reporting suite (reference KKT.py:60-254)
# ---------------------------------------------------------------------------

def _latex_table(summary: dict, caption: str) -> str:
    """Two-column Metric/Value LaTeX table (reference KKT.py:10-29)."""
    lines = ["\\begin{table}[H]", "\\centering",
             "\\begin{tabular}{|l|c|}\\hline",
             "Metric & Value \\\\ \\hline"]
    for k, v in summary.items():
        lines.append(f"{k} & {v} \\\\ \\hline")
    lines += ["\\end{tabular}", f"\\caption{{{caption}}}", "\\end{table}"]
    return "\n".join(lines) + "\n"


def plot_constraint_violations(alpha_viol, beta_viol, out_dir,
                               name="constraint_violations.png"):
    """Stacked per-protein |group-sum - 1| bars, top-5 totals in red
    (reference KKT.py:78-118). alpha_viol/beta_viol: pandas Series indexed
    by gene (alpha: summed over the gene's psites)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    a = alpha_viol.abs().groupby(level=0).sum() if alpha_viol.index.nlevels > 1 \
        else alpha_viol.abs()
    b = beta_viol.abs()
    # union of indices: a kinase that is not itself a substrate gene must
    # still show its sum(beta)=1 violation (reindexing onto a's index alone
    # would silently drop it)
    idx = a.index.union(b.index)
    a = a.reindex(idx, fill_value=0.0)
    b = b.reindex(idx, fill_value=0.0)
    comb = pd.DataFrame({"Alpha Violations": a, "Beta Violations": b})
    comb["Total"] = comb.sum(axis=1)
    comb = comb.sort_values("Total")
    top = set(comb.tail(5).index)

    fig, ax = plt.subplots(figsize=(8, 8))
    colors_a = ["red" if g in top else "dodgerblue" for g in comb.index]
    colors_b = ["red" if g in top else "lightgreen" for g in comb.index]
    ax.bar(comb.index, comb["Alpha Violations"], color=colors_a,
           label=r"$\alpha$")
    ax.bar(comb.index, comb["Beta Violations"],
           bottom=comb["Alpha Violations"], color=colors_b, label=r"$\beta$")
    ax.set_xlabel("Proteins")
    ax.set_ylabel("Constraint Violations")
    ax.tick_params(axis="x", rotation=45)
    ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def plot_sensitivity_analysis(sens_df, out_dir, name="sensitivity.png"):
    """Per-protein min/mean/max sensitivity horizontal bars (reference
    KKT.py:121-150). sens_df columns: GeneID, Sensitivity Mean,
    Max Sensitivity, Min Sensitivity."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    summary = (sens_df.groupby("GeneID")[["Sensitivity Mean",
                                          "Max Sensitivity",
                                          "Min Sensitivity"]]
               .mean().sort_values("Sensitivity Mean"))
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.barh(summary.index, summary["Min Sensitivity"], color="lightgreen",
            label="Min")
    ax.barh(summary.index, summary["Sensitivity Mean"],
            left=summary["Min Sensitivity"], color="dodgerblue", label="Mean")
    ax.barh(summary.index, summary["Max Sensitivity"],
            left=summary["Min Sensitivity"] + summary["Sensitivity Mean"],
            color="coral", label="Max")
    ax.set_xlabel("Sensitivity")
    ax.set_ylabel("Proteins")
    ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def kkt_suite(prob, result, out_dir, *, loss_type: str = "base",
              include_reg: bool = False, tol: float = 1e-5,
              high_thresh: float = 0.75, logger=None) -> dict:
    """Full post-optimization KKT report on a fitted kinopt result.

    Artifacts written to ``out_dir`` (reference KKT.py:60-254 artifact set):
      constraint_violations.png, sensitivity.png, kkt_summary.tex
      (residual + sensitivity + stationarity LaTeX tables),
      active_constraints.csv, lagrange_multipliers.csv,
      high_sensitivity_sites.csv, kkt_report.json.

    Returns {"report": KKTReport, "paths": {...}, "sensitivity": df}.
    """
    import pandas as pd

    from phoskintime_tpu.kinopt.model import kinopt_loss, predict

    os.makedirs(out_dir, exist_ok=True)
    alpha = np.asarray(result.alpha, float)
    beta = np.asarray(result.beta, float)

    def loss_fn(a, b):
        return kinopt_loss(prob, a, b, loss_type, include_reg)

    rep = kkt_check(prob, alpha, beta, loss_fn, tol=tol)

    names = prob.gp_names or [(f"G{i}", f"S{i}") for i in range(prob.n_gp)]
    kn = prob.kinase_names or [f"K{j}" for j in range(prob.n_k)]
    genes = [g for g, _ in names]
    psites = [s for _, s in names]

    # ---- primal feasibility series (per (gene, psite) / per kinase) ----
    a_viol = pd.Series(rep.group_sums_alpha - 1.0,
                       index=pd.MultiIndex.from_tuples(names,
                                                       names=["Gene", "Psite"]))
    b_gene = []
    for j, k in enumerate(kn):
        b_gene.append(rep.group_sums_beta[j] - 1.0)
    b_viol = pd.Series(b_gene, index=pd.Index(kn, name="Gene"))

    # ---- residual / gradient summary over the fitted surfaces ----------
    est = np.asarray(predict(prob, jnp.asarray(alpha), jnp.asarray(beta)))
    obs = np.asarray(prob.P_obs, float)
    residuals = obs - est
    grads = np.gradient(residuals, axis=1)
    residuals_summary = {
        "Max Residual": round(float(residuals.max()), 2),
        "Min Residual": round(float(residuals.min()), 2),
        "Mean Residual": round(float(residuals.mean()), 2),
        "Max Gradient": round(float(grads.max()), 2),
        "Min Gradient": round(float(grads.min()), 2),
        "Mean Gradient": round(float(grads.mean()), 2),
    }
    sensitivity_summary = {
        "Max Sensitivity": round(float(obs.max()), 2),
        "Min Sensitivity": round(float(obs.min()), 2),
        "Mean Sensitivity": round(float(obs.mean()), 2),
    }
    stationarity_summary = {
        "Primal feasible": rep.primal_feasible,
        "Max constraint violation": f"{rep.max_violation:.3e}",
        "Stationarity residual": f"{rep.stationarity_residual:.3e}",
        "Active box constraints": rep.n_active_box,
    }

    sens_df = pd.DataFrame({
        "GeneID": genes, "Psite": psites,
        "Sensitivity Mean": obs.mean(axis=1),
        "Max Sensitivity": obs.max(axis=1),
        "Min Sensitivity": obs.min(axis=1),
    })

    # ---- active box constraints, coordinate-resolved -------------------
    act_rows = []
    for i, (g, s) in enumerate(names):
        for c in range(prob.gp_mask.shape[1]):
            if prob.gp_mask[i, c]:
                v = alpha[i, c]
                where = ("lb" if abs(v - prob.lb) < tol
                         else "ub" if abs(v - prob.ub) < tol else None)
                if where:
                    act_rows.append(("alpha", g, s, kn[prob.gp_kin_idx[i, c]],
                                     float(v), where))
    for j, k in enumerate(kn):
        for c in range(prob.k_mask.shape[1]):
            if prob.k_mask[j, c]:
                v = beta[j, c]
                where = ("lb" if abs(v - prob.lb) < tol
                         else "ub" if abs(v - prob.ub) < tol else None)
                if where:
                    act_rows.append(("beta", k, f"P{c + 1}", "", float(v),
                                     where))
    act_df = pd.DataFrame(act_rows, columns=["block", "group", "member",
                                             "kinase", "value", "bound"])

    # ---- Lagrange multipliers = constraint sensitivities ---------------
    lam_df = pd.DataFrame({
        "constraint": ([f"sum_alpha[{g}_{s}]" for g, s in names]
                       + [f"sum_beta[{k}]" for k in kn]),
        "multiplier": np.concatenate([rep.lagrange_alpha,
                                      rep.lagrange_beta]),
    })
    lam_df["abs"] = lam_df["multiplier"].abs()
    lam_df = lam_df.sort_values("abs", ascending=False).drop(columns="abs")

    high_idx = np.where((obs >= high_thresh).any(axis=1))[0]
    high_df = pd.DataFrame({"Gene": [genes[i] for i in high_idx],
                            "Psite": [psites[i] for i in high_idx],
                            "Max value": obs[high_idx].max(axis=1)
                            if len(high_idx) else []})

    paths = {
        "violations_png": plot_constraint_violations(a_viol, b_viol, out_dir),
        "sensitivity_png": plot_sensitivity_analysis(sens_df, out_dir),
    }
    tex = (_latex_table(residuals_summary, "Residual Summary")
           + _latex_table(sensitivity_summary, "Sensitivity Summary")
           + _latex_table(stationarity_summary, "KKT Stationarity Summary"))
    paths["tex"] = os.path.join(out_dir, "kkt_summary.tex")
    with open(paths["tex"], "w") as f:
        f.write(tex)
    for fname, df in [("active_constraints.csv", act_df),
                      ("lagrange_multipliers.csv", lam_df),
                      ("high_sensitivity_sites.csv", high_df)]:
        p = os.path.join(out_dir, fname)
        df.to_csv(p, index=False)
        paths[fname.split(".")[0]] = p
    paths["json"] = os.path.join(out_dir, "kkt_report.json")
    with open(paths["json"], "w") as f:
        json.dump({"primal_feasible": bool(rep.primal_feasible),
                   "max_violation": float(rep.max_violation),
                   "stationarity_residual": float(rep.stationarity_residual),
                   "n_active_box": int(rep.n_active_box),
                   "residuals": residuals_summary,
                   "sensitivity": sensitivity_summary}, f, indent=1)
    if logger is not None:
        for k, v in {**residuals_summary, **stationarity_summary}.items():
            logger.info(f"[KKT] {k}: {v}")
    return {"report": rep, "paths": paths, "sensitivity": sens_df}
