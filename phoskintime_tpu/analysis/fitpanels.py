"""Post-fit dashboard panels for kinopt / tfopt results.

Spec: reference ``kinopt/fitanalysis/helpers/postfit.py`` (goodness-of-fit
scatter with CI bands, KL divergence, PCA/t-SNE of fitted profiles,
alpha/beta distribution / box / CDF / violin panels, residual heatmap and
per-time variance / MAE trends, cumulative residual profiles, Sankey
network flows, top-connection tables) and
``tfopt/fitanalysis/helper.py:1-372`` (per-mRNA alpha strips, per-TF beta
bars, residual heatmap, GOF, KLD, PCA, box/CDF panels, time-wise
residuals).

Everything is host-side matplotlib/pandas over the exporter sheet schemas
(``io.export.kinopt_sheets`` / ``tfopt_sheets``), so the panels work on
any fitted result regardless of which optimizer produced it. The Sankey
flow is rendered as a dependency-free SVG/HTML file (the reference uses
plotly, which is not available here).
"""

from __future__ import annotations

import html
import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

COLORS = plt.get_cmap("tab20").colors


def _save(fig, out_dir, name):
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def _tcols(df):
    return [c for c in df.columns if str(c).startswith("x")
            and str(c)[1:].isdigit()]


# ---------------------------------------------------------------------------
# shared panels (reference postfit.py:18-151, 279-463)
# ---------------------------------------------------------------------------

def goodness_of_fit_plot(obs_df, est_df, out_dir, group_col="Gene"):
    """Observed-vs-fitted scatter with the diagonal and 95/99% CI bands;
    groups escaping the 95% band get labeled (postfit.py:18-124)."""
    tc = _tcols(obs_df)
    obs = obs_df[tc].to_numpy(float)
    est = est_df[tc].to_numpy(float)
    groups = obs_df[group_col].astype(str).to_numpy()
    uniq = list(dict.fromkeys(groups))
    cmap = {g: COLORS[i % len(COLORS)] for i, g in enumerate(uniq)}

    sd = obs.std()
    ci95, ci99 = 1.96 * sd, 2.576 * sd
    lo = min(obs.min(), est.min())
    hi = max(obs.max(), est.max())

    fig, ax = plt.subplots(figsize=(7.5, 7.5))
    labeled = set()
    for i in range(len(obs)):
        ax.scatter(obs[i], est[i], color=cmap[groups[i]], alpha=0.5, s=40,
                   edgecolor="black", linewidth=0.3)
        if groups[i] not in labeled and np.any(
                np.abs(est[i] - obs[i]) > ci95):
            j = int(np.argmax(np.abs(est[i] - obs[i])))
            ax.annotate(groups[i], (obs[i][j], est[i][j]), fontsize=7,
                        fontweight="bold", color=cmap[groups[i]])
            labeled.add(groups[i])
    ax.plot([lo, hi], [lo, hi], color="gray", lw=1.2)
    for off, col, lbl in [(ci95, "red", "95% CI"), (ci99, "gray", "99% CI")]:
        ax.plot([lo, hi], [lo + off, hi + off], "--", color=col, lw=0.8,
                label=lbl)
        ax.plot([lo, hi], [lo - off, hi - off], "--", color=col, lw=0.8)
    ax.set_xlabel("Observed")
    ax.set_ylabel("Fitted")
    ax.grid(alpha=0.1)
    ax.legend(fontsize=8)
    return _save(fig, out_dir, "Goodness_of_Fit.png")


def kld_plot(obs_df, est_df, out_dir, group_col="Gene"):
    """Per-group mean KL divergence of time-profile distributions
    (postfit.py:126-151)."""
    tc = _tcols(obs_df)
    obs = np.clip(obs_df[tc].to_numpy(float), 1e-12, None)
    est = np.clip(est_df[tc].to_numpy(float), 1e-12, None)
    p = obs / obs.sum(axis=1, keepdims=True)
    q = est / est.sum(axis=1, keepdims=True)
    kl = (p * np.log(p / q)).sum(axis=1)
    s = (pd.DataFrame({group_col: obs_df[group_col].astype(str), "KL": kl})
         .groupby(group_col)["KL"].mean().sort_values())
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.scatter(range(len(s)), s.values, marker="s", color="blue")
    ax.set_xticks(range(len(s)))
    ax.set_xticklabels(s.index, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("KL divergence")
    return _save(fig, out_dir, "kld.png")


def pca_tsne_plots(est_df, out_dir, group_col="Gene"):
    """PCA + t-SNE embeddings of the fitted time profiles
    (postfit.py:186-278)."""
    tc = _tcols(est_df)
    X = est_df[tc].to_numpy(float)
    X = (X - X.mean(0)) / np.maximum(X.std(0), 1e-12)
    groups = est_df[group_col].astype(str).to_numpy()
    uniq = list(dict.fromkeys(groups))
    cmap = {g: COLORS[i % len(COLORS)] for i, g in enumerate(uniq)}

    _, _, Vt = np.linalg.svd(X, full_matrices=False)
    Z = X @ Vt[:2].T
    if Z.shape[1] < 2:  # single profile: pad PC2 with zeros
        Z = np.pad(Z, ((0, 0), (0, 2 - Z.shape[1])))
    paths = []
    fig, ax = plt.subplots(figsize=(7, 6))
    for g in uniq:
        m = groups == g
        ax.scatter(Z[m, 0], Z[m, 1], color=cmap[g], label=g, s=30,
                   alpha=0.8, edgecolor="black", linewidth=0.3)
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    ax.set_title("PCA of fitted profiles")
    if len(uniq) <= 20:
        ax.legend(fontsize=6, ncol=2)
    paths.append(_save(fig, out_dir, "PCA.png"))

    if len(X) >= 8:
        from sklearn.manifold import TSNE

        emb = TSNE(n_components=2, perplexity=min(15, len(X) - 1),
                   random_state=0, init="pca").fit_transform(X)
        fig, ax = plt.subplots(figsize=(7, 6))
        for g in uniq:
            m = groups == g
            ax.scatter(emb[m, 0], emb[m, 1], color=cmap[g], label=g, s=30,
                       alpha=0.8, edgecolor="black", linewidth=0.3)
        ax.set_title("t-SNE of fitted profiles")
        if len(uniq) <= 20:
            ax.legend(fontsize=6, ncol=2)
        paths.append(_save(fig, out_dir, "tSNE.png"))
    return paths


def param_distribution_panels(alpha_vals, beta_vals, out_dir,
                              alpha_groups=None, beta_groups=None):
    """KDE / box / CDF / violin panels over the fitted alpha and beta
    populations (postfit.py:279-345)."""
    from scipy.stats import gaussian_kde

    a = np.asarray(alpha_vals, float).ravel()
    b = np.asarray(beta_vals, float).ravel()
    paths = []

    fig, ax = plt.subplots(figsize=(7, 5))
    for vals, col, lbl in [(a, "tab:blue", r"$\alpha$"),
                           (b, "tab:green", r"$\beta$")]:
        if len(vals) > 2 and vals.std() > 1e-12:
            xs = np.linspace(vals.min() - 0.1, vals.max() + 0.1, 200)
            d = gaussian_kde(vals)(xs)
            ax.plot(xs, d, color=col, label=lbl)
            ax.fill_between(xs, d, alpha=0.3, color=col)
        else:
            ax.hist(vals, bins=10, alpha=0.4, color=col, label=lbl,
                    density=True)
    ax.set_xlabel("value")
    ax.set_ylabel("density")
    ax.legend()
    paths.append(_save(fig, out_dir, "distribution_parameters.png"))

    fig, ax = plt.subplots(figsize=(6, 5))
    ax.boxplot([a, b], tick_labels=[r"$\alpha$", r"$\beta$"],
               patch_artist=True)
    ax.set_ylabel("value")
    paths.append(_save(fig, out_dir, "boxplot_parameters.png"))

    fig, ax = plt.subplots(figsize=(7, 5))
    for vals, col, lbl in [(a, "tab:blue", r"$\alpha$"),
                           (b, "tab:green", r"$\beta$")]:
        xs = np.sort(vals)
        ax.step(xs, np.arange(1, len(xs) + 1) / len(xs), color=col,
                label=lbl, where="post")
    ax.set_xlabel("value")
    ax.set_ylabel("CDF")
    ax.legend()
    paths.append(_save(fig, out_dir, "cdf_parameters.png"))

    fig, ax = plt.subplots(figsize=(7, 5))
    parts = ax.violinplot([a, b], showmedians=True)
    for pc, col in zip(parts["bodies"], ["tab:blue", "tab:green"]):
        pc.set_facecolor(col)
    ax.set_xticks([1, 2])
    ax.set_xticklabels([r"$\alpha$", r"$\beta$"])
    ax.set_ylabel("estimated value")
    paths.append(_save(fig, out_dir, "violin_parameters.png"))
    return paths


def residual_panels(res_df, out_dir, group_col="Gene"):
    """Residual heatmap, per-time variance bars (top-5 highlighted),
    per-time MAE trend (top/bottom-3 marked), cumulative per-group
    residual profile (postfit.py:346-463)."""
    tc = _tcols(res_df)
    R = res_df[tc].to_numpy(float)
    groups = res_df[group_col].astype(str).to_numpy()
    paths = []

    fig, ax = plt.subplots(figsize=(8, max(4, 0.25 * len(R))))
    im = ax.imshow(R, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(tc)))
    ax.set_xticklabels([c[1:] for c in tc], fontsize=7)
    ax.set_yticks(range(len(groups)))
    ax.set_yticklabels(groups, fontsize=5)
    ax.set_xlabel("time index")
    fig.colorbar(im, ax=ax, label="residual")
    paths.append(_save(fig, out_dir, "time_residuals.png"))

    var = R.var(axis=0)
    top5 = np.argsort(var)[-5:]
    fig, ax = plt.subplots(figsize=(7, 5))
    bars = ax.bar(range(len(tc)), var, color="lightblue", edgecolor="black")
    for i in top5:
        bars[i].set_color("coral")
        ax.text(i, var[i], f"{var[i]:.2g}", ha="center", va="bottom",
                fontsize=7)
    ax.set_xticks(range(len(tc)))
    ax.set_xticklabels([c[1:] for c in tc], rotation=45, fontsize=7)
    ax.set_xlabel("time index")
    ax.set_ylabel("Var(residuals)")
    paths.append(_save(fig, out_dir, "variance_residuals.png"))

    mae = np.abs(R).mean(axis=0)
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(range(len(tc)), mae, "o-", color="lightblue")
    for i in np.argsort(mae)[-3:]:
        ax.scatter(i, mae[i], color="red", marker="^", s=90, zorder=5)
    for i in np.argsort(mae)[:3]:
        ax.scatter(i, mae[i], color="green", marker="v", s=90, zorder=5)
    ax.set_xticks(range(len(tc)))
    ax.set_xticklabels([c[1:] for c in tc], rotation=45, fontsize=7)
    ax.set_xlabel("time index")
    ax.set_ylabel("mean |residual|")
    paths.append(_save(fig, out_dir, "error_trends.png"))

    cum = (pd.DataFrame({group_col: groups,
                         "cum": np.abs(R).sum(axis=1)})
           .groupby(group_col)["cum"].sum().sort_values(ascending=False))
    n = len(cum)
    cols = ["teal"] * n
    for r, i in enumerate(range(min(5, n))):
        cols[i] = plt.get_cmap("Reds")(0.9 - 0.12 * r)
    for r, i in enumerate(range(max(0, n - 5), n)):
        cols[i] = plt.get_cmap("Greens")(0.9 - 0.12 * r)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.bar(range(n), cum.values, color=cols, edgecolor="black")
    ax.set_xticks([])
    ax.set_ylabel("cumulative |residual|")
    hi = ", ".join(cum.index[: min(5, n)])
    ax.set_title(f"highest: {hi}", fontsize=8)
    paths.append(_save(fig, out_dir, "residual_profiles.png"))
    return paths


# ---------------------------------------------------------------------------
# network flows (postfit.py:468-620; dependency-free SVG instead of plotly)
# ---------------------------------------------------------------------------

def sankey_html(edges: pd.DataFrame, out_path, title="Network flows"):
    """Two-column Sankey (source -> target, ribbon width ~ value) rendered
    as a standalone SVG/HTML file."""
    e = edges.copy()
    e.columns = ["source", "target", "value"]
    e = e[e["value"] > 0]
    srcs = list(dict.fromkeys(e["source"]))
    tgts = list(dict.fromkeys(e["target"]))
    H, W, PAD = max(420, 22 * max(len(srcs), len(tgts))), 860, 30
    s_tot = e.groupby("source")["value"].sum()
    t_tot = e.groupby("target")["value"].sum()
    total = max(e["value"].sum(), 1e-12)
    scale = (H - PAD * 2) / total

    def stack(names, tot):
        pos, y = {}, PAD
        for nm in names:
            h = float(tot.get(nm, 0)) * scale
            pos[nm] = [y, y]  # [top, cursor]
            y += h + 4
        return pos

    sp, tp = stack(srcs, s_tot), stack(tgts, t_tot)
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
             f'height="{H + PAD}" font-family="sans-serif">']
    for i, (_, row) in enumerate(e.iterrows()):
        h = row["value"] * scale
        y0 = sp[row["source"]][1]
        y1 = tp[row["target"]][1]
        sp[row["source"]][1] += h
        tp[row["target"]][1] += h
        c = matplotlib.colors.to_hex(COLORS[i % len(COLORS)])
        parts.append(
            f'<path d="M 150 {y0 + h / 2:.1f} C 430 {y0 + h / 2:.1f} 430 '
            f'{y1 + h / 2:.1f} 710 {y1 + h / 2:.1f}" stroke="{c}" '
            f'stroke-width="{max(h, 1):.1f}" fill="none" opacity="0.55">'
            f'<title>{html.escape(str(row["source"]))} → '
            f'{html.escape(str(row["target"]))}: {row["value"]:.3g}</title>'
            f'</path>')
    for nm in srcs:
        top, bot = sp[nm][0], sp[nm][1]
        parts.append(f'<rect x="140" y="{top:.1f}" width="10" '
                     f'height="{max(bot - top, 1):.1f}" fill="#333"/>'
                     f'<text x="134" y="{(top + bot) / 2:.1f}" font-size="11"'
                     f' text-anchor="end">{html.escape(str(nm))}</text>')
    for nm in tgts:
        top, bot = tp[nm][0], tp[nm][1]
        parts.append(f'<rect x="710" y="{top:.1f}" width="10" '
                     f'height="{max(bot - top, 1):.1f}" fill="#333"/>'
                     f'<text x="726" y="{(top + bot) / 2:.1f}" '
                     f'font-size="11">{html.escape(str(nm))}</text>')
    parts.append("</svg>")
    doc = (f"<!doctype html><html><head><title>{html.escape(title)}</title>"
           f"</head><body><h3>{html.escape(title)}</h3>"
           + "".join(parts) + "</body></html>")
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path


def important_connections(alpha_df, out_dir, top_n=20,
                          cols=("Kinase", "Gene", "Alpha")):
    """Top-N strongest edges table + bar chart (postfit.py:576-620)."""
    src, tgt, val = cols
    # aggregate per (src, tgt): kinopt alphas carry one row per psite, and
    # duplicate barh labels collapse onto one y slot (caught in review)
    e = (alpha_df[[src, tgt, val]]
         .groupby([src, tgt], as_index=False)[val].sum()
         .sort_values(val, ascending=False).head(top_n))
    fig, ax = plt.subplots(figsize=(8, max(4, 0.3 * len(e))))
    labels = [f"{s} → {t}" for s, t in zip(e[src], e[tgt])]
    ax.barh(labels[::-1], e[val].to_numpy()[::-1], color="steelblue",
            edgecolor="black")
    ax.set_xlabel(val)
    ax.set_title(f"top {len(e)} connections")
    path = _save(fig, out_dir, "important_connections.png")
    e.to_csv(os.path.join(out_dir, "important_connections.csv"), index=False)
    return e, path


# ---------------------------------------------------------------------------
# tfopt-specific panels (tfopt/fitanalysis/helper.py:46-135)
# ---------------------------------------------------------------------------

def alpha_strips_per_mrna(alpha_df, out_dir, max_genes=None):
    """Per-mRNA strip plot of regulator alpha values."""
    markers = "osD^vPXh*<>"
    paths = []
    genes = list(dict.fromkeys(alpha_df["mRNA"]))
    if max_genes is not None:
        genes = genes[:max_genes]
    for g in genes:
        sub = alpha_df[alpha_df["mRNA"] == g].sort_values("Value")
        fig, ax = plt.subplots(figsize=(7, 2.6))
        for i, (_, row) in enumerate(sub.iterrows()):
            ax.scatter(row["Value"], 0, marker=markers[i % len(markers)],
                       s=70, edgecolor="black", label=str(row["TF"]))
        ax.set_yticks([])
        ax.set_xlabel("alpha")
        ax.set_title(f"mRNA: {g}", fontsize=9)
        ax.legend(fontsize=6, ncol=4, loc="upper center",
                  bbox_to_anchor=(0.5, -0.35))
        paths.append(_save(fig, out_dir, f"alpha_distribution_{g}.png"))
    return paths


def beta_bars_per_tf(beta_df, out_dir, max_tfs=None):
    """Per-TF bar chart of beta0 (protein) + per-psite betas."""
    paths = []
    tfs = list(dict.fromkeys(beta_df["TF"]))
    if max_tfs is not None:
        tfs = tfs[:max_tfs]
    for tf in tfs:
        sub = beta_df[beta_df["TF"] == tf].copy()
        sub["PSite"] = sub["PSite"].replace("", "β₀").fillna("β₀")
        fig, ax = plt.subplots(figsize=(5.5, 4.5))
        ax.bar(sub["PSite"].astype(str), sub["Value"].to_numpy(float),
               color=[COLORS[i % len(COLORS)] for i in range(len(sub))],
               edgecolor="black", linewidth=0.5)
        ax.set_xlabel("residue position")
        ax.set_ylabel("β")
        ax.set_title(f"phospho effect on TF {tf} activity", fontsize=8)
        ax.grid(alpha=0.2)
        paths.append(_save(fig, out_dir, f"TF_{tf}_beta_group.png"))
    return paths


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def kinopt_fit_analysis(prob, result, out_dir, meta=None) -> dict:
    """The full reference kinopt post-fit dashboard from a fitted result,
    plus the network-readout figure set (control load, breadth-vs-load,
    knockout effects — reference scripts/kinopt_network_viz.py)."""
    from phoskintime_tpu.analysis.network_tools import (
        kinopt_signal_readout, plot_signal_readout)
    from phoskintime_tpu.io.export import kinopt_sheets

    out = kinopt_fit_analysis_from_sheets(
        kinopt_sheets(prob, result, meta), out_dir)
    tabs = kinopt_signal_readout(prob, result.alpha, result.beta)
    out["network_readout"] = plot_signal_readout(tabs, out_dir,
                                                 which="kinopt")
    return out


def kinopt_fit_analysis_from_sheets(sheets: dict, out_dir) -> dict:
    """Same dashboard from SAVED workbook sheets — re-analysis of an
    existing `kinopt_results.xlsx` without re-fitting (reference
    ``kinopt/fitanalysis/__main__.py`` reads the workbook the same way).
    Use :func:`fit_analysis_from_workbook` for the file-path entry."""
    os.makedirs(out_dir, exist_ok=True)
    obs, est, res = (sheets["Observed"], sheets["Estimated"],
                     sheets["Residuals"])
    alpha, beta = sheets["Alpha Values"], sheets["Beta Values"]
    beta_site = beta[beta["Psite"] != ""]

    out = {"gof": goodness_of_fit_plot(obs, est, out_dir),
           "kld": kld_plot(obs, est, out_dir),
           "embeddings": pca_tsne_plots(est, out_dir),
           "params": param_distribution_panels(
               alpha["Alpha"].to_numpy(float),
               beta_site["Beta"].to_numpy(float), out_dir),
           "residuals": residual_panels(res, out_dir)}
    e = (alpha.groupby(["Kinase", "Gene"], as_index=False)["Alpha"].sum())
    out["sankey"] = sankey_html(e[["Kinase", "Gene", "Alpha"]],
                                os.path.join(out_dir, "network_sankey.html"),
                                title="Kinase → substrate flows")
    out["top_connections"] = important_connections(alpha, out_dir)[1]
    return out


def tfopt_fit_analysis(prob, result, out_dir, max_detail=12) -> dict:
    """The full reference tfopt post-fit dashboard from a fitted result,
    plus the TF network-readout figure set (reference
    scripts/tfopt_network_viz.py)."""
    from phoskintime_tpu.analysis.network_tools import (
        plot_signal_readout, tfopt_signal_readout)
    from phoskintime_tpu.io.export import tfopt_sheets

    out = tfopt_fit_analysis_from_sheets(tfopt_sheets(prob, result),
                                         out_dir, max_detail=max_detail)
    tabs = tfopt_signal_readout(prob, result.alpha, result.beta)
    out["network_readout"] = plot_signal_readout(tabs, out_dir,
                                                 which="tfopt")
    return out


def tfopt_fit_analysis_from_sheets(sheets: dict, out_dir,
                                   max_detail=12) -> dict:
    """Same dashboard from SAVED workbook sheets (see the kinopt
    counterpart)."""
    os.makedirs(out_dir, exist_ok=True)
    obs, est = sheets["Observed"], sheets["Estimated"]
    alpha, beta = sheets["Alpha Values"], sheets["Beta Values"]
    tc = _tcols(obs)
    res = est.copy()
    res[tc] = obs[tc].to_numpy(float) - est[tc].to_numpy(float)

    out = {"gof": goodness_of_fit_plot(obs, est, out_dir, group_col="mRNA"),
           "kld": kld_plot(obs, est, out_dir, group_col="mRNA"),
           "embeddings": pca_tsne_plots(est, out_dir, group_col="mRNA"),
           "params": param_distribution_panels(
               alpha["Value"].to_numpy(float),
               beta["Value"].to_numpy(float), out_dir),
           "residuals": residual_panels(res, out_dir, group_col="mRNA"),
           "alpha_strips": alpha_strips_per_mrna(alpha, out_dir,
                                                 max_genes=max_detail),
           "beta_bars": beta_bars_per_tf(beta, out_dir, max_tfs=max_detail)}
    out["sankey"] = sankey_html(alpha[["TF", "mRNA", "Value"]],
                                os.path.join(out_dir, "network_sankey.html"),
                                title="TF → mRNA flows")
    out["top_connections"] = important_connections(
        alpha, out_dir, cols=("TF", "mRNA", "Value"))[1]
    return out


def fit_analysis_from_workbook(path, out_dir, kind: str) -> dict:
    """Re-run the post-fit dashboard from a SAVED results workbook (or the
    CSV-fallback sheet files) without refitting.

    Spec: reference ``kinopt/fitanalysis/__main__.py`` — it reads
    Observed/Estimated/Alpha/Beta/Residuals back from OUT_FILE; this is
    the same contract for both kinds, exposed via
    ``cli fitanalysis --which kinopt|tfopt``.
    """
    from phoskintime_tpu.io.load import read_table

    if kind == "kinopt":
        names = ["Observed", "Estimated", "Alpha Values", "Beta Values",
                 "Residuals"]
    elif kind == "tfopt":
        names = ["Observed", "Estimated", "Alpha Values", "Beta Values"]
    else:
        raise ValueError(f"kind must be kinopt|tfopt, got {kind!r}")
    sheets = {}
    for n in names:
        df = read_table(path, sheet_name=n)
        if df is None:
            raise FileNotFoundError(f"sheet {n!r} of {path} not found")
        sheets[n] = df
    if kind == "kinopt":
        sheets["Beta Values"]["Psite"] = (
            sheets["Beta Values"]["Psite"].fillna(""))
        return kinopt_fit_analysis_from_sheets(sheets, out_dir)
    return tfopt_fit_analysis_from_sheets(sheets, out_dir)
