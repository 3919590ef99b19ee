"""Plotting suite.

Spec: reference ``plotting/plotting.py:25-1287`` — a per-gene ``Plotter``
with ~25 methods: model-fit overlays, parameter bars with CIs, PCA /
t-SNE / parallel coordinates of parameter ensembles, goodness-of-fit
(R^2, chi^2), KL divergence, knockout overlays, Morris perturbation
clouds, phase space, time-state grids, regularization/error summaries.
Plotly-based 3D Pareto / convergence views are rendered with matplotlib
(plotly is not available here).

All host-side matplotlib (Agg backend); every method writes
``<out_dir>/<gene>_<name>.png`` and returns the path.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

COLORS = plt.get_cmap("tab10").colors


class Plotter:
    """Per-gene figure factory (reference plotting/plotting.py:25)."""

    def __init__(self, gene: str, out_dir: str):
        self.gene = gene
        self.out_dir = str(out_dir)
        os.makedirs(self.out_dir, exist_ok=True)

    def _save(self, fig, name: str) -> str:
        path = os.path.join(self.out_dir, f"{self.gene}_{name}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path

    # ------------------------------------------------------------------
    def plot_model_fit(self, time_points, sol, target=None, state_labels=None,
                       rna_time_points=None, name="model_fit"):
        """Fitted trajectories (solid) vs observations (markers)."""
        sol = np.asarray(sol)
        fig, ax = plt.subplots(figsize=(8, 5))
        for j in range(sol.shape[1]):
            lbl = state_labels[j] if state_labels else f"state {j}"
            ax.plot(time_points, sol[:, j], color=COLORS[j % 10], label=lbl)
        if target is not None:
            tgt = np.asarray(target)
            T = len(time_points)
            # RNA segment length follows the actual RNA grid when given —
            # T-5 only matches the default 14/9-point grids (review)
            rna_t = (rna_time_points if rna_time_points is not None
                     else time_points[5:])
            n_r = len(rna_t)
            ax.plot(rna_t, tgt[:n_r], "o", color=COLORS[0], ms=4)
            ax.plot(time_points, tgt[n_r:n_r + T], "s", color=COLORS[1], ms=4)
            rest = tgt[n_r + T:]
            for j in range(len(rest) // T):
                ax.plot(time_points, rest[j * T:(j + 1) * T], "^",
                        color=COLORS[(2 + j) % 10], ms=4)
        ax.set_xscale("symlog", linthresh=1.0)
        ax.set_xlabel("time [min]")
        ax.set_ylabel("abundance (FC)")
        ax.set_title(f"{self.gene}: model fit")
        ax.legend(fontsize=7, ncol=2)
        return self._save(fig, name)

    def plot_params_bar(self, ci_results: dict, param_names):
        """Parameter estimates with CI whiskers (reference :plot_params_bar)."""
        if ci_results is None:
            return None
        est = np.asarray(ci_results["beta_hat"])
        lwr = np.asarray(ci_results["lwr_ci"])
        upr = np.asarray(ci_results["upr_ci"])
        fig, ax = plt.subplots(figsize=(max(6, 0.5 * len(est)), 4))
        x = np.arange(len(est))
        yerr = np.stack([est - lwr, upr - est])
        ax.bar(x, est, color=COLORS[0], alpha=0.8)
        ax.errorbar(x, est, yerr=np.maximum(yerr, 0), fmt="none", ecolor="k",
                    capsize=3, lw=1)
        ax.set_xticks(x)
        ax.set_xticklabels(param_names, rotation=60, ha="right", fontsize=7)
        ax.set_title(f"{self.gene}: parameter estimates (95% CI)")
        return self._save(fig, "params_ci")

    def plot_scree(self, param_samples, target_variance=0.99):
        """Scree plot: individual + cumulative explained variance with the
        component count reaching ``target_variance`` marked (reference
        plotting.py:87-115 pca_components). Returns (k, ratios)."""
        from sklearn.decomposition import PCA

        X = np.asarray(param_samples)
        if len(X) < 3:
            return None
        p = PCA(n_components=min(X.shape))
        p.fit(X)
        ev = p.explained_variance_ratio_
        cum = np.cumsum(ev)
        k = int(np.argmax(cum >= target_variance) + 1)
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.bar(range(1, len(ev) + 1), ev * 100, alpha=0.6, color=COLORS[0],
               label="Individual")
        ax.plot(range(1, len(cum) + 1), cum * 100, marker="o",
                color=COLORS[1], label="Cumulative")
        ax.axvline(x=k, color=COLORS[2], ls="--", label=f"{k} components")
        ax.set_title(self.gene)
        ax.set_xlabel("Principal Component")
        ax.set_ylabel("Explained Variance (%)")
        ax.legend()
        ax.grid(True, alpha=0.2)
        self._save(fig, "scree_plot")
        return k, ev

    def plot_pca(self, param_samples, var_target=0.99):
        """PCA of a parameter ensemble, keeping components to var_target."""
        from sklearn.decomposition import PCA

        X = np.asarray(param_samples)
        if len(X) < 3:
            return None
        p = PCA(n_components=min(X.shape))
        Z = p.fit_transform(X)
        k = int(np.searchsorted(np.cumsum(p.explained_variance_ratio_),
                                var_target) + 1)
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.scatter(Z[:, 0], Z[:, 1] if Z.shape[1] > 1 else np.zeros(len(Z)),
                   s=10, alpha=0.6, color=COLORS[0])
        ax.set_xlabel(f"PC1 ({p.explained_variance_ratio_[0]:.0%})")
        if Z.shape[1] > 1:
            ax.set_ylabel(f"PC2 ({p.explained_variance_ratio_[1]:.0%})")
        ax.set_title(f"{self.gene}: parameter PCA ({k} comps -> {var_target:.0%} var)")
        return self._save(fig, "pca")

    def plot_tsne(self, param_samples, perplexity=15):
        from sklearn.manifold import TSNE

        X = np.asarray(param_samples)
        if len(X) < 10:
            return None
        Z = TSNE(n_components=2,
                 perplexity=min(perplexity, len(X) // 3),
                 init="pca", random_state=42).fit_transform(X)
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.scatter(Z[:, 0], Z[:, 1], s=10, alpha=0.6, color=COLORS[1])
        ax.set_title(f"{self.gene}: parameter t-SNE")
        return self._save(fig, "tsne")

    def plot_parallel(self, param_samples, param_names, values=None):
        """Parallel coordinates across parameters."""
        X = np.asarray(param_samples)
        lo, hi = X.min(axis=0), X.max(axis=0)
        span = np.where(hi - lo > 0, hi - lo, 1.0)
        Xn = (X - lo) / span
        fig, ax = plt.subplots(figsize=(max(6, 0.6 * X.shape[1]), 4))
        cvals = (np.asarray(values) if values is not None
                 else np.arange(len(X)))
        norm = plt.Normalize(cvals.min(), cvals.max() + 1e-12)
        for i in range(len(Xn)):
            ax.plot(Xn[i], color=plt.cm.viridis(norm(cvals[i])), alpha=0.4, lw=0.8)
        ax.set_xticks(range(X.shape[1]))
        ax.set_xticklabels(param_names, rotation=60, ha="right", fontsize=7)
        ax.set_title(f"{self.gene}: parallel coordinates")
        return self._save(fig, "parallel")

    def plot_gof(self, target, prediction):
        """Goodness of fit: scatter + R^2 + chi^2 (reference :435-527)."""
        t = np.asarray(target).ravel()
        p = np.asarray(prediction).ravel()
        ss_res = np.sum((t - p) ** 2)
        ss_tot = np.sum((t - t.mean()) ** 2)
        r2 = 1 - ss_res / ss_tot if ss_tot > 0 else np.nan
        chi2 = np.sum((t - p) ** 2 / np.maximum(np.abs(p), 1e-9))
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(t, p, s=12, alpha=0.6)
        lims = [min(t.min(), p.min()), max(t.max(), p.max())]
        ax.plot(lims, lims, "k--", lw=1)
        ax.set_xlabel("observed")
        ax.set_ylabel("predicted")
        ax.set_title(f"{self.gene}: GOF  R2={r2:.3f}  chi2={chi2:.2f}")
        return self._save(fig, "gof")

    def plot_kld(self, target, prediction, bins=20):
        """KL divergence between observed and predicted distributions."""
        t = np.abs(np.asarray(target).ravel()) + 1e-12
        p = np.abs(np.asarray(prediction).ravel()) + 1e-12
        lo, hi = min(t.min(), p.min()), max(t.max(), p.max())
        ht, edges = np.histogram(t, bins=bins, range=(lo, hi), density=True)
        hp, _ = np.histogram(p, bins=bins, range=(lo, hi), density=True)
        ht = ht + 1e-12
        hp = hp + 1e-12
        kld = float(np.sum(ht * np.log(ht / hp)) * (edges[1] - edges[0]))
        centers = 0.5 * (edges[:-1] + edges[1:])
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(centers, ht, label="observed", color=COLORS[0])
        ax.plot(centers, hp, label="predicted", color=COLORS[1])
        ax.set_title(f"{self.gene}: distribution match (KLD={kld:.4f})")
        ax.legend()
        return self._save(fig, "kld")

    def plot_knockouts(self, time_points, wt_sol, ko_sols, ko_labels,
                       state_idx=1):
        """Wild-type vs knockout trajectories for one state."""
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(time_points, np.asarray(wt_sol)[:, state_idx], "k-", lw=2,
                label="wild-type")
        for i, (sol, lbl) in enumerate(zip(ko_sols, ko_labels)):
            ax.plot(time_points, np.asarray(sol)[:, state_idx],
                    color=COLORS[i % 10], lw=1, alpha=0.7, label=lbl)
        ax.set_xscale("symlog", linthresh=1.0)
        ax.set_title(f"{self.gene}: knockout scan")
        ax.legend(fontsize=6, ncol=2)
        return self._save(fig, "knockouts")

    def plot_perturbation_cloud(self, time_points, solutions, best_sol=None,
                                state_idx=0, opacity=0.05):
        """Morris perturbation cloud (reference perturbation plots)."""
        fig, ax = plt.subplots(figsize=(7, 4))
        for sol in np.asarray(solutions):
            ax.plot(time_points, sol[:, state_idx], color=COLORS[0],
                    alpha=opacity, lw=0.8)
        if best_sol is not None:
            ax.plot(time_points, np.asarray(best_sol)[:, state_idx], "k-", lw=2)
        ax.set_xscale("symlog", linthresh=1.0)
        ax.set_title(f"{self.gene}: perturbation cloud (state {state_idx})")
        return self._save(fig, f"perturb_{state_idx}")

    def plot_morris(self, morris_result, param_names):
        """mu* vs sigma scatter (elementary effects summary)."""
        mu_star = np.asarray(morris_result.mu_star)
        sigma = np.asarray(morris_result.sigma)
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.errorbar(mu_star, sigma, xerr=np.asarray(morris_result.mu_star_conf),
                    fmt="o", ms=5, capsize=2)
        for x, y, n in zip(mu_star, sigma, param_names):
            ax.annotate(n, (x, y), fontsize=7,
                        textcoords="offset points", xytext=(4, 2))
        ax.set_xlabel("mu* (mean |elementary effect|)")
        ax.set_ylabel("sigma (interaction / nonlinearity)")
        ax.set_title(f"{self.gene}: Morris sensitivity")
        return self._save(fig, "morris")

    def plot_phase_space(self, sol, i=0, j=1, labels=("mRNA", "protein")):
        sol = np.asarray(sol)
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot(sol[:, i], sol[:, j], "-o", ms=3)
        ax.set_xlabel(labels[0])
        ax.set_ylabel(labels[1])
        ax.set_title(f"{self.gene}: phase space")
        return self._save(fig, "phase")

    def plot_time_state_grid(self, time_points, sol, state_labels=None):
        sol = np.asarray(sol)
        d = sol.shape[1]
        ncol = min(4, d)
        nrow = int(np.ceil(d / ncol))
        fig, axes = plt.subplots(nrow, ncol, figsize=(3 * ncol, 2.2 * nrow),
                                 squeeze=False)
        for j in range(d):
            ax = axes[j // ncol][j % ncol]
            ax.plot(time_points, sol[:, j], color=COLORS[j % 10])
            ax.set_xscale("symlog", linthresh=1.0)
            ax.set_title(state_labels[j] if state_labels else f"state {j}",
                         fontsize=8)
        for j in range(d, nrow * ncol):
            axes[j // ncol][j % ncol].axis("off")
        fig.suptitle(f"{self.gene}: per-state trajectories")
        return self._save(fig, "state_grid")

    def plot_error_summary(self, errors: dict):
        """Bar chart over named error metrics / per-weight scores."""
        names = list(errors)
        vals = [errors[k] for k in names]
        fig, ax = plt.subplots(figsize=(max(5, 0.5 * len(names)), 4))
        ax.bar(names, vals, color=COLORS[2])
        ax.set_xticks(range(len(names)))
        ax.set_xticklabels(names, rotation=60, ha="right", fontsize=7)
        ax.set_title(f"{self.gene}: error summary")
        return self._save(fig, "errors")

    # ------------------------------------------------------------------
    def plot_param_series(self, estimated_params, param_names, time_points):
        """Estimated kinetic rates over time (reference plotting.py:182)."""
        arr = np.asarray(estimated_params, float)
        fig, ax = plt.subplots(figsize=(7, 5))
        for i in range(arr.shape[1]):
            ax.plot(time_points, arr[:, i], color=COLORS[i % 10],
                    label=param_names[i] if i < len(param_names) else f"p{i}")
        ax.set_xlabel("time [min]")
        ax.set_ylabel("kinetic rate")
        ax.set_title(f"{self.gene}: parameter series")
        ax.grid(alpha=0.2)
        ax.legend(fontsize=7, ncol=2)
        return self._save(fig, "params_series")

    def plot_profiles(self, data):
        """Per-column rate profiles from a tidy frame with a 'Time' column
        (reference plotting.py:203)."""
        cols = [c for c in data.columns if c != "Time"]
        fig, ax = plt.subplots(figsize=(7, 5))
        for i, c in enumerate(cols):
            ax.plot(data["Time"], data[c], marker="o", ms=4,
                    color=COLORS[i % 10], label=str(c))
        ax.set_xlabel("time [min]")
        ax.set_ylabel("kinetic rate")
        ax.set_title(f"{self.gene}: parameter profiles")
        ax.grid(alpha=0.2)
        ax.legend(fontsize=7)
        return self._save(fig, "params_profiles")

    def plot_param_scatter(self, est_arr, num_psites, time_vals):
        """A/B/C/D vs per-site S rates: time-colored scatter with a linear
        trend per site, plus a KDE density panel (reference plotting.py:335).

        Returns the list of written paths (2 per base parameter)."""
        from scipy.stats import gaussian_kde

        est_arr = np.asarray(est_arr, float)
        time_vals = np.asarray(time_vals, float)
        markers = "osD^vPXh*"
        paths = []
        for idx, label in enumerate(["A", "B", "C", "D"]):
            x = est_arr[:, idx]
            fig, ax = plt.subplots(figsize=(6.5, 5))
            sc = None
            for i in range(num_psites):
                y = est_arr[:, 4 + i]
                sc = ax.scatter(x, y, c=time_vals, cmap="viridis", s=40,
                                alpha=0.8, marker=markers[i % len(markers)])
                if np.ptp(x) > 0:
                    k, b = np.polyfit(x, y, 1)
                    xs = np.linspace(x.min(), x.max(), 50)
                    ax.plot(xs, k * xs + b, color=COLORS[i % 10], lw=1,
                            label=f"S{i + 1}")
            if sc is not None:
                fig.colorbar(sc, ax=ax, label="time [min]")
            ax.set_xlabel(f"{label} (rate)")
            ax.set_ylabel("S (phosphorylation rate)")
            ax.set_title(self.gene)
            ax.grid(alpha=0.2)
            ax.legend(fontsize=7)
            paths.append(self._save(fig, f"scatter_{label}_S"))

            pts = np.vstack([np.column_stack((x, est_arr[:, 4 + i]))
                             for i in range(num_psites)])
            fig, ax = plt.subplots(figsize=(6.5, 5))
            ax.scatter(pts[:, 0], pts[:, 1], c="k", s=20, alpha=0.5)
            try:
                kde = gaussian_kde(pts.T)
                gx = np.linspace(pts[:, 0].min(), pts[:, 0].max(), 80)
                gy = np.linspace(pts[:, 1].min(), pts[:, 1].max(), 80)
                GX, GY = np.meshgrid(gx, gy)
                D = kde(np.vstack([GX.ravel(), GY.ravel()])).reshape(GX.shape)
                cf = ax.contourf(GX, GY, D, levels=10, cmap="inferno",
                                 alpha=0.7)
                fig.colorbar(cf, ax=ax, label="density")
            except np.linalg.LinAlgError:
                pass  # degenerate sample (collinear points): scatter only
            ax.set_xlabel(label)
            ax.set_ylabel("S")
            ax.set_title(self.gene)
            paths.append(self._save(fig, f"density_{label}_S"))
        return paths

    def plot_heatmap(self, param_value_df):
        """Protein x protein parameter-correlation heatmap
        (reference plotting.py:405)."""
        df = param_value_df.copy()
        if "Protein" in df.columns:
            df = df.set_index("Protein")
        corr = np.corrcoef(df.to_numpy(float))
        fig, ax = plt.subplots(figsize=(7, 6))
        im = ax.imshow(corr, cmap="coolwarm", vmin=-1, vmax=1)
        ax.set_xticks(range(len(df.index)))
        ax.set_yticks(range(len(df.index)))
        ax.set_xticklabels(df.index, rotation=90, fontsize=6)
        ax.set_yticklabels(df.index, fontsize=6)
        fig.colorbar(im, ax=ax, label="Pearson r")
        ax.set_title("parameter-profile correlation")
        return self._save(fig, "heatmap_protein")

    def plot_top_param_pairs(self, perturbations, max_pairs_per_gene=None):
        """Pairwise parameter scatter + regression for perturbation samples
        (reference plotting.py:662).

        ``perturbations``: ``{gene: DataFrame}`` of perturbation samples, or
        a workbook path whose ``*_perturbations`` sheets hold them."""
        import re
        from itertools import combinations

        import pandas as pd

        if isinstance(perturbations, (str, os.PathLike)):
            xls = pd.ExcelFile(perturbations)
            perturbations = {
                s[: -len("_perturbations")]: pd.read_excel(xls, sheet_name=s)
                for s in xls.sheet_names if s.endswith("_perturbations")}

        paths = []
        for gene, df in perturbations.items():
            cols = [c for c in df.columns
                    if isinstance(c, str) and c != "RMSE"
                    and re.fullmatch(r"[A-Za-z]\d?", c)]
            clean = df[cols].dropna().drop_duplicates()
            if len(cols) < 2 or clean.empty:
                continue
            corr = clean.corr().abs()
            pairs = sorted(combinations(cols, 2),
                           key=lambda ab: -corr.loc[ab[0], ab[1]])
            if max_pairs_per_gene is not None:
                pairs = pairs[:max_pairs_per_gene]
            for a, b in pairs:
                x, y = clean[a].to_numpy(float), clean[b].to_numpy(float)
                fig, ax = plt.subplots(figsize=(6, 6))
                ax.scatter(x, y, s=10, alpha=0.7)
                if np.ptp(x) > 0 and len(x) > 2:
                    k, c0 = np.polyfit(x, y, 1)
                    xs = np.linspace(x.min(), x.max(), 60)
                    yh = k * xs + c0
                    resid = y - (k * x + c0)
                    se = np.sqrt(np.sum(resid ** 2) / (len(x) - 2))
                    band = 1.96 * se * np.sqrt(
                        1 / len(x) + (xs - x.mean()) ** 2
                        / max(np.sum((x - x.mean()) ** 2), 1e-12))
                    ax.plot(xs, yh, color="red", alpha=0.6)
                    ax.fill_between(xs, yh - band, yh + band, color="red",
                                    alpha=0.15)
                ax.set_xlabel(a)
                ax.set_ylabel(b)
                ax.set_title(f"{gene}: {a} vs {b}  "
                             f"|r|={corr.loc[a, b]:.2f}", fontsize=10)
                path = os.path.join(self.out_dir,
                                    f"{gene}_param_scatter_{a}_vs_{b}.png")
                fig.savefig(path, dpi=120, bbox_inches="tight")
                plt.close(fig)
                paths.append(path)
        return paths

    def plot_future_fit(self, P_data, R_data, sol, num_psites, psite_labels,
                        time_points, rna_time_points=None, cutoff_idx=8):
        """Two-panel fitted-window vs extrapolated-window trajectories
        (reference plotting.py:1135 + future_times extrapolation)."""
        sol = np.asarray(sol, float)
        P_data = np.asarray(P_data, float)
        R_data = np.asarray(R_data, float)
        tp = np.asarray(time_points, float)
        rt = (np.asarray(rna_time_points, float)
              if rna_time_points is not None else tp[: len(R_data)])
        n_obs_t = P_data.shape[1]

        fig, axes = plt.subplots(1, 2, figsize=(13, 5.5), sharey=True)
        for side, (ax, sl) in enumerate(
                zip(axes, [slice(None, cutoff_idx), slice(cutoff_idx, None)])):
            t = tp[sl]
            ax.plot(t, sol[sl, 0], "-", color="black", lw=1,
                    label="mRNA (R)" if side else None)
            rmask = ((rt >= t[0]) & (rt <= t[-1]) if len(t)
                     else np.zeros_like(rt, bool))
            ax.plot(rt[rmask], R_data[rmask], "s--", ms=4, mec="k",
                    color="black", alpha=0.7, lw=0.8)
            ax.plot(t, sol[sl, 1], "-", color="red", lw=1,
                    label="protein (P)" if side else None)
            for i in range(num_psites):
                obs_sl = slice(sl.start or 0,
                               min(n_obs_t, sl.stop or n_obs_t))
                ax.plot(tp[obs_sl], P_data[i, obs_sl], "s--", ms=4, mec="k",
                        color=COLORS[i % 10], alpha=0.8, lw=0.8)
                ax.plot(t, sol[sl, 2 + i], "-", color=COLORS[i % 10], lw=1,
                        label=psite_labels[i] if side else None)
            ax.set_xlabel("time [min]")
            ax.grid(alpha=0.1)
        axes[0].set_ylabel("FC")
        axes[0].set_title("fitted window")
        axes[1].set_title("extrapolation")
        axes[1].legend(fontsize=7)
        fig.suptitle(self.gene)
        return self._save(fig, "future_fit")

    def plot_regularization(self, results, model_name="model"):
        """Horizontal bars of the per-gene L2 regularization term
        (reference plotting.py:1194). ``results``: DataFrame with
        ``gene``/``reg_term`` columns (io.export.export_gene_results
        schema) or a workbook path containing that Results sheet."""
        return self._per_gene_bars(results, ["reg_term", "Regularization"],
                                   "Tikhonov regularization "
                                   r"$R=\frac{\lambda}{m}\sum_j p_j^2$",
                                   f"{model_name}_regularization",
                                   color="skyblue")

    def plot_model_error(self, results, model_name="model"):
        """Horizontal bars of the per-gene fit error
        (reference plotting.py:1241)."""
        return self._per_gene_bars(results, ["error", "MSE", "RMSE"],
                                   r"$\mathrm{MSE}=\frac{1}{n}\sum_i"
                                   r"(y_i-\hat y_i)^2$",
                                   f"{model_name}_error", color="coral")

    def _per_gene_bars(self, results, value_cols, title, name, color):
        import pandas as pd

        if isinstance(results, (str, os.PathLike)):
            results = _read_results_table(results)
        col = next((c for c in value_cols if c in results.columns), None)
        gcol = "gene" if "gene" in results.columns else "Gene"
        if col is None or gcol not in results.columns or results.empty:
            return None
        df = results[[gcol, col]].dropna().sort_values(col, ascending=True)
        vals = df[col].to_numpy(float)
        fig, ax = plt.subplots(figsize=(7, max(4, 0.3 * len(df))))
        bars = ax.barh(df[gcol].astype(str), vals, color=color,
                       edgecolor="black", height=0.6)
        for b in bars:
            ax.text(b.get_width() + max(vals.max(), 1e-12) * 0.01,
                    b.get_y() + b.get_height() / 2, f"{b.get_width():.3g}",
                    va="center", fontsize=6)
        ax.set_xlabel("value", fontsize=8)
        ax.set_ylabel("protein", fontsize=8)
        ax.set_title(title, fontsize=9)
        return self._save(fig, name)


def _read_results_table(path):
    """Results table from export_gene_results output (xlsx or CSV fallback)."""
    import pandas as pd

    p = str(path)
    if os.path.exists(p) and p.endswith((".xlsx", ".xls")):
        return pd.read_excel(p)
    if os.path.exists(p):
        return pd.read_csv(p)
    stem = p.rsplit(".", 1)[0]
    return pd.read_csv(stem + "_results.csv")


# ---------------------------------------------------------------------------
# global-model figures (reference global_model/export.py plot family)
# ---------------------------------------------------------------------------

def plot_pareto_3d(pareto_F, out_path, best_idx=None):
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401

    F = np.asarray(pareto_F)
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(F[:, 0], F[:, 1], F[:, 2], s=15, alpha=0.7)
    if best_idx is not None:
        ax.scatter(*F[best_idx], color="red", s=60, marker="*",
                   label="Frechet pick")
        ax.legend()
    ax.set_xlabel("protein")
    ax.set_ylabel("RNA")
    ax.set_zlabel("phospho")
    ax.set_title("Pareto front")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_convergence(history, out_path):
    """Ideal-point trajectory over generations (replaces the MP4 video)."""
    if not history:
        return None
    gens = [h[0] for h in history]
    mins = np.asarray([h[1] for h in history])
    fig, ax = plt.subplots(figsize=(7, 4))
    for j, lbl in enumerate(["protein", "RNA", "phospho"][: mins.shape[1]]):
        ax.semilogy(gens, np.maximum(mins[:, j], 1e-12), label=lbl,
                    color=COLORS[j])
    ax.set_xlabel("generation")
    ax.set_ylabel("best objective")
    ax.set_title("convergence")
    ax.legend()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_parallel_coords_pareto(pareto_F, out_path):
    F = np.asarray(pareto_F)
    lo, hi = F.min(axis=0), F.max(axis=0)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    Fn = (F - lo) / span
    fig, ax = plt.subplots(figsize=(6, 4))
    for row in Fn:
        ax.plot(row, alpha=0.4, color=COLORS[0])
    ax.set_xticks(range(F.shape[1]))
    ax.set_xticklabels(["protein", "RNA", "phospho"][: F.shape[1]])
    ax.set_title("Pareto parallel coordinates")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
