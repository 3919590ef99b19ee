"""Network readout / subnetwork / curve-similarity tools.

Spec: reference ``scripts/`` standalone analyses —
``kinopt_network_readout.py`` / ``tfopt_network_readout.py`` (summary
tables from result workbooks), ``export_subnetworks.py`` (ego networks
around a protein), ``curve_similarity.py`` (Frechet-distance clustering),
``temporal_sensitivity.py`` (per-timepoint Sobol heatmap — see
:mod:`phoskintime_tpu.ops.sobol`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

from phoskintime_tpu.ops.frechet import frechet_distance


def kinopt_network_readout(alpha_df: pd.DataFrame,
                           beta_df: pd.DataFrame) -> pd.DataFrame:
    """Per-kinase summary: targets, total |alpha| influence, mean beta."""
    a = alpha_df.groupby("Kinase").agg(
        n_targets=("Gene", "nunique"),
        n_sites=("Psite", "count"),
        total_alpha=("Alpha", lambda s: float(np.abs(s).sum())),
        mean_alpha=("Alpha", "mean")).reset_index()
    glob = beta_df[beta_df["Psite"].astype(str).str.strip() == ""]
    b = glob.groupby("Kinase")["Beta"].mean().rename("beta").reset_index()
    return a.merge(b, on="Kinase", how="left").sort_values(
        "total_alpha", ascending=False).reset_index(drop=True)


def tfopt_network_readout(alpha_df: pd.DataFrame,
                          beta_df: pd.DataFrame) -> pd.DataFrame:
    """Per-TF summary: regulated genes, total influence, protein beta."""
    a = alpha_df.groupby("TF").agg(
        n_genes=("mRNA", "nunique"),
        total_alpha=("Value", lambda s: float(np.abs(s).sum())),
        mean_alpha=("Value", "mean")).reset_index()
    prot = beta_df[beta_df["PSite"].astype(str).str.strip() == ""]
    b = prot.groupby("TF")["Value"].mean().rename("protein_beta").reset_index()
    return a.merge(b, on="TF", how="left").sort_values(
        "total_alpha", ascending=False).reset_index(drop=True)


def export_subnetwork(topo, center: str, radius: int = 1):
    """Ego network (kinase + TF edges) around a protein."""
    frontier = {center}
    nodes = {center}
    edges = []
    for _ in range(radius):
        new = set()
        for i, p in enumerate(topo.proteins):
            for j, site in enumerate(topo.sites[i]):
                for k, kin in enumerate(topo.kinases):
                    if topo.W_pad[i, j, k] != 0 and (p in frontier or kin in frontier):
                        edges.append(("kinase", kin, p, site,
                                      float(topo.W_pad[i, j, k])))
                        new.update({p, kin})
        tf = topo.tf_mat
        for tgt_i in range(topo.N):
            for src_i in range(topo.N):
                if tf[tgt_i, src_i] != 0:
                    src, tgt = topo.proteins[src_i], topo.proteins[tgt_i]
                    if src in frontier or tgt in frontier:
                        edges.append(("tf", src, tgt, "", float(tf[tgt_i, src_i])))
                        new.update({src, tgt})
        nodes |= new
        frontier = new
    df = pd.DataFrame(edges, columns=["kind", "source", "target", "site",
                                      "weight"]).drop_duplicates()
    return df, sorted(nodes)


def curve_similarity_matrix(curves: dict[str, np.ndarray]) -> pd.DataFrame:
    """Pairwise discrete-Frechet distances between named (T, d) curves."""
    names = list(curves)
    n = len(names)
    D = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            d = float(frechet_distance(jnp.asarray(curves[names[i]], float),
                                       jnp.asarray(curves[names[j]], float)))
            D[i, j] = D[j, i] = d
    return pd.DataFrame(D, index=names, columns=names)


def cluster_curves(similarity: pd.DataFrame, n_clusters: int = 3) -> pd.Series:
    """Agglomerative clustering on the Frechet distance matrix."""
    from sklearn.cluster import AgglomerativeClustering

    labels = AgglomerativeClustering(
        n_clusters=min(n_clusters, len(similarity)), metric="precomputed",
        linkage="average").fit_predict(similarity.to_numpy())
    return pd.Series(labels, index=similarity.index, name="cluster")


def temporal_sensitivity_heatmap(S_t: np.ndarray, param_names, times,
                                 out_path: str, title="temporal Sobol ST"):
    """Heatmap of per-timepoint total Sobol indices
    (reference scripts/temporal_sensitivity.py:192-219)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(max(6, 0.35 * len(times)),
                                    max(4, 0.3 * len(param_names))))
    im = ax.imshow(np.asarray(S_t).T, aspect="auto", cmap="viridis",
                   origin="lower")
    ax.set_xticks(range(len(times)))
    ax.set_xticklabels([f"{t:g}" for t in times], rotation=60, fontsize=7)
    ax.set_yticks(range(len(param_names)))
    ax.set_yticklabels(param_names, fontsize=7)
    ax.set_xlabel("time [min]")
    ax.set_title(title)
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def analyze_tf_kin_counts(df_kin: pd.DataFrame,
                          df_tf: pd.DataFrame) -> pd.DataFrame:
    """Per-gene regulator counts: #kinases targeting its sites, #TFs
    regulating its mRNA (spec: reference scripts/analyze_tf_kin_counts.py)."""
    kin_counts = (df_kin.groupby("protein")["kinase"].nunique()
                  .rename("n_kinases"))
    site_counts = (df_kin.groupby("protein")["psite"].nunique()
                   .rename("n_sites"))
    tf_counts = (df_tf.groupby("target")["tf"].nunique()
                 .rename("n_tfs"))
    out = pd.concat([kin_counts, site_counts, tf_counts], axis=1).fillna(0)
    out.index.name = "gene"
    return out.astype(int).reset_index()


def map_priors(kin_alpha_df: pd.DataFrame,
               tf_alpha_df: pd.DataFrame) -> pd.DataFrame:
    """Merged per-gene regulator table from the two prior workbooks
    (spec: reference processing/map.py:15-252)."""
    kin = (kin_alpha_df.groupby("Gene")
           .apply(lambda g: ";".join(f"{r.Kinase}:{r.Alpha:.3g}"
                                     for r in g.itertuples()),
                  include_groups=False)
           .rename("kinases"))
    tf = (tf_alpha_df.groupby("mRNA")
          .apply(lambda g: ";".join(f"{r.TF}:{r.Value:.3g}"
                                    for r in g.itertuples()),
                 include_groups=False)
          .rename("tfs"))
    out = pd.concat([kin, tf], axis=1)
    out.index.name = "gene"
    return out.reset_index()


# ---------------------------------------------------------------------------
# publication viz (reference scripts/kinopt_network_viz.py,
# tfopt_network_viz.py, make_kinopt_diagram.py) — matplotlib-only: the
# reference's graphviz/pydot DAG render is replaced by the same layered
# bipartite fallback it ships for graphviz-less hosts.
# ---------------------------------------------------------------------------

def plot_identity_band(obs, est, out_path: str, labels=None, q: float = 0.95,
                       title="observed vs reconstructed"):
    """Scatter with y = x +/- delta_q band; points outside the band are
    annotated (reference kinopt_network_viz.py enhancement 1)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    obs = np.asarray(obs, float)
    est = np.asarray(est, float)
    resid = np.abs(est - obs)
    delta = float(np.quantile(resid, q)) if len(resid) else 0.0
    lim = [min(obs.min(), est.min()), max(obs.max(), est.max())]

    fig, ax = plt.subplots(figsize=(5.5, 5.5))
    ax.scatter(obs, est, s=14, alpha=0.7, edgecolor="none")
    ax.plot(lim, lim, "k-", lw=1)
    ax.fill_between(lim, [v - delta for v in lim], [v + delta for v in lim],
                    color="gray", alpha=0.2,
                    label=f"{int(q*100)}% band (+/-{delta:.3g})")
    if labels is not None:
        out = resid > delta
        for x, y, lab in zip(obs[out], est[out], np.asarray(labels)[out]):
            ax.annotate(str(lab), (x, y), fontsize=6, alpha=0.8)
    ax.set_xlabel("observed")
    ax.set_ylabel("reconstructed")
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_breadth_vs_load(readout: pd.DataFrame, out_path: str,
                         name_col: str | None = None,
                         breadth_col: str = "n_targets",
                         load_col: str = "total_alpha",
                         label_above: float = 1.0):
    """Regulator breadth vs control load, labelling high-load regulators
    (reference kinopt_network_viz.py enhancement 2)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if name_col is None:
        name_col = readout.columns[0]
    fig, ax = plt.subplots(figsize=(6, 4.5))
    ax.scatter(readout[breadth_col], readout[load_col], s=18, alpha=0.8)
    for _, r in readout[readout[load_col] > label_above].iterrows():
        ax.annotate(str(r[name_col]), (r[breadth_col], r[load_col]),
                    fontsize=7)
    ax.set_xlabel(breadth_col)
    ax.set_ylabel(load_col)
    ax.set_title("regulator breadth vs control load")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_network_dag(edges: pd.DataFrame, out_path: str,
                     title="control logic"):
    """Layered bipartite DAG: sources on the top rank, targets below, edge
    width ~ |weight| (reference kinopt_network_viz.py enhancement 3 /
    make_kinopt_diagram.py, without the graphviz dependency).

    edges: DataFrame with [source, target, weight] (extra columns kept as
    hover text are ignored)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    srcs = sorted(edges["source"].unique())
    tgts = sorted(edges["target"].unique())
    xs = {s: i / max(1, len(srcs) - 1) for i, s in enumerate(srcs)}
    xt = {t: i / max(1, len(tgts) - 1) for i, t in enumerate(tgts)}
    wmax = max(1e-12, float(edges["weight"].abs().max()))

    fig, ax = plt.subplots(figsize=(max(6, 0.6 * max(len(srcs), len(tgts))),
                                    4.0))
    for _, e in edges.iterrows():
        w = abs(float(e["weight"])) / wmax
        ax.plot([xs[e["source"]], xt[e["target"]]], [1.0, 0.0],
                color="tab:blue" if float(e["weight"]) >= 0 else "tab:red",
                lw=0.5 + 2.5 * w, alpha=0.35 + 0.6 * w, zorder=1)
    for s, x in xs.items():
        ax.scatter([x], [1.0], s=220, color="#ffd27f", zorder=2,
                   edgecolor="k", lw=0.5)
        ax.annotate(s, (x, 1.0), ha="center", va="center", fontsize=6,
                    zorder=3)
    for t, x in xt.items():
        ax.scatter([x], [0.0], s=220, color="#9fd4ff", zorder=2,
                   edgecolor="k", lw=0.5)
        ax.annotate(t, (x, 0.0), ha="center", va="center", fontsize=6,
                    zorder=3)
    ax.set_ylim(-0.25, 1.25)
    ax.axis("off")
    ax.set_title(title)
    fig.savefig(out_path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return out_path


# ---------------------------------------------------------------------------
# time-resolved signal readouts (reference kinopt/tfopt_network_readout.py)
# ---------------------------------------------------------------------------

def _auc(t: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Trapezoid AUC along the last axis."""
    return np.trapezoid(Y, t, axis=-1)


def kinopt_signal_readout(prob, alpha_pad, beta_pad,
                          times: np.ndarray | None = None) -> dict:
    """Time-resolved kinopt network readout.

    Spec: reference ``scripts/kinopt_network_readout.py:135-420`` — three
    analyses from a fitted (alpha, beta):

    1. kinase load: AUC of routed activity ``|alpha_{i,j} A_j(t)|``
       summed over targets, plus latent activity AUC/peak and the
       fraction of the kinase's betas pinned at bounds;
    2. target fragility: per site, the dominant kinase and its share of
       the total routed signal;
    3. in-silico knockout effects: change in the reconstructed signal
       when one kinase's contribution is removed.

    The model is LINEAR in per-edge contributions C[i,a,t], so every
    knockout prediction is a closed-form subtraction of one slice — the
    whole readout is one einsum + numpy reductions (the reference
    rebuilds the prediction per knockout).

    Returns {"kinase_load", "edge_load", "target_fragility",
    "knockout_effects"} DataFrames.
    """
    alpha_pad = np.asarray(alpha_pad, float)
    beta_pad = np.asarray(beta_pad, float)
    T = prob.K_array.shape[1]
    t = (np.arange(T, dtype=float) if times is None
         else np.asarray(times, float))
    t = t / max(float(t.max()), 1e-12)          # reference: normalized AUC

    K_sel = np.asarray(prob.K_array)[prob.k_row_idx]          # (n_k,Bmax,T)
    A = ((beta_pad * prob.k_mask)[..., None] * K_sel).sum(1)  # (n_k, T)
    S_sel = A[prob.gp_kin_idx]                                # (n_gp,Amax,T)
    C = (alpha_pad * prob.gp_mask)[..., None] * S_sel         # contributions
    pred = np.maximum(C.sum(1), 0.0)                          # (n_gp, T)

    names = prob.gp_names or [(f"G{i}", f"S{i}") for i in range(prob.n_gp)]
    kin_names = prob.kinase_names or [f"K{j}" for j in range(prob.n_k)]
    pred_auc = _auc(t, np.abs(pred))

    # --- per-edge loads + exact knockouts --------------------------------
    edge_rows, ko_rows = [], []
    for i in range(prob.n_gp):
        slots = np.where(prob.gp_mask[i])[0]
        base = pred_auc[i]
        base_peak = float(np.abs(pred[i]).max())
        for a in slots:
            j = int(prob.gp_kin_idx[i, a])
            load = float(_auc(t, np.abs(C[i, a])))
            edge_rows.append({"gene": names[i][0], "psite": names[i][1],
                              "kinase": kin_names[j],
                              "edge_load_auc_abs": load})
            ko_pred = np.maximum(C[i].sum(0) - C[i, a], 0.0)
            ko_rows.append({
                "gene": names[i][0], "psite": names[i][1],
                "knocked_kinase": kin_names[j],
                "delta_auc_abs": float(base - _auc(t, np.abs(ko_pred))),
                "delta_peak_abs": float(base_peak - np.abs(ko_pred).max())})
    edge_load = pd.DataFrame(edge_rows)
    ko = pd.DataFrame(ko_rows)
    if len(ko):
        ko["ko_rank_site"] = ko.groupby(["gene", "psite"])["delta_auc_abs"] \
            .rank(ascending=False, method="first").astype(int)

    # --- kinase-level aggregate ------------------------------------------
    at_bound = (np.isclose(beta_pad, prob.lb, atol=1e-6)
                | np.isclose(beta_pad, prob.ub, atol=1e-6)) & prob.k_mask
    kl_rows = []
    for j in range(prob.n_k):
        mine = edge_load[edge_load.kinase == kin_names[j]]
        nb = max(int(prob.k_mask[j].sum()), 1)
        kl_rows.append({
            "kinase": kin_names[j],
            "n_targets": int(mine.gene.nunique()),
            "n_sites": len(mine),
            "total_load_auc_abs": float(mine.edge_load_auc_abs.sum()),
            "latent_auc_abs": float(_auc(t, np.abs(A[j]))),
            "latent_peak_abs": float(np.abs(A[j]).max()),
            "frac_beta_at_bound": float(at_bound[j].sum() / nb)})
    kinase_load = pd.DataFrame(kl_rows).sort_values(
        "total_load_auc_abs", ascending=False).reset_index(drop=True)

    # --- target fragility -------------------------------------------------
    tf_rows = []
    obs_auc = _auc(t, np.abs(np.asarray(prob.P_obs, float)))
    for i in range(prob.n_gp):
        mine = edge_load[(edge_load.gene == names[i][0])
                         & (edge_load.psite == names[i][1])]
        tot = float(mine.edge_load_auc_abs.sum())
        dom = mine.loc[mine.edge_load_auc_abs.idxmax()] if len(mine) else None
        tf_rows.append({
            "gene": names[i][0], "psite": names[i][1],
            "n_kinases": len(mine),
            "dominant_kinase": dom.kinase if dom is not None else "",
            "dominant_share": (float(dom.edge_load_auc_abs / max(tot, 1e-12))
                               if dom is not None else 0.0),
            "pred_auc_abs": float(pred_auc[i]),
            "obs_auc_abs": float(obs_auc[i])})
    fragility = pd.DataFrame(tf_rows).sort_values(
        "dominant_share", ascending=False).reset_index(drop=True)

    return {"kinase_load": kinase_load, "edge_load": edge_load,
            "target_fragility": fragility, "knockout_effects": ko}


def tfopt_signal_readout(prob, alpha_pad, beta_pad,
                         times: np.ndarray | None = None) -> dict:
    """tfopt counterpart of :func:`kinopt_signal_readout`
    (reference ``scripts/tfopt_network_readout.py``): TF regulatory load,
    gene fragility (dominant TF share) and exact TF-knockout effects,
    from the linear contribution tensor C[g, r, t] = alpha_{g,r} *
    effect_r(t)."""
    alpha_pad = np.asarray(alpha_pad, float)
    beta_pad = np.asarray(beta_pad, float) * prob.beta_mask
    T = prob.mRNA_mat.shape[1]
    t = (np.arange(T, dtype=float) if times is None
         else np.asarray(times, float))
    t = t / max(float(t.max()), 1e-12)

    effect = (beta_pad[:, :1] * np.asarray(prob.protein_mat)
              + np.einsum("fk,fkt->ft", beta_pad[:, 1:],
                          np.asarray(prob.psite_tensor)))  # (n_TF, T)
    reg_idx = np.maximum(prob.regulators, 0)
    C = (alpha_pad * prob.alpha_mask)[..., None] * effect[reg_idx]
    pred = np.maximum(C.sum(1), 0.0)                       # (n_genes, T)
    pred_auc = _auc(t, np.abs(pred))

    genes = prob.gene_ids or [f"G{g}" for g in range(prob.n_genes)]
    tfs = prob.tf_ids or [f"TF{r}" for r in range(prob.n_TF)]

    edge_rows, ko_rows = [], []
    for g in range(prob.n_genes):
        slots = np.where(prob.alpha_mask[g])[0]
        base, base_peak = pred_auc[g], float(np.abs(pred[g]).max())
        for r in slots:
            f = int(prob.regulators[g, r])
            load = float(_auc(t, np.abs(C[g, r])))
            edge_rows.append({"gene": genes[g], "tf": tfs[f],
                              "edge_load_auc_abs": load})
            ko_pred = np.maximum(C[g].sum(0) - C[g, r], 0.0)
            ko_rows.append({
                "gene": genes[g], "knocked_tf": tfs[f],
                "delta_auc_abs": float(base - _auc(t, np.abs(ko_pred))),
                "delta_peak_abs": float(base_peak - np.abs(ko_pred).max())})
    edge_load = pd.DataFrame(edge_rows)
    ko = pd.DataFrame(ko_rows)
    if len(ko):
        ko["ko_rank_gene"] = ko.groupby("gene")["delta_auc_abs"] \
            .rank(ascending=False, method="first").astype(int)

    tf_rows = []
    for f in range(prob.n_TF):
        mine = edge_load[edge_load.tf == tfs[f]]
        tf_rows.append({
            "tf": tfs[f], "n_genes": int(mine.gene.nunique()),
            "total_load_auc_abs": float(mine.edge_load_auc_abs.sum()),
            "latent_auc_abs": float(_auc(t, np.abs(effect[f]))),
            "latent_peak_abs": float(np.abs(effect[f]).max())})
    tf_load = pd.DataFrame(tf_rows).sort_values(
        "total_load_auc_abs", ascending=False).reset_index(drop=True)

    frag_rows = []
    obs_auc = _auc(t, np.abs(np.asarray(prob.mRNA_mat, float)))
    for g in range(prob.n_genes):
        mine = edge_load[edge_load.gene == genes[g]]
        tot = float(mine.edge_load_auc_abs.sum())
        dom = mine.loc[mine.edge_load_auc_abs.idxmax()] if len(mine) else None
        frag_rows.append({
            "gene": genes[g], "n_tfs": len(mine),
            "dominant_tf": dom.tf if dom is not None else "",
            "dominant_share": (float(dom.edge_load_auc_abs / max(tot, 1e-12))
                               if dom is not None else 0.0),
            "pred_auc_abs": float(pred_auc[g]),
            "obs_auc_abs": float(obs_auc[g])})
    fragility = pd.DataFrame(frag_rows).sort_values(
        "dominant_share", ascending=False).reset_index(drop=True)

    return {"tf_load": tf_load, "edge_load": edge_load,
            "gene_fragility": fragility, "knockout_effects": ko}


def plot_signal_readout(tables: dict, out_dir: str, *,
                        which: str = "kinopt") -> list:
    """Figure set for a signal readout (reference
    ``scripts/kinopt_network_viz.py:130-316`` plot sets 1-3): control-load
    top-N bars, breadth-vs-load scatter, knockout-effect distribution and
    strongest activating/suppressing edges."""
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    load = tables.get("kinase_load") if which == "kinopt" \
        else tables.get("tf_load")
    actor = "kinase" if which == "kinopt" else "tf"
    tgt_col = "n_sites" if which == "kinopt" else "n_genes"

    if load is not None and len(load):
        top = load.head(25).iloc[::-1]
        fig, ax = plt.subplots(figsize=(6.4, 0.28 * len(top) + 1.2))
        ax.barh(top[actor], top.total_load_auc_abs, color="tab:blue")
        ax.set_xlabel("total routed activity (AUC)")
        ax.set_title(f"{actor.capitalize()} control load")
        fig.tight_layout()
        p = os.path.join(out_dir, f"{which}_control_load_top.png")
        fig.savefig(p, dpi=140)
        plt.close(fig)
        paths.append(p)

        fig, ax = plt.subplots(figsize=(5.6, 4.3))
        ax.scatter(load[tgt_col], load.total_load_auc_abs, s=22, alpha=0.85)
        thr = float(load.total_load_auc_abs.quantile(0.8))
        for _, r in load[load.total_load_auc_abs > thr].iterrows():
            ax.annotate(r[actor], (r[tgt_col], r.total_load_auc_abs),
                        fontsize=7, xytext=(3, 3),
                        textcoords="offset points")
        ax.set_xlabel("number of targets")
        ax.set_ylabel("control load")
        ax.set_title(f"{actor.capitalize()} breadth vs control load")
        ax.grid(alpha=0.25, lw=0.6)
        fig.tight_layout()
        p = os.path.join(out_dir, f"{which}_breadth_vs_load.png")
        fig.savefig(p, dpi=140)
        plt.close(fig)
        paths.append(p)

    ko = tables.get("knockout_effects")
    if ko is not None and len(ko):
        key = "knocked_kinase" if which == "kinopt" else "knocked_tf"
        fig, ax = plt.subplots(figsize=(5.6, 3.6))
        ax.hist(ko.delta_auc_abs, bins=45, density=True, alpha=0.85)
        ax.axvline(0.0, lw=1.0, color="k")
        ax.set_xlabel("change in reconstructed signal")
        ax.set_ylabel("density")
        ax.set_title("Knockout effect distribution")
        ax.grid(alpha=0.25, lw=0.6)
        fig.tight_layout()
        p = os.path.join(out_dir, f"{which}_knockout_distribution.png")
        fig.savefig(p, dpi=140)
        plt.close(fig)
        paths.append(p)

        lab = (ko.gene.astype(str)
               + (" " + ko.psite.astype(str) if "psite" in ko else "")
               + " ← " + ko[key].astype(str))
        for name, sel in [("activating",
                           ko.assign(edge=lab).nlargest(
                               20, "delta_auc_abs")),
                          ("suppressing",
                           ko.assign(edge=lab).nsmallest(
                               20, "delta_auc_abs"))]:
            sel = sel.iloc[::-1]
            fig, ax = plt.subplots(figsize=(6.6, 0.28 * len(sel) + 1.2))
            ax.barh(sel.edge, sel.delta_auc_abs,
                    color="tab:green" if name == "activating"
                    else "tab:red")
            ax.set_xlabel("change in reconstructed signal")
            ax.set_title(f"Strongest {name} edges")
            fig.tight_layout()
            p = os.path.join(out_dir, f"{which}_knockout_top_{name}.png")
            fig.savefig(p, dpi=140)
            plt.close(fig)
            paths.append(p)
    return paths
