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
