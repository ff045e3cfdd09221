"""Latent-space visualizations: 2-D/3-D scatters and per-dim violins.

Capability parity with reference ``src/evaluation/latent_viz.py``:

- :func:`reduce_latents` — UMAP with PCA fallback (umap-learn is optional;
  this environment has none, so PCA is the effective default, exactly the
  reference's fallback path ``latent_viz.py:9-25``), plus t-SNE,
- 2-D scatters (binary fixed colors / tab10 multiclass) saved as
  ``latent_scatter.png`` / ``latent_scatter_tsne.png`` (ref ``:27-44,61-78``),
- 3-D scatters displayed via ``plt.show()`` and deliberately NOT saved —
  reference behavior kept (``:47-59``; SURVEY.md quirk list), headless
  backends make this a no-op,
- per-dimension violin grid → ``latent_per_dim_violin.png`` (ref ``:95-118``).
"""

from __future__ import annotations

import numpy as np

from ..config import get_config
from ..io.artifacts import save_figure
from .recon_metrics import extract_latents


def reduce_latents(latents, method="umap", n_neighbors=15, min_dist=0.1,
                   seed=42, n_components=2):
    if method == "umap":
        try:
            import umap  # type: ignore

            reducer = umap.UMAP(n_neighbors=n_neighbors, min_dist=min_dist,
                                random_state=seed, n_components=n_components)
            return reducer.fit_transform(latents)
        except Exception:
            method = "pca"
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=n_components,
                   random_state=seed).fit_transform(latents)
    if method == "tsne":
        from sklearn.manifold import TSNE

        return TSNE(n_components=n_components, random_state=seed,
                    init="random", learning_rate="auto",
                    perplexity=min(30.0, max(2.0, latents.shape[0] / 4 - 1)),
                    ).fit_transform(latents)
    raise ValueError(f"unknown reduction method {method}")


def _class_series(labels, binary, class_names=None):
    """``[(class_id, display_name, color), ...]`` for every class to plot.

    Binary keeps the reference's fixed blue/red pair; multiclass cycles tab10
    (ref ``latent_viz.py:29-40``).
    """
    import matplotlib.pyplot as plt

    if binary:
        return [(0, "0", "#1f77b4"), (1, "1", "#d62728")]
    tab10 = plt.get_cmap("tab10")
    return [
        (c, class_names.get(c, str(c)) if class_names else str(c), tab10(i))
        for i, c in enumerate(sorted(np.unique(labels)))
    ]


def plot_latent_scatter(emb, labels, title, binary=True, class_names=None):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    for cls, cname, color in _class_series(labels, binary, class_names):
        pts = emb[labels == cls]
        ax.scatter(pts[:, 0], pts[:, 1], s=10, alpha=0.7, color=color,
                   label=cname)
    ax.set_title(title)
    ax.legend(markerscale=2)
    fig.tight_layout()
    return fig


def plot_latent_scatter3d(emb, labels, title, class_names=None):
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(projection="3d")
    for cls, cname, color in _class_series(labels, binary=False,
                                           class_names=class_names):
        pts = emb[labels == cls]
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=10, alpha=0.7,
                   color=color, label=cname)
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    plt.show()  # reference shows interactively, does not save (quirk kept)
    plt.close(fig)


def per_dim_violin(latents, labels, binary=True):
    """One violin subplot per latent dimension → ``latent_per_dim_violin.png``
    (ref ``latent_viz.py:95-118``); empty class groups plot as a zero stub."""
    import matplotlib.pyplot as plt

    series = _class_series(labels, binary)
    names = [s[1] for s in series]
    dim_count = latents.shape[1]
    cols = min(4, dim_count)
    rows = -(-dim_count // cols)

    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.4 * rows),
                             squeeze=False)
    for dim, ax in enumerate(axes.flat):
        if dim >= dim_count:
            ax.set_axis_off()
            continue
        groups = [latents[labels == cls, dim] for cls, _, _ in series]
        ax.violinplot([g if g.size else np.zeros(1) for g in groups],
                      showextrema=False)
        ax.set_xticks(range(1, len(groups) + 1), labels=names,
                      rotation=0 if binary else 90)
        ax.set_title(f"z{dim}")
    fig.subplots_adjust(hspace=0.4, wspace=0.3)
    save_figure(fig, "latent_per_dim_violin")
    plt.close(fig)


def generate_latent_visualizations(model, variables, test_ds):
    import matplotlib.pyplot as plt

    cfg = get_config()
    lim = int(cfg.evaluation.num_umap_samples)
    latents, labels, paths = extract_latents(model, variables, test_ds,
                                             limit=lim)
    binary = cfg.data.class_mode == "binary"
    idx_to_class = test_ds.idx_to_class or None
    emb = reduce_latents(latents, method="umap", n_components=2)
    fig = plot_latent_scatter(emb, labels, "Latent Scatter (UMAP/PCA)",
                              binary=binary, class_names=idx_to_class)
    save_figure(fig, "latent_scatter")
    plt.close(fig)
    try:
        emb_tsne = reduce_latents(latents, method="tsne", n_components=2)
        fig_tsne = plot_latent_scatter(emb_tsne, labels,
                                       "Latent Scatter (t-SNE)",
                                       binary=binary, class_names=idx_to_class)
        save_figure(fig_tsne, "latent_scatter_tsne")
        plt.close(fig_tsne)
    except Exception:
        pass
    per_dim_violin(latents, labels, binary)
    for method in ("umap", "tsne"):
        try:
            emb3 = reduce_latents(latents, method=method, n_components=3)
            if emb3.shape[1] == 3:
                plot_latent_scatter3d(
                    emb3, labels, f"Latent Scatter ({method.upper()} 3D)",
                    class_names=idx_to_class)
        except Exception:
            pass
