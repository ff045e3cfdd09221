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


def plot_latent_scatter(emb, labels, title, binary=True, class_names=None):
    import matplotlib.pyplot as plt

    plt.figure(figsize=(5, 5))
    if binary:
        colors = ["#1f77b4", "#d62728"]
        for c in (0, 1):
            mask = labels == c
            plt.scatter(emb[mask, 0], emb[mask, 1], s=10, alpha=0.7,
                        c=colors[c], label=str(c))
    else:
        uniq = sorted(np.unique(labels))
        cmap = plt.get_cmap("tab10")
        for i, c in enumerate(uniq):
            mask = labels == c
            cname = class_names.get(c, str(c)) if class_names else str(c)
            plt.scatter(emb[mask, 0], emb[mask, 1], s=10, alpha=0.7,
                        c=[cmap(i)], label=cname)
    plt.legend(markerscale=2)
    plt.title(title)
    plt.tight_layout()
    return plt.gcf()


def plot_latent_scatter3d(emb, labels, title, class_names=None):
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    uniq = sorted(np.unique(labels))
    cmap = plt.get_cmap("tab10")
    for i, c in enumerate(uniq):
        mask = labels == c
        cname = class_names.get(c, str(c)) if class_names else str(c)
        ax.scatter(emb[mask, 0], emb[mask, 1], emb[mask, 2], s=10, alpha=0.7,
                   color=cmap(i), label=cname)
    ax.set_title(title)
    ax.legend()
    plt.tight_layout()
    plt.show()  # reference shows interactively, does not save (quirk kept)
    plt.close(fig)


def per_dim_violin(latents, labels, binary=True):
    import matplotlib.pyplot as plt

    k = latents.shape[1]
    cols = min(4, k)
    rows = int(np.ceil(k / cols))
    plt.figure(figsize=(3 * cols, 2.4 * rows))
    for i in range(k):
        ax = plt.subplot(rows, cols, i + 1)
        if binary:
            groups = [latents[labels == 0, i], latents[labels == 1, i]]
            labels_x = ["0", "1"]
        else:
            uniq = sorted(np.unique(labels))
            groups = [latents[labels == c, i] for c in uniq]
            labels_x = [str(c) for c in uniq]
        groups = [g if len(g) else np.zeros(1) for g in groups]
        ax.violinplot(groups, showextrema=False)
        ax.set_xticks(range(1, len(groups) + 1))
        ax.set_xticklabels(labels_x, rotation=0 if binary else 90)
        ax.set_title(f"z{i}")
    plt.subplots_adjust(hspace=0.4, wspace=0.3)
    save_figure(plt.gcf(), "latent_per_dim_violin")
    plt.close()


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
