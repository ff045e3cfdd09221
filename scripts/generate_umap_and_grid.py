"""Rotating 3-D latent-embedding GIF + traversal grid from saved PNGs.

Capability parity with reference ``scripts/generate_umap_and_grid.py``:
- ``make_umap_gif``: 60-frame rotating 3-D scatter of reduced latents
  (ref ``:53-94``).  umap-learn is optional; PCA is the fallback reducer
  (same fallback contract as ``eval/latent_viz.py``).  Frames are rendered
  with matplotlib and written with PIL (the reference used imageio).
- ``make_traversal_grid``: tile saved ``traversal_*.png`` files into a 7-col
  comparison grid (ref ``:112-138``).
"""
import argparse
import os
from pathlib import Path
from typing import List

import _bootstrap  # noqa: F401
import matplotlib.pyplot as plt
import numpy as np
from PIL import Image

from betavae_tpu.config import get_config
from betavae_tpu.data.dataset import build_datasets
from betavae_tpu.eval.latent_viz import reduce_latents
from betavae_tpu.eval.recon_metrics import extract_latents
from betavae_tpu.eval.run_evaluation import load_model


def make_umap_gif(latents, labels, out_path, n_neighbors=15, min_dist=0.1,
                  frames=60, elev=30, class_names=None):
    emb = reduce_latents(latents, method="umap", n_neighbors=n_neighbors,
                         min_dist=min_dist, n_components=3)
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    cmap = plt.get_cmap("tab10")
    colors = [cmap(int(lbl) % 10) for lbl in labels]
    ax.scatter(emb[:, 0], emb[:, 1], emb[:, 2], c=colors, s=8, alpha=0.8)
    ax.set_xlabel("UMAP-1")
    ax.set_ylabel("UMAP-2")
    ax.set_zlabel("UMAP-3")
    uniq = np.unique(labels)
    if len(uniq) <= 10:
        handles = [
            plt.Line2D([0], [0], marker="o", color="w",
                       label=(class_names.get(int(u), str(u))
                              if class_names else str(u)),
                       markerfacecolor=cmap(int(u) % 10), markersize=6)
            for u in uniq
        ]
        ax.legend(handles=handles, title="class", loc="upper right")

    images = []
    for azim in np.linspace(0, 360, frames, endpoint=False):
        ax.view_init(elev=elev, azim=azim)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        images.append(Image.fromarray(buf.copy()))
    images[0].save(out_path, save_all=True, append_images=images[1:],
                   duration=80, loop=0)
    plt.close(fig)
    return out_path


def split_image_into_columns(img: Image.Image, num_cols: int = 7) -> List[Image.Image]:
    w, h = img.size
    cols = []
    for i in range(num_cols):
        left = round(i * w / num_cols)
        right = round((i + 1) * w / num_cols)
        cols.append(img.crop((left, 0, right, h)))
    return cols


def make_traversal_grid(saved_dir, out_path, titles=None,
                        grid_title="Traversal Grid"):
    saved_dir = Path(saved_dir)
    files = sorted(saved_dir.glob("traversal_*.png"))
    if not files:
        raise FileNotFoundError(f"No traversal PNGs found in {saved_dir}")
    titles = titles or ["-3", "-2", "-1", "0", "+1", "+2", "+3"]
    rows = len(files)
    cols = len(titles)
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 2.6, rows * 2.6),
                             squeeze=False)
    for r, f in enumerate(files):
        img = Image.open(f)
        for c, col_img in enumerate(split_image_into_columns(img, cols)):
            ax = axes[r][c]
            ax.imshow(np.asarray(col_img.convert("L")), cmap="gray")
            ax.axis("off")
            if r == 0:
                ax.set_title(titles[c])
        axes[r][0].set_ylabel(f.stem, rotation=0, labelpad=40)
    fig.suptitle(grid_title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def main():
    parser = argparse.ArgumentParser(
        description="Generate rotating 3-D latent GIF and traversal grid.")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--weights", type=str, default="best")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--skip-gif", action="store_true")
    parser.add_argument("--skip-grid", action="store_true")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    figures_dir = Path(cfg.paths.figures_dir)
    figures_dir.mkdir(parents=True, exist_ok=True)

    if not args.skip_gif:
        _, test_ds = build_datasets()
        model, variables = load_model(args.weights)
        latents, labels, _ = extract_latents(
            model, variables, test_ds,
            limit=int(cfg.evaluation.num_umap_samples))
        out = make_umap_gif(latents, labels, figures_dir / "umap3d.gif",
                            frames=args.frames,
                            class_names=test_ds.idx_to_class)
        print(f"Saved rotating 3-D GIF to {out}")

    if not args.skip_grid:
        try:
            out = make_traversal_grid(figures_dir,
                                      figures_dir / "traversal_grid.png")
            print(f"Saved traversal grid to {out}")
        except FileNotFoundError as e:
            print(f"Skipping grid: {e}")


if __name__ == "__main__":
    main()
