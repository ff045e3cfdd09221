"""Run-directory artifact helpers: dirs, JSON, CSV tables, PNG figures, grids.

Capability parity with reference ``src/utils/brain_tumor_utils/io.py:72-125``
(``ensure_dirs``/``save_json``/``save_table``/``save_figure``/
``model_checkpoint_path``) plus an image-grid writer replacing
``torchvision.utils.save_image`` (used throughout the reference's training
panels and traversal outputs, e.g. ``train.py:176-187``,
``traversal.py:30-33``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import get_config


def ensure_dirs() -> None:
    cfg = get_config()
    for k in ("outputs_dir", "models_dir", "figures_dir", "tables_dir"):
        os.makedirs(getattr(cfg.paths, k), exist_ok=True)
    os.makedirs(os.path.join(cfg.paths.outputs_dir, "logs"), exist_ok=True)


def run_artifact_dir() -> str:
    cfg = get_config()
    d = os.path.join(cfg.paths.outputs_dir, cfg.paths.run_id)
    os.makedirs(d, exist_ok=True)
    return d


def model_checkpoint_path(epoch=None, tag=None) -> str:
    """Checkpoint path scheme (reference ``io.py:95-104``)."""
    cfg = get_config()
    base = cfg.paths.models_dir
    os.makedirs(base, exist_ok=True)
    if tag:
        return os.path.join(base, f"{cfg.paths.run_id}_{tag}.pt")
    if epoch is not None:
        return os.path.join(base, f"{cfg.paths.run_id}_epoch{epoch}.pt")
    return os.path.join(base, f"{cfg.paths.run_id}_latest.pt")


def save_json(data, name: str) -> str:
    cfg = get_config()
    out = os.path.join(cfg.paths.outputs_dir, f"{name}.json")
    with open(out, "w") as f:
        json.dump(data, f, indent=2)
    return out


def save_table(df, name: str) -> str:
    cfg = get_config()
    os.makedirs(cfg.paths.tables_dir, exist_ok=True)
    path = os.path.join(cfg.paths.tables_dir, f"{name}.csv")
    df.to_csv(path, index=False)
    return path


def save_figure(fig, name: str) -> str:
    cfg = get_config()
    os.makedirs(cfg.paths.figures_dir, exist_ok=True)
    path = os.path.join(cfg.paths.figures_dir, f"{name}.png")
    fig.savefig(path, bbox_inches="tight")
    return path


# ---------------------------------------------------------------------------
# image grids (replacement for torchvision save_image)
# ---------------------------------------------------------------------------

def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              normalize: bool = False, pad_value: float = 0.0) -> np.ndarray:
    """Tile ``(N, H, W, C)`` images into one ``(H', W', C)`` grid.

    Matches torchvision ``make_grid`` layout semantics used by the reference's
    ``save_image(..., nrow=..., normalize=True)`` calls: ``nrow`` is images per
    row; ``normalize=True`` rescales the whole grid by its global min/max.
    """
    imgs = np.asarray(images, dtype=np.float32)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    if normalize:
        lo, hi = imgs.min(), imgs.max()
        imgs = (imgs - lo) / max(hi - lo, 1e-8)
    ncols = min(nrow, n)
    nrows = int(np.ceil(n / ncols))
    grid = np.full(
        (padding + nrows * (h + padding), padding + ncols * (w + padding), c),
        pad_value,
        dtype=np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = imgs[idx]
    return grid


def save_image_grid(images, path: str, nrow: int = 8, normalize: bool = False) -> str:
    """Write an image grid PNG (drop-in for reference ``save_image`` calls)."""
    from PIL import Image

    grid = make_grid(np.asarray(images), nrow=nrow, normalize=normalize)
    arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        im = Image.fromarray(arr[..., 0], mode="L")
    else:
        im = Image.fromarray(arr, mode="RGB")
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    im.save(path)
    return path
