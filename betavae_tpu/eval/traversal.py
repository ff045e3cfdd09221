"""Latent traversals: single-dim sweeps and tumor-class direction sweeps.

Capability parity with reference ``src/evaluation/traversal.py``:

- :func:`latent_traversal` — per-dim set-to-value sweeps of the first image's
  μ over ``linspace(-span, span, steps)`` → ``traversal_dim{d}.png``; default
  dims from ``inference.traversal_latent_indices`` else the first
  ``min(latent_dim, 4)`` (ref ``traversal.py:12-33``),
- :func:`run_traversals` — class directions loaded from
  ``latent_usage.csv``'s ``logreg_weight_*`` columns when present, else a
  fresh logistic regression on the full test latents (ref ``:35-80``);
  tumor-class sweeps ``μ + v·dir`` → ``traversal_tumor_{cls}.png``, skipping
  classes containing "notumor" (ref ``:94-114``).

TPU-first: all step decodes for one sweep are batched into a single decode
call (the reference decodes one step at a time).
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path

import numpy as np

from ..config import get_config
from ..io.artifacts import save_image_grid


def _decode_sweep(model, variables, zs: np.ndarray):
    """Batched decode of (steps, D) latents → (steps, H, W, C)."""
    return np.asarray(model.decode(variables, zs))


def latent_traversal(model, variables, images, out_dir, indices=None,
                     steps=None, span=3.0):
    cfg = get_config()
    steps = steps if steps is not None else int(cfg.evaluation.traversal_steps)
    if indices is None:
        indices = list(cfg.inference.traversal_latent_indices or [])
        if not indices:
            indices = list(range(min(model.latent_dim, 4)))
    x = np.asarray(images, np.float32)
    mu, logvar = model.encode(variables, x)
    base = np.asarray(mu)[:1]
    vals = np.linspace(-span, span, steps)
    os.makedirs(out_dir, exist_ok=True)
    for dim in indices:
        zs = np.repeat(base, steps, axis=0)
        zs[:, dim] = vals
        grid = _decode_sweep(model, variables, zs)
        save_image_grid(grid, os.path.join(out_dir, f"traversal_dim{dim}.png"),
                        nrow=steps, normalize=True)


def run_traversals(model, variables, test_ds, indices=None, steps=None,
                   span=3.0, images_override=None):
    cfg = get_config()
    out_dir = cfg.paths.figures_dir
    class_dirs = {}
    usage_path = Path(cfg.paths.tables_dir) / "latent_usage.csv"
    if usage_path.exists():
        try:
            import pandas as pd

            df = pd.read_csv(usage_path)
            for col in df.columns:
                if col.startswith("logreg_weight_") and col != "logreg_weight_maxabs":
                    name = col.replace("logreg_weight_", "")
                    w = df[col].to_numpy(dtype=np.float32)
                    if np.linalg.norm(w) > 0:
                        class_dirs[name] = w / np.linalg.norm(w)
        except Exception:
            class_dirs = {}

    if not class_dirs:
        from .recon_metrics import extract_latents

        idx_to_class = test_ds.idx_to_class
        L, y, _ = extract_latents(model, variables, test_ds)
        if len(y) >= 2 and len(np.unique(y)) >= 2:
            try:
                from sklearn.exceptions import ConvergenceWarning
                from sklearn.linear_model import LogisticRegression

                with warnings.catch_warnings():
                    warnings.filterwarnings("ignore",
                                            category=ConvergenceWarning)
                    clf = LogisticRegression(max_iter=2000)
                    clf.fit(L, y)
                coef = clf.coef_
                if coef.ndim == 1:
                    coef = coef[None, :]
                for cls_idx, row in enumerate(coef):
                    name = idx_to_class.get(clf.classes_[cls_idx],
                                            f"class{clf.classes_[cls_idx]}")
                    norm = np.linalg.norm(row)
                    if norm > 0:
                        class_dirs[name] = (row / norm).astype(np.float32)
            except Exception:
                class_dirs = {}

    if images_override is not None:
        imgs = np.asarray(images_override, np.float32)
    elif len(test_ds) > 0:
        bs = int(cfg.training.batch_size)
        imgs = test_ds.images[:bs].astype(np.float32) / 255.0
    else:
        return

    latent_traversal(model, variables, imgs, out_dir, indices=indices,
                     steps=steps, span=span)

    tumor_dirs = {k: v for k, v in class_dirs.items()
                  if "notumor" not in k.lower()}
    if tumor_dirs:
        steps_n = steps if steps is not None else int(
            cfg.evaluation.traversal_steps)
        mu, _ = model.encode(variables, imgs)
        base = np.asarray(mu)[:1]
        vals = np.linspace(-span, span, steps_n)
        for cls_name, dir_vec in tumor_dirs.items():
            zs = base + vals[:, None] * dir_vec[None, :]
            grid = _decode_sweep(model, variables, zs)
            save_image_grid(
                grid, os.path.join(out_dir, f"traversal_tumor_{cls_name}.png"),
                nrow=steps_n, normalize=True)
