"""Latent traversals: per-dimension sweeps + class-direction sweeps.

Capability parity with reference ``src/evaluation/traversal.py``:

- :func:`latent_traversal` (ref ``:12-33``): the first image's μ is swept
  one dimension at a time over ``linspace(-span, span, steps)``; dims
  default to ``inference.traversal_latent_indices``, else the first
  ``min(latent_dim, 4)``.  One PNG row per dim: ``traversal_dim{d}.png``.
- :func:`run_traversals` (ref ``:35-114``): tumor-class directions come
  from ``latent_usage.csv``'s ``logreg_weight_*`` columns when the analysis
  CLI has produced them (the artifact-dataflow contract, SURVEY.md §1),
  otherwise from a freshly fit logistic regression over the full test
  latents; sweeps ``μ + v·dir`` → ``traversal_tumor_{cls}.png``, with
  classes containing "notumor" excluded (ref ``:94-114``).

TPU-first: a whole sweep decodes as ONE batched call — (steps, D) latents
in, (steps, H, W, C) frames out — where the reference decodes per step.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path

import numpy as np

from ..config import get_config
from ..io.artifacts import save_image_grid


def _render_sweep(model, variables, zs: np.ndarray, png_path: str,
                  steps: int) -> None:
    """Decode a (steps, D) latent stack in one call and save the strip."""
    frames = np.asarray(model.decode(variables, zs))
    save_image_grid(frames, png_path, nrow=steps, normalize=True)


def _default_dims(model) -> list:
    cfg = get_config()
    configured = list(cfg.inference.traversal_latent_indices or [])
    return configured or list(range(min(model.latent_dim, 4)))


def latent_traversal(model, variables, images, out_dir, indices=None,
                     steps=None, span=3.0):
    cfg = get_config()
    if steps is None:
        steps = int(cfg.evaluation.traversal_steps)
    dims = _default_dims(model) if indices is None else indices
    mu, _ = model.encode(variables, np.asarray(images, np.float32))
    anchor = np.asarray(mu)[:1]
    sweep_vals = np.linspace(-span, span, steps)
    os.makedirs(out_dir, exist_ok=True)
    for dim in dims:
        zs = np.repeat(anchor, steps, axis=0)
        zs[:, dim] = sweep_vals
        _render_sweep(model, variables, zs,
                      os.path.join(out_dir, f"traversal_dim{dim}.png"), steps)


def _unit(vec: np.ndarray):
    norm = np.linalg.norm(vec)
    return vec / norm if norm > 0 else None


def _directions_from_usage_csv(tables_dir) -> dict:
    """Read per-class logreg directions back from ``latent_usage.csv``.

    The ``logreg_weight_maxabs`` summary column this framework adds to the
    CSV is not a class direction and is skipped (the reference, whose CSV
    lacks that column, sweeps every ``logreg_weight_*`` column)."""
    usage_path = Path(tables_dir) / "latent_usage.csv"
    if not usage_path.exists():
        return {}
    try:
        import pandas as pd

        df = pd.read_csv(usage_path)
        out = {}
        for col in df.columns:
            if (not col.startswith("logreg_weight_")
                    or col == "logreg_weight_maxabs"):
                continue
            u = _unit(df[col].to_numpy(dtype=np.float32))
            if u is not None:
                out[col[len("logreg_weight_"):]] = u
        return out
    except Exception:
        return {}


def _directions_from_fresh_probe(model, variables, test_ds) -> dict:
    """Fallback: fit a logistic regression on the test latents now."""
    from .recon_metrics import extract_latents

    L, y, _ = extract_latents(model, variables, test_ds)
    if len(y) < 2 or len(np.unique(y)) < 2:
        return {}
    try:
        from sklearn.exceptions import ConvergenceWarning
        from sklearn.linear_model import LogisticRegression

        with warnings.catch_warnings():
            warnings.filterwarnings("ignore", category=ConvergenceWarning)
            clf = LogisticRegression(max_iter=2000)
            clf.fit(L, y)
        coef = np.atleast_2d(clf.coef_)
        out = {}
        for row, cls in zip(coef, clf.classes_):
            u = _unit(row)
            if u is not None:
                name = test_ds.idx_to_class.get(cls, f"class{cls}")
                out[name] = u.astype(np.float32)
        return out
    except Exception:
        return {}


def run_traversals(model, variables, test_ds, indices=None, steps=None,
                   span=3.0, images_override=None):
    cfg = get_config()
    out_dir = cfg.paths.figures_dir

    class_dirs = _directions_from_usage_csv(cfg.paths.tables_dir)
    if not class_dirs:
        class_dirs = _directions_from_fresh_probe(model, variables, test_ds)

    if images_override is not None:
        imgs = np.asarray(images_override, np.float32)
    elif len(test_ds) > 0:
        head = test_ds.images[: int(cfg.training.batch_size)]
        imgs = head.astype(np.float32) / 255.0
    else:
        return

    latent_traversal(model, variables, imgs, out_dir, indices=indices,
                     steps=steps, span=span)

    tumor_dirs = {name: d for name, d in class_dirs.items()
                  if "notumor" not in name.lower()}
    if not tumor_dirs:
        return
    if steps is None:
        steps = int(cfg.evaluation.traversal_steps)
    mu, _ = model.encode(variables, imgs)
    anchor = np.asarray(mu)[:1]
    sweep_vals = np.linspace(-span, span, steps)
    for cls_name, direction in tumor_dirs.items():
        zs = anchor + sweep_vals[:, None] * direction[None, :]
        _render_sweep(
            model, variables, zs,
            os.path.join(out_dir, f"traversal_tumor_{cls_name}.png"), steps)
