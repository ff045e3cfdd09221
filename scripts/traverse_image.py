"""Latent traversals seeded from one user-supplied image.

CLI surface parity with reference ``scripts/traverse_image.py:42-87``
(flags ``--image/--checkpoint/--indices/--span/--steps``, best|latest|path
checkpoint resolution, config fallbacks for span/steps); the body drives
this framework's batched-decode sweeps via
``eval.traversal.run_traversals(images_override=...)``.
"""
import argparse
import os
from pathlib import Path

import _bootstrap  # noqa: F401
import numpy as np

from betavae_tpu.config import get_config
from betavae_tpu.data.dataset import build_datasets
from betavae_tpu.data.preprocess import _load_image
from betavae_tpu.eval.traversal import run_traversals
from betavae_tpu.io.artifacts import ensure_dirs
from betavae_tpu.io.checkpoint import load_sharded_checkpoint, unflatten_like
from betavae_tpu.models.beta_vae import model_from_config


def _resolve_checkpoint(tag: str) -> Path:
    """best/latest → run-id path under models_dir; anything else is a path."""
    cfg = get_config()
    if tag not in ("best", "latest"):
        return Path(tag)
    return Path(cfg.paths.models_dir) / f"{cfg.paths.run_id}_{tag}.pt"


def load_model(checkpoint_tag: str):
    path = _resolve_checkpoint(checkpoint_tag)
    try:
        payload = load_sharded_checkpoint(str(path))
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"Checkpoint not found at {path} (base file or shards).") from e
    model = model_from_config(get_config())
    variables = unflatten_like(model.variables_template(),
                               payload.get("model_state", payload))
    return model, variables


def _parse_dim_list(raw: str | None):
    if not raw:
        return None
    try:
        return [int(tok) for tok in raw.split(",") if tok.strip()]
    except ValueError:
        print("--indices is not a comma-separated int list; "
              "falling back to defaults.")
        return None


def main():
    parser = argparse.ArgumentParser(
        description="Latent traversals for one input image.")
    flag = parser.add_argument
    flag("--config", type=str, default=None,
         help="YAML config to activate for this run.")
    flag("--image", type=str, required=True,
         help="Input image to encode and traverse around.")
    flag("--checkpoint", type=str, default="best",
         help="'best', 'latest', or a checkpoint base path.")
    flag("--indices", type=str, default=None,
         help="Latent dims to sweep, comma-separated.")
    flag("--span", type=float, default=None,
         help="Sweep half-width; config edit_span if omitted.")
    flag("--steps", type=int, default=None,
         help="Sweep sample count; config value if omitted.")
    args = parser.parse_args()

    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    cfg = get_config()
    ensure_dirs()

    model, variables = load_model(args.checkpoint)
    img = _load_image(args.image, cfg.data.grayscale,
                      size=int(cfg.data.image_size))[None]
    _, test_ds = build_datasets()

    run_traversals(
        model, variables, test_ds,
        indices=_parse_dim_list(args.indices),
        steps=int(cfg.evaluation.traversal_steps
                  if args.steps is None else args.steps),
        span=float(cfg.inference.edit_span
                   if args.span is None else args.span),
        images_override=img.astype(np.float32))
    print(f"Traversal figures written under {cfg.paths.figures_dir}")


if __name__ == "__main__":
    main()
