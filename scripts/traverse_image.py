"""Run latent traversals on a specific image.

Capability parity with reference ``scripts/traverse_image.py:42-87``:
``--image/--checkpoint(best|latest|path)/--indices/--span/--steps`` →
``run_traversals(images_override=...)``.
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


def load_model(checkpoint_tag: str):
    import jax

    cfg = get_config()
    if checkpoint_tag in ("best", "latest"):
        path = Path(cfg.paths.models_dir) / f"{cfg.paths.run_id}_{checkpoint_tag}.pt"
    else:
        path = Path(checkpoint_tag)
    try:
        payload = load_sharded_checkpoint(str(path))
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"Checkpoint not found at {path} (base file or shards).") from e
    model = model_from_config(cfg)
    template = model.variables_template()
    variables = unflatten_like(template,
                               payload.get("model_state", payload))
    return model, variables


def main():
    parser = argparse.ArgumentParser(
        description="Latent traversals for one input image.")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config to activate for this run.")
    parser.add_argument("--image", type=str, required=True,
                        help="Input image to encode and traverse around.")
    parser.add_argument("--checkpoint", type=str, default="best",
                        help="'best', 'latest', or a checkpoint base path.")
    parser.add_argument("--indices", type=str, default=None,
                        help="Latent dims to sweep, comma-separated.")
    parser.add_argument("--span", type=float, default=None,
                        help="Sweep half-width; config edit_span if omitted.")
    parser.add_argument("--steps", type=int, default=None,
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

    indices = None
    if args.indices:
        try:
            indices = [int(i.strip()) for i in args.indices.split(",")
                       if i.strip() != ""]
        except ValueError:
            print("--indices is not a comma-separated int list; "
                  "falling back to defaults.")

    span = args.span if args.span is not None else float(cfg.inference.edit_span)
    steps = (args.steps if args.steps is not None
             else int(cfg.evaluation.traversal_steps))

    run_traversals(model, variables, test_ds, indices=indices, steps=steps,
                   span=span, images_override=img.astype(np.float32))
    print(f"Traversal figures written under {cfg.paths.figures_dir}")


if __name__ == "__main__":
    main()
