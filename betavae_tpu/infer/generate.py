"""Generative inference CLI: prior samples, factor edits, interpolations.

Capability parity with reference ``src/inference/generate.py:28-97``:

- :func:`sample_random` — seeded prior-sample grid → ``samples.png``
  (ref ``:28-34``),
- :func:`edit_tumor_factor` — single-dim sweep of
  ``inference.tumor_latent_index`` → ``edit_dim{d}.png`` (ref ``:36-49``),
- :func:`interpolate` — μ-space lerp between two test images →
  ``interpolation.png`` (ref ``:51-64``),
- CLI flags ``--config/--weights/--num-samples/--seed`` (ref ``:66-97``).

All sweeps decode as one batched call.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import get_config
from ..data.dataset import build_datasets
from ..eval.run_evaluation import load_model
from ..io.artifacts import save_image_grid


def sample_random(model, variables, n: int, out_dir, seed=None,
                  filename="samples.png"):
    import jax

    key = jax.random.PRNGKey(seed if seed is not None else 0)
    imgs = np.asarray(model.sample_prior(variables, n, key))
    save_image_grid(imgs, os.path.join(out_dir, filename),
                    nrow=max(1, int(np.sqrt(n))), normalize=True)


def edit_tumor_factor(model, variables, batch, dim, steps, span, out_dir):
    x = np.asarray(batch, np.float32)
    mu, logvar = model.encode(variables, x)
    base = np.asarray(mu)[:1]
    vals = np.linspace(-span, span, steps)
    zs = np.repeat(base, steps, axis=0)
    zs[:, dim] = vals
    grid = np.asarray(model.decode(variables, zs))
    save_image_grid(grid, os.path.join(out_dir, f"edit_dim{dim}.png"),
                    nrow=steps, normalize=True)


def interpolate(model, variables, img_a, img_b, steps, out_dir):
    x = np.concatenate([np.asarray(img_a, np.float32),
                        np.asarray(img_b, np.float32)], axis=0)
    mu, logvar = model.encode(variables, x)
    mu = np.asarray(mu)
    z0, z1 = mu[0:1], mu[1:2]
    alphas = np.linspace(0, 1, steps)[:, None]
    zs = (1 - alphas) * z0 + alphas * z1
    grid = np.asarray(model.decode(variables, zs))
    save_image_grid(grid, os.path.join(out_dir, "interpolation.png"),
                    nrow=steps, normalize=True)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Generate samples/traversals from a trained Beta-VAE.")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config")
    parser.add_argument("--weights", type=str, default="best",
                        help="Checkpoint tag (best or latest)")
    parser.add_argument("--num-samples", type=int, default=None,
                        help="Number of prior samples to generate")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed for sampling latent codes")
    args = parser.parse_args(argv)
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    _, test_ds = build_datasets()
    model, variables = load_model(args.weights)
    out_dir = cfg.paths.figures_dir
    os.makedirs(out_dir, exist_ok=True)
    n = args.num_samples or int(cfg.inference.sample_grid_size)
    sample_random(model, variables, n, out_dir, seed=args.seed)

    steps = int(cfg.evaluation.traversal_steps)
    tumor_dim = cfg.inference.tumor_latent_index
    imgs = test_ds.images.astype(np.float32) / 255.0
    if tumor_dim is not None and len(test_ds) > 0:
        bs = int(cfg.training.batch_size)
        edit_tumor_factor(model, variables, imgs[:bs], int(tumor_dim),
                          steps=steps, span=3.0, out_dir=out_dir)
    bs = int(cfg.training.batch_size)
    if len(test_ds) > bs:  # reference takes image 0 of batches 1 and 2
        interpolate(model, variables, imgs[:1], imgs[bs : bs + 1], steps,
                    out_dir)


if __name__ == "__main__":
    main()
