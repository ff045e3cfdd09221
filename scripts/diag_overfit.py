"""Overfit diagnostic: full train/val MSE + latent stats from the latest ckpt.

Capability parity with reference ``scripts/diag_overfit.py:19-49``: loads the
latest checkpoint, computes mean MSE over the debug-limited train/val splits
with the model's default (deterministic_overfit) forward, and prints
μ/z/logσ²/range statistics as JSON to stdout.
"""
import json
import os
import sys

import _bootstrap  # noqa: F401
import numpy as np

from betavae_tpu.config import get, get_config
from betavae_tpu.data.dataset import build_datasets
from betavae_tpu.io.checkpoint import load_sharded_checkpoint, unflatten_like
from betavae_tpu.models.beta_vae import model_from_config


def main():
    import argparse

    import jax

    parser = argparse.ArgumentParser(description="Overfit diagnostic")
    parser.add_argument("--config", type=str, default=None)
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    train_limit = get(cfg.debug, "train_samples", None)
    test_limit = get(cfg.debug, "test_samples", None)
    train_ds, test_ds = build_datasets(train_limit=train_limit,
                                       test_limit=test_limit)

    ckpt_path = f"{cfg.paths.models_dir}/{cfg.paths.run_id}_latest.pt"
    payload = load_sharded_checkpoint(ckpt_path)
    model = model_from_config(cfg)
    template = model.variables_template()
    variables = unflatten_like(template, payload["model_state"])

    bs = int(cfg.training.batch_size)
    key = jax.random.PRNGKey(int(cfg.data.seed))

    def full_mse(ds):
        nonlocal key
        mses = []
        for s in range(0, len(ds), bs):
            x = ds.images[s : s + bs].astype(np.float32) / 255.0
            key, sub = jax.random.split(key)
            r, mu, logvar, z = model.forward(variables, x, key=sub)
            mses.append(float(np.mean((np.asarray(r) - x) ** 2)))
        return sum(mses) / max(1, len(mses))

    train_mse = full_mse(train_ds)
    val_mse = full_mse(test_ds)

    x = train_ds.images[:bs].astype(np.float32) / 255.0
    key, sub = jax.random.split(key)
    r, mu, logvar, z = model.forward(variables, x, key=sub)
    r, mu, logvar, z = map(np.asarray, (r, mu, logvar, z))
    stats = {
        "train_mse_mean": train_mse,
        "val_mse_mean": val_mse,
        "mu_mean": float(mu.mean()), "mu_std": float(mu.std()),
        "z_mean": float(z.mean()), "z_std": float(z.std()),
        "logvar_mean": float(logvar.mean()), "logvar_std": float(logvar.std()),
        "x_min": float(x.min()), "x_max": float(x.max()),
        "r_min": float(r.min()), "r_max": float(r.max()),
    }
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
