"""Save a preview grid of the first validation batch (seed-determinism check).

Capability parity with reference ``scripts/preview_val_batch.py:42-58``:
outputs ``val_preview_seed{seed}.png`` + ``..._paths.txt`` listing image
paths and class names, so the deterministic seeded val ordering can be
verified across runs.
"""
import argparse
import os
from pathlib import Path

import _bootstrap  # noqa: F401
import numpy as np

from betavae_tpu.config import get_config
from betavae_tpu.data.dataset import build_datasets
from betavae_tpu.io.artifacts import ensure_dirs, save_image_grid


def main():
    parser = argparse.ArgumentParser(
        description="Render the first val batch for determinism checks.")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config to activate for this run.")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    ensure_dirs()
    _, test_ds = build_datasets()
    bs = int(cfg.training.batch_size)
    imgs = test_ds.images[:bs].astype(np.float32) / 255.0

    out_dir = Path(cfg.paths.figures_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    seed = cfg.data.seed
    grid_path = out_dir / f"val_preview_seed{seed}.png"
    save_image_grid(imgs, str(grid_path), nrow=min(len(imgs), 8),
                    normalize=True)

    meta_path = out_dir / f"val_preview_seed{seed}_paths.txt"
    with open(meta_path, "w", encoding="utf-8") as f:
        for i in range(imgs.shape[0]):
            f.write(f"{i}: class={test_ds.class_names[i]} "
                    f"path={test_ds.paths[i]}\n")

    print(f"Val-batch grid: {grid_path}")
    print(f"Val-batch paths/classes: {meta_path}")


if __name__ == "__main__":
    main()
