"""Dump the first validation batch so seeded ordering can be diffed.

Artifact parity with reference ``scripts/preview_val_batch.py:42-58``: a
``val_preview_seed{seed}.png`` grid plus a ``..._paths.txt`` manifest with
one ``{i}: class=... path=...`` line per sample — run it twice (or against
a reference run) and diff the manifests to prove the val order is a pure
function of ``data.seed``.
"""
import argparse
import os
from pathlib import Path

import _bootstrap  # noqa: F401
import numpy as np

from betavae_tpu.config import get_config
from betavae_tpu.data.dataset import build_datasets
from betavae_tpu.io.artifacts import ensure_dirs, save_image_grid


def _write_manifest(path: Path, ds, count: int) -> None:
    lines = (f"{i}: class={ds.class_names[i]} path={ds.paths[i]}\n"
             for i in range(count))
    with open(path, "w", encoding="utf-8") as f:
        f.writelines(lines)


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

    batch = test_ds.images[: int(cfg.training.batch_size)]
    imgs = batch.astype(np.float32) / 255.0
    out_dir = Path(cfg.paths.figures_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    stem = f"val_preview_seed{cfg.data.seed}"
    grid_path = out_dir / f"{stem}.png"
    save_image_grid(imgs, str(grid_path), nrow=min(len(imgs), 8),
                    normalize=True)
    meta_path = out_dir / f"{stem}_paths.txt"
    _write_manifest(meta_path, test_ds, imgs.shape[0])

    print(f"Val-batch grid: {grid_path}")
    print(f"Val-batch paths/classes: {meta_path}")


if __name__ == "__main__":
    main()
