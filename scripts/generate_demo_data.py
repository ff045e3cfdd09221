"""Generate a small synthetic dataset under cfg.paths.processed_dir.

Capability parity with reference ``scripts/generate_demo_data.py:27-77``:
seeded class-distinguishable grayscale patterns (glioma circle / meningioma
bands / pituitary cross-hatch / notumor noise) for smoke tests without the
real dataset.
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.data.demo import CLASSES, generate_demo_data


def main():
    parser = argparse.ArgumentParser(
        description="Generate synthetic demo dataset.")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config.")
    parser.add_argument("--train-per-class", type=int, default=24,
                        help="Images per class for train split.")
    parser.add_argument("--test-per-class", type=int, default=12,
                        help="Images per class for test split.")
    args = parser.parse_args()

    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    cfg = get_config()

    generate_demo_data(
        cfg.paths.processed_dir,
        train_subdir=cfg.data.train_subdir,
        test_subdir=cfg.data.test_subdir,
        train_per_class=args.train_per_class,
        test_per_class=args.test_per_class,
        size=cfg.data.image_size,
        classes=CLASSES,
    )
    print(f"Wrote synthetic data to {cfg.paths.processed_dir} (train/test splits).")


if __name__ == "__main__":
    main()
