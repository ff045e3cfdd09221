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
        description="Write the seeded synthetic 4-class demo dataset.")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config to activate for this run.")
    parser.add_argument("--train-per-class", type=int, default=24,
                        help="Train-split image count per class.")
    parser.add_argument("--test-per-class", type=int, default=12,
                        help="Test-split image count per class.")
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
    print(f"Demo dataset ready under {cfg.paths.processed_dir} "
          f"({cfg.data.train_subdir}/ + {cfg.data.test_subdir}/).")


if __name__ == "__main__":
    main()
