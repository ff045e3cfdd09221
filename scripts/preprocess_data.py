"""Preprocess the brain tumour dataset into processed train/test splits.

Capability parity with reference ``scripts/preprocess_data.py:33-55``:
``--config/--normalization{minmax,global_z}/--overwrite``; runs
split_from_raw → preprocess_dataset → verify_processed.

Expected raw layout (per config): subfolders are classes, e.g.
  data/braintumour/{glioma,meningioma,pituitary,notumor}/*.png
or a pre-split Training/Testing tree.
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.data.preprocess import (preprocess_dataset, split_from_raw,
                                         verify_processed)


def main():
    parser = argparse.ArgumentParser(
        description="Preprocess brain tumour dataset into processed/train|test splits.")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config (defaults to configs/beta_vae_se.yaml).")
    parser.add_argument("--normalization", type=str, default="minmax",
                        choices=["minmax", "global_z"],
                        help="Normalization mode for resizing.")
    parser.add_argument("--overwrite", action="store_true",
                        help="Remove existing processed dir before copying/splitting.")
    args = parser.parse_args()

    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    cfg = get_config()

    print(f"Using raw data from: {cfg.paths.raw_dir}")
    print(f"Writing processed data to: {cfg.paths.processed_dir}")
    print(f"Normalization mode: {args.normalization}")
    print("Classes are auto-detected from subfolders under raw_dir.")

    split_from_raw(overwrite=args.overwrite)
    preprocess_dataset(compute_stats=(args.normalization == "global_z"),
                       normalization_mode=args.normalization)
    verify_processed()
    print("Preprocessing complete.")


if __name__ == "__main__":
    main()
