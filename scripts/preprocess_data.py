"""Preprocess raw images into the processed train/test tree (thin CLI).

Parity with reference ``scripts/preprocess_data.py:33-55``; the pipeline
itself lives in ``betavae_tpu.data.preprocess``:

1. ``split_from_raw`` — copy a pre-split ``Training/Testing`` tree, or make a
   seeded per-class 80/20 split from class folders under ``paths.raw_dir``,
2. ``preprocess_dataset`` — in-place resize to ``data.image_size`` with
   ``minmax`` (resize-only) or ``global_z`` normalization,
3. ``verify_processed`` — sanity-check the resulting split dirs.
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.data import preprocess


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--config", default=None,
                        help="Path to YAML config (default resolution order "
                             "applies).")
    parser.add_argument("--normalization", default="minmax",
                        choices=("minmax", "global_z"))
    parser.add_argument("--overwrite", action="store_true",
                        help="Rebuild the processed dir from scratch.")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    print(f"raw: {cfg.paths.raw_dir} -> processed: {cfg.paths.processed_dir} "
          f"(normalization={args.normalization}; classes auto-detected from "
          "raw subfolders)")
    preprocess.split_from_raw(overwrite=args.overwrite)
    preprocess.preprocess_dataset(
        compute_stats=(args.normalization == "global_z"),
        normalization_mode=args.normalization)
    preprocess.verify_processed()
    print("Preprocessing complete.")


if __name__ == "__main__":
    main()
