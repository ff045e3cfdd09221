"""Build the processed train/test tree from raw class folders (thin CLI).

Parity with reference ``scripts/preprocess_data.py:33-55``; all logic lives
in ``betavae_tpu.data.preprocess``.  Three stages run in order:

1. ``split_from_raw`` — a pre-split ``Training/Testing`` layout is copied
   through; otherwise class folders under ``paths.raw_dir`` get a seeded
   per-class 80/20 split,
2. ``preprocess_dataset`` — in-place resize to ``data.image_size``;
   ``minmax`` means resize-only, ``global_z`` z-scores with streamed
   dataset stats first,
3. ``verify_processed`` — sanity-check the split dirs that resulted.
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.data import preprocess


def _cli() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--config", default=None,
                        help="Path to YAML config (default resolution order "
                             "applies).")
    parser.add_argument("--normalization", default="minmax",
                        choices=("minmax", "global_z"))
    parser.add_argument("--overwrite", action="store_true",
                        help="Rebuild the processed dir from scratch.")
    return parser.parse_args()


def main():
    args = _cli()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    cfg = get_config()
    print(f"raw: {cfg.paths.raw_dir} -> processed: {cfg.paths.processed_dir} "
          f"(normalization={args.normalization}; classes auto-detected from "
          "raw subfolders)")

    preprocess.split_from_raw(overwrite=args.overwrite)
    wants_stats = args.normalization == "global_z"
    preprocess.preprocess_dataset(compute_stats=wants_stats,
                                  normalization_mode=args.normalization)
    preprocess.verify_processed()
    print("Preprocessing complete.")


if __name__ == "__main__":
    main()
