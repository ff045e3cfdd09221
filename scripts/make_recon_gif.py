"""Animate the per-epoch recon panels into a GIF (thin CLI).

Logic lives in ``betavae_tpu.eval.logs.recon_gif``; parity with reference
``scripts/make_recon_gif.py`` (numeric-aware ordering, bottom-half crop,
``--no-crop/--include-diff`` flags).
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.eval.logs import epoch_sort_key, recon_gif  # noqa: F401


def natural_sort_key(path):  # kept name for API/test compatibility
    return epoch_sort_key(path)


def main():
    parser = argparse.ArgumentParser(
        description="Create GIF from recon panels (bottom half only).")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config.")
    parser.add_argument("--pattern", type=str, default="recon_epoch*.png",
                        help="Glob pattern within figures_dir.")
    parser.add_argument("--output", type=str, default="recons_only.gif",
                        help="Output GIF filename (saved to figures_dir).")
    parser.add_argument("--duration", type=int, default=200,
                        help="Frame duration (ms).")
    parser.add_argument("--no-crop", action="store_true",
                        help="Do not crop; use full images.")
    parser.add_argument("--include-diff", action="store_true",
                        help="Include *_diff.png files (default: exclude).")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    out = recon_gif(cfg.paths.figures_dir, pattern=args.pattern,
                    output=args.output, duration_ms=args.duration,
                    crop_bottom_half=not args.no_crop,
                    include_diff=args.include_diff)
    print(f"Saved GIF to {out}")


if __name__ == "__main__":
    main()
