"""Train the β-VAE (CLI entry point).

Capability parity with reference ``src/training/train.py:481-485``:
``--config`` sets ``CONFIG_PATH``; ``--resume best|latest|none``.
"""
import argparse
import os

import _bootstrap  # noqa: F401


def _parse_args():
    parser = argparse.ArgumentParser(description="Train Beta-VAE model")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config file (optional)")
    parser.add_argument("--resume", type=str,
                        choices=["best", "latest", "none"], default="none",
                        help="Resume from a checkpoint in models_dir")
    return parser.parse_args()


if __name__ == "__main__":
    args = _parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    from betavae_tpu.train.loop import train

    train(resume=args.resume)
