"""Plot train/val total losses from a METRICS log (thin CLI).

Logic lives in ``betavae_tpu.eval.logs``; parity with reference
``scripts/plot_phase_losses.py`` including its first-7-points drop and the
``epoch*180`` val-step heuristic.  Outputs ``{run_id}_losses.png``.
"""
import argparse
import os
from pathlib import Path

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.eval.logs import parse_metrics, phase_losses_figure


def main():
    parser = argparse.ArgumentParser(
        description="Plot train/val losses from log.")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config (sets run_id).")
    parser.add_argument("--log", type=str, default=None,
                        help="Override log path.")
    parser.add_argument("--out", type=str, default=None,
                        help="Override output figure path.")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    log_path = (Path(args.log) if args.log else
                Path(cfg.paths.outputs_dir) / "logs" / f"{cfg.paths.run_id}.log")
    out_path = (Path(args.out) if args.out else
                Path(cfg.paths.figures_dir) / f"{cfg.paths.run_id}_losses.png")
    fig = phase_losses_figure(parse_metrics(log_path))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=150)
    print(f"Saved plot to {out_path}")


if __name__ == "__main__":
    main()
