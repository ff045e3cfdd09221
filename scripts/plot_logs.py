"""Plot key train-phase metrics from a METRICS log (thin CLI).

Logic lives in ``betavae_tpu.eval.logs``; parity with reference
``scripts/plot_logs.py`` with its broken double-escaped regex FIXED
(SURVEY.md quirk 1).  Outputs ``{run_id}_train_metrics.png``.
"""
import argparse
import os
from pathlib import Path

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.eval.logs import parse_metrics, train_metrics_figure


def main():
    parser = argparse.ArgumentParser(description="Plot train metrics from log.")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config.")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    log_path = Path(cfg.paths.outputs_dir) / "logs" / f"{cfg.paths.run_id}.log"
    out_path = (Path(cfg.paths.figures_dir)
                / f"{cfg.paths.run_id}_train_metrics.png")
    fig = train_metrics_figure(parse_metrics(log_path))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=150)
    print(f"Saved train metrics plot to {out_path}")


if __name__ == "__main__":
    main()
