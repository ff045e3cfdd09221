"""Parse training logs and plot key train-phase metrics.

Capability parity with reference ``scripts/plot_logs.py`` with its quirk
FIXED: the reference's regex was double-escaped (``r"METRICS (\\\\{.*\\\\})"``,
``plot_logs.py:34``) and never matched anything; this uses the correct form
(same as ``plot_phase_losses.py:29``).

Outputs ``{run_id}_train_metrics.png`` under figures_dir.
"""
import argparse
import json
import os
import re
from pathlib import Path

import _bootstrap  # noqa: F401
import matplotlib.pyplot as plt
import pandas as pd

from betavae_tpu.config import get_config


def parse_metrics(log_path: Path) -> pd.DataFrame:
    rows = []
    if not log_path.exists():
        raise FileNotFoundError(f"Log file not found: {log_path}")
    pattern = re.compile(r"METRICS (\{.*\})")
    with log_path.open("r", encoding="utf-8") as f:
        for line in f:
            m = pattern.search(line)
            if not m:
                continue
            try:
                rows.append(json.loads(m.group(1)))
            except json.JSONDecodeError:
                continue
    return pd.DataFrame(rows)


def plot_train_metrics(df: pd.DataFrame, out_path: Path) -> None:
    cols = ["train_total_loss", "train_recon_loss", "train_kl",
            "train_kl_mean", "train_kl_effective_last"]
    df_train = df[df["phase"] == "train"].copy()
    if df_train.empty:
        raise ValueError("No train-phase metrics found in the log.")
    x = (df_train["step"]
         if "step" in df_train and df_train["step"].notna().any()
         else df_train.index)

    fig, axes = plt.subplots(len(cols), 1, figsize=(8, 12), sharex=True)
    for ax, c in zip(axes, cols):
        if c not in df_train:
            ax.text(0.5, 0.5, f"{c} not found", ha="center", va="center")
            ax.set_ylabel(c)
            continue
        ax.plot(x, df_train[c], label=c, color="tab:blue")
        ax.set_ylabel(c)
        ax.grid(True, linestyle="--", alpha=0.4)
    axes[-1].set_xlabel("step")
    fig.suptitle("Train metrics")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


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
    df = parse_metrics(log_path)
    plot_train_metrics(df, out_path)
    print(f"Saved train metrics plot to {out_path}")


if __name__ == "__main__":
    main()
