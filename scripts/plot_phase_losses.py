"""Plot train and validation total losses from a METRICS log.

Capability parity with reference ``scripts/plot_phase_losses.py:26-131``:
drops the first 7 train points, overlays train/val total loss, val x-axis
falls back to ``epoch * 180`` when val steps are missing (the reference's
step heuristic, kept).  Outputs ``{run_id}_losses.png``.
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
    pattern = re.compile(r"METRICS (\{.*\})")
    if not log_path.exists():
        raise FileNotFoundError(f"Log file not found: {log_path}")
    with log_path.open("r", encoding="utf-8") as f:
        for line in f:
            match = pattern.search(line)
            if not match:
                continue
            try:
                rows.append(json.loads(match.group(1)))
            except json.JSONDecodeError:
                continue
    return pd.DataFrame(rows)


def plot_train_val_losses(df: pd.DataFrame, out_path: Path) -> None:
    if "phase" not in df.columns:
        raise ValueError("No phase column found in metrics log.")

    df_train = df[df["phase"] == "train"].copy()
    if len(df_train) > 7:
        df_train = df_train.iloc[7:]
    df_val = df[df["phase"] == "val"].copy()
    if df_train.empty and df_val.empty:
        raise ValueError("No train or val metrics found in the log.")

    x_train = (df_train["step"]
               if "step" in df_train and df_train["step"].notna().any()
               else df_train.index)
    if "step" in df_val and df_val["step"].notna().any():
        x_val = df_val["step"]
    elif "epoch" in df_val and df_val["epoch"].notna().any():
        x_val = df_val["epoch"] * 180
    else:
        x_val = df_val.index

    fig, ax = plt.subplots(1, 1, figsize=(10, 4))
    train_total = val_total = None
    if (not df_train.empty and "train_total_loss" in df_train
            and not df_train["train_total_loss"].isna().all()):
        train_total = ax.plot(x_train, df_train["train_total_loss"],
                              label="train_total_loss", color="tab:blue")[0]
    if (not df_val.empty and "val_total_loss" in df_val
            and not df_val["val_total_loss"].isna().all()):
        val_total = ax.plot(x_val, df_val["val_total_loss"],
                            label="val_total_loss", color="tab:orange",
                            linestyle="--")[0]
    if train_total is None and val_total is None:
        ax.text(0.5, 0.5, "No total losses found", ha="center", va="center")

    ax.set_title("Total loss")
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.grid(True, linestyle="--", alpha=0.4)
    lines = [ln for ln in (train_total, val_total) if ln is not None]
    if lines:
        ax.legend(lines, [ln.get_label() for ln in lines], loc="upper right")
    fig.tight_layout()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


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
    log_path = (Path(args.log) if args.log
                else Path(cfg.paths.outputs_dir) / "logs" / f"{cfg.paths.run_id}.log")
    out_path = (Path(args.out) if args.out
                else Path(cfg.paths.figures_dir) / f"{cfg.paths.run_id}_losses.png")
    df = parse_metrics(log_path)
    plot_train_val_losses(df, out_path)
    print(f"Saved plot to {out_path}")


if __name__ == "__main__":
    main()
