"""Training-log tooling: parse, plot, and repair ``METRICS {json}`` logs.

One home for everything that consumes the structured log protocol
(capability parity with the reference's ``scripts/plot_logs.py``,
``plot_phase_losses.py``, ``fix_steps.py`` and ``make_recon_gif.py``; the
scripts in ``scripts/`` are thin CLIs over this module).

Every record is one line ``<ts> | <LEVEL> | METRICS {json}`` with ``phase``
and ``step`` keys first.  Note the reference's ``plot_logs.py`` shipped with
a double-escaped regex that never matched (SURVEY.md quirk 1); the pattern
here is the working single-escaped form.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

_METRICS_RE = re.compile(r"METRICS (\{.*\})")

TRAIN_PANEL_KEYS = ("train_total_loss", "train_recon_loss", "train_kl",
                    "train_kl_mean", "train_kl_effective_last")


def iter_metrics(log_path) -> "list[dict]":
    """All METRICS payloads in a log file, in order."""
    log_path = Path(log_path)
    if not log_path.exists():
        raise FileNotFoundError(f"Log file not found: {log_path}")
    records = []
    for line in log_path.read_text(encoding="utf-8").splitlines():
        m = _METRICS_RE.search(line)
        if not m:
            continue
        try:
            records.append(json.loads(m.group(1)))
        except json.JSONDecodeError:
            continue
    return records


def parse_metrics(log_path):
    """METRICS payloads as a pandas DataFrame."""
    import pandas as pd

    return pd.DataFrame(iter_metrics(log_path))


def _x_axis(df):
    if "step" in df and df["step"].notna().any():
        return df["step"]
    return df.index


def train_metrics_figure(df, keys=TRAIN_PANEL_KEYS):
    """Stacked per-key panels over train steps (one axis per metric)."""
    import matplotlib.pyplot as plt

    train = df[df["phase"] == "train"]
    if train.empty:
        raise ValueError("No train-phase metrics found in the log.")
    x = _x_axis(train)
    fig, axes = plt.subplots(len(keys), 1, figsize=(8, 12), sharex=True)
    for ax, key in zip(axes, keys):
        if key in train:
            ax.plot(x, train[key], color="tab:blue", label=key)
            ax.grid(True, linestyle="--", alpha=0.4)
        else:
            ax.text(0.5, 0.5, f"{key} not found", ha="center", va="center")
        ax.set_ylabel(key)
    axes[-1].set_xlabel("step")
    fig.suptitle("Train metrics")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    return fig


def phase_losses_figure(df, skip_first_train: int = 7,
                        val_step_scale: int = 180):
    """Train/val total-loss overlay.

    ``skip_first_train`` drops the initial noisy points and
    ``val_step_scale`` maps val epochs onto a step axis when val rows carry
    no step — both reference behaviors (``plot_phase_losses.py:49-66``).
    """
    import matplotlib.pyplot as plt

    if "phase" not in df.columns:
        raise ValueError("No phase column found in metrics log.")
    train = df[df["phase"] == "train"].iloc[skip_first_train:]
    val = df[df["phase"] == "val"]
    if train.empty and val.empty:
        raise ValueError("No train or val metrics found in the log.")

    fig, ax = plt.subplots(figsize=(10, 4))
    plotted = []
    if "train_total_loss" in train and train["train_total_loss"].notna().any():
        plotted.append(ax.plot(_x_axis(train), train["train_total_loss"],
                               color="tab:blue", label="train_total_loss")[0])
    if not val.empty and "val_total_loss" in val and val["val_total_loss"].notna().any():
        if "step" in val and val["step"].notna().any():
            xv = val["step"]
        elif "epoch" in val and val["epoch"].notna().any():
            xv = val["epoch"] * val_step_scale
        else:
            xv = val.index
        plotted.append(ax.plot(xv, val["val_total_loss"], color="tab:orange",
                               linestyle="--", label="val_total_loss")[0])
    if not plotted:
        ax.text(0.5, 0.5, "No total losses found", ha="center", va="center")
    else:
        ax.legend(loc="upper right")
    ax.set(title="Total loss", xlabel="step", ylabel="loss")
    ax.grid(True, linestyle="--", alpha=0.4)
    fig.tight_layout()
    return fig


def rewrite_val_steps(input_path, output_path) -> int:
    """Repair: give val-phase records the preceding train step.

    Returns the number of rewritten val lines (reference ``fix_steps.py``).
    """
    fixed = 0
    last_train_step = None
    out_lines = []
    for line in Path(input_path).read_text().splitlines(keepends=True):
        m = _METRICS_RE.search(line)
        if m:
            try:
                payload = json.loads(m.group(1))
            except json.JSONDecodeError:
                out_lines.append(line)
                continue
            phase = payload.get("phase")
            if phase == "train" and "step" in payload:
                last_train_step = payload["step"]
            elif phase == "val" and last_train_step is not None:
                payload["step"] = last_train_step
                fixed += 1
            rendered = json.dumps(payload, separators=(", ", ": "))
            out_lines.append(line[: m.start(1)] + rendered + "\n")
        else:
            out_lines.append(line)
    Path(output_path).write_text("".join(out_lines))
    return fixed


# ---------------------------------------------------------------------------
# recon-panel GIF
# ---------------------------------------------------------------------------

_EPOCH_RE = re.compile(r"(\d+)")


def epoch_sort_key(path):
    """Numeric-aware ordering so epoch10 follows epoch2."""
    nums = [int(n) for n in _EPOCH_RE.findall(Path(path).stem)]
    return (nums, str(path))


def recon_gif(figures_dir, pattern: str = "recon_epoch*.png",
              output: str = "recons_only.gif", duration_ms: int = 200,
              crop_bottom_half: bool = True,
              include_diff: bool = False) -> Path:
    """Animate the recon panels (bottom/reconstruction half by default)."""
    from PIL import Image

    figures_dir = Path(figures_dir)
    files = sorted(figures_dir.glob(pattern), key=epoch_sort_key)
    if not include_diff:
        files = [f for f in files if "_diff" not in f.stem]
    if not files:
        raise FileNotFoundError(
            f"No files matching {pattern} found in {figures_dir}")

    frames = []
    for f in files:
        img = Image.open(f)
        if crop_bottom_half:
            w, h = img.size
            img = img.crop((0, h // 2, w, h))
        frames.append(img.copy())
    out_path = figures_dir / output
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
    return out_path
