"""eval/logs module unit tests (parsers, figures, repair, gif ordering)."""

import json

import numpy as np
import pytest

from betavae_tpu.eval.logs import (epoch_sort_key, iter_metrics,
                                   parse_metrics, phase_losses_figure,
                                   recon_gif, rewrite_val_steps,
                                   train_metrics_figure)


def _log_lines(tmp_path, rows, name="run.log"):
    p = tmp_path / name
    lines = []
    for r in rows:
        lines.append("2026-01-01 00:00:00,000 | INFO | METRICS "
                     + json.dumps(r))
    lines.insert(0, "2026-01-01 00:00:00,000 | INFO | CONFIG {}")
    lines.insert(2, "garbage line without metrics")
    lines.append("2026-01-01 00:00:00,000 | INFO | METRICS {not json")
    p.write_text("\n".join(lines) + "\n")
    return p


def test_iter_metrics_skips_junk(tmp_path):
    rows = [{"phase": "train", "step": 1, "train_total_loss": 5.0},
            {"phase": "val", "step": None, "val_total_loss": 4.0}]
    p = _log_lines(tmp_path, rows)
    got = iter_metrics(p)
    assert got == rows


def test_parse_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        iter_metrics(tmp_path / "absent.log")


def test_figures_build(tmp_path):
    rows = []
    for s in range(1, 12):
        rows.append({"phase": "train", "step": s, "epoch": 1,
                     "train_total_loss": 10.0 / s,
                     "train_recon_loss": 9.0 / s, "train_kl": 1.0,
                     "train_kl_mean": 1.0, "train_kl_effective_last": 1.1})
    rows.append({"phase": "val", "step": 11, "epoch": 1,
                 "val_total_loss": 8.0})
    df = parse_metrics(_log_lines(tmp_path, rows))
    fig1 = train_metrics_figure(df)
    fig2 = phase_losses_figure(df)
    assert fig1 is not None and fig2 is not None
    import matplotlib.pyplot as plt

    plt.close(fig1)
    plt.close(fig2)


def test_no_train_metrics_raises(tmp_path):
    df = parse_metrics(_log_lines(tmp_path, [{"phase": "val", "step": 1}]))
    with pytest.raises(ValueError, match="No train-phase"):
        train_metrics_figure(df)


def test_rewrite_val_steps_counts(tmp_path):
    rows = [{"phase": "train", "step": 5},
            {"phase": "val", "step": None},
            {"phase": "train", "step": 9},
            {"phase": "val", "step": None}]
    src = _log_lines(tmp_path, rows)
    out = tmp_path / "fixed.log"
    n = rewrite_val_steps(src, out)
    assert n == 2
    fixed = iter_metrics(out)
    assert [r["step"] for r in fixed] == [5, 5, 9, 9]


def test_epoch_sort_key_ordering():
    files = ["recon_epoch10.png", "recon_epoch2.png", "recon_epoch1.png"]
    assert sorted(files, key=epoch_sort_key) == [
        "recon_epoch1.png", "recon_epoch2.png", "recon_epoch10.png"]


def test_recon_gif_crop(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for e in (1, 3):
        Image.fromarray(rng.integers(0, 255, (40, 20), np.uint8), "L").save(
            tmp_path / f"recon_epoch{e}.png")
    out = recon_gif(tmp_path)
    im = Image.open(out)
    assert im.n_frames == 2
    assert im.size == (20, 20)  # bottom half of 40-high panels
