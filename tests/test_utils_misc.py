"""Small utility coverage: image grids, FLOP accounting, log NaN encoding."""

import json
import math
import os

import numpy as np

from betavae_tpu.io.artifacts import make_grid, save_image_grid
from betavae_tpu.utils.flops import (model_forward_flops, train_step_flops,
                                     utilization)


def test_make_grid_layout():
    imgs = np.stack([np.full((4, 4, 1), v, np.float32)
                     for v in (0.0, 0.5, 1.0)])
    grid = make_grid(imgs, nrow=2, padding=1)
    # 2 cols, 2 rows: height = 1 + 2*(4+1), width = 1 + 2*(4+1)
    assert grid.shape == (11, 11, 1)
    # first tile at [1:5, 1:5]
    np.testing.assert_allclose(grid[1:5, 1:5, 0], 0.0)
    np.testing.assert_allclose(grid[1:5, 6:10, 0], 0.5)
    np.testing.assert_allclose(grid[6:10, 1:5, 0], 1.0)


def test_make_grid_normalize():
    imgs = np.stack([np.full((2, 2, 1), 2.0, np.float32),
                     np.full((2, 2, 1), 4.0, np.float32)])
    grid = make_grid(imgs, nrow=2, padding=1, normalize=True)
    assert grid.max() <= 1.0 and grid.min() >= 0.0
    # global min/max rescale: 2.0 -> 0, 4.0 -> 1
    assert np.isclose(grid[1, 1, 0], 0.0) and np.isclose(grid[1, 4, 0], 1.0)


def test_save_image_grid(tmp_path):
    from PIL import Image

    imgs = np.random.default_rng(0).uniform(size=(4, 8, 8, 1)).astype(
        np.float32)
    p = str(tmp_path / "grid.png")
    save_image_grid(imgs, p, nrow=2)
    im = Image.open(p)
    assert im.mode == "L"


def test_flops_production_model():
    layers = model_forward_flops(128, 1, 64, 64, 4)
    total = sum(l.flops for l in layers)
    # hand check: decoder dec_3 conv dominates at 2*128^2*64*9*64
    dec3 = next(l for l in layers if l.name == "dec_3.conv")
    assert dec3.flops == 2 * 128 * 128 * 64 * 9 * 64
    assert 3.0e9 < total < 4.5e9  # ~3.5 GFLOP/img forward
    fl = train_step_flops(128, 1, 64, 64, 4, batch_size=32)
    assert fl["train_flops_per_step"] == fl["train_flops_per_image"] * 32
    assert fl["train_flops_per_image"] == int(total * 3.0)
    # remat adds one forward
    fr = train_step_flops(128, 1, 64, 64, 4, batch_size=32, remat=True)
    assert fr["train_flops_per_image"] == int(total * 4.0)


def test_utilization_math():
    u = utilization(step_seconds=0.00840, flops_per_step=336_000_000_000)
    assert abs(u["achieved_tflops"] - 40.0) < 0.5
    assert 0.19 < u["mxu_utilization"] < 0.22


def test_data_parallel_scaling_model():
    from betavae_tpu.utils.flops import data_parallel_scaling

    # flagship: 5.1M fp32 grads, 7.6ms step, 8 chips @ 200 GB/s ICI
    d = data_parallel_scaling(7.6, 5_100_000, 8)
    # wire bytes/chip: 2*(7/8)*20.4MB = 35.7MB -> 0.1785 ms
    assert abs(d["comm_ms"] - 0.1785) < 0.001
    # comm hides entirely under the backward -> no overlapped slowdown
    assert d["efficiency_overlapped"] == 1.0
    assert 0.97 < d["efficiency_serial"] < 0.98
    # degenerate single chip
    one = data_parallel_scaling(7.6, 5_100_000, 1)
    assert one["comm_ms"] == 0.0 and one["efficiency_overlapped"] == 1.0
    # a hypothetical huge model makes comm dominate and efficiency drop
    big = data_parallel_scaling(7.6, 5_000_000_000, 8, ici_gb_per_s=200.0)
    assert big["efficiency_overlapped"] < 0.3


def test_log_metrics_nan_roundtrip(demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.logging_utils import log_metrics, reset_logger

    path = demo_config_factory(**{"logging.log_to_file": True})
    cfg = get_config(path)
    reset_logger()
    log_metrics({"a": float("nan"), "b": 1.5}, step=3, phase="train")
    log_path = os.path.join(cfg.paths.outputs_dir, "logs", "testrun.log")
    line = [ln for ln in open(log_path) if "METRICS" in ln][-1]
    payload = json.loads(line.split("METRICS ", 1)[1])
    assert math.isnan(payload["a"]) and payload["b"] == 1.5
