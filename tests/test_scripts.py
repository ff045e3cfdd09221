"""CLI scripts smoke tests (log parsers, gif, preview, reshard, demo data)."""

import importlib
import json
import os
import sys

import numpy as np
import pytest

SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS_DIR not in sys.path:
    sys.path.insert(0, SCRIPTS_DIR)


def _write_fake_log(path, steps=20, run_id="testrun"):
    lines = []
    for s in range(1, steps + 1):
        payload = {"phase": "train", "step": s, "epoch": 1 + s // 10,
                   "beta": 0.1, "train_total_loss": 100.0 / s,
                   "train_recon_loss": 90.0 / s, "train_kl": 5.0,
                   "train_kl_mean": 5.0, "train_kl_effective_last": 5.1}
        lines.append(f"2026-01-01 00:00:{s:02d},000 | INFO | METRICS "
                     + json.dumps(payload))
        if s % 10 == 0:
            val = {"phase": "val", "step": None, "epoch": s // 10,
                   "val_total_loss": 95.0 / s}
            lines.append("2026-01-01 00:00:59,000 | INFO | METRICS "
                         + json.dumps(val))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def log_env(demo_config_factory):
    from betavae_tpu.config import get_config

    path = demo_config_factory(**{"logging.log_to_file": True})
    cfg = get_config(path)
    log_path = os.path.join(cfg.paths.outputs_dir, "logs", "testrun.log")
    _write_fake_log(log_path)
    return path, cfg, log_path


def test_fix_steps_roundtrip(log_env, tmp_path):
    _, cfg, log_path = log_env
    fix_steps = importlib.import_module("fix_steps")
    out = str(tmp_path / "fixed.log")
    fix_steps.fix_steps(log_path, out)
    fixed = open(out).read().splitlines()
    vals = [json.loads(ln.split("METRICS ", 1)[1]) for ln in fixed
            if "METRICS" in ln]
    for v in vals:
        if v["phase"] == "val":
            assert v["step"] is not None  # rewritten to last train step


def test_plot_phase_losses(log_env, monkeypatch):
    path, cfg, log_path = log_env
    mod = importlib.import_module("plot_phase_losses")
    monkeypatch.setattr(sys, "argv", ["plot_phase_losses.py", "--config", path])
    mod.main()
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "testrun_losses.png"))


def test_plot_logs_regex_fixed(log_env, monkeypatch):
    """The reference's double-escaped regex parsed nothing (SURVEY.md quirk 1);
    ours must actually produce the figure."""
    path, cfg, log_path = log_env
    mod = importlib.import_module("plot_logs")
    df = mod.parse_metrics(__import__("pathlib").Path(log_path))
    assert len(df) > 0
    monkeypatch.setattr(sys, "argv", ["plot_logs.py", "--config", path])
    mod.main()
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "testrun_train_metrics.png"))


def test_make_recon_gif(log_env, monkeypatch):
    path, cfg, _ = log_env
    from PIL import Image

    os.makedirs(cfg.paths.figures_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for e in (1, 2, 10):
        arr = rng.integers(0, 255, (64, 128), np.uint8)
        Image.fromarray(arr, "L").save(
            os.path.join(cfg.paths.figures_dir, f"recon_epoch{e}.png"))
        Image.fromarray(arr, "L").save(
            os.path.join(cfg.paths.figures_dir, f"recon_epoch{e}_diff.png"))
    mod = importlib.import_module("make_recon_gif")
    monkeypatch.setattr(sys, "argv", ["make_recon_gif.py", "--config", path])
    mod.main()
    gif = os.path.join(cfg.paths.figures_dir, "recons_only.gif")
    assert os.path.exists(gif)
    im = Image.open(gif)
    assert im.n_frames == 3  # _diff excluded, natural sort order


def test_natural_sort_key():
    mod = importlib.import_module("make_recon_gif")
    files = ["recon_epoch10.png", "recon_epoch2.png", "recon_epoch1.png"]
    assert sorted(files, key=mod.natural_sort_key) == [
        "recon_epoch1.png", "recon_epoch2.png", "recon_epoch10.png"]


def test_generate_demo_data_cli(demo_config_factory, monkeypatch):
    from betavae_tpu.config import get_config

    path = demo_config_factory()
    cfg = get_config(path)
    mod = importlib.import_module("generate_demo_data")
    monkeypatch.setattr(sys, "argv", [
        "generate_demo_data.py", "--config", path,
        "--train-per-class", "2", "--test-per-class", "1"])
    mod.main()
    classes = os.listdir(os.path.join(cfg.paths.processed_dir, "train"))
    assert sorted(classes) == ["glioma", "meningioma", "notumor", "pituitary"]


def test_preview_val_batch(demo_env, monkeypatch):
    from betavae_tpu.config import get_config

    cfg = get_config()
    mod = importlib.import_module("preview_val_batch")
    monkeypatch.setattr(sys, "argv", ["preview_val_batch.py", "--config",
                                      demo_env])
    mod.main()
    seed = cfg.data.seed
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       f"val_preview_seed{seed}.png"))
    meta = open(os.path.join(cfg.paths.figures_dir,
                             f"val_preview_seed{seed}_paths.txt")).read()
    assert "class=" in meta and "path=" in meta


def test_reshard_cli(demo_config_factory, monkeypatch, tmp_path):
    from betavae_tpu.config import get_config
    from betavae_tpu.io.checkpoint import (load_sharded_checkpoint,
                                           save_sharded_checkpoint)

    path = demo_config_factory()
    cfg = get_config(path)
    os.makedirs(cfg.paths.models_dir, exist_ok=True)
    base = os.path.join(cfg.paths.models_dir, "testrun_latest.pt")
    model_state = {f"p{i}": np.full((2, 2), i, np.float32) for i in range(6)}
    save_sharded_checkpoint(base, {"epoch": 1, "total_steps": 5,
                                   "model_state": model_state}, num_shards=2)
    mod = importlib.import_module("reshard_checkpoint")
    out_base = str(tmp_path / "out.pt")
    monkeypatch.setattr(sys, "argv", [
        "reshard_checkpoint.py", "--config", path, "--checkpoint", "latest",
        "--num-shards", "3", "--output", out_base])
    mod.main()
    merged = load_sharded_checkpoint(out_base)
    assert len(merged["model_state"]) == 6
    for k, v in model_state.items():
        np.testing.assert_array_equal(merged["model_state"][k], v)
    # probe: resharding DOWN must fail
    monkeypatch.setattr(sys, "argv", [
        "reshard_checkpoint.py", "--config", path, "--checkpoint", "latest",
        "--num-shards", "2"])
    with pytest.raises(ValueError, match="would not grow"):
        mod.main()


def _save_init_checkpoint(cfg, tag="best"):
    """Write a fresh-init model checkpoint in the CLI shard layout."""
    import jax

    from betavae_tpu.io.checkpoint import (flatten_pytree,
                                           save_sharded_checkpoint)
    from betavae_tpu.models.beta_vae import model_from_config

    model = model_from_config(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    os.makedirs(cfg.paths.models_dir, exist_ok=True)
    base = os.path.join(cfg.paths.models_dir,
                        f"{cfg.paths.run_id}_{tag}.pt")
    save_sharded_checkpoint(base, {"epoch": 1, "total_steps": 1,
                                   "model_state": flatten_pytree(variables),
                                   "val_total": 1.0}, num_shards=2)
    return base


def test_traverse_image_cli(demo_env, monkeypatch):
    """scripts/traverse_image.py end-to-end on CPU: checkpoint load, single
    image encode, per-dim sweeps written (ref scripts/traverse_image.py:42-87)."""
    import glob

    from betavae_tpu.config import get_config

    cfg = get_config()
    _save_init_checkpoint(cfg)
    img = sorted(glob.glob(os.path.join(
        cfg.paths.processed_dir, "test", "*", "*.png")))[0]
    mod = importlib.import_module("traverse_image")
    monkeypatch.setattr(sys, "argv", [
        "traverse_image.py", "--config", demo_env, "--image", img,
        "--indices", "0,1", "--steps", "3"])
    mod.main()
    outs = glob.glob(os.path.join(cfg.paths.figures_dir, "traversal_dim*.png"))
    assert {os.path.basename(p) for p in outs} >= {
        "traversal_dim0.png", "traversal_dim1.png"}


def test_generate_umap_and_grid_cli(demo_env, monkeypatch):
    """scripts/generate_umap_and_grid.py: rotating 3-D GIF (PCA fallback
    reducer) + 7-col grid from saved traversal PNGs (ref :53-138)."""
    from PIL import Image

    from betavae_tpu.config import get_config

    cfg = get_config()
    _save_init_checkpoint(cfg)
    os.makedirs(cfg.paths.figures_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for d in (0, 1):
        arr = rng.integers(0, 255, (32, 32 * 7), np.uint8)
        Image.fromarray(arr, "L").save(
            os.path.join(cfg.paths.figures_dir, f"traversal_dim{d}.png"))
    mod = importlib.import_module("generate_umap_and_grid")
    monkeypatch.setattr(sys, "argv", [
        "generate_umap_and_grid.py", "--config", demo_env, "--frames", "3"])
    mod.main()
    gif = os.path.join(cfg.paths.figures_dir, "umap3d.gif")
    grid = os.path.join(cfg.paths.figures_dir, "traversal_grid.png")
    assert os.path.exists(gif) and os.path.exists(grid)
    assert Image.open(gif).n_frames == 3


def test_xla_flag_sweep_cli(demo_config_factory, monkeypatch, capsys):
    """scripts/xla_flag_sweep.py: lower-once/compile-per-variant harness runs
    on CPU with a custom candidate list and reports numeric ms/step
    (DESIGN.md §3.0.4 — the hardware sweep that measured no-headroom)."""
    path = demo_config_factory()
    mod = importlib.import_module("xla_flag_sweep")
    monkeypatch.setattr(sys, "argv", [
        "xla_flag_sweep.py", "--config", path, "--steps", "2",
        "--chunks", "1", "--reps", "1",
        "--options-json", '[["baseline", {}]]'])
    mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    results = json.loads(out[-1])
    assert isinstance(results["baseline"], float) and results["baseline"] > 0
