"""End-to-end integration: train → resume → evaluate → inference suite.

This is the framework's equivalent of the reference's debug-config +
demo-data manual harness (SURVEY.md §4): a tiny 2-epoch run on synthetic data
exercising the full artifact surface.
"""

import glob
import json
import os
import re

import numpy as np
import pytest

from betavae_tpu.config import get_config


@pytest.fixture(scope="module")
def trained_env(tmp_path_factory):
    """Train once per module; later tests consume the artifacts."""
    import matplotlib

    matplotlib.use("Agg")
    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.train.loop import train
    from tests.conftest import _write_demo_config

    reset_config_cache()
    tmp = tmp_path_factory.mktemp("e2e")
    path = _write_demo_config(
        tmp, image_size=32, latent_dim=8, base_channels=8, num_blocks=2,
        batch_size=4, class_mode="multiclass",
        **{"logging.log_to_file": True, "evaluation.num_umap_samples": 12,
           "evaluation.traversal_steps": 3},
    )
    cfg = get_config(path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=32)
    train()
    yield path
    reset_config_cache()


def _use(trained_env):
    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.logging_utils import reset_logger

    reset_config_cache()
    reset_logger()
    return get_config(trained_env)


def test_train_artifacts(trained_env):
    cfg = _use(trained_env)
    models = sorted(os.listdir(cfg.paths.models_dir))
    assert "testrun_latest_shard0.pt" in models
    assert "testrun_latest_shard1.pt" in models
    assert "testrun_best_shard0.pt" in models
    figs = os.listdir(cfg.paths.figures_dir)
    assert any(f.startswith("recon_epoch") and f.endswith(".png") for f in figs)
    assert any(f.endswith("_diff.png") for f in figs)
    assert any(f.endswith("_stats.json") for f in figs)


def test_metrics_log_protocol(trained_env):
    cfg = _use(trained_env)
    log_path = os.path.join(cfg.paths.outputs_dir, "logs", "testrun.log")
    assert os.path.exists(log_path)
    text = open(log_path).read()
    # CONFIG line + METRICS lines parse with the downstream regex
    # (the corrected single-escape form, ref plot_phase_losses.py:29)
    assert "CONFIG {" in text
    metrics = [json.loads(m) for m in re.findall(r"METRICS (\{.*\})", text)]
    phases = {m["phase"] for m in metrics}
    assert {"train", "val"} <= phases
    train_m = [m for m in metrics if m["phase"] == "train"][0]
    for k in ("epoch", "beta", "train_total_loss", "train_recon_loss",
              "train_kl", "mu_mean_batch", "z_std_batch", "lr"):
        assert k in train_m
    val_m = [m for m in metrics if m["phase"] == "val"][-1]
    for k in ("val_total_loss", "val_kl", "latent_probe_auc", "best_dim_auc"):
        assert k in val_m


def test_resume_from_latest(trained_env):
    _use(trained_env)
    from betavae_tpu.train.loop import train

    # resume: starts at epoch 3 which is > debug epochs=2, so the loop body
    # is skipped — this validates checkpoint load + state reconstruction
    state = train(resume="latest")
    assert state is not None


def test_resume_missing_falls_back(trained_env, capsys):
    cfg = _use(trained_env)
    from betavae_tpu.train.loop import train

    run_id = cfg.paths.run_id
    for p in glob.glob(os.path.join(cfg.paths.models_dir, f"{run_id}_best*")):
        os.rename(p, p + ".bak")
    try:
        train(resume="best")
        out = capsys.readouterr().out
        assert "starting fresh" in out
    finally:
        for p in glob.glob(os.path.join(cfg.paths.models_dir, "*.bak")):
            os.rename(p, p[: -len(".bak")])


def test_evaluate_full_artifacts(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.data.dataset import build_datasets
    from betavae_tpu.eval.recon_metrics import evaluate_full
    from betavae_tpu.eval.run_evaluation import load_model

    train_ds, test_ds = build_datasets()
    model, variables = load_model("best")
    combined = evaluate_full(model, variables, train_ds, test_ds)
    for k in ("mse_mean", "psnr_mean", "ssim_mean", "probe_macro_f1",
              "silhouette"):
        assert k in combined
    assert 0 <= combined["ssim_mean"] <= 1
    assert os.path.exists(os.path.join(cfg.paths.tables_dir,
                                       "metrics_summary.csv"))
    assert os.path.exists(os.path.join(cfg.paths.tables_dir,
                                       "confusion_matrix.csv"))
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "latent_logreg_weights.png"))
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "recon_vs_traversal.png"))
    # per-class rows exist for all 4 demo classes
    for cls in ("glioma", "meningioma", "pituitary", "notumor"):
        assert f"per_class/{cls}/mse_mean" in combined


def test_latent_viz_artifacts(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.data.dataset import build_datasets
    from betavae_tpu.eval.latent_viz import generate_latent_visualizations
    from betavae_tpu.eval.run_evaluation import load_model

    _, test_ds = build_datasets()
    model, variables = load_model("best")
    generate_latent_visualizations(model, variables, test_ds)
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "latent_scatter.png"))
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "latent_per_dim_violin.png"))


def test_encode_cli(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.infer.encode import main

    main([])
    tables = cfg.paths.tables_dir
    for prefix in ("train_latents", "test_latents"):
        mu = np.load(os.path.join(tables, f"{prefix}_mu.npy"))
        lv = np.load(os.path.join(tables, f"{prefix}_logvar.npy"))
        assert mu.shape[1] == 8 and lv.shape == mu.shape
        csv_path = os.path.join(tables, f"{prefix}_embeddings.csv")
        header = open(csv_path).readline().strip().split(",")
        assert header[:2] == ["path", "label"]
        assert header[2:] == [f"z{i}" for i in range(8)]


def test_latent_analysis_cli(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.infer.latent_analysis import main

    res = main([])
    assert "traversal_order_auc" in res and "traversal_order_kl" in res
    assert len(res["traversal_order_auc"]) == 8
    assert os.path.exists(os.path.join(cfg.paths.tables_dir,
                                       "latent_usage.csv"))
    assert os.path.exists(os.path.join(cfg.paths.tables_dir,
                                       "per_dimension_auc.csv"))
    assert os.path.exists(os.path.join(cfg.paths.tables_dir,
                                       "latent_corr_pairs.csv"))
    assert os.path.exists(os.path.join(cfg.paths.outputs_dir,
                                       "latent_ranking_summary.json"))
    # latent_usage carries logreg_weight_<class> columns for traversal reuse
    import pandas as pd

    df = pd.read_csv(os.path.join(cfg.paths.tables_dir, "latent_usage.csv"))
    assert any(c.startswith("logreg_weight_") for c in df.columns)
    # sorted by kl_mean descending (ref latent_analysis.py:132)
    kl = df["kl_mean"].to_numpy()
    assert np.all(kl[:-1] >= kl[1:] - 1e-9)


def test_generate_cli(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.infer.generate import main

    main(["--seed", "3", "--num-samples", "4"])
    assert os.path.exists(os.path.join(cfg.paths.figures_dir, "samples.png"))
    assert os.path.exists(os.path.join(cfg.paths.figures_dir,
                                       "interpolation.png"))


def test_traversals_consume_latent_usage(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.data.dataset import build_datasets
    from betavae_tpu.eval.run_evaluation import load_model
    from betavae_tpu.eval.traversal import run_traversals

    _, test_ds = build_datasets()
    model, variables = load_model("best")
    run_traversals(model, variables, test_ds, indices=[0, 1], steps=3)
    figs = os.listdir(cfg.paths.figures_dir)
    assert "traversal_dim0.png" in figs and "traversal_dim1.png" in figs
    # tumor-class sweeps exist (latent_usage.csv written by prior test)
    assert any(f.startswith("traversal_tumor_") for f in figs)


def test_run_evaluation_driver(trained_env):
    cfg = _use(trained_env)
    from betavae_tpu.eval.run_evaluation import main

    main([])
    figs = os.listdir(cfg.paths.figures_dir)
    # dim order came from latent_ranking_summary.json (3 = traversal_steps)
    assert any(f.startswith("traversal_dim") for f in figs)


def test_checkpoint_cadence_knob(tmp_path_factory):
    """training.checkpoint_every_epochs gates 'latest' saves (additive key)."""
    import yaml

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.train.loop import train
    from tests.conftest import _write_demo_config

    reset_config_cache()
    tmp = tmp_path_factory.mktemp("ckpt_cadence")
    path = _write_demo_config(tmp)
    raw = yaml.safe_load(open(path))
    raw["debug"].update(epochs=3, max_train_batches=2, max_val_batches=1)
    raw["training"]["checkpoint_every_epochs"] = 2
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
    cfg = get_config(path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=4,
                       test_per_class=2, size=cfg.data.image_size)

    saves = []
    from betavae_tpu.train import callbacks

    orig = callbacks.CheckpointManager.save_latest

    def spy(self, state, epoch, total_steps, extra):
        saves.append(epoch)
        return orig(self, state, epoch, total_steps, extra)

    callbacks.CheckpointManager.save_latest = spy
    try:
        train()
    finally:
        callbacks.CheckpointManager.save_latest = orig
    # epochs 2 (cadence) and 3 (final) saved; epoch 1 skipped
    assert saves == [2, 3]
