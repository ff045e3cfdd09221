"""Evaluation driver: load best checkpoint → full eval → viz → traversals.

Capability parity with reference ``src/evaluation/run_evaluation.py:18-61``:
loads the ``best`` checkpoint with ``latest`` fallback through the sharded
loader, runs ``evaluate_full`` → ``generate_latent_visualizations`` →
``run_traversals`` with traversal dim order taken from
``latent_ranking_summary.json::traversal_order_auc`` when present (sliced to
``min(latent_dim, evaluation.traversal_steps)`` — the reference's naming
collision where ``traversal_steps`` doubles as a dim-count, deliberately
kept).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from ..config import get_config
from ..data.dataset import build_datasets
from ..io.checkpoint import load_sharded_checkpoint, unflatten_like
from ..models.beta_vae import model_from_config
from .latent_viz import generate_latent_visualizations
from .recon_metrics import evaluate_full
from .traversal import run_traversals


def load_model(weights: str = "best"):
    """Returns (model, variables); best → latest fallback (ref ``:18-29``)."""
    import jax

    cfg = get_config()
    path = f"{cfg.paths.models_dir}/{cfg.paths.run_id}_{weights}.pt"
    root, ext = os.path.splitext(path)
    if not (os.path.exists(path) or
            any(True for _ in Path(os.path.dirname(path)).glob(
                f"{os.path.basename(root)}_shard*{ext}"))):
        path = f"{cfg.paths.models_dir}/{cfg.paths.run_id}_latest.pt"
    payload = load_sharded_checkpoint(path)
    model = model_from_config(cfg)
    template = model.variables_template()
    variables = unflatten_like(template, payload["model_state"])
    return model, variables


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Run full evaluation for Beta-VAE")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config file")
    args = parser.parse_args(argv)
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    cfg = get_config()
    train_ds, test_ds = build_datasets()
    model, variables = load_model("best")
    evaluate_full(model, variables, train_ds, test_ds)
    generate_latent_visualizations(model, variables, test_ds)
    traversal_indices = None
    summary_path = Path(cfg.paths.outputs_dir) / "latent_ranking_summary.json"
    if summary_path.exists():
        with open(summary_path, "r") as f:
            summary = json.load(f)
        if "traversal_order_auc" in summary:
            traversal_indices = summary["traversal_order_auc"][
                : min(model.latent_dim, int(cfg.evaluation.traversal_steps))
            ]
    run_traversals(model, variables, test_ds, indices=traversal_indices)


if __name__ == "__main__":
    main()
