"""Evaluation driver: checkpoint → metrics → visualizations → traversals.

Capability parity with reference ``src/evaluation/run_evaluation.py:18-61``.
The driver sequence is the contract: resolve the ``best`` checkpoint
(falling back to ``latest``, shard-aware), then ``evaluate_full`` →
``generate_latent_visualizations`` → ``run_traversals``.  When a prior
``latent_analysis`` run left ``latent_ranking_summary.json`` behind, its
``traversal_order_auc`` ranking picks the traversal dims, sliced to
``min(latent_dim, evaluation.traversal_steps)`` — the reference's naming
collision where ``traversal_steps`` doubles as a dim count, deliberately
kept (SURVEY.md §8).
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


def _checkpoint_exists(base: str) -> bool:
    """True if the base file OR any of its shard files is on disk."""
    if os.path.exists(base):
        return True
    root, ext = os.path.splitext(base)
    shard_glob = f"{os.path.basename(root)}_shard*{ext}"
    return any(Path(os.path.dirname(base)).glob(shard_glob))


def load_model(weights: str = "best"):
    """Returns (model, variables); best → latest fallback (ref ``:18-29``)."""
    cfg = get_config()

    def tag_path(tag):
        return os.path.join(cfg.paths.models_dir,
                            f"{cfg.paths.run_id}_{tag}.pt")

    path = tag_path(weights)
    if not _checkpoint_exists(path):
        path = tag_path("latest")
    payload = load_sharded_checkpoint(path)
    model = model_from_config(cfg)
    variables = unflatten_like(model.variables_template(),
                               payload["model_state"])
    return model, variables


def _ranked_traversal_dims(cfg, latent_dim: int):
    """Dim order from ``latent_ranking_summary.json``, if the analysis ran."""
    summary_path = Path(cfg.paths.outputs_dir) / "latent_ranking_summary.json"
    if not summary_path.exists():
        return None
    ranking = json.loads(summary_path.read_text()).get("traversal_order_auc")
    if ranking is None:
        return None
    return ranking[: min(latent_dim, int(cfg.evaluation.traversal_steps))]


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
    run_traversals(model, variables, test_ds,
                   indices=_ranked_traversal_dims(cfg, model.latent_dim))


if __name__ == "__main__":
    main()
