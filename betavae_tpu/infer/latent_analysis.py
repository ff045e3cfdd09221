"""Latent-dimension analysis CLI: per-dim AUCs, KL usage, logreg ranking.

Capability parity with reference ``src/inference/latent_analysis.py:40-179``:

- per-dim AUC on μ and |μ| (max-over-class OVR for multiclass, zeroed scores
  for constant dims — ref ``:47-89``),
- logistic-regression weights + dim ordering by max-|weight| (ref ``:91-99``),
- per-dim KL mean ``0.5(μ²+σ²−logσ²−1)`` and μ-variance (ref ``:40,110-111``),
- latent correlation pairs (ref ``:155-162``),
- artifacts: ``per_dimension_auc.csv``, ``latent_usage.csv`` (sorted by
  kl_mean desc, incl. per-class ``logreg_weight_*`` columns consumed by
  ``eval/traversal.py``), ``latent_corr_pairs.csv``, and
  ``latent_ranking_summary.json`` with ``traversal_order_auc/kl``, top-10
  logreg dims, class balance, top-20 |corr| pairs (ref ``:113-179``).

TPU-first notes: every encode for the split is dispatched before any
device→host pull (one relay round-trip amortized over the whole split), and
the D×C-per-variant sklearn AUC sweep of the reference is a single midrank
Mann-Whitney matrix product (``eval.probes.rank_auc_matrix``, shared with
the per-epoch training probes) — same values to float64 rounding.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import get_config
from ..data.dataset import ArrayDataset, build_datasets
from ..eval.probes import rank_auc_matrix
from ..eval.run_evaluation import load_model
from ..io.artifacts import save_json, save_table


def extract_latents_with_kl(model, variables, ds: ArrayDataset):
    cfg = get_config()
    bs = int(cfg.training.batch_size)
    # dispatch all encodes first, materialize after (relay RTT per sync)
    pending = []
    for s in range(0, len(ds), bs):
        e = min(s + bs, len(ds))
        x = ds.images[s:e].astype(np.float32) / 255.0
        if e - s < bs:  # pad the ragged tail: one compile per program
            x = np.concatenate(
                [x, np.repeat(x[-1:], bs - (e - s), axis=0)], axis=0)
        pending.append((*model.encode(variables, x), e - s))
    lat, kls = [], []
    for mu, logvar, n in pending:
        mu = np.asarray(mu)[:n]
        logvar = np.asarray(logvar)[:n]
        lat.append(mu)
        kls.append(0.5 * (mu**2 + np.exp(logvar) - logvar - 1.0))
    L = np.concatenate(lat, axis=0)
    K = np.concatenate(kls, axis=0)
    return L, K, np.asarray(ds.labels)


def _ovr_auc_per_dim(scores_mat: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Per-column one-vs-rest AUC summary, reference semantics.

    Multiclass: the max over per-class OVR AUCs; binary: the AUC of the
    larger label (``roc_auc_score(y, s)``'s convention); degenerate label
    vectors (a single class) give NaN, matching the reference's
    try/except-NaN path (``latent_analysis.py:53-66``).  Constant columns
    land on 0.5 like the reference's zeroed-scores fallback.  One deliberate
    deviation: when exactly two classes are present but labeled outside
    {0, 1} (a two-class test split under a multiclass config), sklearn
    refuses to pick a positive label and the reference's except-clause
    turns EVERY dim's AUC into NaN — here the Mann-Whitney value for the
    larger label is reported instead.
    """
    auc, classes = rank_auc_matrix(scores_mat, y)
    if len(classes) < 2:
        return np.full(scores_mat.shape[1], np.nan)
    if len(classes) == 2:
        return auc[:, 1]
    return np.max(auc, axis=1)  # every present class is valid when C >= 2


def per_dimension_auc(L, y):
    return [(d, float(a)) for d, a in enumerate(_ovr_auc_per_dim(L, y))]


def per_dimension_abs_auc(L, y):
    return [(d, float(a))
            for d, a in enumerate(_ovr_auc_per_dim(np.abs(L), y))]


def logistic_weights(L, y):
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=2000)
    clf.fit(L, y)
    coef = np.atleast_2d(clf.coef_)
    # binary sklearn logreg gives ONE row (the positive class direction) but
    # two classes; the reference indexes coef[cls_idx] and would crash in
    # binary mode (ref latent_analysis.py:128-131) — expand to ±row so each
    # class gets its direction (deviation: bug fix).
    if len(clf.classes_) == 2 and coef.shape[0] == 1:
        coef = np.concatenate([-coef, coef], axis=0)
    order = np.argsort(np.max(np.abs(coef), axis=0))[::-1]
    return order, coef, clf.classes_


def _nan_last(values: np.ndarray) -> np.ndarray:
    """Rank order, descending, NaNs pushed to the end."""
    keyed = np.where(np.isnan(values), -np.inf, values)
    return np.argsort(-keyed, kind="stable")


def build_report(L: np.ndarray, K: np.ndarray, y: np.ndarray,
                 idx_to_class: dict) -> dict:
    """Compute every artifact table + the ranking summary (ref ``:108-179``).

    Writes ``per_dimension_auc.csv``, ``latent_usage.csv`` and
    ``latent_corr_pairs.csv`` through ``save_table`` and returns the
    ``latent_ranking_summary`` payload.
    """
    import pandas as pd

    n_dims = L.shape[1]
    auc_mu = _ovr_auc_per_dim(L, y)
    auc_abs = _ovr_auc_per_dim(np.abs(L), y)
    kl_mean = K.mean(axis=0)
    mu_var = L.var(axis=0)
    order, coef, classes = logistic_weights(L, y)
    class_name = {cls: str(idx_to_class.get(cls, f"class{cls}"))
                  for cls in classes}

    save_table(
        pd.DataFrame({"latent_dim": np.arange(n_dims),
                      "single_dim_auc": auc_mu}),
        "per_dimension_auc")

    usage = pd.DataFrame({
        "latent_dim": np.arange(n_dims),
        "kl_mean": kl_mean,
        "mu_var": mu_var,
        "single_dim_auc": auc_mu,
        "single_dim_auc_abs": auc_abs,
        "logreg_weight_maxabs": np.max(np.abs(coef), axis=0),
        # per-class weight columns: eval/traversal.py reads these back as
        # class directions (artifact-dataflow contract, SURVEY.md §1)
        **{f"logreg_weight_{class_name[cls]}": coef[row]
           for row, cls in enumerate(classes)},
    })
    save_table(usage.sort_values("kl_mean", ascending=False), "latent_usage")

    # all-pairs latent correlation; the CSV keeps every pair, the summary
    # only the 20 strongest
    iu, ju = np.triu_indices(n_dims, k=1)
    corr_full = np.corrcoef(L, rowvar=False)[iu, ju]
    save_table(pd.DataFrame({"i": iu, "j": ju, "corr": corr_full}),
               "latent_corr_pairs")
    strongest = np.argsort(-np.abs(corr_full), kind="stable")[:20]

    auc_rank = _nan_last(auc_mu)
    abs_rank = _nan_last(auc_abs)
    return {
        "best_auc_dim": int(auc_rank[0]),
        "best_auc": float(auc_mu[auc_rank[0]]),
        "best_abs_auc_dim": int(abs_rank[0]),
        "best_abs_auc": float(auc_abs[abs_rank[0]]),
        "top_logreg_dims": [{
            "latent_dim": int(d),
            "abs_weight_max": float(np.max(np.abs(coef[:, d]))),
            "weights": {class_name[cls]: float(coef[row, d])
                        for row, cls in enumerate(classes)},
            "kl_mean": float(kl_mean[d]),
            "mu_var": float(mu_var[d]),
            "single_dim_auc": float(auc_mu[d]),
        } for d in order[:10]],
        "traversal_order_auc": [int(d) for d in auc_rank],
        "traversal_order_kl": [int(d) for d in np.argsort(-kl_mean)],
        "class_balance": {
            "counts": {int(k): int(v)
                       for k, v in zip(*np.unique(y, return_counts=True))}
        },
        "top_corr_pairs": [{"i": int(iu[p]), "j": int(ju[p]),
                            "corr": float(corr_full[p])} for p in strongest],
    }


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Latent dimension analysis")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--weights", type=str, default="best")
    args = parser.parse_args(argv)
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    get_config()
    _, test_ds = build_datasets()
    model, variables = load_model(args.weights)
    L, K, y = extract_latents_with_kl(model, variables, test_ds)
    report = build_report(L, K, y, test_ds.idx_to_class)
    save_json(report, "latent_ranking_summary")
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
