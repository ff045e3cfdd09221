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
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import get_config
from ..data.dataset import ArrayDataset, build_datasets
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


def _per_dim_auc(scores_fn, L, y):
    from sklearn.metrics import roc_auc_score

    out = []
    classes = np.unique(y)
    multiclass = len(classes) > 2
    for i in range(L.shape[1]):
        scores = scores_fn(L[:, i])
        try:
            if multiclass:
                aucs = []
                for cls in classes:
                    y_bin = (y == cls).astype(int)
                    if y_bin.sum() == 0 or y_bin.sum() == len(y):
                        continue
                    aucs.append(roc_auc_score(
                        y_bin,
                        scores if scores.var() > 0 else np.zeros_like(scores)))
                auc = np.max(aucs) if aucs else float("nan")
            else:
                auc = roc_auc_score(
                    y, scores if scores.var() > 0 else np.zeros_like(scores))
        except Exception:
            auc = float("nan")
        out.append((i, float(auc)))
    return out


def per_dimension_auc(L, y):
    return _per_dim_auc(lambda s: s, L, y)


def per_dimension_abs_auc(L, y):
    return _per_dim_auc(np.abs, L, y)


def logistic_weights(L, y):
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=2000)
    clf.fit(L, y)
    coef = clf.coef_
    if coef.ndim == 1:
        coef = coef[None, :]
    # binary sklearn logreg gives ONE row (the positive class direction) but
    # two classes; the reference indexes coef[cls_idx] and would crash in
    # binary mode (ref latent_analysis.py:128-131) — expand to ±row so each
    # class gets its direction (deviation: bug fix).
    if len(clf.classes_) == 2 and coef.shape[0] == 1:
        coef = np.concatenate([-coef, coef], axis=0)
    max_abs = np.max(np.abs(coef), axis=0)
    order = np.argsort(max_abs)[::-1]
    return order, coef, clf.classes_


def main(argv=None):
    import argparse

    import pandas as pd

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
    aucs = per_dimension_auc(L, y)
    aucs_abs = per_dimension_abs_auc(L, y)
    kl_mean = K.mean(axis=0)
    mu_var = L.var(axis=0)
    order, coef, classes = logistic_weights(L, y)

    save_table(pd.DataFrame(aucs, columns=["latent_dim", "single_dim_auc"]),
               "per_dimension_auc")

    usage_payload = {
        "latent_dim": np.arange(L.shape[1]),
        "kl_mean": kl_mean,
        "mu_var": mu_var,
        "single_dim_auc": [a[1] for a in aucs],
        "single_dim_auc_abs": [a[1] for a in aucs_abs],
        "logreg_weight_maxabs": np.max(np.abs(coef), axis=0),
    }
    idx_to_class = test_ds.idx_to_class
    for cls_idx, cls_name in enumerate(classes):
        cname = idx_to_class.get(cls_name, f"class{cls_name}")
        usage_payload[f"logreg_weight_{cname}"] = coef[cls_idx]
    usage_df = pd.DataFrame(usage_payload)
    save_table(usage_df.sort_values("kl_mean", ascending=False),
               "latent_usage")

    best = max(aucs, key=lambda t: (t[1] if not np.isnan(t[1]) else -1))
    best_abs = max(aucs_abs, key=lambda t: (t[1] if not np.isnan(t[1]) else -1))

    top_logreg = []
    for d in order[:10]:
        weights_per_class = {
            str(idx_to_class.get(cls, cls)): float(coef_row[d])
            for cls, coef_row in zip(classes, coef)
        }
        top_logreg.append({
            "latent_dim": int(d),
            "abs_weight_max": float(np.max(np.abs(coef[:, d]))),
            "weights": weights_per_class,
            "kl_mean": float(kl_mean[d]),
            "mu_var": float(mu_var[d]),
            "single_dim_auc": float([a[1] for a in aucs][d]),
        })

    traversal_order_auc = [
        int(i) for i, _ in sorted(
            aucs, key=lambda t: (t[1] if not np.isnan(t[1]) else -1),
            reverse=True)
    ]
    traversal_order_kl = [int(i) for i in np.argsort(-kl_mean)]

    corr = np.corrcoef(L, rowvar=False)
    triu_idx = np.triu_indices_from(corr, k=1)
    corr_pairs = [(int(i), int(j), float(c))
                  for i, j, c in zip(triu_idx[0], triu_idx[1], corr[triu_idx])]
    corr_pairs_sorted = sorted(corr_pairs, key=lambda t: abs(t[2]),
                               reverse=True)[:20]
    save_table(pd.DataFrame(corr_pairs, columns=["i", "j", "corr"]),
               "latent_corr_pairs")

    res = {
        "best_auc_dim": int(best[0]),
        "best_auc": float(best[1]),
        "best_abs_auc_dim": int(best_abs[0]),
        "best_abs_auc": float(best_abs[1]),
        "top_logreg_dims": top_logreg,
        "traversal_order_auc": traversal_order_auc,
        "traversal_order_kl": traversal_order_kl,
        "class_balance": {
            "counts": {int(k): int(v)
                       for k, v in zip(*np.unique(y, return_counts=True))}
        },
        "top_corr_pairs": [{"i": i, "j": j, "corr": c}
                           for i, j, c in corr_pairs_sorted],
    }
    save_json(res, "latent_ranking_summary")
    print(json.dumps(res, indent=2))
    return res


if __name__ == "__main__":
    main()
