"""Host-side linear-probe diagnostics on latent means (sklearn).

Capability parity with reference ``src/training/train.py:24-96``
(``compute_probe_metrics``): global logistic-regression probe AUC (binary or
macro-OVR) plus best per-dimension AUC / |correlation| / R² against one-vs-rest
class indicators.  Runs on host CPU over a (N, D) latent matrix pulled from
device once per epoch — deliberately outside the jit boundary.
"""

from __future__ import annotations

import numpy as np


def rank_auc_matrix(scores: np.ndarray, y: np.ndarray):
    """One-vs-rest ROC-AUC of every score column for every class, in one shot.

    Midrank Mann-Whitney formulation: with ties-averaged ranks ``R`` of a
    column, ``AUC = (Σ_pos R − n_pos(n_pos+1)/2) / (n_pos · n_neg)`` —
    exactly ``sklearn.roc_auc_score``'s value (to float64 rounding), for all
    ``(column, class)`` pairs via a single rank pass plus one matmul instead
    of D×C sklearn calls (the reference fits them one at a time,
    ``src/inference/latent_analysis.py:47-89`` /
    ``src/training/train.py:24-96``).

    Returns ``(auc (D, C), classes (C,))``; a class comprising the entire
    sample (only possible when ``len(classes) == 1``) yields a NaN column.
    A constant score column lands on AUC 0.5 for every class, which is also
    what the reference's zeroed-scores fallback produces.
    """
    from scipy.stats import rankdata

    scores = np.asarray(scores, np.float64)
    y = np.asarray(y)
    classes = np.unique(y)
    onehot = y[:, None] == classes[None, :]               # (N, C)
    n_pos = onehot.sum(axis=0).astype(np.float64)         # (C,)
    n = float(len(y))
    ranks = rankdata(scores, axis=0)                      # midranks, per col
    pos_rank_sum = ranks.T @ onehot                       # (D, C)
    with np.errstate(invalid="ignore", divide="ignore"):
        auc = (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (
            n_pos * (n - n_pos))
    return auc, classes


def compute_probe_metrics(latents, labels) -> dict:
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import r2_score, roc_auc_score

    out = {
        "latent_probe_auc": float("nan"),
        "best_dim_auc": float("nan"),
        "best_dim_corr": float("nan"),
        "best_dim_r2": float("nan"),
    }
    if latents is None or len(latents) < 2:
        return out
    lat = np.asarray(latents)
    y = np.asarray(labels)
    classes = np.unique(y)
    if len(classes) < 2:
        return out
    try:
        clf = LogisticRegression(max_iter=2000)
        clf.fit(lat, y)
        prob = clf.predict_proba(lat)
        if len(classes) == 2:
            out["latent_probe_auc"] = float(roc_auc_score(y, prob[:, 1]))
        else:
            out["latent_probe_auc"] = float(
                roc_auc_score(y, prob, multi_class="ovr", average="macro")
            )
    except Exception:
        pass

    # Per-dimension diagnostics, fully vectorized (same math as the
    # per-dim sklearn loop the reference runs — 64 dims × 4 classes ×
    # {roc_auc_score, corrcoef, r2_score} cost ~1 s/epoch on a 1-core
    # host; the closed forms below are ~20× faster and agree to 1e-10,
    # parity-tested against the loop in test_probe_alignment.py):
    #   AUC      = Mann-Whitney U with midranks (ties-averaged ranks),
    #   corr     = Pearson via centered moments,
    #   R²       = 1 − SS_res/SS_tot of the raw dim as a predictor.
    live = ~np.all(np.isclose(lat, lat[:1, :]), axis=0)      # per-dim gate
    onehot = (y[:, None] == classes[None, :])                # (N, C)
    n_pos = onehot.sum(axis=0).astype(np.float64)            # (C,)
    n = float(len(y))
    valid_cls = (n_pos > 0) & (n_pos < n)

    best_auc, best_corr, best_r2 = [], [], []
    if live.any() and valid_cls.any():
        sub = lat[:, live].astype(np.float64)                # (N, D')
        # U-statistic AUC for every (dim, class) pair at once
        auc, _ = rank_auc_matrix(sub, y)                     # (D', C)
        if len(classes) == 2:
            # binary mode scores the raw dim against y directly
            # (roc_auc_score(y, z) == one-vs-rest AUC of the second class)
            a = auc[:, 1]
            best_auc = a[np.isfinite(a)]
        else:
            best_auc = np.nanmax(auc[:, valid_cls], axis=1)

        zc = sub - sub.mean(axis=0)                          # centered dims
        bc = onehot - n_pos / n                              # centered labels
        cov = zc.T @ bc / n                                  # (D', C)
        sz = sub.std(axis=0)
        sb = onehot.std(axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = np.abs(cov / (sz[:, None] * sb[None, :]))
        corr = corr[:, valid_cls]
        best_corr = corr[np.isfinite(corr)]

        # r2_score(y_bin, z): 1 - Σ(y_bin - z)² / Σ(y_bin - mean(y_bin))²
        # Expanded: Σz² - 2·Σ(z·y_bin) + Σy_bin² with y_bin ∈ {0,1}, so the
        # cross term is a (D', C) matmul and Σy_bin² = n_pos — O(D'·C)
        # memory instead of an (N, D', C) squared-difference temporary.
        ss_tot = (sb**2) * n                                 # (C,)
        ss_res = ((sub**2).sum(axis=0)[:, None]
                  - 2.0 * (sub.T @ onehot.astype(np.float64))
                  + n_pos[None, :])                          # (D', C)
        with np.errstate(invalid="ignore", divide="ignore"):
            r2 = 1.0 - ss_res / ss_tot[None, :]
        r2 = r2[:, valid_cls]
        best_r2 = r2[np.isfinite(r2)]

    if len(best_auc):
        out["best_dim_auc"] = float(np.max(best_auc))
    if len(best_corr):
        out["best_dim_corr"] = float(np.max(best_corr))
    if len(best_r2):
        out["best_dim_r2"] = float(np.max(best_r2))
    return out
