"""Host-side linear-probe diagnostics on latent means (sklearn).

Capability parity with reference ``src/training/train.py:24-96``
(``compute_probe_metrics``): global logistic-regression probe AUC (binary or
macro-OVR) plus best per-dimension AUC / |correlation| / R² against one-vs-rest
class indicators.  Runs on host CPU over a (N, D) latent matrix pulled from
device once per epoch — deliberately outside the jit boundary.
"""

from __future__ import annotations

import numpy as np


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

    best_auc, best_corr, best_r2 = [], [], []
    for k in range(lat.shape[1]):
        z = lat[:, k]
        if np.allclose(z, z[0]):
            continue
        if len(classes) == 2:
            try:
                best_auc.append(roc_auc_score(y, z))
            except Exception:
                pass
        else:
            per_class_auc = []
            for cls in classes:
                y_bin = (y == cls).astype(int)
                if y_bin.sum() == 0 or y_bin.sum() == len(y):
                    continue
                try:
                    per_class_auc.append(roc_auc_score(y_bin, z))
                except Exception:
                    continue
            if per_class_auc:
                best_auc.append(np.max(per_class_auc))

        for cls in classes:
            y_bin = (y == cls).astype(int)
            if np.std(y_bin) == 0:
                continue
            if np.std(z) > 0:
                c = np.corrcoef(z, y_bin)[0, 1]
                if not np.isnan(c):
                    best_corr.append(abs(c))
            try:
                best_r2.append(r2_score(y_bin, z))
            except Exception:
                pass

    if best_auc:
        out["best_dim_auc"] = float(np.max(best_auc))
    if best_corr:
        out["best_dim_corr"] = float(np.max(best_corr))
    if best_r2:
        out["best_dim_r2"] = float(np.max(best_r2))
    return out
