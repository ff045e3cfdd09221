"""Full evaluation: recon metrics, probes, traversal validation, figures.

Capability parity with reference ``src/evaluation/recon_metrics.py``:

- :func:`gather_reconstruction_metrics` — per-image MSE/PSNR/SSIM with a
  *stochastic* forward (ref ``:58-103``; the sampling forward at ``:71`` is
  reference behavior, kept), per-class aggregation keyed by class name,
- :func:`extract_latents` — μ-only latents limited to
  ``evaluation.num_umap_samples`` (ref ``:105-124``),
- :func:`logistic_probe` — seeded shuffle split at
  ``evaluation.probe_train_split``, binary AUC/F1/confusion or multiclass
  macro-F1/macro-AUC-ovr/per-class-F1 (ref ``:126-169``),
- :func:`compute_probe_directions` / :func:`traversal_probe_validation` —
  L2-normalized logreg rows, probe-probability sweeps →
  ``traversal_probe_validation.csv`` (ref ``:172-233``),
- logreg weight heatmap + 4-panel original/recon/±span figures
  (ref ``:236-308``), silhouette separability (ref ``:310-324``),
- :func:`evaluate_full` — orchestrates everything, writes
  ``metrics_summary.csv`` + ``confusion_matrix.csv``, logs phase="eval"
  (ref ``:326-375``).

TPU-first: image metrics run batched on device (``ops.metrics``) instead of
the reference's per-image Python loop; sklearn/matplotlib stay host-side.
"""

from __future__ import annotations

import numpy as np

from ..config import get, get_config
from ..data.dataset import ArrayDataset
from ..io.artifacts import save_figure, save_table
from ..logging_utils import log_metrics
from ..ops.metrics import batched_image_metrics


def _batches(ds: ArrayDataset, batch_size: int):
    """Fixed-shape batches: the ragged tail is padded by repetition and the
    yielded ``count`` marks how many leading samples are real — one XLA
    compile per program instead of two."""
    n = len(ds)
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        count = e - s
        x = ds.images[s:e].astype(np.float32) / 255.0
        if count < batch_size:
            x = np.concatenate(
                [x, np.repeat(x[-1:], batch_size - count, axis=0)], axis=0)
        yield (x, ds.labels[s:e], ds.class_names[s:e], ds.paths[s:e], count)


def gather_reconstruction_metrics(model, variables, test_ds: ArrayDataset,
                                  key=None) -> dict:
    import jax

    cfg = get_config()
    if key is None:
        key = jax.random.PRNGKey(int(cfg.data.seed))
    bs = int(cfg.training.batch_size)
    all_m, all_p, all_s = [], [], []
    per_class: dict = {}
    for bi, (x, labels, names, _, count) in enumerate(_batches(test_ds, bs)):
        key, sub = jax.random.split(key)
        # deterministic=None → model's own deterministic_overfit flag decides,
        # like the reference's bare model.forward(x) (recon_metrics.py:71)
        recon, mu, logvar, z = model.forward(variables, x, key=sub,
                                             deterministic=None)
        m = batched_image_metrics(recon, x)
        mses = np.asarray(m["mse"])[:count]
        psnrs = np.asarray(m["psnr"])[:count]
        ssims = np.asarray(m["ssim"])[:count]
        all_m.extend(mses.tolist())
        all_p.extend(psnrs.tolist())
        all_s.extend(ssims.tolist())
        for i in range(count):
            cname = names[i] or test_ds.idx_to_class.get(int(labels[i]),
                                                         str(int(labels[i])))
            bucket = per_class.setdefault(cname,
                                          {"mse": [], "psnr": [], "ssim": []})
            bucket["mse"].append(float(mses[i]))
            bucket["psnr"].append(float(psnrs[i]))
            bucket["ssim"].append(float(ssims[i]))
    d = {
        "mse_mean": float(np.mean(all_m)), "mse_std": float(np.std(all_m)),
        "psnr_mean": float(np.mean(all_p)), "psnr_std": float(np.std(all_p)),
        "ssim_mean": float(np.mean(all_s)), "ssim_std": float(np.std(all_s)),
    }
    for cname, vals in per_class.items():
        d[f"per_class/{cname}/mse_mean"] = float(np.mean(vals["mse"]))
        d[f"per_class/{cname}/psnr_mean"] = float(np.mean(vals["psnr"]))
        d[f"per_class/{cname}/ssim_mean"] = float(np.mean(vals["ssim"]))
        d[f"per_class/{cname}/count"] = int(len(vals["mse"]))
    return d


def extract_latents(model, variables, ds: ArrayDataset, limit=None):
    cfg = get_config()
    bs = int(cfg.training.batch_size)
    latents, labels, paths = [], [], []
    for x, lab, _, pth, count in _batches(ds, bs):
        mu, logvar = model.encode(variables, x)
        latents.append(np.asarray(mu)[:count])
        labels.extend(lab.tolist())
        paths.extend(pth)
        if limit and len(labels) >= limit:
            break
    L = np.concatenate(latents, axis=0)
    if limit:
        L = L[:limit]
        labels = labels[:limit]
        paths = paths[:limit]
    return L, np.asarray(labels), paths


def logistic_probe(latents, labels, train_fraction=0.3, seed=42, binary=True,
                   return_model=False):
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import confusion_matrix, f1_score, roc_auc_score

    n = latents.shape[0]
    idx = np.arange(n)
    rng = np.random.RandomState(seed)
    rng.shuffle(idx)
    split = int(train_fraction * n)
    train_idx, test_idx = idx[:split], idx[split:]
    y_train, y_test = labels[train_idx], labels[test_idx]
    clf = LogisticRegression(max_iter=2000)
    clf.fit(latents[train_idx], y_train)
    probs = clf.predict_proba(latents[test_idx])
    preds = (np.argmax(probs, axis=1) if probs.shape[1] > 1
             else (probs[:, 0] >= 0.5).astype(int))
    classes = np.unique(labels)
    if binary:
        auc = roc_auc_score(y_test, probs[:, 1])
        f1 = f1_score(y_test, (probs[:, 1] >= 0.5).astype(int))
        cm = confusion_matrix(y_test, (probs[:, 1] >= 0.5).astype(int),
                              labels=classes)
        res = {"probe_auc": float(auc), "probe_f1": float(f1),
               "confusion_matrix": cm.tolist(), "classes": classes.tolist()}
    else:
        macro_f1 = f1_score(y_test, preds, average="macro")
        try:
            macro_auc = roc_auc_score(y_test, probs, multi_class="ovr",
                                      average="macro")
        except Exception:
            macro_auc = float("nan")
        cm = confusion_matrix(y_test, preds, labels=classes)
        per_class_f1 = f1_score(y_test, preds, average=None, labels=classes)
        res = {"probe_macro_f1": float(macro_f1),
               "probe_macro_auc": float(macro_auc),
               "confusion_matrix": cm.tolist(), "classes": classes.tolist(),
               "per_class_f1": per_class_f1.tolist()}
    if return_model:
        return res, clf, classes
    return res


def compute_probe_directions(probe_model, classes, class_map=None) -> dict:
    if probe_model is None or not hasattr(probe_model, "coef_"):
        return {}
    coef = probe_model.coef_
    if coef.ndim == 1:
        coef = coef[None, :]
    idx_to_class = {v: k for k, v in class_map.items()} if class_map else {}
    dirs = {}
    for cls_idx, row in enumerate(coef):
        cname = idx_to_class.get(classes[cls_idx], str(classes[cls_idx]))
        norm = np.linalg.norm(row)
        if norm > 0:
            dirs[cname] = (row / norm).astype(np.float32)
    return dirs


def traversal_probe_validation(probe_model, classes, latents, labels,
                               class_dirs, steps=7, span=3.0, class_map=None):
    if probe_model is None or not class_dirs:
        return {}, None
    import pandas as pd

    vals = np.linspace(-span, span, steps)
    idx_to_class = {v: k for k, v in class_map.items()} if class_map else {}
    summary_rows = []
    for cls_id in classes:
        cname = idx_to_class.get(cls_id, str(cls_id))
        dir_vec = class_dirs.get(cname)
        if dir_vec is None:
            continue
        mask = labels == cls_id
        base = latents[mask].mean(axis=0) if mask.any() else latents.mean(axis=0)
        samples = np.array([base + v * dir_vec for v in vals])
        try:
            probs = probe_model.predict_proba(samples)
        except Exception:
            continue
        class_pos = np.where(classes == cls_id)[0]
        if class_pos.size == 0:
            continue
        cls_probs = probs[:, class_pos[0]]
        delta = float(cls_probs[-1] - cls_probs[0])
        try:
            corr = float(np.corrcoef(vals, cls_probs)[0, 1])
        except Exception:
            corr = float("nan")
        summary_rows.append({"class": cname, "start_prob": float(cls_probs[0]),
                             "end_prob": float(cls_probs[-1]), "delta": delta,
                             "corr": corr})
    if not summary_rows:
        return {}, None
    df = pd.DataFrame(summary_rows)
    save_table(df, "traversal_probe_validation")
    metrics = {}
    for row in summary_rows:
        metrics[f"traversal_probe/{row['class']}/delta"] = row["delta"]
        metrics[f"traversal_probe/{row['class']}/corr"] = row["corr"]
    return metrics, df


def save_logreg_weight_heatmap(probe_model, classes, class_map=None,
                               name="latent_logreg_weights"):
    import matplotlib.pyplot as plt

    if probe_model is None or not hasattr(probe_model, "coef_"):
        return None
    coef = probe_model.coef_
    if coef.ndim == 1:
        coef = coef[None, :]
    idx_to_class = {v: k for k, v in class_map.items()} if class_map else {}
    class_labels = [idx_to_class.get(int(c), str(int(c))) for c in classes]
    vmax = np.max(np.abs(coef))
    vmax = float(vmax) if vmax > 0 else 1.0
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(coef, aspect="auto", cmap="coolwarm", vmin=-vmax, vmax=vmax)
    xticks = np.arange(coef.shape[1])
    step = max(1, coef.shape[1] // 16)
    ax.set_xticks(xticks[::step])
    ax.set_xticklabels([str(i) for i in xticks[::step]], rotation=90)
    ax.set_yticks(np.arange(len(class_labels)))
    ax.set_yticklabels(class_labels)
    ax.set_xlabel("latent dimension")
    ax.set_ylabel("class")
    ax.set_title("Logistic regression weights")
    fig.colorbar(im, ax=ax, label="weight")
    path = save_figure(fig, name)
    plt.close(fig)
    return path


def save_recon_traversal_comparison(model, variables, test_ds: ArrayDataset,
                                    class_dirs=None, span=3.0, steps=7):
    import jax
    import matplotlib.pyplot as plt

    cfg = get_config()
    class_dirs = class_dirs or {}
    if len(test_ds) == 0:
        return None
    x = test_ds.images[:1].astype(np.float32) / 255.0
    label = int(test_ds.labels[0])
    idx_to_class = test_ds.idx_to_class
    cname = idx_to_class.get(label, str(label))
    direction = None
    if cname in class_dirs:
        direction = class_dirs[cname]
    elif class_dirs:
        direction = next(iter(class_dirs.values()))
    if direction is None:
        direction = np.zeros((model.latent_dim,), np.float32)
        direction[0] = 1.0
    direction = np.asarray(direction, np.float32)[None, :]
    span = span if span is not None else get(cfg.inference, "edit_span", 3.0)
    key = jax.random.PRNGKey(int(cfg.data.seed))
    recon, mu, logvar, _ = model.forward(variables, x, key=key,
                                         deterministic=None)
    base = np.asarray(mu)
    end_neg = model.decode(variables, base - span * direction)
    end_pos = model.decode(variables, base + span * direction)
    imgs = [x, np.asarray(recon), np.asarray(end_neg), np.asarray(end_pos)]
    titles = ["original", "reconstruction", f"traverse -{span}",
              f"traverse +{span}"]
    fig, axes = plt.subplots(1, len(imgs), figsize=(3 * len(imgs), 3))
    for ax, img, title in zip(axes, imgs, titles):
        arr = np.asarray(img)[0]
        if arr.shape[-1] == 1:
            ax.imshow(arr[..., 0], cmap="gray", vmin=0, vmax=1)
        else:
            ax.imshow(arr, vmin=0, vmax=1)
        ax.axis("off")
        ax.set_title(title)
    path = save_figure(fig, "recon_vs_traversal")
    plt.close(fig)
    return path


def latent_separability_scores(latents, labels, binary=True) -> dict:
    from sklearn.metrics import silhouette_score

    try:
        return {"silhouette": float(silhouette_score(latents, labels))}
    except Exception:
        return {"silhouette": float("nan")}


def evaluate_full(model, variables, train_ds: ArrayDataset,
                  test_ds: ArrayDataset) -> dict:
    """Full eval driver (ref ``recon_metrics.py:326-375``)."""
    import pandas as pd

    cfg = get_config()
    class_map = test_ds.class_to_idx
    recon_metrics = gather_reconstruction_metrics(model, variables, test_ds)
    lat_lim = int(cfg.evaluation.num_umap_samples)
    latents, labels, paths = extract_latents(model, variables, test_ds,
                                             limit=lat_lim)
    binary = cfg.data.class_mode == "binary"
    probe, probe_model, probe_classes = logistic_probe(
        latents, labels, train_fraction=float(cfg.evaluation.probe_train_split),
        binary=binary, return_model=True,
    )
    class_dirs = compute_probe_directions(probe_model, probe_classes, class_map)
    traversal_metrics, _ = traversal_probe_validation(
        probe_model, probe_classes, latents, labels, class_dirs,
        steps=int(cfg.evaluation.traversal_steps),
        span=float(get(cfg.inference, "edit_span", 3.0)),
        class_map=class_map,
    )
    sep = latent_separability_scores(latents, labels, binary=binary)
    combined = {}
    combined.update(recon_metrics)
    combined.update({k: v for k, v in probe.items()})
    combined.update(traversal_metrics)
    combined.update(sep)
    save_table(
        pd.DataFrame([{"metric": k, "value": v} for k, v in combined.items()]),
        "metrics_summary",
    )
    if "confusion_matrix" in probe and "classes" in probe:
        cm = pd.DataFrame(
            probe["confusion_matrix"],
            columns=[f"pred_{c}" for c in probe["classes"]],
            index=[f"true_{c}" for c in probe["classes"]],
        )
        save_table(cm.reset_index(), "confusion_matrix")
    save_logreg_weight_heatmap(probe_model, probe_classes, class_map)
    save_recon_traversal_comparison(
        model, variables, test_ds, class_dirs=class_dirs,
        span=float(get(cfg.inference, "edit_span", 3.0)),
        steps=int(cfg.evaluation.traversal_steps),
    )
    log_metrics(combined, step=None, phase="eval")
    return combined
