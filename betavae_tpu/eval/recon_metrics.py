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
    # Dispatch ALL batches first, materialize after: converting per batch
    # would sync each dispatch through the relay (~30 ms RTT each); deferred
    # device->host pulls let the forward passes pipeline back-to-back.
    pending = []
    for x, labels, names, _, count in _batches(test_ds, bs):
        key, sub = jax.random.split(key)
        # deterministic=None → model's own deterministic_overfit flag decides,
        # like the reference's bare model.forward(x) (recon_metrics.py:71)
        recon, mu, logvar, z = model.forward(variables, x, key=sub,
                                             deterministic=None)
        pending.append((batched_image_metrics(recon, x), labels, names, count))

    all_m, all_p, all_s = [], [], []
    per_class: dict = {}
    for m, labels, names, count in pending:
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
    pending, labels, paths = [], [], []
    for x, lab, _, pth, count in _batches(ds, bs):
        mu, logvar = model.encode(variables, x)
        pending.append((mu, count))   # materialize after the dispatch loop
        labels.extend(lab.tolist())
        paths.extend(pth)
        if limit and len(labels) >= limit:
            break
    L = np.concatenate([np.asarray(mu)[:count] for mu, count in pending],
                       axis=0)
    if limit:
        L = L[:limit]
        labels = labels[:limit]
        paths = paths[:limit]
    return L, np.asarray(labels), paths


def _idx_to_name(class_map) -> dict:
    """Invert a ``{name: idx}`` map; empty map → empty dict."""
    return {v: k for k, v in class_map.items()} if class_map else {}


def _held_out_split(n: int, train_fraction: float, seed: int):
    """Seeded permutation split; identical stream to the reference's
    ``RandomState(seed).shuffle(arange(n))`` (ref ``recon_metrics.py:127-133``)."""
    order = np.random.RandomState(seed).permutation(n)
    cut = int(train_fraction * n)
    return order[:cut], order[cut:]


def logistic_probe(latents, labels, train_fraction=0.3, seed=42, binary=True,
                   return_model=False):
    """Held-out logistic probe on latent means (ref ``recon_metrics.py:126-169``).

    Binary mode reports AUC/F1 at a 0.5 threshold on P(class 1); multiclass
    reports macro-F1 / macro-OVR-AUC / per-class F1 on argmax predictions.
    """
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import confusion_matrix, f1_score, roc_auc_score

    fit_idx, held_idx = _held_out_split(latents.shape[0], train_fraction, seed)
    y_held = labels[held_idx]
    classes = np.unique(labels)
    clf = LogisticRegression(max_iter=2000)
    try:
        clf.fit(latents[fit_idx], labels[fit_idx])
    except ValueError:
        # degenerate seeded split: the probe's train set holds one class
        # (or is empty) — report NaN metrics rather than crash (the
        # reference propagates sklearn's ValueError here)
        nan = float("nan")
        res = ({"probe_auc": nan, "probe_f1": nan} if binary else
               {"probe_macro_f1": nan, "probe_macro_auc": nan})
        only = int(labels[fit_idx][0]) if len(fit_idx) else int(classes[0])
        hard = np.full(len(y_held), only, dtype=labels.dtype)
        res["confusion_matrix"] = confusion_matrix(
            y_held, hard, labels=classes).tolist()
        res["classes"] = classes.tolist()
        if not binary:
            res["per_class_f1"] = [nan] * len(classes)
        return (res, None, classes) if return_model else res
    probs = clf.predict_proba(latents[held_idx])

    res = {}
    if binary:
        hard = (probs[:, 1] >= 0.5).astype(int)
        res["probe_auc"] = float(roc_auc_score(y_held, probs[:, 1]))
        res["probe_f1"] = float(f1_score(y_held, hard))
    else:
        hard = (np.argmax(probs, axis=1) if probs.shape[1] > 1
                else (probs[:, 0] >= 0.5).astype(int))
        res["probe_macro_f1"] = float(f1_score(y_held, hard, average="macro"))
        try:
            res["probe_macro_auc"] = float(roc_auc_score(
                y_held, probs, multi_class="ovr", average="macro"))
        except Exception:
            res["probe_macro_auc"] = float("nan")
    res["confusion_matrix"] = confusion_matrix(y_held, hard,
                                               labels=classes).tolist()
    res["classes"] = classes.tolist()
    if not binary:
        res["per_class_f1"] = f1_score(y_held, hard, average=None,
                                       labels=classes).tolist()
    return (res, clf, classes) if return_model else res


def compute_probe_directions(probe_model, classes, class_map=None) -> dict:
    """Unit-norm logreg coefficient rows keyed by class name
    (ref ``recon_metrics.py:172-185``); zero rows are dropped.

    Rows align with ``probe_model.classes_`` (the classes present in the
    probe's train split), not ``np.unique(all labels)`` — the reference zips
    against the latter and silently misassigns directions whenever a class is
    missing from the split (deviation, DESIGN.md §4 #17).
    """
    coef = getattr(probe_model, "coef_", None)
    if coef is None:
        return {}
    coef = np.atleast_2d(coef)
    fitted = getattr(probe_model, "classes_", classes)
    names = _idx_to_name(class_map)
    norms = np.linalg.norm(coef, axis=1)
    return {
        names.get(cls, str(cls)): (row / n).astype(np.float32)
        for cls, row, n in zip(fitted, coef, norms) if n > 0
    }


def traversal_probe_validation(probe_model, classes, latents, labels,
                               class_dirs, steps=7, span=3.0, class_map=None):
    """Probe-probability sweeps along each class direction
    (ref ``recon_metrics.py:188-233``) → ``traversal_probe_validation.csv``.

    Redesign: all class sweeps are stacked into one ``predict_proba`` call
    (probe inference is row-independent) instead of one call per class.
    """
    if probe_model is None or not class_dirs:
        return {}, None
    import pandas as pd

    sweep = np.linspace(-span, span, steps)
    names = _idx_to_name(class_map)
    grand_mean = latents.mean(axis=0)

    # Assemble (class, anchor, direction) work items, then batch the sweep.
    # Iterate probe_model.classes_ so `pos` indexes the right predict_proba
    # column even when a class is absent from the probe's train split
    # (deviation #17 — the reference indexes np.unique(labels) positions).
    fitted = getattr(probe_model, "classes_", classes)
    work = []
    for pos, cls_id in enumerate(fitted):
        cname = names.get(cls_id, str(cls_id))
        direction = class_dirs.get(cname)
        if direction is None:
            continue
        members = latents[labels == cls_id]
        anchor = members.mean(axis=0) if members.size else grand_mean
        work.append((pos, cname, anchor, np.asarray(direction)))
    if not work:
        return {}, None

    grid = np.concatenate(
        [a[None, :] + sweep[:, None] * d[None, :] for _, _, a, d in work])
    try:
        all_probs = probe_model.predict_proba(grid)
    except Exception:
        return {}, None

    rows = []
    for i, (pos, cname, _, _) in enumerate(work):
        curve = all_probs[i * steps:(i + 1) * steps, pos]
        corr = float(np.corrcoef(sweep, curve)[0, 1])
        rows.append({
            "class": cname,
            "start_prob": float(curve[0]),
            "end_prob": float(curve[-1]),
            "delta": float(curve[-1] - curve[0]),
            "corr": corr,
        })
    df = pd.DataFrame(rows)
    save_table(df, "traversal_probe_validation")
    metrics = {}
    for r in rows:
        metrics[f"traversal_probe/{r['class']}/delta"] = r["delta"]
        metrics[f"traversal_probe/{r['class']}/corr"] = r["corr"]
    return metrics, df


def save_logreg_weight_heatmap(probe_model, classes, class_map=None,
                               name="latent_logreg_weights"):
    """Diverging heatmap of probe weights, classes × latent dims
    (same artifact role as ref ``recon_metrics.py:236-260``; layout is ours)."""
    import matplotlib.pyplot as plt

    coef = getattr(probe_model, "coef_", None)
    if coef is None:
        return None
    coef = np.atleast_2d(coef)
    n_cls, n_dim = coef.shape
    names = _idx_to_name(class_map)
    limit = float(np.abs(coef).max()) or 1.0

    fig, ax = plt.subplots(figsize=(11, 1.2 + 0.8 * n_cls))
    im = ax.pcolormesh(coef, cmap="RdBu_r", vmin=-limit, vmax=limit)
    tick_every = max(1, int(np.ceil(n_dim / 32)))
    ax.set_xticks(np.arange(0, n_dim, tick_every) + 0.5,
                  labels=np.arange(0, n_dim, tick_every))
    # row labels from probe_model.classes_ — coef_ rows follow the classes
    # the probe actually saw, which can be fewer than np.unique(labels)
    # (the reference mislabels rows there, recon_metrics.py:243-253)
    fitted = getattr(probe_model, "classes_", classes)
    ax.set_yticks(np.arange(n_cls) + 0.5,
                  labels=[names.get(int(c), str(int(c)))
                          for c in list(fitted)[:n_cls]])
    ax.invert_yaxis()
    ax.set(xlabel="latent dimension", ylabel="class",
           title="Latent-probe weights per class")
    fig.colorbar(im, ax=ax, label="weight")
    path = save_figure(fig, name)
    plt.close(fig)
    return path


def _pick_traversal_direction(class_dirs: dict, cname: str, latent_dim: int):
    """Class's own probe direction, else any probe direction, else axis 0."""
    if cname in class_dirs:
        return np.asarray(class_dirs[cname], np.float32)
    if class_dirs:
        return np.asarray(next(iter(class_dirs.values())), np.float32)
    axis0 = np.zeros((latent_dim,), np.float32)
    axis0[0] = 1.0
    return axis0


def save_recon_traversal_comparison(model, variables, test_ds: ArrayDataset,
                                    class_dirs=None, span=3.0, steps=7):
    """``recon_vs_traversal.png``: original / recon / μ∓span·dir panels for the
    first test image (ref ``recon_metrics.py:263-308``).

    Redesign: the ±span endpoints are decoded in ONE batched decode call
    (stacked z) instead of two device dispatches.
    """
    import jax
    import matplotlib.pyplot as plt

    cfg = get_config()
    if len(test_ds) == 0:
        return None
    if span is None:
        span = get(cfg.inference, "edit_span", 3.0)
    x = test_ds.images[:1].astype(np.float32) / 255.0
    cname = test_ds.idx_to_class.get(int(test_ds.labels[0]),
                                     str(int(test_ds.labels[0])))
    direction = _pick_traversal_direction(class_dirs or {}, cname,
                                          model.latent_dim)

    recon, mu, _, _ = model.forward(
        variables, x, key=jax.random.PRNGKey(int(cfg.data.seed)),
        deterministic=None)
    endpoints = np.asarray(mu)[None, 0] + np.stack(
        [-span * direction, span * direction])
    ends = np.asarray(model.decode(variables, endpoints))

    panels = [
        ("original", x[0]),
        ("reconstruction", np.asarray(recon)[0]),
        (f"traverse -{span}", ends[0]),
        (f"traverse +{span}", ends[1]),
    ]
    fig, axes = plt.subplots(1, len(panels), figsize=(3 * len(panels), 3))
    for ax, (title, img) in zip(axes, panels):
        gray = img.shape[-1] == 1
        ax.imshow(img[..., 0] if gray else img,
                  cmap="gray" if gray else None, vmin=0, vmax=1)
        ax.set_title(title)
        ax.axis("off")
    path = save_figure(fig, "recon_vs_traversal")
    plt.close(fig)
    return path


def latent_separability_scores(latents, labels, binary=True) -> dict:
    from sklearn.metrics import silhouette_score

    try:
        return {"silhouette": float(silhouette_score(latents, labels))}
    except Exception:
        return {"silhouette": float("nan")}


def _write_summary_tables(report: dict, probe: dict) -> None:
    """``metrics_summary.csv`` (metric,value rows) + ``confusion_matrix.csv``."""
    import pandas as pd

    save_table(pd.DataFrame({"metric": list(report), "value": list(report.values())}),
               "metrics_summary")
    cm, classes = probe.get("confusion_matrix"), probe.get("classes")
    if cm is not None and classes is not None:
        frame = pd.DataFrame(cm, columns=[f"pred_{c}" for c in classes],
                             index=[f"true_{c}" for c in classes])
        save_table(frame.reset_index(), "confusion_matrix")


def evaluate_full(model, variables, train_ds: ArrayDataset,
                  test_ds: ArrayDataset) -> dict:
    """Full eval driver (ref ``recon_metrics.py:326-375``): recon metrics →
    latents → probe → directions → traversal validation → separability →
    tables, figures, and one phase="eval" METRICS line."""
    cfg = get_config()
    class_map = test_ds.class_to_idx
    binary = cfg.data.class_mode == "binary"
    span = float(get(cfg.inference, "edit_span", 3.0))
    sweep_steps = int(cfg.evaluation.traversal_steps)

    report = gather_reconstruction_metrics(model, variables, test_ds)
    latents, labels, _ = extract_latents(
        model, variables, test_ds, limit=int(cfg.evaluation.num_umap_samples))

    probe, probe_model, probe_classes = logistic_probe(
        latents, labels,
        train_fraction=float(cfg.evaluation.probe_train_split),
        binary=binary, return_model=True)
    report.update(probe)

    class_dirs = compute_probe_directions(probe_model, probe_classes, class_map)
    sweep_metrics, _ = traversal_probe_validation(
        probe_model, probe_classes, latents, labels, class_dirs,
        steps=sweep_steps, span=span, class_map=class_map)
    report.update(sweep_metrics)
    report.update(latent_separability_scores(latents, labels, binary=binary))

    _write_summary_tables(report, probe)
    save_logreg_weight_heatmap(probe_model, probe_classes, class_map)
    save_recon_traversal_comparison(model, variables, test_ds,
                                    class_dirs=class_dirs, span=span,
                                    steps=sweep_steps)
    log_metrics(report, step=None, phase="eval")
    return report
