"""Probe column/row alignment when a class is missing from the train split
(deviation #17) and degenerate-split robustness."""

import numpy as np
import pytest


def _fit_probe_missing_class():
    """LogisticRegression fit on classes {0,1,2} while labels contain 3."""
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(0)
    lat = np.concatenate([rng.normal(3 * c, 0.3, (20, 6)) for c in range(4)])
    labels = np.repeat(np.arange(4), 20)
    mask = labels != 3
    clf = LogisticRegression(max_iter=500).fit(lat[mask], labels[mask])
    return clf, lat, labels


def test_directions_keyed_by_fitted_classes():
    from betavae_tpu.eval.recon_metrics import compute_probe_directions

    clf, _, labels = _fit_probe_missing_class()
    class_map = {f"c{i}": i for i in range(4)}
    dirs = compute_probe_directions(clf, np.unique(labels), class_map)
    assert set(dirs) == {"c0", "c1", "c2"}          # no phantom "c3"
    # each named direction is the matching coef row, not a shifted one
    for pos, cls in enumerate(clf.classes_):
        want = clf.coef_[pos] / np.linalg.norm(clf.coef_[pos])
        np.testing.assert_allclose(dirs[f"c{cls}"], want, rtol=1e-6)


def test_traversal_sweep_uses_matching_proba_column():
    from betavae_tpu.eval.recon_metrics import (compute_probe_directions,
                                                traversal_probe_validation)

    clf, lat, labels = _fit_probe_missing_class()
    class_map = {f"c{i}": i for i in range(4)}
    dirs = compute_probe_directions(clf, np.unique(labels), class_map)
    metrics, df = traversal_probe_validation(
        clf, np.unique(labels), lat, labels, dirs, steps=5, span=2.0,
        class_map=class_map)
    assert set(df["class"]) == {"c0", "c1", "c2"}
    # walking along a class's own direction from its mean must RAISE that
    # class's probability — only true if the proba column indexing is right
    for _, row in df.iterrows():
        assert row["delta"] > 0, row["class"]


@pytest.mark.parametrize("binary", [True, False])
def test_one_class_fit_split_reports_nan(binary):
    """sklearn refuses to fit a single-class split; we report NaN metrics
    instead of propagating its ValueError (deviation #17)."""
    from betavae_tpu.eval.recon_metrics import logistic_probe

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(12, 4))
    labels = np.zeros(12, dtype=int)
    order = np.random.RandomState(42).permutation(12)
    labels[order[int(0.3 * 12):]] = 1   # class 1 exists only in held-out
    res, model, classes = logistic_probe(lat, labels, train_fraction=0.3,
                                         binary=binary, return_model=True)
    key = "probe_auc" if binary else "probe_macro_auc"
    assert np.isnan(res[key])
    assert model is None
    assert res["classes"] == [0, 1]
    assert len(res["confusion_matrix"]) == 2


def _probe_reference_loop(latents, labels):
    """The original per-dim sklearn loop (reference train.py:44-96 semantics);
    kept here as the parity oracle for the vectorized implementation."""
    from sklearn.metrics import r2_score, roc_auc_score

    lat = np.asarray(latents)
    y = np.asarray(labels)
    classes = np.unique(y)
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
    return {
        "best_dim_auc": float(np.max(best_auc)) if best_auc else float("nan"),
        "best_dim_corr": float(np.max(best_corr)) if best_corr else float("nan"),
        "best_dim_r2": float(np.max(best_r2)) if best_r2 else float("nan"),
    }


def test_vectorized_probe_matches_sklearn_loop():
    from betavae_tpu.eval.probes import compute_probe_metrics

    rng = np.random.default_rng(0)
    for trial, n_cls in [(0, 4), (1, 2), (2, 4)]:
        lat = rng.standard_normal((257, 16))
        lat[:, 3] = 0.0                      # constant dim: must be skipped
        y = rng.integers(0, n_cls, 257)
        lat[:, 5] += 2.0 * (y == 0)          # one informative dim + ties
        lat[:, 7] = np.round(lat[:, 7])      # heavy ties exercise midranks
        got = compute_probe_metrics(lat, list(y))
        want = _probe_reference_loop(lat, y)
        for k, w in want.items():
            assert abs(got[k] - w) < 1e-9, (trial, k, got[k], w)


def test_vectorized_probe_binary_single_class_split():
    from betavae_tpu.eval.probes import compute_probe_metrics

    out = compute_probe_metrics(np.random.default_rng(0).standard_normal(
        (10, 4)), [1] * 10)
    assert np.isnan(out["best_dim_auc"])


def _auc_reference_loop(L, y, transform=lambda s: s):
    """Reference latent_analysis.py:47-89 per-dim AUC loop, as the parity
    oracle for the vectorized rewrite."""
    from sklearn.metrics import roc_auc_score

    classes = np.unique(y)
    out = []
    for i in range(L.shape[1]):
        scores = transform(L[:, i])
        try:
            if len(classes) > 2:
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


@pytest.mark.parametrize("n_cls", [2, 3, 4])
def test_rank_auc_matrix_matches_sklearn(n_cls):
    from sklearn.metrics import roc_auc_score

    from betavae_tpu.eval.probes import rank_auc_matrix

    rng = np.random.default_rng(7)
    S = rng.standard_normal((211, 9))
    S[:, 2] = 1.5                            # constant column -> 0.5
    S[:, 4] = np.round(S[:, 4] * 2) / 2      # heavy ties -> midranks matter
    y = rng.integers(0, n_cls, 211)
    auc, classes = rank_auc_matrix(S, y)
    assert auc.shape == (9, len(classes))
    for ci, cls in enumerate(classes):
        y_bin = (y == cls).astype(int)
        for d in range(S.shape[1]):
            want = roc_auc_score(y_bin, S[:, d])
            assert abs(auc[d, ci] - want) < 1e-12, (d, cls)
    assert np.allclose(auc[2], 0.5)


@pytest.mark.parametrize("n_cls", [2, 4])
@pytest.mark.parametrize("use_abs", [False, True])
def test_per_dimension_auc_matches_reference_loop(n_cls, use_abs):
    from betavae_tpu.infer.latent_analysis import (per_dimension_abs_auc,
                                                   per_dimension_auc)

    rng = np.random.default_rng(11)
    L = rng.standard_normal((157, 12))
    L[:, 0] = -3.0                           # constant dim
    y = rng.integers(0, n_cls, 157)
    L[:, 6] += 1.5 * (y == 1)                # informative dim
    if use_abs:
        got = per_dimension_abs_auc(L, y)
        want = _auc_reference_loop(L, y, transform=np.abs)
    else:
        got = per_dimension_auc(L, y)
        want = _auc_reference_loop(L, y)
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                               atol=1e-12)


def test_per_dimension_auc_single_class_is_nan():
    from betavae_tpu.infer.latent_analysis import per_dimension_auc

    L = np.random.default_rng(0).standard_normal((20, 3))
    got = per_dimension_auc(L, np.zeros(20, dtype=int))
    assert all(np.isnan(a) for _, a in got)
