"""Metric parity checker (eval/parity.py + scripts/parity_check.py).

The tool discharges the real-dataset parity obligation wherever the
reference's data exists (reference ``outputs/tables/metrics_summary.csv``
schema); here we pin its comparison semantics on synthetic tables.
"""

import csv
import os

from betavae_tpu.eval.parity import (compare_metrics, format_report,
                                     load_metrics_csv)

BASE = {
    "mse_mean": 0.0049, "mse_std": 0.0042,
    "psnr_mean": 23.92, "ssim_mean": 0.651,
    "per_class/glioma/mse_mean": 0.0032,
    "per_class/glioma/count": 300.0,
    "probe_macro_auc": 0.877, "silhouette": 0.0216,
    "classes": "[0, 1, 2, 3]",
}


def _write(path, d):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        for k, v in d.items():
            w.writerow([k, v])


def test_identical_tables_pass(tmp_path):
    p = str(tmp_path / "m.csv")
    _write(p, BASE)
    m = load_metrics_csv(p)
    res = compare_metrics(m, m)
    assert res["parity"] and res["n_fail"] == 0
    assert "PARITY" in format_report(res)


def test_short_rows_skipped_not_crash(tmp_path):
    """A lone metric name or stray footer line must be skipped, not raise
    IndexError — the comparator should report a clean diff either way."""
    p = str(tmp_path / "m.csv")
    _write(p, BASE)
    with open(p, "a", newline="") as f:
        f.write("orphan_metric_name\n")   # 1-column row
        f.write("\n")                     # blank
    m = load_metrics_csv(p)
    assert "orphan_metric_name" not in m
    assert m["mse_mean"] == BASE["mse_mean"]


def test_families_and_tolerances():
    ref = dict(BASE)
    ours = dict(BASE)
    ours["mse_mean"] = 0.0049 * 1.03          # recon: 3% < 5% rtol -> OK
    ours["mse_std"] = 0.0042 * 1.20           # std: 20% < 25% -> OK
    ours["probe_macro_auc"] = 0.877 + 0.03    # loose: 0.03 < 0.05 abs -> OK
    assert compare_metrics(ref, ours)["parity"]

    ours["psnr_mean"] = 23.92 * 1.10          # 10% > 5% -> FAIL
    res = compare_metrics(ref, ours)
    assert not res["parity"]
    bad = [r for r in res["rows"] if r["status"] == "FAIL"]
    assert [r["metric"] for r in bad] == ["psnr_mean"]


def test_exact_family_and_missing():
    ref = dict(BASE)
    ours = dict(BASE)
    ours["per_class/glioma/count"] = 299.0    # dataset mismatch -> FAIL
    del ours["silhouette"]                    # -> MISSING
    res = compare_metrics(ref, ours)
    statuses = {r["metric"]: r["status"] for r in res["rows"]}
    assert statuses["per_class/glioma/count"] == "FAIL"
    assert statuses["silhouette"] == "MISSING"
    assert not res["parity"]

    ours2 = dict(BASE)
    ours2["classes"] = "[0, 1]"               # class-list mismatch -> FAIL
    assert not compare_metrics(ref, ours2)["parity"]


def test_extra_ours_metrics_reported_not_failed():
    ours = dict(BASE, recon_elbo=1.0)
    res = compare_metrics(BASE, ours)
    assert res["parity"] and res["extra_in_ours"] == ["recon_elbo"]


def test_cli_end_to_end(tmp_path, demo_config_factory):
    from betavae_tpu.config import get_config
    from scripts.parity_check import main

    cfg = get_config(demo_config_factory())
    os.makedirs(cfg.paths.tables_dir, exist_ok=True)
    _write(os.path.join(cfg.paths.tables_dir, "metrics_summary.csv"), BASE)
    ref_dir = str(tmp_path / "ref_tables")
    os.makedirs(ref_dir)
    _write(os.path.join(ref_dir, "metrics_summary.csv"), BASE)
    assert main(["--reference-tables", ref_dir]) == 0

    worse = dict(BASE, mse_mean=0.0049 * 2)
    _write(os.path.join(ref_dir, "metrics_summary.csv"), worse)
    assert main(["--reference-tables", ref_dir]) == 1
