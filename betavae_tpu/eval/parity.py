"""Metric-parity comparison against a reference ``metrics_summary.csv``.

Closes the loop on the one obligation this build environment cannot
discharge (no real MRI dataset, no pretrained LPIPS weights): wherever the
reference's data/checkpoints DO exist, ``scripts/parity_check.py`` reduces
the recon-MSE/ELBO parity claim (reference
``outputs/tables/metrics_summary.csv:2-7``) to a single command — load the
reference checkpoint through ``io/torch_compat.py``, run our
``eval/run_evaluation.py`` on the same data, then diff the two
``metrics_summary.csv`` files with per-family tolerances.

Tolerances default to the reference's own observed eval-to-eval jitter:
its recon metrics use a *sampling* forward (``src/evaluation/
recon_metrics.py:71``), so exact equality is impossible by design
(SURVEY.md §7 "stochastic eval") — parity is statistical.  Integer counts
and class lists must match exactly.
"""

from __future__ import annotations

import csv
import json
import math


# metric-name → comparison family
_EXACT_SUBSTR = ("count", "classes")
_LOOSE_SUBSTR = ("probe", "silhouette", "f1", "auc", "traversal")


def load_metrics_csv(path: str) -> dict:
    """Read a ``metric,value`` CSV into {name: float | str}."""
    out = {}
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        if header[:2] != ["metric", "value"]:
            raise ValueError(f"{path}: expected 'metric,value' header, "
                             f"got {header}")
        for row in reader:
            if len(row) < 2:  # blank lines, stray footers, lone names
                continue
            name, value = row[0], row[1]
            try:
                out[name] = float(value)
            except ValueError:
                out[name] = value  # JSON-ish fields (lists, matrices)
    return out


def _family(name: str) -> str:
    low = name.lower()
    if any(s in low for s in _EXACT_SUBSTR):
        return "exact"
    if any(s in low for s in _LOOSE_SUBSTR):
        return "loose"
    if low.endswith("_std"):
        return "std"
    return "recon"


def compare_metrics(reference: dict, ours: dict, *,
                    rtol_recon: float = 0.05, rtol_std: float = 0.25,
                    atol_loose: float = 0.05) -> dict:
    """Per-metric parity verdicts.

    - ``recon`` family (mse/psnr/ssim means, per-class): relative tolerance
      ``rtol_recon`` (default 5% — generous vs the reference's observed
      sampling jitter, tight vs any real implementation divergence).
    - ``std`` family: relative ``rtol_std`` (spread estimates are noisier).
    - ``loose`` family (probe/silhouette/traversal/f1/auc): absolute
      ``atol_loose`` — these depend on sklearn solver details and probe
      split RNG, not on the model math under test.
    - ``exact`` family (counts, class lists): string/integer equality —
      a mismatch means the datasets differ and every other row is moot.
    """
    rows = []
    for name, ref_val in reference.items():
        fam = _family(name)
        if name not in ours:
            rows.append({"metric": name, "family": fam, "ref": ref_val,
                         "ours": None, "status": "MISSING"})
            continue
        our_val = ours[name]
        if fam == "exact" or isinstance(ref_val, str) or isinstance(our_val,
                                                                    str):
            ok = str(ref_val) == str(our_val)
            rows.append({"metric": name, "family": fam, "ref": ref_val,
                         "ours": our_val,
                         "status": "OK" if ok else "FAIL"})
            continue
        if not (math.isfinite(ref_val) and math.isfinite(our_val)):
            ok = (math.isnan(ref_val) and math.isnan(our_val))
            rows.append({"metric": name, "family": fam, "ref": ref_val,
                         "ours": our_val,
                         "status": "OK" if ok else "FAIL"})
            continue
        if fam == "loose":
            err = abs(our_val - ref_val)
            ok = err <= atol_loose
            rows.append({"metric": name, "family": fam, "ref": ref_val,
                         "ours": our_val, "abs_diff": round(err, 6),
                         "status": "OK" if ok else "FAIL"})
        else:
            rtol = rtol_recon if fam == "recon" else rtol_std
            denom = max(abs(ref_val), 1e-12)
            rel = abs(our_val - ref_val) / denom
            ok = rel <= rtol
            rows.append({"metric": name, "family": fam, "ref": ref_val,
                         "ours": our_val, "rel_diff": round(rel, 6),
                         "status": "OK" if ok else "FAIL"})
    extra = sorted(set(ours) - set(reference))
    n_fail = sum(r["status"] == "FAIL" for r in rows)
    n_missing = sum(r["status"] == "MISSING" for r in rows)
    return {"rows": rows, "extra_in_ours": extra,
            "n_compared": len(rows), "n_fail": n_fail,
            "n_missing": n_missing,
            "parity": n_fail == 0 and n_missing == 0}


def format_report(result: dict) -> str:
    lines = [f"{'metric':<42} {'ref':>14} {'ours':>14} {'diff':>10} status"]
    for r in result["rows"]:
        diff = r.get("rel_diff", r.get("abs_diff", ""))
        diff = f"{diff:.4f}" if isinstance(diff, float) else str(diff)
        ref = (f"{r['ref']:.6g}" if isinstance(r["ref"], float)
               else str(r["ref"])[:14])
        ours = (f"{r['ours']:.6g}" if isinstance(r["ours"], float)
                else str(r["ours"])[:14])
        lines.append(f"{r['metric']:<42} {ref:>14} {ours:>14} "
                     f"{diff:>10} {r['status']}")
    if result["extra_in_ours"]:
        lines.append(f"(ours-only metrics, not compared: "
                     f"{', '.join(result['extra_in_ours'])})")
    lines.append(f"PARITY {json.dumps({k: result[k] for k in ('n_compared', 'n_fail', 'n_missing', 'parity')})}")
    return "\n".join(lines)
