#!/usr/bin/env python
"""One-command metric parity check against a reference run.

Wherever the reference's real dataset + checkpoints exist (they do not in
this build environment), this discharges the recon-metric parity
obligation (reference ``outputs/tables/metrics_summary.csv``) end to end:

    # 1. point the config at the real processed data, then
    python scripts/parity_check.py \
        --reference-tables /path/to/reference/outputs/tables \
        --config configs/beta_vae_se.yaml --run-eval

``--run-eval`` runs our full evaluation first (use a reference checkpoint
directly — ``io/torch_compat.py`` converts torch-pickle shards on load);
without it, the existing ``<tables_dir>/metrics_summary.csv`` is compared.
Exit status 0 = parity within tolerance; 1 = any FAIL/MISSING row.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Diff our metrics_summary.csv against a reference run")
    parser.add_argument("--reference-tables", required=True,
                        help="reference tables dir (metrics_summary.csv)")
    parser.add_argument("--config", default=None)
    parser.add_argument("--run-eval", action="store_true",
                        help="run our full evaluation first")
    parser.add_argument("--rtol-recon", type=float, default=0.05)
    parser.add_argument("--rtol-std", type=float, default=0.25)
    parser.add_argument("--atol-loose", type=float, default=0.05)
    args = parser.parse_args(argv)

    from betavae_tpu.config import get_config
    from betavae_tpu.eval.parity import (compare_metrics, format_report,
                                         load_metrics_csv)

    cfg = get_config(args.config)
    if args.run_eval:
        from betavae_tpu.eval.run_evaluation import main as eval_main

        eval_main([])

    ours_csv = os.path.join(cfg.paths.tables_dir, "metrics_summary.csv")
    ref_csv = os.path.join(args.reference_tables, "metrics_summary.csv")
    result = compare_metrics(
        load_metrics_csv(ref_csv), load_metrics_csv(ours_csv),
        rtol_recon=args.rtol_recon, rtol_std=args.rtol_std,
        atol_loose=args.atol_loose)
    print(format_report(result))
    return 0 if result["parity"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
