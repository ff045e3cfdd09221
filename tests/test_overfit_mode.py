"""Deterministic-overfit mode end-to-end (the overfit_capacity.yaml path).

Covers the reference's memorization-diagnostic workflow (SURVEY.md §4.3):
``model.deterministic_overfit: true`` + debug limits trains with z=μ and a
zeroed KL path; the test asserts the mode's loss semantics hold in a real
run and that ``diag_overfit`` stats come out.
"""

import importlib
import json
import re
import sys

import numpy as np
import yaml

from betavae_tpu.config import get_config, reset_config_cache


def test_overfit_mode_end_to_end(demo_env, capsys, monkeypatch):
    from betavae_tpu.train.loop import train

    cfg_path = demo_env
    raw = yaml.safe_load(open(cfg_path))
    raw["model"]["deterministic_overfit"] = True
    raw["debug"].update(train_samples=8, test_samples=8, max_train_batches=2,
                        max_val_batches=2, epochs=2)
    raw["logging"]["log_to_file"] = True
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    cfg = get_config(cfg_path)

    train()

    # deterministic mode: KL identically zero in the logs, test aliased to
    # train (ref datautils.py:72-73)
    import os

    log = open(os.path.join(cfg.paths.outputs_dir, "logs",
                            "testrun.log")).read()
    vals = [json.loads(m) for m in re.findall(r"METRICS (\{.*\})", log)]
    train_lines = [m for m in vals if m["phase"] == "train"]
    assert train_lines, "no train metrics logged"
    for m in train_lines:
        assert m["train_kl"] == 0.0

    # diag_overfit CLI on the produced checkpoint
    scripts_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    mod = importlib.import_module("diag_overfit")
    monkeypatch.setattr(sys, "argv", ["diag_overfit.py", "--config", cfg_path])
    capsys.readouterr()  # drain train() output
    mod.main()
    out = capsys.readouterr().out
    stats = json.loads(out[out.index("{"):])
    for k in ("train_mse_mean", "val_mse_mean", "mu_std", "z_std",
              "logvar_mean"):
        assert k in stats
    # z == mu in deterministic mode
    assert abs(stats["z_mean"] - stats["mu_mean"]) < 1e-6
