"""training.detect_anomalies: a diverging run fails fast with the
documented message (the reference has no sanitizers — SURVEY.md §5)."""

import pytest
import yaml


def test_nonfinite_loss_raises(demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.train.loop import train

    cfg_path = demo_config_factory()
    raw = yaml.safe_load(open(cfg_path))
    raw["optimization"]["lr"] = 1e12          # guaranteed divergence
    raw["training"]["grad_clip"] = 0.0        # and no clipping to save it
    raw["debug"]["epochs"] = 2
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)
    with pytest.raises(FloatingPointError, match="non-finite training loss"):
        train()


def test_guard_can_be_disabled(demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.train.loop import train

    cfg_path = demo_config_factory(**{"training.detect_anomalies": False})
    raw = yaml.safe_load(open(cfg_path))
    raw["optimization"]["lr"] = 1e12
    raw["training"]["grad_clip"] = 0.0
    raw["debug"]["epochs"] = 1
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)
    train()  # survives the non-finite loss when the guard is off
