"""Background recon-panel writer: overlap is observable-behavior-neutral and
failures are not swallowed (round-3 tail engineering, docs/DESIGN.md §3.3).

The panel's device pull + PNG encode run on a daemon thread that overlaps the
next epoch's train chunk; the loop must still (a) produce every panel
artifact by the time ``train()`` returns and (b) re-raise a writer failure
instead of dropping it on the floor.
"""

import glob
import os

import pytest
import yaml


def _setup(demo_config_factory, epochs=2):
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data

    cfg_path = demo_config_factory()
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"]["epochs"] = epochs
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)
    return cfg


def test_all_panels_land_before_train_returns(demo_config_factory):
    from betavae_tpu.train.loop import train

    cfg = _setup(demo_config_factory, epochs=2)
    train()
    for epoch in (1, 2):
        assert os.path.exists(os.path.join(
            cfg.paths.figures_dir, f"recon_epoch{epoch}.png")), epoch
        assert os.path.exists(os.path.join(
            cfg.paths.figures_dir, f"recon_epoch{epoch}_stats.json")), epoch
    # exactly the run's panels — the writer didn't double-fire
    assert len(glob.glob(os.path.join(
        cfg.paths.figures_dir, "recon_epoch*_stats.json"))) == 2


def test_panel_writer_failure_reraises(demo_config_factory, monkeypatch):
    import betavae_tpu.train.loop as loop_mod

    _setup(demo_config_factory, epochs=2)

    def _boom(*a, **k):
        raise RuntimeError("panel writer exploded")

    monkeypatch.setattr(loop_mod, "sample_reconstructions", _boom)
    with pytest.raises(RuntimeError, match="panel writer exploded"):
        loop_mod.train()
