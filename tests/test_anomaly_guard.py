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


def test_chunk_guard_fires_at_exact_step(demo_config_factory, monkeypatch):
    """A NaN at a NON-log step inside a scanned chunk must surface when that
    chunk drains, with the exact global step index — not one log interval
    later (VERDICT r3 weak #4: at K=192 a log-gated check could average ~2
    chunks of corrupted metrics before firing)."""
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.train import loop

    cfg_path = demo_config_factory()
    raw = yaml.safe_load(open(cfg_path))
    raw["training"]["scan_chunk_steps"] = 2
    raw["debug"]["max_train_batches"] = 4     # 2 chunks of K=2
    raw["debug"]["epochs"] = 1
    raw["logging"]["log_every_n_steps"] = 50  # no log step ever fires
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=10,
                       test_per_class=3, size=cfg.data.image_size)

    real_maker = loop.make_train_multi_step
    calls = {"n": 0}

    def nan_injecting_maker(*args, **kwargs):
        multi = real_maker(*args, **kwargs)

        def wrapped(state, *rest):
            state, mk = multi(state, *rest)
            calls["n"] += 1
            if calls["n"] == 2:  # second chunk, second step => global step 4
                t = np.asarray(mk["total"]).copy()
                t[1] = np.nan
                mk = {**mk, "total": jnp.asarray(t)}
            return state, mk

        return wrapped

    monkeypatch.setattr(loop, "make_train_multi_step", nan_injecting_maker)
    with pytest.raises(FloatingPointError,
                       match=r"non-finite training loss at step 4 "):
        loop.train()
