"""Epoch rotation (DESIGN.md §3.3): the next epoch's first train chunk is
dispatched before the val pull.  Pure dispatch reordering — the math, the
logged metrics, the checkpoints, and the returned state must be identical
to the unrotated loop; early stopping must discard the speculative chunk."""

import os

import jax
import numpy as np
import yaml

from betavae_tpu.config import get_config, reset_config_cache


def _leaves(state):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]


def _configure(cfg_path, *, rotation: bool, epochs: int = 3):
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"]["epochs"] = epochs
    raw["debug"]["max_train_batches"] = 5   # 2 chunks of 2 + 1 single step
    raw["debug"]["max_val_batches"] = 2
    raw["training"]["scan_chunk_steps"] = 2
    raw["training"]["epoch_rotation"] = rotation
    raw["optimization"]["scheduler"] = "none"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    return get_config(cfg_path)


def test_rotation_is_bitexact_vs_unrotated(demo_env):
    from betavae_tpu.train.loop import train

    cfg_path = demo_env
    cfg = _configure(cfg_path, rotation=False)
    state_off = train()
    off = _leaves(state_off)

    for f in os.listdir(cfg.paths.models_dir):
        os.remove(os.path.join(cfg.paths.models_dir, f))
    _configure(cfg_path, rotation=True)
    state_on = train()
    on = _leaves(state_on)

    for a, b in zip(off, on):
        np.testing.assert_array_equal(a, b)


def test_early_stop_discards_inflight_epoch(demo_env, monkeypatch):
    """When early stopping fires, the speculatively dispatched next-epoch
    chunk must be discarded: the returned state equals the epoch-N
    checkpoint, not N plus one in-flight chunk."""
    from betavae_tpu.io.checkpoint import load_sharded_checkpoint
    from betavae_tpu.train import loop

    cfg_path = demo_env
    cfg = _configure(cfg_path, rotation=True, epochs=6)

    class StopAfterTwo:
        def __init__(self, *a, **kw):
            self.calls = 0
            self.should_stop = False

        def update(self, value):
            self.calls += 1
            if self.calls >= 2:
                self.should_stop = True

    monkeypatch.setattr(loop, "EarlyStopping", StopAfterTwo)
    state = loop.train()

    payload = load_sharded_checkpoint(
        os.path.join(cfg.paths.models_dir,
                     f"{cfg.paths.run_id}_latest.pt"))
    assert payload["epoch"] == 2
    from betavae_tpu.io.checkpoint import flatten_pytree

    live = flatten_pytree(state.model_variables(), to_host=True)
    for k, v in payload["model_state"].items():
        np.testing.assert_array_equal(np.asarray(v), live[k],
                                      err_msg=f"mismatch at {k}")
