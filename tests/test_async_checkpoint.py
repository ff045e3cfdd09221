"""Async checkpointing (CheckpointManager(async_io=True)).

The background writer must produce byte-identical artifacts to the sync
path, order saves strictly, surface worker errors on drain, and land all
writes before ``train()`` returns.
"""

import os

import numpy as np
import pytest
import yaml


def _tiny_state():
    import jax

    from betavae_tpu.config import get_config
    from betavae_tpu.models.beta_vae import BetaVAE, BetaVAEModule
    from betavae_tpu.train.loop import init_state
    from betavae_tpu.train.optim import build_optimizer

    model = BetaVAE(module=BetaVAEModule(
        image_size=16, in_channels=1, latent_dim=4, base_channels=8,
        num_blocks=2, norm_type="layer", se_reduction=4,
        use_decoder_se=True, encoder_pooling="flatten"))
    return init_state(model, build_optimizer(get_config()),
                      jax.random.PRNGKey(0))


def test_async_save_matches_sync(demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.io.checkpoint import load_sharded_checkpoint
    from betavae_tpu.train.callbacks import CheckpointManager

    get_config(demo_config_factory())
    state = _tiny_state()

    sync = CheckpointManager(num_shards=2, async_io=False)
    sync.run_id = "syncrun"
    sync.save_latest(state, epoch=3, total_steps=11, extra={"val_total": 1.5})

    asy = CheckpointManager(num_shards=2, async_io=True)
    asy.run_id = "asyncrun"
    asy.save_latest(state, epoch=3, total_steps=11, extra={"val_total": 1.5})
    asy.drain()

    a = load_sharded_checkpoint(os.path.join(sync.dir, "syncrun_latest.pt"))
    b = load_sharded_checkpoint(os.path.join(asy.dir, "asyncrun_latest.pt"))
    assert a["epoch"] == b["epoch"] and a["total_steps"] == b["total_steps"]
    assert sorted(a["model_state"]) == sorted(b["model_state"])
    for k in a["model_state"]:
        np.testing.assert_array_equal(a["model_state"][k],
                                      b["model_state"][k])
    for k in a["optim_state"]:
        np.testing.assert_array_equal(a["optim_state"][k],
                                      b["optim_state"][k])


def test_async_worker_error_surfaces_on_drain(demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.train.callbacks import CheckpointManager

    get_config(demo_config_factory())
    state = _tiny_state()
    m = CheckpointManager(num_shards=2, async_io=True)
    m.dir = os.path.join(m.dir, "missing", "deeply")  # writer will mkdir OK
    # poison instead: unwritable path on POSIX
    m.dir = "/proc/definitely/not/writable"
    m.save_latest(state, epoch=1, total_steps=1, extra={})
    with pytest.raises(Exception):
        m.drain()
    m.drain()  # error is consumed; manager remains usable


def test_train_with_async_checkpoint(demo_config_factory):
    import jax

    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.io.checkpoint import (load_sharded_checkpoint,
                                           unflatten_like)
    from betavae_tpu.train.loop import train

    cfg_path = demo_config_factory(**{"training.async_checkpoint": True})
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"]["epochs"] = 2
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)
    state = train()
    # the drained latest checkpoint holds exactly the returned state
    payload = load_sharded_checkpoint(
        os.path.join(cfg.paths.models_dir, "testrun_latest.pt"))
    loaded = unflatten_like(state.model_variables(), payload["model_state"])
    for a, b in zip(jax.tree_util.tree_leaves(loaded["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_under_mesh(demo_config_factory):
    """The scaled config enables mesh + async together; the drained latest
    checkpoint must hold the sharded run's final params exactly."""
    import jax

    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.io.checkpoint import (load_sharded_checkpoint,
                                           unflatten_like)
    from betavae_tpu.parallel.mesh import data_parallel_mesh
    from betavae_tpu.train.loop import train

    cfg_path = demo_config_factory(
        batch_size=8, **{"training.async_checkpoint": True})
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"]["epochs"] = 2
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)
    state = train(mesh=data_parallel_mesh(8))
    payload = load_sharded_checkpoint(
        os.path.join(cfg.paths.models_dir, "testrun_latest.pt"))
    loaded = unflatten_like(state.model_variables(), payload["model_state"])
    for a, b in zip(jax.tree_util.tree_leaves(loaded["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
