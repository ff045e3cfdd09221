"""Full train() over a data-parallel mesh (virtual 8-device CPU)."""

import os

import numpy as np
import yaml

from betavae_tpu.config import get_config, reset_config_cache


def test_train_on_mesh_matches_single_device(demo_env):
    from betavae_tpu.parallel.mesh import data_parallel_mesh
    from betavae_tpu.train.loop import train
    import jax

    cfg_path = demo_env
    raw = yaml.safe_load(open(cfg_path))
    raw["training"]["batch_size"] = 8  # divisible by 8 devices
    raw["training"]["scan_chunk_steps"] = 2
    raw["debug"]["epochs"] = 1
    raw["debug"]["max_train_batches"] = 3
    raw["augmentation"]["use_augmentations"] = False  # identical math paths
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)

    state_single = train()
    leaves_single = [np.asarray(x) for x in
                     jax.tree_util.tree_leaves(state_single.params)]

    reset_config_cache()
    get_config(cfg_path)
    mesh = data_parallel_mesh(8)
    state_mesh = train(mesh=mesh)
    leaves_mesh = [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(state_mesh.params)]

    for a, b in zip(leaves_single, leaves_mesh):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_mesh_batch_size_divisibility(demo_env):
    from betavae_tpu.parallel.mesh import data_parallel_mesh
    from betavae_tpu.train.loop import train
    import pytest
    import yaml

    raw = yaml.safe_load(open(demo_env))
    raw["training"]["batch_size"] = 6  # not divisible by 8
    with open(demo_env, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(demo_env)
    with pytest.raises(ValueError, match="divide evenly"):
        train(mesh=data_parallel_mesh(8))


def test_mesh_with_remat_and_host_feed(demo_env):
    """Interaction smoke: mesh × remat × host-feed streaming in one run."""
    from betavae_tpu.parallel.mesh import data_parallel_mesh
    from betavae_tpu.train.loop import train
    import jax
    import numpy as np
    import yaml

    raw = yaml.safe_load(open(demo_env))
    raw["training"].update(batch_size=8, scan_chunk_steps=2, remat=True,
                           max_device_dataset_mb=0)  # force host streaming
    raw["debug"].update(epochs=1, max_train_batches=3, max_val_batches=1)
    with open(demo_env, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(demo_env)
    state = train(mesh=data_parallel_mesh(8))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_resume_on_mesh_matches_single_device_resume(demo_config_factory,
                                                     tmp_path):
    """A data-parallel run can be resumed on the mesh, and the continuation
    matches a single-device resume from the same checkpoint (the host-loaded
    state is placed correctly by jit under the mesh)."""
    import shutil

    import yaml

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.logging_utils import reset_logger
    from betavae_tpu.parallel.mesh import data_parallel_mesh
    from betavae_tpu.train.loop import train

    cfg_path = demo_config_factory(batch_size=8)
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"]["epochs"] = 2
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)

    train(mesh=data_parallel_mesh(8))
    snap = str(tmp_path / "ckpt_snap")
    shutil.copytree(cfg.paths.models_dir, snap)

    raw["debug"]["epochs"] = 4
    yaml.safe_dump(raw, open(cfg_path, "w"))

    reset_config_cache(); get_config(cfg_path); reset_logger()
    s_mesh = train(resume="latest", mesh=data_parallel_mesh(8))

    shutil.rmtree(cfg.paths.models_dir)
    shutil.copytree(snap, cfg.paths.models_dir)
    reset_config_cache(); get_config(cfg_path); reset_logger()
    s_single = train(resume="latest")

    import jax

    a = [np.asarray(x) for x in jax.tree_util.tree_leaves(s_mesh.params)]
    b = [np.asarray(x) for x in jax.tree_util.tree_leaves(s_single.params)]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-4)
