"""Host-feed streaming mode (dataset larger than the HBM budget) equivalence."""

import jax
import numpy as np
import yaml

from betavae_tpu.config import get_config, reset_config_cache
from betavae_tpu.data.dataset import ArrayDataset
from betavae_tpu.data.pipeline import DeviceData


def test_device_data_host_feed_threshold():
    rng = np.random.default_rng(0)
    ds = ArrayDataset(images=rng.integers(0, 255, (10, 8, 8, 1), np.uint8),
                      labels=np.zeros(10, np.int32))
    small_budget = DeviceData.from_dataset(ds, max_device_bytes=100)
    assert small_budget.host_feed
    assert isinstance(small_budget.images, np.ndarray)
    big_budget = DeviceData.from_dataset(ds, max_device_bytes=10**9)
    assert not big_budget.host_feed
    np.testing.assert_array_equal(
        small_budget.batch(np.array([1, 3])), ds.images[[1, 3]])


def test_host_feed_training_matches_device_feed(demo_env):
    from betavae_tpu.train.loop import train

    cfg_path = demo_env
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"].update(epochs=1, max_train_batches=3, max_val_batches=2)
    raw["training"]["scan_chunk_steps"] = 2
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state_dev = train()
    dev_leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(state_dev.params)]

    raw["training"]["max_device_dataset_mb"] = 0  # force host streaming
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state_host = train()
    host_leaves = [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(state_host.params)]

    for a, b in zip(dev_leaves, host_leaves):
        np.testing.assert_array_equal(a, b)


def test_host_feed_chunk_limit_values():
    from betavae_tpu.data.pipeline import host_feed_chunk_limit

    # flagship shape: 32 * 128*128 uint8 = 512 KiB/step -> 16 steps per 8 MB
    assert host_feed_chunk_limit(32, (128, 128, 1), 8.0) == 16
    # budget below one step still yields a usable chunk of 1
    assert host_feed_chunk_limit(32, (128, 128, 1), 0.001) == 1
    # big budget is bounded only by the caller's K
    assert host_feed_chunk_limit(8, (8, 8, 1), 8.0) >= 1000


def test_host_feed_K_derate_matches(demo_env):
    """A tiny host_feed_chunk_mb budget forces K->1; results are identical
    (K only sets scan chunking, never the math)."""
    from betavae_tpu.train.loop import train

    cfg_path = demo_env
    raw = yaml.safe_load(open(cfg_path))
    raw["debug"].update(epochs=1, max_train_batches=4, max_val_batches=1)
    raw["training"]["scan_chunk_steps"] = 4
    raw["training"]["max_device_dataset_mb"] = 0  # host streaming
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state_full = train()
    full = [np.asarray(x) for x in
            jax.tree_util.tree_leaves(state_full.params)]

    raw["training"]["host_feed_chunk_mb"] = 1e-9  # derate K to 1
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state_derated = train()
    derated = [np.asarray(x) for x in
               jax.tree_util.tree_leaves(state_derated.params)]
    for a, b in zip(full, derated):
        np.testing.assert_array_equal(a, b)


def test_host_feed_on_mesh_matches_device_feed_on_mesh(demo_env):
    """Host-streamed payloads sharded over the data axis (P(None, 'data'))
    train identically to the device-resident path under the same 8-device
    mesh — the placement differs, the math must not."""
    from betavae_tpu.parallel.mesh import data_parallel_mesh
    from betavae_tpu.train.loop import train

    cfg_path = demo_env
    raw = yaml.safe_load(open(cfg_path))
    raw["training"].update(batch_size=8, scan_chunk_steps=2)
    raw["debug"].update(epochs=1, max_train_batches=3, max_val_batches=2)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state_dev = train(mesh=data_parallel_mesh(8))
    dev_leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(state_dev.params)]

    raw["training"]["max_device_dataset_mb"] = 0  # force host streaming
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state_host = train(mesh=data_parallel_mesh(8))
    host_leaves = [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(state_host.params)]

    for a, b in zip(dev_leaves, host_leaves):
        # tolerance-equal, not bit-identical (unlike the K-derate test
        # above, which re-runs the SAME compiled program): host-feed and
        # device-feed are different XLA programs — one takes the (K,B,...)
        # payload as an argument, the other gathers from the resident
        # array inside the jit — and XLA may fuse/order the conv and
        # reduction arithmetic differently between the two lowerings.
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
