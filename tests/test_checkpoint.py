"""Sharded checkpoint round-trip, autodetect, reshard, pytree flatten."""

import os

import numpy as np
import pytest

from betavae_tpu.io.checkpoint import (flatten_pytree, load_sharded_checkpoint,
                                       save_sharded_checkpoint, unflatten_like)


def _payload(n_params=7):
    rng = np.random.default_rng(0)
    model = {f"layer{i}/kernel": rng.normal(size=(3, 3)).astype(np.float32)
             for i in range(n_params)}
    optim = {f"mu/layer{i}/kernel": rng.normal(size=(3, 3)).astype(np.float32)
             for i in range(n_params)}
    return {"epoch": 4, "total_steps": 123, "val_total": 1.5,
            "model_state": model, "optim_state": optim}


def test_roundtrip_two_shards(tmp_path):
    base = str(tmp_path / "run_latest.pt")
    payload = _payload()
    paths = save_sharded_checkpoint(base, payload, num_shards=2)
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)
    assert not os.path.exists(base)  # base removed like the reference

    out = load_sharded_checkpoint(base)
    assert out["epoch"] == 4
    assert out["total_steps"] == 123
    assert out["val_total"] == 1.5
    assert set(out["model_state"]) == set(payload["model_state"])
    for k in payload["model_state"]:
        np.testing.assert_array_equal(out["model_state"][k],
                                      payload["model_state"][k])
    for k in payload["optim_state"]:
        np.testing.assert_array_equal(out["optim_state"][k],
                                      payload["optim_state"][k])


def test_shard_count_autodetect(tmp_path):
    base = str(tmp_path / "ck.pt")
    save_sharded_checkpoint(base, _payload(), num_shards=5)
    out = load_sharded_checkpoint(base)  # no num_shards given
    assert len(out["model_state"]) == 7


def test_round_robin_distribution(tmp_path):
    base = str(tmp_path / "rr.pt")
    save_sharded_checkpoint(base, _payload(n_params=5), num_shards=2)
    from betavae_tpu.io.checkpoint import _read_shard

    a0, _ = _read_shard(str(tmp_path / "rr_shard0.pt"))
    a1, _ = _read_shard(str(tmp_path / "rr_shard1.pt"))
    m0 = [k for k in a0 if k.startswith("model_state/")]
    m1 = [k for k in a1 if k.startswith("model_state/")]
    assert len(m0) == 3 and len(m1) == 2  # sorted keys round-robin


def test_reshard_merge(tmp_path):
    base = str(tmp_path / "rs.pt")
    payload = _payload()
    save_sharded_checkpoint(base, payload, num_shards=2)
    merged = load_sharded_checkpoint(base, num_shards=2)
    out_base = str(tmp_path / "rs4.pt")
    new = save_sharded_checkpoint(out_base, merged, num_shards=4)
    assert len(new) == 4
    out = load_sharded_checkpoint(out_base)
    for k in payload["model_state"]:
        np.testing.assert_array_equal(out["model_state"][k],
                                      payload["model_state"][k])


def test_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_sharded_checkpoint(str(tmp_path / "nope.pt"))


def test_pytree_flatten_roundtrip():
    tree = {"a": {"b": np.ones((2, 2), np.float32)},
            "c": [np.zeros(3, np.float32), np.full(4, 2.0, np.float32)]}
    flat = flatten_pytree(tree)
    assert set(flat) == {"a/b", "c/0", "c/1"}
    rebuilt = unflatten_like(tree, flat)
    np.testing.assert_array_equal(rebuilt["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(rebuilt["c"][1], tree["c"][1])


def test_unflatten_shape_mismatch():
    tree = {"w": np.ones((2, 2), np.float32)}
    with pytest.raises(ValueError, match="Shape mismatch"):
        unflatten_like(tree, {"w": np.ones((3, 3), np.float32)})
    with pytest.raises(KeyError):
        unflatten_like(tree, {})
