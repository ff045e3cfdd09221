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


def test_reshard_narrower_removes_stale_shards(tmp_path):
    """An in-place reshard 4->2 must delete _shard2/_shard3: a later load
    globs every shard file and would silently merge old-epoch arrays over
    the fresh ones (r5 review finding)."""
    base = str(tmp_path / "ns.pt")
    save_sharded_checkpoint(base, _payload(), num_shards=4)
    p2 = _payload()
    p2["epoch"] = 9
    p2["model_state"] = {k: v + 1.0 for k, v in p2["model_state"].items()}
    save_sharded_checkpoint(base, p2, num_shards=2)

    import glob
    left = sorted(glob.glob(str(tmp_path / "ns_shard*.pt")))
    assert len(left) == 2, f"stale shards survived: {left}"
    out = load_sharded_checkpoint(base)
    assert out["epoch"] == 9
    for k in p2["model_state"]:
        np.testing.assert_array_equal(out["model_state"][k],
                                      p2["model_state"][k])


def test_load_rejects_torn_shard_set(tmp_path):
    """A hard kill between the per-shard os.replace calls leaves shard0 at
    epoch N and shard1 at epoch N-1 — the merge must refuse, not silently
    mix epochs (r5 review finding)."""
    import shutil

    old = str(tmp_path / "old" / "t.pt")
    new = str(tmp_path / "new" / "t.pt")
    p1 = _payload()
    save_sharded_checkpoint(old, p1, num_shards=2)
    p2 = _payload()
    p2["epoch"] = 5
    save_sharded_checkpoint(new, p2, num_shards=2)
    # simulate the torn write: new shard0, old shard1
    shutil.copy(str(tmp_path / "old" / "t_shard1.pt"),
                str(tmp_path / "new" / "t_shard1.pt"))
    with pytest.raises(ValueError, match="torn"):
        load_sharded_checkpoint(new)


def test_load_rejects_stale_extra_shard(tmp_path):
    """A shard file beyond the set's recorded num_shards means a stale file
    from an earlier wider save is mixed in — refuse loudly."""
    import shutil

    base = str(tmp_path / "x.pt")
    save_sharded_checkpoint(base, _payload(), num_shards=2)
    shutil.copy(str(tmp_path / "x_shard1.pt"), str(tmp_path / "x_shard2.pt"))
    with pytest.raises(ValueError, match="num_shards"):
        load_sharded_checkpoint(base)


def test_torch_adam_moments_survive_reshard(tmp_path):
    """Imported torch Adam moments must round-trip through save/load so
    resharding a torch-origin checkpoint keeps the optimizer trajectory
    (r5 review finding: they were silently dropped)."""
    base = str(tmp_path / "m.pt")
    payload = _payload()
    rng = np.random.default_rng(1)
    moments = {
        "count": 77,
        "mu": {k: rng.normal(size=v.shape).astype(np.float32)
               for k, v in payload["model_state"].items()},
        "nu": {k: rng.normal(size=v.shape).astype(np.float32) ** 2
               for k, v in payload["model_state"].items()},
    }
    payload["torch_adam_moments"] = moments
    save_sharded_checkpoint(base, payload, num_shards=3)
    out = load_sharded_checkpoint(base)
    got = out["torch_adam_moments"]
    assert got["count"] == 77
    for m in ("mu", "nu"):
        assert set(got[m]) == set(moments[m])
        for k in moments[m]:
            np.testing.assert_array_equal(got[m][k], moments[m][k])


def test_save_warns_on_dropped_payload_entries(tmp_path):
    """Non-serializable payload entries must not vanish silently."""
    base = str(tmp_path / "w.pt")
    payload = _payload()
    payload["mystery_blob"] = object()
    with pytest.warns(UserWarning, match="mystery_blob"):
        save_sharded_checkpoint(base, payload, num_shards=2)
    out = load_sharded_checkpoint(base)
    assert "mystery_blob" not in out


def test_async_presnapshot_artifacts_identical(tmp_path, monkeypatch):
    """presnapshot=True (rotated-loop path: the state is already a fresh
    device snapshot) must produce byte-identical artifacts to the default
    copy-at-queue-time path."""
    import jax
    import yaml

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.train.callbacks import CheckpointManager

    cfg_src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "beta_vae_se_debug.yaml")
    raw = yaml.safe_load(open(cfg_src))
    raw["paths"]["models_dir"] = str(tmp_path / "models")
    raw["paths"]["outputs_dir"] = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(raw, open(cfg_path, "w"))
    reset_config_cache()
    get_config(cfg_path)

    from types import SimpleNamespace

    leaves = {"w": jax.numpy.arange(6.0).reshape(2, 3)}
    opt = {"m": jax.numpy.ones((2, 3))}
    state = SimpleNamespace(model_variables=lambda: dict(leaves),
                            opt_state=dict(opt))
    try:
        a = CheckpointManager(num_shards=2, async_io=True)
        a.save_latest(state, 3, 30, {"val_total": 2.0})
        a.drain()
        copy_path = load_sharded_checkpoint(
            os.path.join(a.dir, f"{a.run_id}_latest.pt"))

        b = CheckpointManager(num_shards=2, async_io=True)
        b.save_latest(state, 3, 30, {"val_total": 2.0}, presnapshot=True)
        b.drain()
        pre_path = load_sharded_checkpoint(
            os.path.join(b.dir, f"{b.run_id}_latest.pt"))
    finally:
        reset_config_cache()

    assert copy_path["epoch"] == pre_path["epoch"] == 3
    for sec in ("model_state", "optim_state"):
        assert set(copy_path[sec]) == set(pre_path[sec])
        for k in copy_path[sec]:
            np.testing.assert_array_equal(copy_path[sec][k],
                                          pre_path[sec][k])
