"""Config system tests (schema, resolution, immutability, validation)."""

import os

import pytest
import yaml

from betavae_tpu.config import (Frozen, get_config, load_config,
                                reset_config_cache, resolve_config_path)


def test_shipped_configs_validate():
    for name in ("beta_vae_se.yaml", "beta_vae_se_debug.yaml",
                 "overfit_capacity.yaml"):
        raw = load_config(os.path.join("configs", name))
        assert raw["data"]["class_mode"] in ("binary", "multiclass")


def test_frozen_immutable():
    f = Frozen({"a": 1, "b": {"c": 2}})
    assert f.a == 1
    assert f.b.c == 2
    assert f["b"]["c"] == 2
    with pytest.raises(AttributeError):
        f.a = 5
    assert f.to_dict() == {"a": 1, "b": {"c": 2}}


def test_missing_top_key_rejected(tmp_path):
    raw = yaml.safe_load(open("configs/beta_vae_se_debug.yaml"))
    del raw["experiment"]
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(raw))
    with pytest.raises(ValueError, match="experiment"):
        load_config(str(p))


def test_invalid_class_mode_rejected(tmp_path):
    raw = yaml.safe_load(open("configs/beta_vae_se_debug.yaml"))
    raw["data"]["class_mode"] = "ternary"
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(raw))
    with pytest.raises(ValueError, match="class_mode"):
        load_config(str(p))


def test_env_resolution(tmp_path, monkeypatch):
    raw = yaml.safe_load(open("configs/beta_vae_se_debug.yaml"))
    raw["paths"]["run_id"] = "env_pick"
    p = tmp_path / "env.yaml"
    p.write_text(yaml.safe_dump(raw))
    monkeypatch.setenv("CONFIG_PATH", str(p))
    assert resolve_config_path() == str(p)
    cfg = get_config()
    assert cfg.paths.run_id == "env_pick"


def test_singleton_caching_and_reset():
    c1 = get_config("configs/beta_vae_se_debug.yaml")
    c2 = get_config()
    assert c1 is c2
    reset_config_cache()
    c3 = get_config("configs/beta_vae_se.yaml")
    assert c3.paths.run_id == "beta_vae_se"


def test_explicit_new_path_switches():
    c1 = get_config("configs/beta_vae_se_debug.yaml")
    c2 = get_config("configs/beta_vae_se.yaml")
    assert c2.paths.run_id == "beta_vae_se"
    assert c1.paths.run_id == "beta_vae_se_debug"
