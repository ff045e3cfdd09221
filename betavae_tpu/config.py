"""YAML config system: frozen attribute-tree singleton with env-based resolution.

Capability parity with the reference config parser
(``src/utils/brain_tumor_utils/config_parser.py:1-90``):

- resolution priority: explicit arg > ``CONFIG_PATH`` env >
  ``configs/beta_vae_se.yaml`` > ``configs/overfit_capacity.yaml``
  (reference ``config_parser.py:45-73``),
- 12 required top-level sections (reference ``config_parser.py:6-9``),
- ``data.class_mode`` in {binary, multiclass} and ``beta_schedule.type``
  validation (reference ``config_parser.py:35-43``).  Deviation (documented,
  SURVEY.md quirk #2): the reference validator rejects ``cosine`` even though
  its scheduler implements it; we accept it.
- immutable ``Frozen`` tree with double-checked-lock caching
  (reference ``config_parser.py:27-33,82-90``); we additionally expose
  ``reset_config_cache`` so tests and long-lived processes can switch configs.
"""

from __future__ import annotations

import os
from copy import deepcopy
from threading import Lock

import yaml

_REQUIRED_TOP_KEYS = (
    "paths",
    "data",
    "model",
    "training",
    "optimization",
    "beta_schedule",
    "augmentation",
    "evaluation",
    "inference",
    "logging",
    "experiment",
    "debug",
)

_VALID_CLASS_MODES = ("binary", "multiclass")
# Reference validator: constant|linear|cyclical (config_parser.py:41).  We also
# accept cosine, which the reference BetaScheduler implements (schedulers.py:63).
_VALID_BETA_TYPES = ("constant", "linear", "cyclical", "cosine")


class Frozen:
    """Immutable attribute-tree view over a nested dict.

    Mirrors reference ``_Frozen`` (``config_parser.py:11-30``): attribute and
    item access, ``to_dict`` round-trip, and a guard against reassignment.
    """

    def __init__(self, d: dict):
        for k, v in d.items():
            if isinstance(v, dict):
                v = Frozen(v)
            super().__setattr__(k, v)

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, Frozen) else v
        return out

    def keys(self):
        return self.__dict__.keys()

    def __getitem__(self, item):
        return getattr(self, item)

    def __contains__(self, item):
        return item in self.__dict__

    def __setattr__(self, key, value):
        raise AttributeError("Frozen config is immutable")

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Frozen({self.to_dict()!r})"


def get(node, name, default=None):
    """``getattr`` with default that also works on plain dicts."""
    if node is None:
        return default
    if isinstance(node, dict):
        return node.get(name, default)
    return getattr(node, name, default)


_config_cache = None
_config_cache_path = None
_config_lock = Lock()


def validate(raw: dict) -> dict:
    missing = [k for k in _REQUIRED_TOP_KEYS if k not in raw]
    if missing:
        raise ValueError(f"Missing required top-level keys: {missing}")
    if raw["data"]["class_mode"] not in _VALID_CLASS_MODES:
        raise ValueError("data.class_mode must be binary or multiclass")
    if raw["beta_schedule"]["type"] not in _VALID_BETA_TYPES:
        raise ValueError("beta_schedule.type invalid")
    return raw


def resolve_config_path(path: str | None = None) -> str:
    """Pick a usable config path (reference ``config_parser.py:45-73``)."""
    candidates = []
    if path:
        candidates.append(path)
    env_path = os.environ.get("CONFIG_PATH")
    if env_path:
        candidates.append(env_path)
    candidates.append("configs/beta_vae_se.yaml")
    candidates.append("configs/overfit_capacity.yaml")

    tried = []
    for cand in candidates:
        if not cand:
            continue
        cand = os.path.expanduser(str(cand))
        tried.append(cand)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"Config file not found. Set CONFIG_PATH or pass a path. Tried: {tried}"
    )


def load_config(path: str | None = None) -> dict:
    cfg_path = resolve_config_path(path)
    with open(cfg_path, "r") as f:
        raw = yaml.safe_load(f)
    validate(raw)
    return raw


def get_config(path: str | None = None) -> Frozen:
    """Return the cached frozen config, loading it on first use.

    Double-checked locking mirrors reference ``config_parser.py:82-90``.
    If a *different* explicit ``path`` is requested than the one cached, the
    cache is refreshed (the reference silently returns the stale singleton; we
    treat an explicit new path as intent to switch).
    """
    global _config_cache, _config_cache_path
    requested = resolve_config_path(path) if path else None
    if _config_cache is None or (requested and requested != _config_cache_path):
        with _config_lock:
            if _config_cache is None or (
                requested and requested != _config_cache_path
            ):
                raw = load_config(path)
                _config_cache = Frozen(deepcopy(raw))
                _config_cache_path = resolve_config_path(path)
    return _config_cache


def reset_config_cache() -> None:
    """Drop the config singleton (tests / multi-config processes)."""
    global _config_cache, _config_cache_path
    with _config_lock:
        _config_cache = None
        _config_cache_path = None
