"""Persistent XLA compilation cache setup.

Every CLI in this framework is a fresh Python process; on remote-compile TPU
toolchains a cold compile of the encoder or fused train step costs tens of
seconds and is occasionally much worse.  Enabling JAX's persistent
compilation cache makes each distinct XLA program compile once per machine.

This must run through ``jax.config.update`` (not env vars) because this
environment's ``sitecustomize`` imports jax before any user code, freezing
env-derived config defaults.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "betavae_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without these knobs
        pass
