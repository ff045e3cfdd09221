"""Shared CLI bootstrap: repo root on sys.path, headless matplotlib."""

import os
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))

if not os.environ.get("MPLBACKEND"):
    import matplotlib

    matplotlib.use("Agg")

# Persistent XLA compilation cache: every CLI is a fresh process, and on
# remote-compile TPU toolchains a cold compile of the encoder/train step can
# dominate (or flake).  Cache compiled executables across invocations.
from betavae_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
