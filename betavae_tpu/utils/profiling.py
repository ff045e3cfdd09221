"""First-class profiling hooks (the reference had none — SURVEY.md §5).

``StepProfiler`` captures a ``jax.profiler`` trace of the first N training
steps when ``logging.profile_steps`` is set in the config; the trace lands in
``<outputs_dir>/profile`` for TensorBoard/XProf.  Zero overhead when off.
"""

from __future__ import annotations

import os


class StepProfiler:
    def __init__(self, profile_steps: int, out_dir: str):
        self.remaining = int(profile_steps or 0)
        self.out_dir = out_dir
        self.active = False

    def maybe_start(self) -> None:
        if self.remaining > 0 and not self.active:
            import jax

            os.makedirs(self.out_dir, exist_ok=True)
            try:
                jax.profiler.start_trace(self.out_dir)
                self.active = True
            except Exception:  # pragma: no cover - backend without profiler
                self.remaining = 0

    def after_step(self, n: int = 1) -> None:
        if not self.active:
            return
        self.remaining -= n
        if self.remaining <= 0:
            self.stop()

    def stop(self) -> None:
        if self.active:
            import jax

            try:
                jax.profiler.stop_trace()
            finally:
                self.active = False
