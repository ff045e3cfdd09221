"""Training callbacks: early stopping + checkpoint management.

Capability parity with reference ``src/training/callbacks.py:32-89``:

- :class:`EarlyStopping`: patience / min_delta / min-or-max monitoring
  (ref ``callbacks.py:32-51``),
- :class:`CheckpointManager`: ``save_latest`` every epoch and monitored
  ``save_best`` (val_total, min) as 2-way sharded checkpoints named
  ``<run_id>_{latest,best}.pt`` (ref ``callbacks.py:53-89``), payload
  ``{epoch, total_steps, model_state, optim_state, val_total}``.
"""

from __future__ import annotations

import os

from ..config import get_config
from ..io.checkpoint import flatten_pytree, save_sharded_checkpoint


class EarlyStopping:
    def __init__(self, patience: int = 20, min_delta: float = 0.0, mode: str = "min"):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best = None
        self.num_bad = 0
        self.should_stop = False

    def update(self, value: float) -> None:
        if self.best is None:
            self.best = value
            return
        improve = (
            value < self.best - self.min_delta
            if self.mode == "min"
            else value > self.best + self.min_delta
        )
        if improve:
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad >= self.patience:
                self.should_stop = True


class CheckpointManager:
    """Saves jitted-state snapshots with reference-compatible naming.

    ``async_io=True`` overlaps the device→host transfer and file write with
    training (orbax-style): the state is snapshotted on device with
    ``jnp.copy`` (fresh buffers, so the training loop's donated buffers are
    never touched by the writer), and a single background thread pulls and
    writes it.  Saves are strictly ordered — each save drains the previous
    one — and :meth:`drain` must run before reading the files or exiting
    (``train()`` drains at loop exit).  Off by default; the artifacts are
    byte-identical either way (tested).
    """

    def __init__(self, num_shards: int = 2, async_io: bool = False):
        cfg = get_config()
        self.dir = cfg.paths.models_dir
        os.makedirs(self.dir, exist_ok=True)
        self.run_id = cfg.paths.run_id
        self.num_shards = num_shards
        self.best_value = None
        self.async_io = async_io
        self._pending = None
        self._pending_error = None

    def _payload(self, state, epoch: int, total_steps: int, extra: dict) -> dict:
        return {
            "epoch": int(epoch),
            "total_steps": int(total_steps),
            "model_state": flatten_pytree(state.model_variables()),
            "optim_state": flatten_pytree(state.opt_state),
            **{k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in extra.items()},
        }

    def drain(self) -> None:
        """Block until any in-flight async save has finished; re-raise its
        error if it failed."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._pending_error is not None:
            err, self._pending_error = self._pending_error, None
            raise err

    def _save(self, path: str, payload: dict):
        if not self.async_io:
            return save_sharded_checkpoint(path, payload,
                                           num_shards=self.num_shards)
        import threading

        import jax
        import jax.numpy as jnp

        self.drain()
        # device-side copy: fresh buffers the background pull can read while
        # the training loop donates/overwrites the live state buffers
        for sec in ("model_state", "optim_state"):
            payload[sec] = {k: (jnp.copy(v) if isinstance(v, jax.Array)
                                else v)
                            for k, v in payload[sec].items()}

        def work():
            try:
                save_sharded_checkpoint(path, payload,
                                        num_shards=self.num_shards)
            except Exception as e:  # surfaced on the next drain()
                self._pending_error = e

        t = threading.Thread(target=work, daemon=True,
                             name="betavae-ckpt-writer")
        t.start()
        self._pending = t
        return path

    def save_latest(self, state, epoch: int, total_steps: int, extra: dict):
        path = os.path.join(self.dir, f"{self.run_id}_latest.pt")
        return self._save(path, self._payload(state, epoch, total_steps,
                                              extra))

    def restore_best_history(self) -> None:
        """Re-arm ``save_best`` with the historical best after a resume.

        The reference forgets its best-so-far across resume and overwrites
        ``_best`` with the first post-resume epoch even if worse
        (``callbacks.py:53-89``); we re-read ``val_total`` from the existing
        best checkpoint instead (documented deviation, DESIGN.md §4 #12).
        Metadata-only read — no arrays are deserialized.
        """
        from ..io.checkpoint import read_checkpoint_meta

        path = os.path.join(self.dir, f"{self.run_id}_best.pt")
        try:
            payload = read_checkpoint_meta(path)
        except FileNotFoundError:
            return
        monitor = payload.get("val_total")
        if monitor is not None:
            self.best_value = float(monitor)

    def save_best(self, state, epoch: int, total_steps: int, extra: dict,
                  monitor_value: float):
        if self.best_value is None or monitor_value < self.best_value:
            self.best_value = monitor_value
            path = os.path.join(self.dir, f"{self.run_id}_best.pt")
            return self._save(path, self._payload(state, epoch, total_steps,
                                                  extra))
        return None
