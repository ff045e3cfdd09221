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

import numpy as np

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
        import math

        if not math.isfinite(value):
            # a non-finite monitor must never become `best` — `NaN < x` is
            # False for every x, so it would freeze the tracker and burn
            # patience silently.  Count it as a bad epoch instead (the train
            # loop's anomaly guard raises before we get here when enabled).
            self.num_bad += 1
            if self.num_bad >= self.patience:
                self.should_stop = True
            return
        if self.best is None:
            self.best = value
            # the non-finite branch above can run before any best exists
            # (guard off, NaN on epoch 1): the first finite value is an
            # improvement, so the bad-epoch count must restart with it
            self.num_bad = 0
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


_SNAPSHOT_JIT = None


def _snapshot_tree(tree):
    """Fresh on-device copies of every leaf in one compiled dispatch."""
    global _SNAPSHOT_JIT
    if _SNAPSHOT_JIT is None:
        import jax
        import jax.numpy as jnp

        _SNAPSHOT_JIT = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t))
    return _SNAPSHOT_JIT(tree)


class CheckpointManager:
    """Saves jitted-state snapshots with reference-compatible naming.

    ``async_io=True`` makes saves fully non-blocking (orbax-style): the
    state is snapshotted on device with ``jnp.copy`` (fresh buffers, so the
    training loop's donated buffers are never touched), queued per tag
    (``latest`` / ``best``), and a background thread performs the
    device→host pull + file write.  The queue is depth-1 per tag with
    latest-wins coalescing: when the writer is slower than the epoch rate
    (e.g. a ~17 MB/s relayed D2H link pulling a ~280 MB state), newer
    snapshots replace queued ones and the writer self-paces — training
    NEVER stalls on checkpoint I/O.  On-disk ``latest`` may then lag a few
    epochs mid-run (deviation ledger, DESIGN.md §4); :meth:`drain` (called
    at loop exit, even on error) flushes the queue so the final state
    always lands.  Off by default; artifacts are byte-identical either way
    (tested).
    """

    def __init__(self, num_shards: int = 2, async_io: bool = False):
        cfg = get_config()
        self.dir = cfg.paths.models_dir
        os.makedirs(self.dir, exist_ok=True)
        self.run_id = cfg.paths.run_id
        self.num_shards = num_shards
        self.best_value = None
        self.async_io = async_io
        self._pending_error = None
        import threading

        self._lock = threading.Lock()
        self._queue = {}       # tag -> (path, payload with device leaves)
        self._worker = None
        self.writes = 0        # completed file writes (observability/tests)
        self.coalesced = 0     # queued snapshots replaced before writing

    def _payload(self, state, epoch: int, total_steps: int, extra: dict) -> dict:
        # async mode keeps jax.Array leaves on device here; the snapshot and
        # the device→host pull both happen later (copy at queue time, pull
        # in the worker thread) so the training thread never blocks
        on_host = not self.async_io
        return {
            "epoch": int(epoch),
            "total_steps": int(total_steps),
            "model_state": flatten_pytree(state.model_variables(),
                                          to_host=on_host),
            "optim_state": flatten_pytree(state.opt_state, to_host=on_host),
            **{k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in extra.items()},
        }

    def drain(self) -> None:
        """Block until the queue is flushed and the writer idle; re-raise
        the first worker error if any save failed."""
        while True:
            with self._lock:
                w = self._worker
            if w is None:
                break
            w.join()
        if self._pending_error is not None:
            err, self._pending_error = self._pending_error, None
            raise err

    def _run_worker(self):
        while True:
            with self._lock:
                if not self._queue:
                    self._worker = None
                    return
                # 'best' before 'latest': a best improvement is the rarer,
                # higher-value artifact
                tag = "best" if "best" in self._queue else next(iter(self._queue))
                path, payload = self._queue.pop(tag)
            try:
                # the device→host pull happens HERE, off the training thread
                for sec in ("model_state", "optim_state"):
                    payload[sec] = {k: np.asarray(v)
                                    for k, v in payload[sec].items()}
                save_sharded_checkpoint(path, payload,
                                        num_shards=self.num_shards)
                self.writes += 1
            except Exception as e:  # surfaced on the next drain()
                if self._pending_error is None:
                    self._pending_error = e

    def _save(self, tag: str, path: str, payload: dict,
              presnapshot: bool = False):
        if not self.async_io:
            out = save_sharded_checkpoint(path, payload,
                                          num_shards=self.num_shards)
            self.writes += 1
            return out
        import threading

        import jax

        # a failed background write must surface within one epoch (at the
        # next save), not silently at loop-exit drain: a long run whose
        # writes all fail would otherwise finish with zero checkpoints
        with self._lock:
            if self._pending_error is not None:
                err, self._pending_error = self._pending_error, None
                raise err

        # device-side copy: fresh buffers the background pull can read while
        # the training loop donates/overwrites the live state buffers.  The
        # copies are enqueued on the device stream *before* the next train
        # dispatch, so they read the pre-donation values.  ONE jitted
        # program copies every leaf — per-leaf jnp.copy would pay one relay
        # dispatch per leaf (~400 dispatches per save on the flagship state)
        # presnapshot: the caller's state is ALREADY a fresh device snapshot
        # (the rotated train loop snapshots once per epoch for its own
        # rollback) — copying it again would burn an extra full-state HBM
        # copy + relay dispatch per save for nothing (r5 review finding)
        if not presnapshot:
            dev = {sec: {k: v for k, v in payload[sec].items()
                         if isinstance(v, jax.Array)}
                   for sec in ("model_state", "optim_state")}
            copies = _snapshot_tree(dev)
            for sec in ("model_state", "optim_state"):
                payload[sec] = {**payload[sec], **copies[sec]}
        with self._lock:
            if tag in self._queue:
                self.coalesced += 1
            self._queue[tag] = (path, payload)
            if self._worker is None:
                self._worker = threading.Thread(
                    target=self._run_worker, daemon=True,
                    name="betavae-ckpt-writer")
                self._worker.start()
        return path

    def save_latest(self, state, epoch: int, total_steps: int, extra: dict,
                    presnapshot: bool = False):
        path = os.path.join(self.dir, f"{self.run_id}_latest.pt")
        return self._save("latest", path,
                          self._payload(state, epoch, total_steps, extra),
                          presnapshot=presnapshot)

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
                  monitor_value: float, presnapshot: bool = False):
        import math

        if not math.isfinite(monitor_value):
            # never ingest a non-finite monitor: it would become best_value
            # on the first epoch and nothing ever compares better than NaN.
            # Loudly: with detect_anomalies off this is the only trace of
            # why <run_id>_best.pt was never refreshed this epoch.
            import logging
            logging.getLogger("beta_vae_se").warning(
                "save_best: non-finite monitor %r at epoch %d — skipping "
                "best-checkpoint update", monitor_value, epoch)
            return None
        if self.best_value is None or monitor_value < self.best_value:
            self.best_value = monitor_value
            path = os.path.join(self.dir, f"{self.run_id}_best.pt")
            # coalescing is monotone-safe here: a queued best snapshot is
            # only ever replaced by a strictly better one
            return self._save("best", path,
                              self._payload(state, epoch, total_steps, extra),
                              presnapshot=presnapshot)
        return None
