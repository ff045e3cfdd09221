"""Device-resident input pipeline: whole-split HBM cache + index batching.

Replaces the reference's per-item PIL decode + DataLoader worker pool
(``src/utils/brain_tumor_utils/datautils.py:59-93``) with a TPU-first design:

- the packed uint8 split ((N, H, W, C), ~95 MB for the full 128 px train set)
  is uploaded to device memory ONCE (optionally sharded over a data mesh),
- each step the host supplies only a ``(B,)`` int32 index vector; the jitted
  step gathers the batch, converts to float [0,1] and augments on device —
  zero steady-state host↔device image traffic,
- epoch order is a seeded host-side permutation (train shuffles per epoch with
  a deterministic per-epoch seed; test iterates in order, mirroring
  ``DataLoader(shuffle=True, generator=seed)`` / ``shuffle=False``).

The final short batch is padded up to ``batch_size`` with repeated indices and
a validity mask so the step compiles exactly once per shape; loss/metrics are
mask-weighted, preserving the reference's drop_last=False semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import ArrayDataset


@dataclass
class DeviceData:
    """A split resident on device: uint8 images + int32 labels.

    ``host_feed=True`` keeps the packed array in host RAM instead (datasets
    larger than the configured HBM budget); batches are then gathered on host
    and shipped per step — the async dispatch pipeline hides the H2D copy.
    """

    images: object      # jax.Array on device, or np.ndarray when host_feed
    labels: np.ndarray  # (N,) int32 (host; only consumed host-side)
    n: int
    host_feed: bool = False

    @classmethod
    def from_dataset(cls, ds: ArrayDataset, sharding=None,
                     max_device_bytes: int | None = None) -> "DeviceData":
        labels = ds.labels.astype(np.int32)
        if max_device_bytes is not None and ds.images.nbytes > max_device_bytes:
            return cls(images=ds.images, labels=labels, n=len(ds),
                       host_feed=True)
        if sharding is not None:
            images = jax.device_put(ds.images, sharding)
        else:
            images = jax.device_put(ds.images)
        return cls(images=images, labels=labels, n=len(ds))

    def batch(self, idx: np.ndarray):
        """Host-side gather for host_feed mode: uint8 (..., H, W, C)."""
        return self.images[idx]


def host_feed_chunk_limit(batch_size: int, image_shape,
                          budget_mb: float) -> int:
    """Largest scan-chunk ``K`` whose host-feed payload fits one dispatch.

    In host-feed mode each multi-step dispatch ships a ``(K, B, H, W, C)``
    uint8 stack host→device; unclamped (K=192, bs32, 128 px) that is ~100 MB
    per dispatch — minutes through a ~30 MB/s tunneled runtime.  The train
    loop clamps K to this limit (``training.host_feed_chunk_mb``, default
    8 MB ≈ 16 steps at flagship shape) so streaming mode stays responsive;
    results are bit-identical since K only sets the scan chunking.
    """
    bytes_per_step = int(batch_size) * int(np.prod(image_shape))
    return max(1, int(budget_mb * 1024 * 1024) // max(1, bytes_per_step))


def gather_batch(images: jax.Array, idx: jax.Array) -> jax.Array:
    """Device gather + uint8→float [0,1] conversion (ToTensor semantics)."""
    x = jnp.take(images, idx, axis=0)
    return x.astype(jnp.float32) / 255.0


class BatchPlan:
    """Seeded epoch batching over ``n`` samples with fixed-shape padded batches.

    ``batches(epoch)`` yields ``(idx, mask)`` numpy pairs where ``idx`` is
    always ``(batch_size,)`` and ``mask`` flags real (non-padded) samples.
    """

    def __init__(self, n: int, batch_size: int, *, shuffle: bool, seed: int):
        self.n = int(n)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed)

    @property
    def steps_per_epoch(self) -> int:
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(self.n, dtype=np.int32)
        if self.shuffle:
            rng = np.random.default_rng(np.uint64(self.seed * 1_000_003 + epoch))
            rng.shuffle(order)
        return order

    def batches(self, epoch: int):
        order = self.epoch_order(epoch)
        bs = self.batch_size
        for start in range(0, self.n, bs):
            chunk = order[start : start + bs]
            k = len(chunk)
            if k < bs:
                pad = np.resize(chunk, bs - k)  # repeat real indices as filler
                idx = np.concatenate([chunk, pad])
                mask = np.zeros(bs, dtype=np.float32)
                mask[:k] = 1.0
            else:
                idx = chunk
                mask = np.ones(bs, dtype=np.float32)
            yield idx.astype(np.int32), mask
