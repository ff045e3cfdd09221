"""Data-parallel scaling over a TPU slice: mesh + sharding helpers.

The reference has NO distributed support (SURVEY.md §2.3 — single
``cuda``-if-available device, no DDP/NCCL).  The TPU-native equivalent added
here is the one strategy this workload needs: **data parallelism over a 1-D
``data`` mesh**, expressed as ``jax.sharding.NamedSharding`` annotations on
the batch dimension.  ``jax.jit`` then partitions the fused train step and
inserts the gradient all-reduce over ICI automatically — there is no
host-side communication backend to manage.

Model/optimizer state is replicated (a ~23M-param conv VAE fits trivially
per-chip); batch indices, images and per-sample intermediates shard along
``data``.  Multi-chip correctness is exercised on a virtual 8-device CPU mesh
in CI (``XLA_FLAGS=--xla_force_host_platform_device_count=8``) and by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ``data``; defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                # never silently truncate: the caller believes they run
                # n-way data parallel with per-device batch B/n — running
                # B/len(devices) instead skews memory and throughput
                # expectations with no error (r5 review finding)
                raise ValueError(
                    f"requested a {n_devices}-device data mesh but only "
                    f"{len(devices)} device(s) are visible "
                    f"({[str(d) for d in devices]})")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_state(state, mesh: Mesh):
    """Fully replicate a state pytree over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "shape") else x,
        state,
    )


def chunk_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (K, B) stacked step batches along the batch (second) axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch_indices(idx: np.ndarray, mask: np.ndarray, mesh: Mesh):
    """Place a (B,) index/mask pair sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.device_put(idx, sh), jax.device_put(mask, sh)
