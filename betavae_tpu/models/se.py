"""Squeeze-and-Excitation channel gating.

Capability parity with reference ``src/models/se_blocks.py:4-19``: global
average pool → Linear(C → max(1, C//r)) → ReLU → Linear(→ C) → Sigmoid →
channelwise scale.  NHWC layout; the two projections are MXU matmuls and the
gate fuses into the surrounding convolution epilogue under XLA.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class SEBlock(nn.Module):
    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_gate: bool = False):
        r = max(1, self.channels // self.reduction)
        y = jnp.mean(x, axis=(1, 2))                       # (B, C) squeeze
        y = nn.Dense(r, dtype=self.dtype, kernel_init=_kaiming, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, kernel_init=_kaiming,
                     name="fc2")(y)
        y = nn.sigmoid(y)
        if return_gate:
            # ungated activations + gates, for callers that fold the gate
            # into a following op (ops/pallas_head.py)
            return x, y
        return x * y[:, None, None, :]
