"""Bilinear ×2 upsampling as separable depthwise transposed convolutions.

The reference decoder upsamples with torch ``Upsample(scale_factor=2,
mode='bilinear', align_corners=False)`` (``beta_vae.py:52-55``).  The naive
TPU lowering of ``jax.image.resize`` for that op runs ~4× off the HBM
roofline (measured 0.85 ms fwd+bwd at the 64→128 c64 production stage); a
hand-interleave formulation is worse still (layout shuffles), and Mosaic
cannot strided-store bf16, ruling out the direct pallas kernel.

What wins on this hardware (measured 0.62 ms at the same stage, exact to
bilinear half-pixel semantics *including edges*):

    pad x by 1 with edge replication, then per axis a depthwise
    ``conv_general_dilated`` with ``lhs_dilation=2`` and the fixed kernel
    [0.25, 0.75, 0.75, 0.25].

Derivation: with half-pixel centers, ``out[2i] = 0.25·x[i-1] + 0.75·x[i]``
and ``out[2i+1] = 0.75·x[i] + 0.25·x[i+1]`` with clamped indices; the edge
pad turns the clamps into ordinary interior taps, so the dilated conv with
zero padding reproduces them exactly.  XLA differentiates it for free (the
backward is the transposed depthwise conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TAPS = (0.25, 0.75, 0.75, 0.25)


def bilinear_upsample_x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, 2H, 2W, C), bilinear, align_corners=False."""
    b, h, w, c = x.shape
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    xp = jnp.concatenate([xp[:, :, :1], xp, xp[:, :, -1:]], axis=2)
    k = jnp.asarray(_TAPS, x.dtype)
    kr = jnp.broadcast_to(k.reshape(4, 1, 1, 1), (4, 1, 1, c))
    kc = jnp.broadcast_to(k.reshape(1, 4, 1, 1), (1, 4, 1, c))
    dn_r = jax.lax.conv_dimension_numbers(xp.shape, kr.shape,
                                          ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xp, kr, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(2, 1),
        dimension_numbers=dn_r, feature_group_count=c)
    dn_c = jax.lax.conv_dimension_numbers(y.shape, kc.shape,
                                          ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        y, kc, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(1, 2),
        dimension_numbers=dn_c, feature_group_count=c)
