"""LPIPS perceptual loss — flax re-implementation of the official metric.

Capability parity with reference ``src/training/losses.py:38-75``
(``LPIPSLoss``): grayscale inputs are repeated to 3 channels, scaled from
[0, 1] to [-1, 1], run through frozen AlexNet features with per-layer unit
channel normalization, squared differences weighted by non-negative 1×1
linear heads, spatially averaged, summed over the five taps, clamped at 0 and
batch-averaged.  fp32 throughout (the reference disables autocast here).

The reference depends on the ``lpips`` pip package's pretrained AlexNet +
linear-head weights.  This environment has no network access and no pretrained
weights, so weight resolution is:

1. ``loss.lpips_weights_path`` in the config (an ``.npz`` of this module's
   flattened parameters, e.g. converted offline from the official release), or
   the ``LPIPS_WEIGHTS`` environment variable;
2. otherwise a **deterministic randomly-initialized frozen network**
   (PRNGKey(0)).  Random frozen conv features are a known usable perceptual
   distance (they preserve locality/frequency structure); this keeps configs
   with ``use_lpips: true`` runnable and differentiable, and is documented
   behavior, not silent: a warning is logged once.
"""

from __future__ import annotations

import os
import warnings
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# official LPIPS input scaling (net preprocessing)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

_ALEX_CFG = (
    # (features, kernel, stride, padding, pool_after)
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


class _AlexFeatures(nn.Module):
    """AlexNet feature trunk; returns activations after each ReLU tap."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (feats, k, s, p, pool) in enumerate(_ALEX_CFG):
            x = nn.Conv(feats, (k, k), strides=(s, s), padding=p,
                        dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class LPIPSModule(nn.Module):
    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)[None, None, None, :]
        scale = jnp.asarray(_SCALE)[None, None, None, :]
        net = _AlexFeatures(name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            # official normalize_tensor: x / (||x||_channels + 1e-10)
            a = a / (jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.uniform(scale=0.1),
                           (d.shape[-1],))
            w = jnp.abs(w)  # official heads are trained non-negative
            total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1),
                                     axis=(1, 2))
        return total  # (B,)


_warned = False


def resolve_weights_path(weights_path: str | None = None) -> str | None:
    """The usable converted-``.npz`` path (argument or ``$LPIPS_WEIGHTS``),
    or ``None`` when none exists."""
    path = weights_path or os.environ.get("LPIPS_WEIGHTS")
    return path if path and os.path.exists(path) else None


def resolve_weight_source(weights_path: str | None = None) -> str:
    """Display form for the CONFIG line: ``"pretrained:<path>"`` or the loud
    ``"random-init"`` marker."""
    path = resolve_weights_path(weights_path)
    return f"pretrained:{path}" if path else "random-init"


def _load_or_init_params(weights_path: str | None):
    global _warned
    module = LPIPSModule()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    path = resolve_weights_path(weights_path)
    if path:
        from ..io.checkpoint import unflatten_like

        flat = dict(np.load(path))
        params = unflatten_like(params, flat)
    elif not _warned:
        warnings.warn(
            "LPIPS pretrained weights not found; using deterministic "
            "randomly-initialized frozen features (set loss.lpips_weights_path "
            "or LPIPS_WEIGHTS to an .npz of converted official weights)."
        )
        _warned = True
    return module, params


def build_lpips_fn(weights_path: str | None = None):
    """Returns ``lpips(pred, target) -> scalar`` over NHWC [0,1] images.

    Matches reference prep (``losses.py:60-75``): 1→3 channel repeat,
    [0,1]→[-1,1], clamp-at-zero, batch mean.  Params are captured as frozen
    constants (no gradient flows to them; gradients flow to ``pred``).
    """
    module, params = _load_or_init_params(weights_path)
    params = jax.lax.stop_gradient(params)

    def _prep(x):
        x = x.astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return x * 2.0 - 1.0

    @partial(jax.named_call, name="lpips")
    def lpips(pred, target):
        if pred.shape != target.shape:
            raise ValueError(
                f"Shape mismatch: pred {pred.shape} vs target {target.shape}"
            )
        d = module.apply({"params": params}, _prep(pred), _prep(target))
        return jnp.mean(jnp.clip(d, min=0.0))

    return lpips
