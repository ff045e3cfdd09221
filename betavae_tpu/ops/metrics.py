"""Reconstruction metrics: MSE / PSNR / SSIM with reference semantics, batched.

The reference computes these per image in a Python loop
(``src/evaluation/recon_metrics.py:58-103``); here the whole batch is
processed by single XLA programs — the SSIM window convolutions run once over
the full (B, H, W, C) batch with per-image dynamic ranges broadcast in, which
is both faster and far cheaper to compile than a vmapped per-image kernel.

Reference-parity details (deliberately nonstandard, kept for eval parity —
SURVEY.md §7 "SSIM/PSNR parity"):
- ``psnr``: max signal fixed at 1.0, returns 99.0 on zero MSE
  (``recon_metrics.py:16-20``),
- ``ssim``: 11×11 σ=1.5 Gaussian window, depthwise convolution with same
  padding, dynamic range ``L = x.max() - x.min()`` of the *first* argument
  per image with floor 1.0 when non-positive, variance clamping at 0,
  ``1e-12`` denominator guard (``recon_metrics.py:23-55``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    m = jnp.mean((a - b) ** 2)
    # 20*log10(1.0) - 10*log10(m); 99.0 cap on zero MSE (ref recon_metrics.py:16-20)
    val = -10.0 * jnp.log10(jnp.maximum(m, 1e-30))
    return jnp.where(m == 0, 99.0, val)


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    k2d = np.outer(g, g)
    return (k2d / k2d.sum()).astype(np.float32)


def _depthwise_same_conv(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C); kernel: (kh, kw) applied per channel, same padding."""
    c = x.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]          # (kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))                      # (kh, kw, in/groups=1, C)
    return jax.lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def batched_ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
                 sigma: float = 1.5) -> jnp.ndarray:
    """Per-image SSIM over a batch; x, y: (B, H, W, C).  Returns (B,)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    window = _gaussian_window(window_size, sigma)

    # per-image dynamic range from the first argument (ref recon_metrics.py:37-39)
    L = (jnp.max(x, axis=(1, 2, 3)) - jnp.min(x, axis=(1, 2, 3)))
    L = jnp.where(L <= 0, 1.0, L)[:, None, None, None]
    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2

    mu_x = _depthwise_same_conv(x, window)
    mu_y = _depthwise_same_conv(y, window)
    mu_x_sq = mu_x * mu_x
    mu_y_sq = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x_sq = jnp.clip(_depthwise_same_conv(x * x, window) - mu_x_sq, min=0.0)
    sigma_y_sq = jnp.clip(_depthwise_same_conv(y * y, window) - mu_y_sq, min=0.0)
    sigma_xy = _depthwise_same_conv(x * y, window) - mu_xy
    denom = (mu_x_sq + mu_y_sq + C1) * (sigma_x_sq + sigma_y_sq + C2)
    num = (2 * mu_xy + C1) * (2 * sigma_xy + C2)
    return jnp.mean(num / (denom + 1e-12), axis=(1, 2, 3))


def ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """SSIM of one image pair; x, y: (H, W, C) in [0, 1]."""
    return batched_ssim(x[None], y[None], window_size, sigma)[0]


@jax.jit
def batched_image_metrics(recon: jnp.ndarray, x: jnp.ndarray) -> dict:
    """Per-image mse/psnr/ssim over a batch: recon, x of shape (B, H, W, C).

    Note argument order matches the reference's per-image calls
    ``mse(ri, xi) / psnr(ri, xi) / ssim(ri, xi)`` (``recon_metrics.py:76-78``)
    — SSIM's dynamic range comes from the *reconstruction*.
    """
    r = recon.astype(jnp.float32)
    t = x.astype(jnp.float32)
    per_img_mse = jnp.mean((r - t) ** 2, axis=(1, 2, 3))
    psnr_v = jnp.where(per_img_mse == 0, 99.0,
                       -10.0 * jnp.log10(jnp.maximum(per_img_mse, 1e-30)))
    return {
        "mse": per_img_mse,
        "psnr": psnr_v,
        "ssim": batched_ssim(r, t),
    }
