"""Golden-value parity vs torch implementations of the reference formulas.

These tests re-implement the reference's documented math in torch (CPU) —
the ELBO objective (ref ``src/models/beta_vae.py:185-253``), the hand-rolled
SSIM (ref ``src/evaluation/recon_metrics.py:23-55``) and the Focal Frequency
Loss (ref ``src/training/losses.py:16-35``) — and check our JAX ops produce
the same numbers on identical inputs.  This pins eval/train parity without
importing any reference code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from betavae_tpu.models.losses import LossSpec, compute_loss  # noqa: E402
from betavae_tpu.ops.ffl import focal_frequency_loss  # noqa: E402
from betavae_tpu.ops.metrics import psnr, ssim  # noqa: E402
from betavae_tpu.ops.reparam import reparameterize_and_kl  # noqa: E402


def _torch_ssim(x, y, window_size=11, sigma=1.5):
    """Reference SSIM formula in torch (NCHW)."""
    import torch.nn.functional as F

    B, C, H, W = x.shape
    coords = torch.arange(window_size, dtype=torch.float32) - window_size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    k2d = g[:, None] @ g[None, :]
    k2d = k2d / k2d.sum()
    window = k2d.view(1, 1, window_size, window_size).repeat(C, 1, 1, 1)
    pad = window_size // 2
    L = x.max() - x.min()
    if L <= 0:
        L = 1.0
    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    mu_x = F.conv2d(x, window, padding=pad, groups=C)
    mu_y = F.conv2d(y, window, padding=pad, groups=C)
    mu_x_sq, mu_y_sq, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x_sq = (F.conv2d(x * x, window, padding=pad, groups=C) - mu_x_sq).clamp(min=0)
    sigma_y_sq = (F.conv2d(y * y, window, padding=pad, groups=C) - mu_y_sq).clamp(min=0)
    sigma_xy = F.conv2d(x * y, window, padding=pad, groups=C) - mu_xy
    denom = (mu_x_sq + mu_y_sq + C1) * (sigma_x_sq + sigma_y_sq + C2)
    num = (2 * mu_xy + C1) * (2 * sigma_xy + C2)
    return float((num / (denom + 1e-12)).mean())


def test_ssim_golden_vs_torch():
    rng = np.random.default_rng(0)
    for i in range(3):
        x = rng.uniform(size=(24, 24, 1)).astype(np.float32) * (0.5 + 0.3 * i)
        y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
        theirs = _torch_ssim(
            torch.from_numpy(x[None].transpose(0, 3, 1, 2)),
            torch.from_numpy(y[None].transpose(0, 3, 1, 2)),
        )
        assert abs(ours - theirs) < 2e-4, (ours, theirs)


def test_psnr_golden_vs_torch():
    import math

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(16, 16, 1)).astype(np.float32)
    b = rng.uniform(size=(16, 16, 1)).astype(np.float32)
    m = float(torch.mean((torch.from_numpy(a) - torch.from_numpy(b)) ** 2))
    theirs = 20 * math.log10(1.0) - 10 * math.log10(m)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - theirs) < 1e-3


def test_ffl_golden_vs_torch():
    rng = np.random.default_rng(2)
    pred = rng.uniform(size=(3, 16, 16, 1)).astype(np.float32)
    target = rng.uniform(size=(3, 16, 16, 1)).astype(np.float32)
    # reference formula in torch (NCHW)
    p = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    t = torch.from_numpy(target.transpose(0, 3, 1, 2))
    pf = torch.fft.fft2(p, norm="ortho")
    tf = torch.fft.fft2(t, norm="ortho")
    diff = pf - tf
    dist = diff.real.pow(2) + diff.imag.pow(2)
    denom = dist.mean(dim=(0, 2, 3), keepdim=True) + 1e-8
    weight = (dist / denom).clamp_min(1e-8).pow(1.0)
    theirs = float((weight * dist).mean())
    ours = float(focal_frequency_loss(jnp.asarray(pred), jnp.asarray(target),
                                      alpha=1.0))
    assert abs(ours - theirs) / max(abs(theirs), 1e-8) < 2e-3


@pytest.mark.parametrize("mode", ["beta", "beta_freebits", "capacity"])
def test_elbo_golden_vs_torch(mode):
    rng = np.random.default_rng(3)
    b, d, hw = 5, 7, 12
    x = rng.uniform(size=(b, hw, hw, 1)).astype(np.float32)
    recon = rng.uniform(size=(b, hw, hw, 1)).astype(np.float32)
    mu = rng.normal(size=(b, d)).astype(np.float32)
    logvar = rng.normal(size=(b, d)).astype(np.float32)
    beta, capacity, gamma, fb = 0.7, 4.0, 2.0, 0.4

    # --- torch reference formulas (beta_vae.py:185-253) ---
    tx = torch.from_numpy(x)
    tr = torch.from_numpy(recon)
    tmu = torch.from_numpy(mu)
    tlv = torch.from_numpy(logvar)
    rec = torch.nn.functional.mse_loss(tr, tx, reduction="sum") / b
    kl_elem = -0.5 * (1 + tlv - tmu.pow(2) - tlv.exp())
    kl_per_dim = kl_elem.mean(dim=0)
    kl_mean = kl_elem.sum(dim=1).mean()
    if mode == "beta":
        total_t = rec + beta * kl_per_dim.sum()
    elif mode == "beta_freebits":
        total_t = rec + beta * kl_per_dim.clamp(min=fb).sum()
    else:
        total_t = rec + gamma * (kl_mean - capacity).abs()

    # --- ours ---
    import jax

    z, kl = reparameterize_and_kl(jax.random.PRNGKey(0), jnp.asarray(mu),
                                  jnp.asarray(logvar))
    outputs = (jnp.asarray(recon), jnp.asarray(mu), jnp.asarray(logvar), z, kl)
    spec = LossSpec(recon_loss_type="mse",
                    free_bits_enabled=(mode == "beta_freebits"))
    kwargs = dict(beta=beta)
    if mode == "beta_freebits":
        kwargs["free_bits"] = fb
    if mode == "capacity":
        kwargs.update(capacity=capacity, capacity_weight=gamma)
    out = compute_loss(outputs, jnp.asarray(x), spec=spec, **kwargs)

    np.testing.assert_allclose(float(out["total"]), float(total_t), rtol=1e-5)
    np.testing.assert_allclose(float(out["kl_mean"]), float(kl_mean),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["kl_per_dim"]),
                               kl_per_dim.numpy(), rtol=1e-5)
