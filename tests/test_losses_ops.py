"""Golden-value tests for KL / recon / FFL / SSIM / PSNR against closed forms
and a NumPy reimplementation of the reference formulas (torch-free)."""

import jax
import jax.numpy as jnp
import numpy as np

from betavae_tpu.models.losses import LossSpec, compute_loss
from betavae_tpu.ops.ffl import focal_frequency_loss
from betavae_tpu.ops.metrics import psnr, ssim, batched_image_metrics
from betavae_tpu.ops.reparam import reparameterize_and_kl


def _fake_outputs(rng, b=4, d=6, hw=8, deterministic=False):
    mu = rng.normal(size=(b, d)).astype(np.float32)
    logvar = rng.normal(size=(b, d)).astype(np.float32)
    x = rng.uniform(size=(b, hw, hw, 1)).astype(np.float32)
    recon = rng.uniform(size=(b, hw, hw, 1)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    z, kl_elem = reparameterize_and_kl(key, jnp.asarray(mu),
                                       jnp.asarray(logvar),
                                       deterministic=deterministic)
    return (jnp.asarray(recon), jnp.asarray(mu), jnp.asarray(logvar), z,
            kl_elem), np.asarray(x), mu, logvar, recon


def test_kl_closed_form():
    # KL(N(mu, sigma^2) || N(0,1)) elementwise = -0.5(1+logvar-mu^2-e^logvar)
    mu = np.array([[0.0, 1.0], [2.0, -1.0]], np.float32)
    logvar = np.array([[0.0, 0.5], [-0.5, 1.0]], np.float32)
    _, kl = reparameterize_and_kl(jax.random.PRNGKey(0), jnp.asarray(mu),
                                  jnp.asarray(logvar))
    expected = -0.5 * (1 + logvar - mu**2 - np.exp(logvar))
    np.testing.assert_allclose(np.asarray(kl), expected, rtol=1e-5)
    # standard normal has zero KL
    _, kl0 = reparameterize_and_kl(jax.random.PRNGKey(0), jnp.zeros((2, 2)),
                                   jnp.zeros((2, 2)))
    np.testing.assert_allclose(np.asarray(kl0), 0.0, atol=1e-7)


def test_reparam_statistics():
    mu = jnp.full((20000, 1), 3.0)
    logvar = jnp.full((20000, 1), np.log(4.0))
    z, _ = reparameterize_and_kl(jax.random.PRNGKey(1), mu, logvar)
    assert abs(float(z.mean()) - 3.0) < 0.05
    assert abs(float(z.std()) - 2.0) < 0.05
    # deterministic returns mu exactly
    zd, _ = reparameterize_and_kl(jax.random.PRNGKey(1), mu, logvar,
                                  deterministic=True)
    np.testing.assert_array_equal(np.asarray(zd), np.asarray(mu))


def test_beta_objective_matches_reference_formula():
    rng = np.random.default_rng(0)
    outputs, x, mu, logvar, recon = _fake_outputs(rng)
    spec = LossSpec(recon_loss_type="mse")
    d = compute_loss(outputs, jnp.asarray(x), spec=spec, beta=2.0)
    b = x.shape[0]
    rec_expected = ((recon - x) ** 2).sum() / b
    kl_elem = -0.5 * (1 + logvar - mu**2 - np.exp(logvar))
    kl_per_dim = kl_elem.mean(axis=0)
    kl_mean = kl_elem.sum(axis=1).mean()
    np.testing.assert_allclose(float(d["recon_base"]), rec_expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d["kl_per_dim"]), kl_per_dim,
                               rtol=1e-5)
    np.testing.assert_allclose(float(d["kl_mean"]), kl_mean, rtol=1e-5)
    np.testing.assert_allclose(
        float(d["total"]), rec_expected + 2.0 * kl_per_dim.sum(), rtol=1e-5)
    assert d["mode"] == "beta"


def test_free_bits_clamp():
    rng = np.random.default_rng(1)
    outputs, x, mu, logvar, _ = _fake_outputs(rng)
    fb = 0.5
    spec = LossSpec(recon_loss_type="mse", free_bits_enabled=True)
    d = compute_loss(outputs, jnp.asarray(x), spec=spec, beta=1.0,
                     free_bits=fb)
    kl_elem = -0.5 * (1 + logvar - mu**2 - np.exp(logvar))
    expected_eff = np.clip(kl_elem.mean(axis=0), fb, None).sum()
    np.testing.assert_allclose(float(d["kl_effective"]), expected_eff,
                               rtol=1e-5)


def test_capacity_objective():
    rng = np.random.default_rng(2)
    outputs, x, mu, logvar, recon = _fake_outputs(rng)
    spec = LossSpec(recon_loss_type="mse", free_bits_enabled=True)  # fb ignored
    d = compute_loss(outputs, jnp.asarray(x), spec=spec, beta=1.0,
                     capacity=5.0, capacity_weight=2.0, free_bits=0.5)
    kl_elem = -0.5 * (1 + logvar - mu**2 - np.exp(logvar))
    kl_mean = kl_elem.sum(axis=1).mean()
    rec = ((recon - x) ** 2).sum() / x.shape[0]
    np.testing.assert_allclose(float(d["total"]),
                               rec + 2.0 * abs(kl_mean - 5.0), rtol=1e-5)
    assert d["mode"] == "capacity"
    # free bits silently disabled in capacity mode (ref beta_vae.py:229)
    np.testing.assert_allclose(float(d["kl_effective"]),
                               kl_elem.mean(axis=0).sum(), rtol=1e-5)


def test_l1_and_bce_recon():
    rng = np.random.default_rng(3)
    outputs, x, _, _, recon = _fake_outputs(rng)
    d = compute_loss(outputs, jnp.asarray(x),
                     spec=LossSpec(recon_loss_type="l1"), beta=0.0)
    np.testing.assert_allclose(float(d["recon_base"]),
                               np.abs(recon - x).sum() / x.shape[0], rtol=1e-5)
    d = compute_loss(outputs, jnp.asarray(x),
                     spec=LossSpec(recon_loss_type="bce"), beta=0.0)
    eps = 1e-12
    r = np.clip(recon, eps, 1 - eps)
    bce = -(x * np.log(r) + (1 - x) * np.log(1 - r)).sum() / x.shape[0]
    np.testing.assert_allclose(float(d["recon_base"]), bce, rtol=1e-4)


def test_mask_weighting_equals_unpadded():
    rng = np.random.default_rng(4)
    outputs, x, mu, logvar, recon = _fake_outputs(rng, b=4)
    spec = LossSpec(recon_loss_type="mse")
    ref = compute_loss(outputs, jnp.asarray(x), spec=spec, beta=1.5)
    # pad to 6 by repeating rows 0-1, mask them out
    pad = lambda a: jnp.concatenate([a, a[:2]], axis=0)
    padded = tuple(pad(o) for o in outputs)
    mask = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    out = compute_loss(padded, pad(jnp.asarray(x)), spec=spec, beta=1.5,
                       mask=mask)
    np.testing.assert_allclose(float(out["total"]), float(ref["total"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out["kl_mean"]), float(ref["kl_mean"]),
                               rtol=1e-5)


def test_latent_reg():
    rng = np.random.default_rng(5)
    outputs, x, mu, _, _ = _fake_outputs(rng)
    spec = LossSpec(recon_loss_type="mse", latent_reg_lambda=0.3)
    d = compute_loss(outputs, jnp.asarray(x), spec=spec, beta=0.0)
    np.testing.assert_allclose(float(d["latent_reg"]), 0.3 * (mu**2).mean(),
                               rtol=1e-5)


def test_ffl_reference_formula():
    rng = np.random.default_rng(6)
    pred = rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
    target = rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
    got = float(focal_frequency_loss(jnp.asarray(pred), jnp.asarray(target),
                                     alpha=1.0))
    pf = np.fft.fft2(pred, axes=(1, 2), norm="ortho")
    tf = np.fft.fft2(target, axes=(1, 2), norm="ortho")
    dist = np.abs(pf - tf) ** 2
    denom = dist.mean(axis=(0, 1, 2), keepdims=True) + 1e-8
    weight = np.clip(dist / denom, 1e-8, None) ** 1.0
    expected = (weight * dist).mean()
    np.testing.assert_allclose(got, expected, rtol=1e-4)
    # identical inputs -> zero
    assert float(focal_frequency_loss(jnp.asarray(pred),
                                      jnp.asarray(pred))) == 0.0


def test_psnr_semantics():
    a = jnp.full((4, 4, 1), 0.5)
    assert float(psnr(a, a)) == 99.0  # zero-MSE cap (ref recon_metrics.py:16-20)
    b = jnp.zeros((4, 4, 1))
    c = jnp.full((4, 4, 1), 0.1)
    np.testing.assert_allclose(float(psnr(b, c)), -10 * np.log10(0.01),
                               rtol=1e-4)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(16, 16, 1)).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-4


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(8)
    x = rng.uniform(size=(32, 32, 1)).astype(np.float32)
    y1 = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    s1 = float(ssim(jnp.asarray(y1), jnp.asarray(x)))
    s2 = float(ssim(jnp.asarray(y2), jnp.asarray(x)))
    assert s1 > s2 > 0.0


def test_batched_metrics_match_single():
    rng = np.random.default_rng(9)
    x = rng.uniform(size=(3, 16, 16, 1)).astype(np.float32)
    r = rng.uniform(size=(3, 16, 16, 1)).astype(np.float32)
    out = batched_image_metrics(jnp.asarray(r), jnp.asarray(x))
    for i in range(3):
        np.testing.assert_allclose(float(out["ssim"][i]),
                                   float(ssim(jnp.asarray(r[i]),
                                              jnp.asarray(x[i]))), rtol=1e-5)
        np.testing.assert_allclose(float(out["mse"][i]),
                                   ((r[i] - x[i]) ** 2).mean(), rtol=1e-5)
