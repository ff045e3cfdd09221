"""LPIPS module tests (architecture + fallback weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betavae_tpu.ops.lpips import build_lpips_fn


@pytest.fixture(scope="module")
def lpips():
    return build_lpips_fn()


def test_identical_images_zero(lpips):
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 1)).astype(np.float32))
    assert float(lpips(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_distance_increases_with_perturbation(lpips):
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 64, 64, 1)).astype(np.float32)
    near = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    far = rng.uniform(size=x.shape).astype(np.float32)
    d_near = float(lpips(jnp.asarray(near), jnp.asarray(x)))
    d_far = float(lpips(jnp.asarray(far), jnp.asarray(x)))
    assert 0 <= d_near < d_far


def test_gray_and_rgb_supported(lpips):
    rng = np.random.default_rng(2)
    rgb = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    out = float(lpips(jnp.asarray(rgb), jnp.asarray(rgb)))
    assert out == pytest.approx(0.0, abs=1e-6)


def test_shape_mismatch_raises(lpips):
    a = jnp.zeros((1, 64, 64, 1))
    b = jnp.zeros((2, 64, 64, 1))
    with pytest.raises(ValueError, match="Shape mismatch"):
        lpips(a, b)


def test_differentiable_wrt_pred(lpips):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    g = jax.grad(lambda p: lpips(p, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
