"""Separable conv-transpose bilinear upsample vs jax.image.resize oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betavae_tpu.ops.upsample import bilinear_upsample_x2


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 16, 12, 3),
                                   (3, 5, 7, 2)])
def test_matches_resize_including_edges(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    b, h, w, c = shape
    with jax.default_matmul_precision("highest"):
        got = bilinear_upsample_x2(x)
    want = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_resize():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        _, vjp = jax.vjp(bilinear_upsample_x2, x)
        got, = vjp(g)
    _, vjp_ref = jax.vjp(
        lambda x: jax.image.resize(x, (2, 12, 12, 3), "bilinear"), x)
    want, = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_bf16_passthrough():
    x = jnp.ones((1, 4, 4, 2), jnp.bfloat16)
    y = bilinear_upsample_x2(x)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), 1.0)
