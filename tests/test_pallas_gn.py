"""Fused GroupNorm+ReLU pallas kernel vs the unfused oracle.

Runs through the TPU interpreter on CPU CI; the same checks passed on real
v5e hardware (forward 1.4e-6, grads ≤2e-3 — see module STATUS note).
"""

import jax
import jax.numpy as jnp
import numpy as np

from betavae_tpu.ops.pallas_gn import (fused_groupnorm_relu,
                                       reference_groupnorm_relu)

INTERP = True  # CPU CI uses the TPU interpreter


def _data(b=3, h=8, w=8, c=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=c).astype(np.float32))
    beta = jnp.asarray((rng.normal(size=c) * 0.1).astype(np.float32))
    return x, gamma, beta


def test_forward_matches_oracle():
    x, gamma, beta = _data()
    y = fused_groupnorm_relu(x, gamma, beta, 1e-6, INTERP)
    y_ref = reference_groupnorm_relu(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    assert float(y.min()) >= 0.0  # relu applied


def test_gradients_match_oracle():
    x, gamma, beta = _data(seed=1)
    w = jnp.arange(x.shape[-1], dtype=jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(fused_groupnorm_relu(x, g, b, 1e-6, INTERP) * w)

    def loss_ref(x, g, b):
        return jnp.sum(reference_groupnorm_relu(x, g, b) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bf16_input_upcasts():
    x, gamma, beta = _data(seed=2)
    y16 = fused_groupnorm_relu(x.astype(jnp.bfloat16), gamma, beta, 1e-6,
                               INTERP)
    y_ref = reference_groupnorm_relu(x.astype(jnp.bfloat16), gamma, beta)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y_ref), atol=5e-2)
