"""Fused GroupNorm+ReLU(+SE pool) pallas kernel vs the unfused oracle.

Runs through the TPU interpreter on CPU CI; the same parity checks were run
once on real v5e hardware.  NOTE: the kernel is a tested building block but
is NOT wired into the model — measured slower than XLA's roofline GroupNorm
(see the module STATUS note and docs/DESIGN.md §3.0.1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from betavae_tpu.ops.pallas_gn import (fits_vmem, fused_gn_relu_pool,
                                       fused_groupnorm_relu,
                                       reference_gn_relu_pool,
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


def test_pool_output_matches_oracle():
    x, gamma, beta = _data(seed=3)
    y, pooled = fused_gn_relu_pool(x, gamma, beta, 1e-6, INTERP)
    y_ref, pooled_ref = reference_gn_relu_pool(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               atol=2e-6)
    assert pooled.shape == (x.shape[0], x.shape[-1])
    assert pooled.dtype == jnp.float32


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


def test_gradients_through_pool_branch():
    """Gradient flows through BOTH outputs (y and the SE squeeze)."""
    x, gamma, beta = _data(seed=4)
    wv = jnp.arange(x.shape[-1], dtype=jnp.float32)

    def loss_fused(x, g, b):
        y, pooled = fused_gn_relu_pool(x, g, b, 1e-6, INTERP)
        return jnp.sum(y) + jnp.sum(pooled * wv) * 3.0

    def loss_ref(x, g, b):
        y, pooled = reference_gn_relu_pool(x, g, b)
        return jnp.sum(y) + jnp.sum(pooled * wv) * 3.0

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bf16_io_dtype():
    """bf16 in → bf16 y out (fp32 stats inside), pooled stays fp32."""
    x, gamma, beta = _data(seed=2)
    y16, pooled = fused_gn_relu_pool(x.astype(jnp.bfloat16), gamma, beta,
                                     1e-6, INTERP)
    y_ref = reference_groupnorm_relu(x.astype(jnp.bfloat16), gamma, beta)
    assert y16.dtype == jnp.bfloat16
    assert pooled.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16, dtype=np.float32),
                               np.asarray(y_ref), atol=5e-2)


def test_fits_vmem_gate():
    assert fits_vmem((32, 128, 128, 64), jnp.bfloat16)      # production max
    assert not fits_vmem((32, 256, 256, 128), jnp.bfloat16)  # scaled 256px
