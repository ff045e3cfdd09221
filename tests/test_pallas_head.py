"""Fused SE-gate∘final-conv head kernel (ops/pallas_head.py) vs XLA oracle.

Runs the kernel in the TPU interpreter on CPU (same strategy as
``test_pallas_elbo.py``).  The kernel is an opt-in building block
(``training.fused_head: true``); these tests pin its math, custom VJP, and
the model wiring (gate handed through ``DeconvBlock``/``FinalConvHead``)
regardless of the default.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betavae_tpu.ops.pallas_head import (fused_se_conv_head,
                                         head_conv_reference, supports_shape)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("b,h,w,c", [(2, 16, 16, 8), (3, 32, 24, 64)])
def test_forward_matches_oracle(b, h, w, c):
    y = _rand((b, h, w, c), 0)
    s = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (b, c)).astype(np.float32))
    k = _rand((3, 3, c), 2)
    out = fused_se_conv_head(y, s, k, True)
    ref = head_conv_reference(y, s, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_custom_vjp_matches_oracle_grads():
    b, h, w, c = 2, 16, 16, 16
    y = _rand((b, h, w, c), 0)
    s = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (b, c)).astype(np.float32))
    k = _rand((3, 3, c), 2)

    def loss_p(y, s, k):
        return jnp.sum(jnp.sin(fused_se_conv_head(y, s, k, True)))

    def loss_r(y, s, k):
        return jnp.sum(jnp.sin(head_conv_reference(y, s, k)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(y, s, k)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(y, s, k)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-4)


def test_supports_shape_gate():
    assert supports_shape(128, 128, 64, jnp.bfloat16)        # flagship bf16
    assert supports_shape(128, 128, 64, jnp.float32)         # flagship fp32
    assert not supports_shape(256, 256, 64, jnp.bfloat16)    # 256px excluded
    assert not supports_shape(1024, 1024, 64, jnp.float32)


def test_model_wiring_parity():
    """fused_head=True (interpret) produces the same recon/grads as the
    default head, with identical parameter trees (checkpoint compat)."""
    os.environ["BETAVAE_HEAD_INTERPRET"] = "1"
    try:
        from betavae_tpu.models.beta_vae import BetaVAEModule

        kw = dict(image_size=32, in_channels=1, latent_dim=8,
                  base_channels=8, num_blocks=3, activation="relu",
                  norm_type="layer", se_reduction=4, use_decoder_se=True,
                  encoder_pooling="flatten", logvar_clamp=(-10.0, 5.0),
                  dtype=jnp.float32)
        m0 = BetaVAEModule(**kw, fused_head=False)
        m1 = BetaVAEModule(**kw, fused_head=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (2, 32, 32, 1)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "reparam": jax.random.PRNGKey(1)}
        v0 = m0.init(rngs, x, train=False)
        v1 = m1.init(rngs, x, train=False)
        assert jax.tree_util.tree_all(
            jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), v0, v1))

        r0 = m0.apply(v0, x, deterministic=True)[0]
        r1 = m1.apply(v1, x, deterministic=True)[0]
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)

        def loss(v, m):
            rec, mu, _, _ = m.apply(v, x, deterministic=True)
            return jnp.sum((rec - x) ** 2) + jnp.sum(mu**2)

        g0 = jax.grad(lambda v: loss(v, m0))(v0)
        g1 = jax.grad(lambda v: loss(v, m1))(v1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

        # decoder remat composes with the gate plumbing (static_argnums)
        m2 = BetaVAEModule(**kw, fused_head=True, remat="decoder")
        r2 = m2.apply(v1, x, deterministic=True)[0]
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r2), atol=1e-5)
    finally:
        del os.environ["BETAVAE_HEAD_INTERPRET"]


def test_no_decoder_se_falls_back_cleanly():
    os.environ["BETAVAE_HEAD_INTERPRET"] = "1"
    try:
        from betavae_tpu.models.beta_vae import BetaVAEModule

        kw = dict(image_size=16, in_channels=1, latent_dim=4,
                  base_channels=8, num_blocks=2, activation="relu",
                  norm_type="layer", se_reduction=4, use_decoder_se=False,
                  encoder_pooling="flatten", dtype=jnp.float32)
        m0 = BetaVAEModule(**kw, fused_head=False)
        m1 = BetaVAEModule(**kw, fused_head=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (2, 16, 16, 1)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "reparam": jax.random.PRNGKey(1)}
        v = m0.init(rngs, x, train=False)
        r0 = m0.apply(v, x, deterministic=True)[0]
        r1 = m1.apply(v, x, deterministic=True)[0]
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)
    finally:
        del os.environ["BETAVAE_HEAD_INTERPRET"]


def test_resolve_fused_head_values():
    from betavae_tpu.models.beta_vae import _resolve_fused_head

    assert _resolve_fused_head(True) is True
    assert _resolve_fused_head("true") is True
    assert _resolve_fused_head(False) is False
    assert _resolve_fused_head(None) is False
    assert _resolve_fused_head("auto") in (True, False)  # env-dependent
    with pytest.raises(ValueError):
        _resolve_fused_head("sometimes")
