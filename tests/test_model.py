"""Model architecture tests: shapes, pooling, norms, init, clamps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betavae_tpu.models.beta_vae import BetaVAE, BetaVAEModule


def _make(pooling="flatten", norm="layer", image_size=32, blocks=2, base=8,
          latent=8, **kw):
    module = BetaVAEModule(
        image_size=image_size, in_channels=1, latent_dim=latent,
        base_channels=base, num_blocks=blocks, norm_type=norm,
        encoder_pooling=pooling, logvar_clamp=(-10.0, 5.0), **kw)
    return BetaVAE(module=module)


def test_forward_shapes_flatten():
    model = _make()
    v = model.init_variables(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).uniform(size=(3, 32, 32, 1)).astype(np.float32)
    recon, mu, logvar, z = model.forward(v, x, key=jax.random.PRNGKey(1))
    assert recon.shape == (3, 32, 32, 1)
    assert mu.shape == (3, 8) and logvar.shape == (3, 8) and z.shape == (3, 8)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid


def test_forward_shapes_gap():
    model = _make(pooling="gap")
    v = model.init_variables(jax.random.PRNGKey(0))
    x = np.zeros((2, 32, 32, 1), np.float32)
    recon, mu, logvar, z = model.forward(v, x, deterministic=True)
    assert recon.shape == (2, 32, 32, 1)
    # gap flat dim is channel width only
    assert model.module.flat_dim == 8 * 2


def test_bottleneck_and_flat_dim():
    m = _make().module
    assert m.bottleneck_hw == 8  # 32 / 2^2
    assert m.flat_dim == 16 * 8 * 8  # top width base*2^(blocks-1)=16


@pytest.mark.parametrize("norm", ["layer", "none", "batch"])
def test_norm_variants_run(norm):
    model = _make(norm=norm)
    v = model.init_variables(jax.random.PRNGKey(0))
    if norm == "batch":
        assert "batch_stats" in v
    x = np.random.default_rng(1).uniform(size=(2, 32, 32, 1)).astype(np.float32)
    recon, *_ = model.forward(v, x, deterministic=True)
    assert np.isfinite(np.asarray(recon)).all()


def test_logvar_clamp_applied():
    model = _make()
    v = model.init_variables(jax.random.PRNGKey(0))
    # scale fc_logvar kernel hugely so raw outputs exceed the clamp
    v = jax.tree_util.tree_map(lambda a: a, v)
    params = v["params"]
    params["fc_logvar"]["kernel"] = params["fc_logvar"]["kernel"] * 1e4
    x = np.random.default_rng(2).uniform(size=(2, 32, 32, 1)).astype(np.float32)
    mu, logvar = model.encode({"params": params}, x)
    lv = np.asarray(logvar)
    assert lv.max() <= 5.0 + 1e-6 and lv.min() >= -10.0 - 1e-6


def test_deterministic_uses_mu():
    model = _make()
    v = model.init_variables(jax.random.PRNGKey(0))
    x = np.random.default_rng(3).uniform(size=(2, 32, 32, 1)).astype(np.float32)
    _, mu, _, z = model.forward(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(z))
    _, mu2, _, z2 = model.forward(v, x, key=jax.random.PRNGKey(9),
                                  deterministic=False)
    assert not np.allclose(np.asarray(mu2), np.asarray(z2))


def test_latent_clamp():
    model = _make(latent_clamp=0.5)
    v = model.init_variables(jax.random.PRNGKey(0))
    big = np.full((1, 8), 100.0, np.float32)
    small = np.full((1, 8), 0.5, np.float32)
    np.testing.assert_allclose(np.asarray(model.decode(v, big)),
                               np.asarray(model.decode(v, small)), atol=1e-6)


def test_traverse_shapes():
    model = _make()
    v = model.init_variables(jax.random.PRNGKey(0))
    x = np.zeros((2, 32, 32, 1), np.float32)
    out, vals = model.traverse(v, x, dim=3, steps=5, span=2.0)
    assert out.shape == (5, 2, 32, 32, 1) or out.shape == (2, 5, 32, 32, 1)
    assert vals.shape == (5,)
    np.testing.assert_allclose(np.asarray(vals), np.linspace(-2, 2, 5),
                               atol=1e-6)


def test_kaiming_init_scale():
    # conv kernel std ~ sqrt(2 / fan_in) (ref train.py:217-221 weight_init)
    model = _make(image_size=32, base=32, blocks=2, latent=16)
    v = model.init_variables(jax.random.PRNGKey(0))
    k = np.asarray(v["params"]["enc_1"]["conv"]["kernel"])  # (3,3,32,64)
    fan_in = 3 * 3 * 32
    expected = np.sqrt(2.0 / fan_in)
    assert abs(k.std() - expected) / expected < 0.15
    # biases zero
    assert np.all(np.asarray(v["params"]["enc_1"]["conv"]["bias"]) == 0)


def test_sample_prior_shape():
    model = _make()
    v = model.init_variables(jax.random.PRNGKey(0))
    imgs = model.sample_prior(v, 4, jax.random.PRNGKey(5))
    assert imgs.shape == (4, 32, 32, 1)


def test_remat_scopes_equivalent():
    """remat false / "decoder" / true produce identical outputs and grads
    (remat only changes the recompute schedule, never the math)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.models.beta_vae import BetaVAE, BetaVAEModule

    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 16, 16, 1)).astype(np.float32))
    outs, grads = [], []
    for mode in (False, "decoder", True):
        module = BetaVAEModule(image_size=16, in_channels=1, latent_dim=4,
                               base_channels=4, num_blocks=2,
                               norm_type="layer", se_reduction=2,
                               use_decoder_se=True, encoder_pooling="flatten",
                               remat=mode)
        model = BetaVAE(module=module)
        variables = model.init_variables(jax.random.PRNGKey(0))

        def loss(v):
            recon, *_ = module.apply(v, x, deterministic=True)
            return jnp.sum((recon - x) ** 2)

        outs.append(float(loss(variables)))
        g = jax.grad(loss)(variables)
        grads.append(float(sum(jnp.sum(jnp.abs(l))
                               for l in jax.tree_util.tree_leaves(g))))
    assert outs[0] == outs[1] == outs[2]
    np.testing.assert_allclose(grads, grads[0], rtol=1e-6)


def test_remat_with_batchnorm_trains():
    """Regression: remat=True + encoder_norm=batch must not hit
    TracerBoolConversionError (train must stay a *static* remat arg;
    blocks are called positionally so static_argnums=(2,) binds it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.models.beta_vae import BetaVAE, BetaVAEModule

    module = BetaVAEModule(image_size=16, in_channels=1, latent_dim=4,
                           base_channels=4, num_blocks=2,
                           norm_type="batch", se_reduction=2,
                           use_decoder_se=True, encoder_pooling="flatten",
                           remat=True)
    model = BetaVAE(module=module)
    variables = model.init_variables(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(2, 16, 16, 1)).astype(np.float32))

    @jax.jit
    def loss(params, bs):
        (mu, logvar), upd = module.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            method=module.encode, mutable=["batch_stats"])
        return jnp.sum(mu ** 2 + logvar ** 2)

    g = jax.grad(loss)(variables["params"], variables["batch_stats"])
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
