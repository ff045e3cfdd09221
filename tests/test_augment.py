"""On-device augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from betavae_tpu.data.augment import (augment_batch, random_brightness,
                                      random_hflip, random_rotation)


def test_hflip_is_exact_mirror():
    x = jnp.asarray(np.arange(2 * 4 * 4).reshape(2, 4, 4, 1).astype(np.float32))
    out = np.asarray(random_hflip(jax.random.PRNGKey(0), x))
    for i in range(2):
        same = np.array_equal(out[i], np.asarray(x[i]))
        flipped = np.array_equal(out[i], np.asarray(x[i])[:, ::-1])
        assert same or flipped


def test_rotation_zero_angle_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))
    out = random_rotation(jax.random.PRNGKey(0), x, degrees=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_shear_rotation_matches_exact_on_smooth_image():
    from betavae_tpu.data.augment import _rotate_one, rotate_shear

    yy, xx = np.mgrid[:64, :64]
    img = np.exp(-(((xx - 24) ** 2 + (yy - 40) ** 2) / 120.0)).astype(
        np.float32)[..., None]
    for deg in (8.0, -9.5, 3.0):
        ang = np.float32(np.radians(deg))
        ref = np.asarray(_rotate_one(jnp.asarray(img), jnp.asarray(ang)))
        got = np.asarray(rotate_shear(jnp.asarray(img)[None],
                                      jnp.asarray([ang]), 10.0))[0]
        inner = (slice(14, 50), slice(14, 50), slice(None))
        assert np.abs(ref[inner] - got[inner]).max() < 0.02


def test_rotation_90_matches_numpy():
    from betavae_tpu.data.augment import _rotate_one

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(9, 9, 1)).astype(np.float32))
    out = np.asarray(_rotate_one(x, jnp.float32(np.pi / 2)))
    # 90° rotation of a (2k+1)² image is exact under bilinear sampling
    expected = np.rot90(np.asarray(x), k=-1, axes=(0, 1))
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_brightness_bounds_and_clip():
    x = jnp.full((4, 8, 8, 1), 0.9, jnp.float32)
    out = np.asarray(random_brightness(jax.random.PRNGKey(2), x, 0.5))
    assert out.max() <= 1.0 and out.min() >= 0.45 * 0.9 - 1e-6


def test_augment_batch_noop_config():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(0), x, use_flip=False, degrees=0.0,
                        brightness=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_augment_deterministic_per_key():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(3, 8, 8, 1)).astype(np.float32))
    a = augment_batch(jax.random.PRNGKey(7), x, use_flip=True, degrees=10.0,
                      brightness=0.1)
    b = augment_batch(jax.random.PRNGKey(7), x, use_flip=True, degrees=10.0,
                      brightness=0.1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
