"""Pallas TPU kernel: fused reparameterization sample + elementwise KL.

The VAE sampling tail (SURVEY.md §2: "the fused recon+KL ELBO step as the
candidate Pallas kernel"; reference ``src/models/beta_vae.py:147-150,224``)
is a bandwidth-bound elementwise chain:

    std  = exp(0.5·logvar)
    z    = mu + eps·std,            eps ~ N(0, 1)
    kl   = -0.5·(1 + logvar - mu² - exp(logvar))

This kernel fuses all of it — *including the Gaussian noise generation* —
into one VMEM-resident pass using the TPU's per-core PRNG
(``pltpu.prng_random_bits``) and a Box–Muller transform, so no separate
``jax.random.normal`` buffer ever round-trips through HBM.

Gradients: a ``jax.custom_vjp`` with the closed-form backward

    dL/dmu     = g_z + g_kl · mu
    dL/dlogvar = 0.5·eps·std·g_z + 0.5·(exp(logvar) − 1)·g_kl

computed as plain (fully fused by XLA) elementwise math from the saved noise
residual.

Numerics note: the noise stream is the TPU hardware PRNG, not the threefry
stream of ``jax.random.normal`` — statistically equivalent, bitwise
different; deterministic for a given seed.  The pure-jnp path
(``ops.reparam.reparameterize_and_kl``) remains the default on non-TPU
backends and the correctness oracle in tests (kernel runs there in
interpreter mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TWO_PI = 6.283185307179586


def _kernel(seed_ref, mu_ref, logvar_ref, z_ref, kl_ref, eps_ref):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    mu = mu_ref[:].astype(jnp.float32)
    logvar = logvar_ref[:].astype(jnp.float32)

    # Box–Muller from two uint32 draws; 24 high bits -> uniform in (0, 1]
    shape = mu.shape
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits fit in int32 (Mosaic lacks a direct uint32->f32 cast)
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (1.0 / 16777216.0)
    u2 = i2.astype(jnp.float32) * (1.0 / 16777216.0)
    u1 = jnp.maximum(u1, 1e-7)  # keep log finite
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    eps = r * jnp.cos(_TWO_PI * u2)

    std = jnp.exp(0.5 * logvar)
    elv = jnp.exp(logvar)
    z_ref[:] = mu + eps * std
    kl_ref[:] = -0.5 * (1.0 + logvar - mu * mu - elv)
    eps_ref[:] = eps


def _run_kernel(seed: jnp.ndarray, mu: jnp.ndarray, logvar: jnp.ndarray,
                interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the generic interpreter lacks the TPU PRNG primitives; use the TPU
    # interpreter (note: its prng_random_bits returns zeros — fine for math/
    # gradient tests, noise statistics are validated on real hardware)
    interp = pltpu.InterpretParams() if interpret else False
    out_shape = jax.ShapeDtypeStruct(mu.shape, jnp.float32)
    return pl.pallas_call(
        _kernel,
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interp,
    )(seed, mu, logvar)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_reparam_kl(seed, mu, logvar, interpret: bool = False):
    """Returns ``(z, kl_elem)``; both fp32, shapes of ``mu``.

    ``seed``: int32 scalar or (1,) array (traced OK — per-step seeds don't
    recompile).
    """
    z, kl, _ = _run_kernel(
        jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
        mu.astype(jnp.float32), logvar.astype(jnp.float32), interpret)
    return z, kl


def _fwd(seed, mu, logvar, interpret):
    mu32 = mu.astype(jnp.float32)
    logvar32 = logvar.astype(jnp.float32)
    z, kl, eps = _run_kernel(
        jnp.atleast_1d(jnp.asarray(seed, jnp.int32)), mu32, logvar32,
        interpret)
    return (z, kl), (mu32, logvar32, eps)


def _bwd(interpret, residuals, grads):
    mu, logvar, eps = residuals
    g_z, g_kl = grads
    std = jnp.exp(0.5 * logvar)
    elv = jnp.exp(logvar)
    d_mu = g_z + g_kl * mu
    d_logvar = 0.5 * eps * std * g_z + 0.5 * (elv - 1.0) * g_kl
    return None, d_mu, d_logvar


fused_reparam_kl.defvjp(_fwd, _bwd)


def tpu_backend_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def key_to_seed(key) -> jnp.ndarray:
    """Derive an int32 kernel seed from a jax PRNG key (traced-safe)."""
    data = jax.random.key_data(key)
    return jnp.asarray(data.reshape(-1)[-1], jnp.int32)
