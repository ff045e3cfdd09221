"""Fused reparameterization + KL statistics.

The VAE sampling tail — ``std = exp(0.5·logvar)``, ``z = mu + eps·std``, and
the elementwise KL ``-0.5·(1 + logvar - mu² - exp(logvar))`` — is the
bandwidth-bound elementwise hot spot of the loss (reference
``src/models/beta_vae.py:147-150,224``).  This module provides:

- :func:`reparameterize_and_kl` — the fp32 jnp reference implementation (XLA
  fuses this into adjacent ops already; it is the correctness oracle),
- a Pallas TPU kernel variant (``betavae_tpu.ops.pallas_elbo``) used by the
  training step on TPU backends (see that module for the kernel).

KL numerics are always fp32 regardless of the bf16 compute policy, mirroring
the reference's AMP hygiene (SURVEY.md §7 "bf16 numerics").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reparameterize_and_kl(key, mu: jnp.ndarray, logvar: jnp.ndarray,
                          deterministic: bool = False):
    """Returns ``(z, kl_elem)`` with fp32 KL.

    z = mu + eps * exp(0.5 * logvar)        (ref beta_vae.py:147-150)
    kl_elem = -0.5 * (1 + logvar - mu^2 - exp(logvar))   (ref beta_vae.py:224)
    """
    mu32 = mu.astype(jnp.float32)
    logvar32 = logvar.astype(jnp.float32)
    if deterministic:
        z = mu32
    else:
        std = jnp.exp(0.5 * logvar32)
        eps = jax.random.normal(key, mu32.shape, dtype=jnp.float32)
        z = mu32 + eps * std
    kl_elem = -0.5 * (1.0 + logvar32 - mu32**2 - jnp.exp(logvar32))
    return z, kl_elem
