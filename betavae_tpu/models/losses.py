"""The β-VAE training objective — one pure function returning the metrics pytree.

Capability parity with reference ``BetaVAE.loss`` (``src/models/beta_vae.py:
185-272``) and its helpers:

- reconstruction: sum-reduced per-sample mse/bce/l1 divided by batch size
  (ref ``beta_vae.py:185-192``), plus optional LPIPS (ref ``beta_vae.py:
  207-212``) and Focal Frequency Loss (ref ``beta_vae.py:214-215``) extras,
- KL: elementwise ``-0.5(1+logvar-mu²-exp(logvar))`` with ``kl_per_dim``
  (batch mean per dim) and ``kl_mean`` (sum over dims, batch mean)
  (ref ``beta_vae.py:224-226``),
- two objectives: β-mode ``rec + β·kl_effective`` with per-dim free-bits clamp
  (ref ``beta_vae.py:229-233,251``), capacity mode ``rec + γ·|kl_mean − C|``
  (ref ``beta_vae.py:242-249``), plus optional ``λ·mean(mu²)`` latent
  regularizer (ref ``beta_vae.py:238-240``),
- deterministic-overfit mode zeroes the KL path (ref ``beta_vae.py:221-223``),
- returns the same 16-key dict (ref ``beta_vae.py:255-272``).

TPU-first details: scalars (β, capacity, γ, free_bits) are traced values so
schedule updates never recompile; a batch validity ``mask`` supports the
padded fixed-shape final batch (weighted means reduce to the reference's
plain means when the mask is full); all KL/recon reductions are fp32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from ..config import get, get_config
from ..ops.ffl import focal_frequency_loss


@dataclass(frozen=True)
class LossSpec:
    """Static (compile-time) loss configuration."""

    recon_loss_type: str = "mse"          # mse | bce | l1
    deterministic: bool = False
    latent_reg_lambda: float = 0.0
    use_ffl: bool = False
    ffl_weight: float = 0.0
    ffl_alpha: float = 1.0
    use_lpips: bool = False
    lpips_weight: float = 0.0
    free_bits_enabled: bool = False


def loss_spec_from_config(cfg=None) -> LossSpec:
    cfg = cfg or get_config()
    lcfg = get(cfg, "loss", None)
    mcfg = cfg.model
    free_bits = float(get(lcfg, "free_bits", 0.0) or 0.0)
    return LossSpec(
        recon_loss_type=str(mcfg.reconstruction_loss),
        deterministic=bool(get(mcfg, "deterministic_overfit", False)),
        latent_reg_lambda=float(get(mcfg, "latent_reg_lambda", 0.0) or 0.0),
        use_ffl=bool(get(lcfg, "use_ffl", False)),
        ffl_weight=float(get(lcfg, "ffl_weight", 0.0) or 0.0),
        ffl_alpha=float(get(lcfg, "ffl_alpha", 1.0)),
        use_lpips=bool(get(lcfg, "use_lpips", False)),
        lpips_weight=float(get(lcfg, "lpips_weight", 0.0) or 0.0),
        free_bits_enabled=free_bits > 0.0,
    )


def _per_sample_recon(recon, x, kind: str):
    """Sum over pixels per sample (fp32)."""
    r = recon.astype(jnp.float32)
    t = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    if kind == "mse":
        return jnp.sum((r - t) ** 2, axis=axes)
    if kind == "bce":
        eps = 1e-12
        r = jnp.clip(r, eps, 1.0 - eps)
        return jnp.sum(-(t * jnp.log(r) + (1.0 - t) * jnp.log(1.0 - r)), axis=axes)
    if kind == "l1":
        return jnp.sum(jnp.abs(r - t), axis=axes)
    raise ValueError("invalid reconstruction_loss")


def compute_loss(
    outputs,                       # (recon, mu, logvar, z, kl_elem)
    x: jnp.ndarray,
    *,
    spec: LossSpec,
    beta,
    capacity=None,                 # traced scalar or None (static mode switch)
    capacity_weight=None,
    free_bits=0.0,
    mask: Optional[jnp.ndarray] = None,
    lpips_fn: Optional[Callable] = None,
) -> dict:
    recon, mu, logvar, z, kl_elem = outputs
    b = x.shape[0]
    if mask is None:
        mask = jnp.ones((b,), jnp.float32)
    msum = jnp.maximum(jnp.sum(mask), 1.0)

    base_recon = jnp.sum(
        _per_sample_recon(recon, x, spec.recon_loss_type) * mask
    ) / msum

    lp = jnp.zeros((), jnp.float32)
    ff = jnp.zeros((), jnp.float32)
    if spec.use_lpips and spec.lpips_weight > 0 and lpips_fn is not None:
        lp = lpips_fn(recon, x) * spec.lpips_weight
    if spec.use_ffl and spec.ffl_weight > 0:
        ff = focal_frequency_loss(recon, x, alpha=spec.ffl_alpha) * spec.ffl_weight

    rec_loss = base_recon + lp + ff

    use_capacity = (capacity is not None) and (capacity_weight is not None)

    if spec.deterministic:
        kl_per_dim = jnp.zeros((mu.shape[1],), jnp.float32)
        kl_mean = jnp.zeros((), jnp.float32)
        kl_effective = jnp.zeros((), jnp.float32)
    else:
        kl_elem32 = kl_elem.astype(jnp.float32)
        kl_per_dim = jnp.sum(kl_elem32 * mask[:, None], axis=0) / msum
        kl_mean = jnp.sum(jnp.sum(kl_elem32, axis=1) * mask) / msum
        if spec.free_bits_enabled and not use_capacity:
            kl_effective = jnp.sum(jnp.clip(kl_per_dim, min=free_bits))
        else:
            kl_effective = jnp.sum(kl_per_dim)

    latent_reg = jnp.zeros((), jnp.float32)
    if spec.latent_reg_lambda > 0:
        mu_sq_mean = jnp.sum(jnp.mean(mu**2, axis=1) * mask) / msum
        latent_reg = spec.latent_reg_lambda * mu_sq_mean

    if spec.deterministic:
        total = rec_loss + latent_reg
    elif use_capacity:
        gamma = capacity_weight
        total = rec_loss + gamma * jnp.abs(kl_mean - capacity) + latent_reg
    else:
        total = rec_loss + beta * kl_effective + latent_reg

    return {
        "total": total,
        "recon": rec_loss,
        "recon_base": base_recon,
        "recon_lpips": lp,
        "recon_ffl": ff,
        "kl_mean": kl_mean,
        "kl_per_dim": kl_per_dim,
        "beta": jnp.asarray(beta, jnp.float32),
        "capacity": (jnp.asarray(capacity, jnp.float32)
                     if capacity is not None else jnp.asarray(jnp.nan)),
        "latent_reg": latent_reg,
        "recon_img": recon,
        "z": z,
        "mu": mu,
        "logvar": logvar,
        "kl_effective": kl_effective,
        "mode": "capacity" if use_capacity else "beta",
    }
