"""Pallas TPU kernel: fused per-sample GroupNorm(1 group) + scale/bias + ReLU.

Every encoder/decoder block ends with GroupNorm→ReLU (reference
``beta_vae.py:17-24``, ``encoder_norm: layer``).  Unfused, the norm costs two
extra full-tensor HBM passes per block (stats + apply); this kernel does the
whole chain in one VMEM-resident pass per sample, with a hand-derived
``custom_vjp`` (one fused backward pass producing dx and per-sample dγ/dβ
partials).

Math (per sample, N = H·W·C, fast-variance form like flax):
    m = mean(x); v = mean(x²) − m²; rstd = rsqrt(v + eps)
    x̂ = (x − m)·rstd;  z = x̂·γ + β;  y = max(z, 0)
Backward given g = dL/dy:
    gz = g·1[z>0];  dβ_c = Σ_hw gz;  dγ_c = Σ_hw gz·x̂
    dx̂ = gz·γ;  dx = rstd·(dx̂ − mean(dx̂) − x̂·mean(dx̂·x̂))

STATUS: validated (forward 1e-6, gradients ≤2e-3 vs the unfused oracle on
real v5e hardware and in the TPU interpreter) for per-sample blocks that fit
VMEM (≈ ≤64×64×64 fp32 with double buffering).  At the production decoder's
128×128×64 blocks Mosaic runs out of VMEM — the kernel needs a spatially
tiled two-pass (stats, then normalize) design before it can be wired into
``models.beta_vae``; measured upside there is ~0.7 ms of an 8.4 ms step
(docs/DESIGN.md §3).  NOT yet used by the model — kept as a tested building
block for that follow-up.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, m_ref, rstd_ref, *,
                eps: float):
    x = x_ref[...].astype(jnp.float32)
    n = x.size
    m = jnp.sum(x) / n
    v = jnp.sum(x * x) / n - m * m
    rstd = jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)
    xhat = (x - m) * rstd
    z = xhat * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(jnp.float32)
    y_ref[...] = jnp.maximum(z, 0.0)
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    m_ref[i] = m
    rstd_ref[i] = rstd


def _bwd_kernel(x_ref, gamma_ref, beta_ref, m_ref, rstd_ref, g_ref,
                dx_ref, dgamma_ref, dbeta_ref):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    m = m_ref[i]
    rstd = rstd_ref[i]
    n = x.size
    xhat = (x - m) * rstd
    z = xhat * gamma + beta
    gz = jnp.where(z > 0, g, 0.0)
    # per-channel partials; outputs are whole (B, C) buffers, write row i
    dbeta_ref[i, :] = jnp.sum(gz, axis=(0, 1, 2))
    dgamma_ref[i, :] = jnp.sum(gz * xhat, axis=(0, 1, 2))
    dxhat = gz * gamma
    mean_dxhat = jnp.sum(dxhat) / n
    mean_dxhat_xhat = jnp.sum(dxhat * xhat) / n
    dx_ref[...] = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)


def _interp(interpret):
    if not interpret:
        return False
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.InterpretParams()


def _run_fwd(x, gamma, beta, eps, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    sample = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    # whole (B,) stat vectors live in SMEM; each grid step writes slot i
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, eps=eps),
        grid=(b,),
        in_specs=[sample, chan, chan],
        out_specs=(sample, scal, scal),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
        ),
        interpret=_interp(interpret),
    )(x.astype(jnp.float32), gamma, beta)


def _run_bwd(x, gamma, beta, m, rstd, g, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    sample = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    chan_in = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    chan_out = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole (B, C), row writes
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[sample, chan_in, chan_in, scal, scal, sample],
        out_specs=(sample, chan_out, chan_out),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ),
        interpret=_interp(interpret),
    )(x.astype(jnp.float32), gamma, beta, m, rstd, g.astype(jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_groupnorm_relu(x, gamma, beta, eps: float = 1e-6,
                         interpret: bool = False):
    """y = relu(GroupNorm_1group(x)·γ + β), fp32 out.  x: (B, H, W, C)."""
    y, _, _ = _run_fwd(x, gamma, beta, eps, interpret)
    return y


def _gn_fwd(x, gamma, beta, eps, interpret):
    x32 = x.astype(jnp.float32)
    y, m, rstd = _run_fwd(x32, gamma, beta, eps, interpret)
    return y, (x32, gamma, beta, m, rstd)


def _gn_bwd(eps, interpret, residuals, g):
    x, gamma, beta, m, rstd = residuals
    dx, dgamma_b, dbeta_b = _run_bwd(x, gamma, beta, m, rstd, g, interpret)
    return dx, jnp.sum(dgamma_b, axis=0), jnp.sum(dbeta_b, axis=0)


fused_groupnorm_relu.defvjp(_gn_fwd, _gn_bwd)


def reference_groupnorm_relu(x, gamma, beta, eps: float = 1e-6):
    """Unfused oracle (same math as flax GroupNorm(1) fast-variance + relu)."""
    x = x.astype(jnp.float32)
    m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    v = jnp.mean(x * x, axis=(1, 2, 3), keepdims=True) - m * m
    xhat = (x - m) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)
    return jnp.maximum(xhat * gamma + beta, 0.0)
