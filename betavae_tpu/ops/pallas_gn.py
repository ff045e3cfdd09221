"""Pallas TPU kernel: fused per-sample GroupNorm(1 group) + ReLU + SE squeeze.

Every encoder/decoder block ends with GroupNorm → ReLU → SE gate (reference
``beta_vae.py:17-24,33-66``, ``encoder_norm: layer``).  Unfused, XLA executes
this as stats pass (read) + normalize pass (read, write) + SE squeeze pool
(read) = 3 reads + 1 write of the full tensor.  This kernel keeps one whole
sample VMEM-resident and does everything in a single HBM read + write:

    m = mean(x); v = mean(x²) − m²; rstd = rsqrt(v + eps)
    y = max((x − m)·rstd·γ + β, 0)
    pooled_c = mean_hw(y)                 # the SE AdaptiveAvgPool squeeze

The SE MLP (two tiny matmuls on ``pooled``) and the gate multiply stay in
XLA — they are negligible and fuse well.

Backward (hand-derived ``custom_vjp``, one fused kernel): given gy = dL/dy
and gp = dL/dpooled, with gz = (gy + gp/(H·W))·1[z>0]:

    dβ_c = Σ_hw gz ;  dγ_c = Σ_hw gz·x̂
    dx   = rstd·γ⊙(gz − mean(gz·γ)/γ... ) — computed in normalized form:
    dx̂  = gz·γ ;  dx = rstd·(dx̂ − mean(dx̂) − x̂·mean(dx̂·x̂))

I/O dtype follows ``x`` (bf16 in production); all statistics and the
normalization math run in fp32 inside the kernel.  Whole-sample blocks:
the largest production block (128·128·64 bf16 = 2 MB/sample) fits VMEM;
callers fall back to the unfused oracle above ~8 MB/sample (``fits_vmem``).

STATUS — tested building block, deliberately NOT wired into the model.
Math/VJP validated against :func:`reference_groupnorm_relu` in the TPU
interpreter (CPU CI) and compiled+parity-checked on real v5e hardware, BUT
the end-to-end measurement went the other way: XLA's GroupNorm is already
at the HBM roofline (fwd 0.235 ms vs 0.23 ms ideal at 128²·64·bs32) while
this kernel's per-sample sequential grid with whole-(B,C) accumulator
outputs defeats Mosaic's pipelining — 2.10 ms vs 0.66 ms for the
GN+ReLU+SE block fwd+bwd.  Full numbers: docs/DESIGN.md §3.0.1.  Kept as a
correct, tested reference for a future tiled-grid attempt; the model uses
flax GroupNorm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, pooled_ref, m_ref,
                rstd_ref, *, eps: float):
    from jax.experimental import pallas as pl

    x = x_ref[0].astype(jnp.float32)            # (H, W, C)
    h, w, c = x.shape
    n = h * w * c
    m = jnp.sum(x) / n
    v = jnp.sum(x * x) / n - m * m
    rstd = jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)
    xhat = (x - m) * rstd
    z = xhat * gamma_ref[...].astype(jnp.float32) \
        + beta_ref[...].astype(jnp.float32)
    y = jnp.maximum(z, 0.0)
    y_ref[0] = y.astype(y_ref.dtype)
    i = pl.program_id(0)
    pooled_ref[i, :] = jnp.sum(y, axis=(0, 1)) * (1.0 / (h * w))
    m_ref[i] = m
    rstd_ref[i] = rstd


def _bwd_kernel(x_ref, gamma_ref, beta_ref, m_ref, rstd_ref, gy_ref, gp_ref,
                dx_ref, dgamma_ref, dbeta_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    h, w, c = x.shape
    n = x.size
    gamma = gamma_ref[...].astype(jnp.float32)
    xhat = (x - m_ref[i]) * rstd_ref[i]
    z = xhat * gamma + beta_ref[...].astype(jnp.float32)
    # pooled = mean_hw(y) adds gp/(H·W) to every surviving element's gradient
    g = gy_ref[0].astype(jnp.float32) + gp_ref[i, :] * (1.0 / (h * w))
    gz = jnp.where(z > 0, g, 0.0)
    dbeta_ref[i, :] = jnp.sum(gz, axis=(0, 1))
    dgamma_ref[i, :] = jnp.sum(gz * xhat, axis=(0, 1))
    dxhat = gz * gamma
    mean_dxhat = jnp.sum(dxhat) / n
    mean_dxhat_xhat = jnp.sum(dxhat * xhat) / n
    dx = rstd_ref[i] * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _interp(interpret):
    if not interpret:
        return False
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.InterpretParams()


# the 16 MB scoped-vmem default is a compiler knob, not the hardware limit
# (v5e has 128 MB VMEM); whole-sample fp32 working sets need more headroom
_VMEM_LIMIT = 100 * 1024 * 1024


def _params(interpret):
    from jax.experimental.pallas import tpu as pltpu

    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _run_fwd(x, gamma, beta, eps, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    sample = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    pooled = pl.BlockSpec(memory_space=pltpu.VMEM)   # whole (B, C), row i
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)     # whole (B,), slot i
    return pl.pallas_call(
        partial(_fwd_kernel, eps=eps),
        grid=(b,),
        in_specs=[sample, chan, chan],
        out_specs=(sample, pooled, scal, scal),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
        ),
        interpret=_interp(interpret),
        compiler_params=_params(interpret),
    )(x, gamma, beta)


def _run_bwd(x, gamma, beta, m, rstd, gy, gp, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    sample = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    chan_in = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    bc = pl.BlockSpec(memory_space=pltpu.VMEM)       # whole (B, C)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[sample, chan_in, chan_in, scal, scal, sample, bc],
        out_specs=(sample, bc, bc),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ),
        interpret=_interp(interpret),
        compiler_params=_params(interpret),
    )(x, gamma, beta, m, rstd, gy, gp)


def fits_vmem(shape, dtype=jnp.bfloat16, budget_bytes=12_000_000) -> bool:
    """Whether a per-sample block (plus fp32 working set) fits VMEM.

    Budget verified empirically on v5e at the production 128·128·64 bf16
    block; the scaled 256px variant exceeds it and falls back to the oracle.
    """
    _, h, w, c = shape
    per_sample = h * w * c * jnp.dtype(dtype).itemsize
    return per_sample * 5 <= budget_bytes  # x, y + fp32 temps ~3x


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_gn_relu_pool(x, gamma, beta, eps: float = 1e-6,
                       interpret: bool = False):
    """``(y, pooled)``: relu(GroupNorm₁(x)·γ+β) and its per-channel HW mean.

    ``y`` keeps ``x``'s dtype; ``pooled`` is fp32 ``(B, C)`` — exactly the SE
    squeeze input.  x: (B, H, W, C).
    """
    y, pooled, _, _ = _run_fwd(x, gamma, beta, eps, interpret)
    return y, pooled


def _gn_fwd(x, gamma, beta, eps, interpret):
    y, pooled, m, rstd = _run_fwd(x, gamma, beta, eps, interpret)
    return (y, pooled), (x, gamma, beta, m, rstd)


def _gn_bwd(eps, interpret, residuals, grads):
    x, gamma, beta, m, rstd = residuals
    gy, gp = grads
    dx, dgamma_b, dbeta_b = _run_bwd(x, gamma, beta, m, rstd, gy,
                                     gp.astype(jnp.float32), interpret)
    return dx, jnp.sum(dgamma_b, axis=0), jnp.sum(dbeta_b, axis=0)


fused_gn_relu_pool.defvjp(_gn_fwd, _gn_bwd)


def fused_groupnorm_relu(x, gamma, beta, eps: float = 1e-6,
                         interpret: bool = False):
    """y = relu(GroupNorm₁(x)·γ + β) — pool output discarded."""
    y, _ = fused_gn_relu_pool(x, gamma, beta, eps, interpret)
    return y


def reference_groupnorm_relu(x, gamma, beta, eps: float = 1e-6):
    """Unfused oracle (same math as flax GroupNorm(1) fast-variance + relu)."""
    x = x.astype(jnp.float32)
    m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    v = jnp.mean(x * x, axis=(1, 2, 3), keepdims=True) - m * m
    xhat = (x - m) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)
    return jnp.maximum(xhat * gamma + beta, 0.0)


def reference_gn_relu_pool(x, gamma, beta, eps: float = 1e-6):
    """Unfused oracle for the pool variant."""
    y = reference_groupnorm_relu(x, gamma, beta, eps)
    return y, jnp.mean(y, axis=(1, 2))
