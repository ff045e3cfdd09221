"""Pallas TPU kernel: fused SE-gate ∘ final 3×3 conv (C→1) decoder head.

The reference's decoder tail is ``SE gate → final 3×3 conv → sigmoid``
(``src/models/beta_vae.py:60-66,127,163-164``).  On TPU both halves are
off-roofline as XLA lowers them:

- the gate multiply ``y·s`` is a full read+write pass over the largest
  activation in the network ([B,128,128,64] at the flagship shape), and
- the C_out=1 convolution occupies 1 of 128 MXU output lanes (<2 TFLOPS
  measured; profiler trace in docs/DESIGN.md §3.0.2), with a degenerate
  ``T(2,128)`` output layout.

Because the channel contraction commutes with the per-sample gate,

    conv(y·s, k) = conv(y, s⊙k)     (s broadcast over taps)

the gate folds into the conv weights per sample, and the whole head becomes
ONE pass over ``y`` on the VPU (the contraction is a 64-lane reduce — no MXU
needed, no degenerate layout, no gated copy of ``y`` ever written to HBM).

Forward kernel (grid over samples, per-sample blocks, VPU only):

    out[h,w] = Σ_{Δh,Δw,c} yp[h+Δh, w+Δw, c] · s[c] · k[Δh,Δw,c]

with zero 'SAME' padding realised as variable-extent tap slices accumulated
into a VMEM scratch (border taps simply cover smaller regions — exact
zero-pad semantics, no padded copy of ``y``).

Backward (``jax.custom_vjp``):

- ``dy_y = s ⊙ Σ_tap shift(dy)·k`` — dy is tiny ([B,H,W] fp32), so this is a
  write-bound broadcast; left to XLA as 9 shifted-slice FMAs (one fusion).
- ``dk = Σ_b s·M``, ``ds = Σ_tap k·M`` where ``M[b,tap,c] = Σ_hw
  shiftᵗ(y)·dy`` — the only term that must re-read ``y``; computed by a
  second Pallas kernel as 9 in-VMEM reductions per sample (one HBM read of
  ``y`` total, per-sample partial outputs so Mosaic pipelines the grid —
  the accumulator-output mistake of ``pallas_gn.py`` is deliberately
  avoided).

Numerics: tap products and accumulation run in fp32 regardless of the bf16
activation policy (the MXU path also accumulates fp32 — parity at bf16
rounding level, covered by docs/DESIGN.md §4 deviation 15).  Bias add and
sigmoid stay outside (XLA, fp32, on the tiny [B,H,W,1] output).

The pure-XLA oracle (:func:`head_conv_reference`) is the correctness
reference in tests and the fallback on non-TPU backends / unsupported
shapes (``supports_shape``).

STATUS — tested, hardware-validated building block, OFF by default
(``training.fused_head: true`` opts in).  End-to-end at the flagship
128px/bs32 shape the fused step measured 13.96 ms vs 7.67 ms for the XLA
path; piecewise (net of harness overhead) fwd ≈1.5 ms / M ≈1.1 ms vs
≈0.9 ms for XLA's whole gate+conv fwd+bwd.  The cost is not the channel
contraction (≈19 MFLOP/sample) but Mosaic's handling of the 9
sublane-unaligned tap slices + read-modify-write accumulation, and the
same per-sample-grid pipelining weakness already measured for
``pallas_gn.py`` (docs/DESIGN.md §3.0.1-§3.0.2).  An MXU formulation
(in-kernel ``(H·W, C) @ (C, 9)`` tap matmul) needs a second-minor reshape,
which Mosaic forbids.  Numbers and the decision record live in
docs/DESIGN.md §3.0.2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _tap_bounds(h: int, w: int, dh: int, dw: int):
    """Slice bounds for tap (dh, dw) ∈ {0,1,2}² of a zero-padded 3×3 conv.

    Returns (dst_rows, dst_cols, src_rows, src_cols): out[dst] += y[src]·w.
    """
    # out[r, c] reads yp[r+dh, c+dw] = y[r+dh-1, c+dw-1]
    oh = dh - 1
    ow = dw - 1
    dst_r = (max(0, -oh), h - max(0, oh))
    dst_c = (max(0, -ow), w - max(0, ow))
    src_r = (dst_r[0] + oh, dst_r[1] + oh)
    src_c = (dst_c[0] + ow, dst_c[1] + ow)
    return dst_r, dst_c, src_r, src_c


def _fwd_kernel(y_ref, s_ref, k_ref, out_ref, acc_ref):
    """One sample: out[h,w] = Σ_taps,c y·(s⊙k), zero-padded 3×3."""
    h, w, _ = y_ref.shape[1:]
    s = s_ref[0, 0].astype(jnp.float32)               # (C,)
    sk = k_ref[...].astype(jnp.float32) * s           # (3, 3, C)
    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
    for dh in range(3):
        for dw in range(3):
            (d0, d1), (e0, e1), (r0, r1), (c0, c1) = _tap_bounds(h, w, dh, dw)
            sl = y_ref[0, r0:r1, c0:c1, :].astype(jnp.float32)
            acc_ref[d0:d1, e0:e1] += jnp.sum(sl * sk[dh, dw], axis=-1)
    out_ref[0] = acc_ref[...]


def _mkernel(y_ref, dy_ref, m_ref):
    """One sample: M[tap, c] = Σ_hw shiftᵗ(y)·dy (for dk/ds)."""
    h, w, _ = y_ref.shape[1:]
    dy = dy_ref[0]                                    # (H, W) fp32
    for dh in range(3):
        for dw in range(3):
            (d0, d1), (e0, e1), (r0, r1), (c0, c1) = _tap_bounds(h, w, dh, dw)
            sl = y_ref[0, r0:r1, c0:c1, :].astype(jnp.float32)
            # slice and expand_dims kept as separate ops: a combined
            # slice+None index lowers to an unsupported Mosaic gather
            d = dy[d0:d1, e0:e1]
            m_ref[0, dh * 3 + dw, :] = jnp.sum(sl * d[:, :, None],
                                               axis=(0, 1))


def _interp(interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.InterpretParams() if interpret else False


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _run_fwd(y, s, k, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = y.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            # gates fed as (B, 1, C): the (1, 1, C) block then matches the
            # trailing array dims exactly (a (1, C) block of (B, C) violates
            # the sublane-divisibility rule, and dynamic row loads need
            # 8-aligned indices)
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(y, s[:, None, :], k)


def _run_m(y, dy, interpret: bool):
    from jax.experimental import pallas as pl

    b, h, w, c = y.shape
    return pl.pallas_call(
        _mkernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 9, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 9, c), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=_interp(interpret),
    )(y, dy)


def _dx_xla(dy, s, k, dtype):
    """dy_y[b,h,w,c] = s[b,c] · Σ_tap dy[b, h+1-Δh, w+1-Δw] · k[Δh,Δw,c].

    dy is [B,H,W] fp32 (tiny); the result is write-bound, one XLA fusion of
    9 shifted-slice broadcasts — no MXU conv-transpose machinery.
    """
    b, h, w = dy.shape
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros((b, h, w, k.shape[-1]), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            # dx[a, b] += dy[a+1-dh, b+1-dw]·k[dh,dw]; via dyp: offset 2-dh
            sl = jax.lax.dynamic_slice(dyp, (0, 2 - dh, 2 - dw), (b, h, w))
            acc = acc + sl[..., None] * k[dh, dw].astype(jnp.float32)
    return (acc * s[:, None, None, :].astype(jnp.float32)).astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_se_conv_head(y, s, k, interpret: bool = False):
    """``conv2d_same(y · s[:,None,None,:], k[...,None])`` without the gate pass.

    y: (B, H, W, C) activations (bf16/fp32); s: (B, C) SE gates; k: (3, 3, C)
    weights (fp32 params).  Returns fp32 logits (B, H, W) — bias and sigmoid
    are the caller's (they are tiny and XLA-fused).
    """
    return _run_fwd(y, s, k, interpret)


def _head_fwd(y, s, k, interpret):
    return _run_fwd(y, s, k, interpret), (y, s, k)


def _head_bwd(interpret, res, dy):
    y, s, k = res
    dy = dy.astype(jnp.float32)
    m = _run_m(y, dy, interpret)                      # (B, 9, C)
    m = m.reshape(m.shape[0], 3, 3, -1)
    dk = jnp.sum(m * s[:, None, None, :].astype(jnp.float32), axis=0)
    ds = jnp.sum(m * k[None].astype(jnp.float32), axis=(1, 2)).astype(s.dtype)
    dy_y = _dx_xla(dy, s, k, y.dtype)
    return dy_y, ds, dk


fused_se_conv_head.defvjp(_head_fwd, _head_bwd)


def head_conv_reference(y, s, k):
    """XLA oracle: gate then 3×3 'SAME' conv, fp32. Tests compare against it."""
    yg = y.astype(jnp.float32) * s[:, None, None, :].astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        yg, k.astype(jnp.float32)[..., None], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]


def supports_shape(h: int, w: int, c: int, dtype) -> bool:
    """Feasibility gate for the per-sample whole-block design.

    Budget: double-buffered input block (lane dim padded to 128) + fp32
    accumulator scratch, capped at the envelope actually validated on
    hardware (128px-class blocks, bf16 and fp32).  256px-class blocks
    (~17 MB per input buffer) hit multi-minute Mosaic/compile-service
    stalls on this toolchain and are excluded — callers fall back to the
    XLA head.
    """
    itemsize = jnp.dtype(dtype).itemsize
    c_padded = max(c, 128) if c % 128 else c
    in_bytes = h * w * c_padded * itemsize
    acc_bytes = h * w * 4
    return 2 * in_bytes + acc_bytes < 20 * 1024 * 1024
