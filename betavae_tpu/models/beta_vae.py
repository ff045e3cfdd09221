"""Conv β-VAE with SE blocks — the flagship model, TPU-native.

Capability parity with reference ``src/models/beta_vae.py:68-287``:

- encoder: ``num_blocks`` × [3×3 stride-2 conv → norm → act → SE (always on)]
  with channel widths ``base·2^i`` (ref ``beta_vae.py:33-46,94-100``),
- pooling ``flatten`` or ``gap`` (ref ``beta_vae.py:101-116``) then
  ``fc_mu`` / ``fc_logvar`` / ``fc_dec`` (ref ``beta_vae.py:117-119``),
- decoder: mirrored blocks of [bilinear ×2 upsample → 3×3 conv → norm → act →
  optional SE] (NOT transposed conv; ref ``beta_vae.py:48-66,120-126``) and a
  final 3×3 conv + sigmoid (ref ``beta_vae.py:127,163-164``),
- norms: ``batch`` → BatchNorm, ``layer`` → GroupNorm(1 group) (per-sample
  over C,H,W like torch ``GroupNorm(1, C)``), ``none`` (ref
  ``beta_vae.py:17-24``); activations relu / leakyrelu(0.2) / elu (ref
  ``beta_vae.py:8-15``),
- logvar clamped to ``model.logvar_clamp`` else ±10 (ref ``beta_vae.py:141-144``),
  optional latent clamp before decode (ref ``beta_vae.py:153-154``),
- ``forward(x, deterministic)`` 3-state semantics, ``sample_prior``,
  ``traverse`` (ref ``beta_vae.py:167-183,274-287``).

TPU-first design: NHWC layout (native TPU conv layout), static shapes (the
torch dummy-forward shape probe at ``beta_vae.py:108-115`` is replaced by
closed-form ``image_size / 2^num_blocks``), Kaiming-normal init matching the
reference's ``weight_init`` (``train.py:217-221``), and a ``dtype`` compute
policy: bf16 activations under mixed precision with fp32 params and fp32
mu/logvar heads (KL and sampling stay fp32).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import get, get_config
from ..ops.pallas_elbo import tpu_backend_available
from ..ops.pallas_head import fused_se_conv_head, supports_shape
from ..ops.reparam import reparameterize_and_kl
from ..ops.upsample import bilinear_upsample_x2
from .se import SEBlock

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return partial(nn.leaky_relu, negative_slope=0.2)
    if name == "elu":
        return nn.elu
    raise ValueError("unsupported activation")


class _Norm(nn.Module):
    """norm selector: batch | layer (GroupNorm 1 group) | none."""

    norm_type: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.norm_type == "batch":
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                name="bn")(x)
        if self.norm_type == "layer":
            return nn.GroupNorm(num_groups=1, dtype=self.dtype, name="gn")(x)
        if self.norm_type == "none":
            return x
        raise ValueError("unsupported norm")


class ConvBlock(nn.Module):
    out_ch: int
    norm_type: str
    activation: str
    use_se: bool
    se_reduction: int
    down: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        stride = 2 if self.down else 1
        x = nn.Conv(self.out_ch, (3, 3), strides=(stride, stride), padding=1,
                    dtype=self.dtype, kernel_init=_kaiming, name="conv")(x)
        x = _Norm(self.norm_type, dtype=self.dtype, name="norm")(x, train)
        x = _activation(self.activation)(x)
        if self.use_se:
            x = SEBlock(self.out_ch, self.se_reduction, dtype=self.dtype,
                        name="se")(x)
        return x


class DeconvBlock(nn.Module):
    out_ch: int
    norm_type: str
    activation: str
    use_se: bool
    se_reduction: int
    up: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_gate: bool = False):
        if self.up:
            # bilinear ×2 with torch Upsample(align_corners=False) semantics;
            # lowered as separable depthwise transposed convs — measurably
            # faster than jax.image.resize on TPU and numerically identical
            # (see ops/upsample.py)
            x = bilinear_upsample_x2(x)
        x = nn.Conv(self.out_ch, (3, 3), strides=(1, 1), padding=1,
                    dtype=self.dtype, kernel_init=_kaiming, name="conv")(x)
        x = _Norm(self.norm_type, dtype=self.dtype, name="norm")(x, train)
        x = _activation(self.activation)(x)
        if self.use_se:
            se = SEBlock(self.out_ch, self.se_reduction, dtype=self.dtype,
                         name="se")
            if return_gate:
                return se(x, return_gate=True)       # (ungated, gates)
            return se(x)
        if return_gate:
            return x, None
        return x


class FinalConvHead(nn.Module):
    """Final 3×3 conv (ref ``beta_vae.py:127``), optionally fused with the
    preceding SE gate via the Pallas head kernel (``ops/pallas_head.py``).

    Parameter names/shapes/init match ``nn.Conv(name="final_conv")`` exactly
    (same RNG fold path), so checkpoints and the torch converter are
    unaffected.  The fallback path reproduces ``nn.Conv``'s compute (cast to
    ``dtype``, conv, bias in ``dtype``); the Pallas path accumulates fp32
    (deviation table §4 #15 covers the bf16-rounding-level difference).
    """

    out_ch: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, gate=None):
        c = h.shape[-1]
        kernel = self.param("kernel", _kaiming, (3, 3, c, self.out_ch),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                          jnp.float32)
        interpret = os.environ.get("BETAVAE_HEAD_INTERPRET") == "1"
        if (self.use_pallas and self.out_ch == 1
                and supports_shape(h.shape[1], h.shape[2], c, h.dtype)
                and (interpret or tpu_backend_available())):
            s = gate if gate is not None else jnp.ones((h.shape[0], c),
                                                       h.dtype)
            logits = fused_se_conv_head(h, s, kernel[..., 0], interpret)
            return logits[..., None] + bias
        if gate is not None:
            h = h * gate[:, None, None, :]
        x = h.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class BetaVAEModule(nn.Module):
    """Pure flax module.  Inputs/outputs NHWC float in [0, 1]."""

    image_size: int
    in_channels: int
    latent_dim: int
    base_channels: int
    num_blocks: int
    activation: str = "relu"
    norm_type: str = "layer"
    se_reduction: int = 16
    use_decoder_se: bool = True
    encoder_pooling: str = "flatten"     # flatten | gap
    logvar_clamp: Optional[Sequence[float]] = None
    latent_clamp: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    # rematerialize block activations in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(depth) less activation memory — for the
    # scaled 256px/global-batch-256 variant where decoder activations
    # otherwise dominate HBM.  False | True/"all" | "decoder" (decoder-only:
    # the decoder holds the biggest activations, so rematting just it keeps
    # most of the memory win at a fraction of the recompute)
    remat: Any = False
    # fuse the last decoder SE gate into the final conv via the Pallas head
    # kernel (ops/pallas_head.py).  Opt-in (training.fused_head: true): the
    # kernel is correct but measured slower than XLA end-to-end on current
    # hardware — see _resolve_fused_head and docs/DESIGN.md §3.0.2
    fused_head: bool = False

    @property
    def channel_widths(self):
        return [self.base_channels * (2**i) for i in range(self.num_blocks)]

    @property
    def bottleneck_hw(self) -> int:
        s = self.image_size
        for _ in range(self.num_blocks):
            s = (s + 1) // 2  # stride-2 conv with padding 1: ceil(s/2)
        return s

    @property
    def flat_dim(self) -> int:
        if self.encoder_pooling == "gap":
            return self.channel_widths[-1]
        return self.channel_widths[-1] * self.bottleneck_hw**2

    def setup(self):
        chs = self.channel_widths
        if self.remat in (True, "all", "true"):
            mode = "all"
        elif self.remat == "decoder":
            mode = "decoder"
        elif self.remat in (False, None, "none", "false"):
            mode = "none"
        else:
            raise ValueError(
                f"training.remat must be true/false/'decoder', got "
                f"{self.remat!r}")
        # static_argnums under flax remat: positional args count from the
        # module instance itself, so a block called ``blk(h, train, ...)``
        # has ``train`` at args[2] — both blocks are called positionally
        Enc = (nn.remat(ConvBlock, static_argnums=(2,))
               if mode == "all" else ConvBlock)
        Dec = (nn.remat(DeconvBlock, static_argnums=(2, 3))
               if mode in ("all", "decoder") else DeconvBlock)
        self.encoder = [
            Enc(chs[i], self.norm_type, self.activation, True,
                self.se_reduction, down=True, dtype=self.dtype,
                name=f"enc_{i}")
            for i in range(self.num_blocks)
        ]
        self.fc_mu = nn.Dense(self.latent_dim, kernel_init=_kaiming,
                              dtype=jnp.float32, name="fc_mu")
        self.fc_logvar = nn.Dense(self.latent_dim, kernel_init=_kaiming,
                                  dtype=jnp.float32, name="fc_logvar")
        self.fc_dec = nn.Dense(self.flat_dim, kernel_init=_kaiming,
                               dtype=self.dtype, name="fc_dec")
        # decoder channels mirror the encoder (ref beta_vae.py:120-126):
        # dec_chs = reversed(chs); block i maps dec_chs[i] -> dec_chs[i+1]
        # (last block keeps the final width).
        dec_chs = list(reversed(chs))
        self.decoder = [
            Dec(
                dec_chs[i + 1] if i + 1 < len(dec_chs) else dec_chs[-1],
                self.norm_type, self.activation, self.use_decoder_se,
                self.se_reduction, up=True, dtype=self.dtype, name=f"dec_{i}",
            )
            for i in range(self.num_blocks)
        ]
        # same param tree as nn.Conv(name="final_conv"); optionally fused
        # with the last decoder SE gate (see FinalConvHead)
        self.final_conv = FinalConvHead(self.in_channels, dtype=self.dtype,
                                        use_pallas=self.fused_head,
                                        name="final_conv")

    def encode(self, x, train: bool = False):
        h = x.astype(self.dtype)
        for blk in self.encoder:
            h = blk(h, train)
        if self.encoder_pooling == "gap":
            h = jnp.mean(h, axis=(1, 2))
        else:
            h = h.reshape(h.shape[0], -1)
        h = h.astype(jnp.float32)
        mu = self.fc_mu(h)
        logvar = self.fc_logvar(h)
        lo, hi = (self.logvar_clamp if self.logvar_clamp else (-10.0, 10.0))
        logvar = jnp.clip(logvar, lo, hi)
        return mu, logvar

    def decode(self, z, train: bool = False):
        if self.latent_clamp is not None:
            z = jnp.clip(z, -self.latent_clamp, self.latent_clamp)
        h = self.fc_dec(z.astype(self.dtype))
        s = self.bottleneck_hw
        c = self.channel_widths[-1]
        if self.encoder_pooling == "gap":
            # broadcast the GAP vector over the bottleneck spatial grid
            # (ref beta_vae.py:156-159)
            h = jnp.broadcast_to(h[:, None, None, :], (h.shape[0], s, s, c))
        else:
            h = h.reshape(h.shape[0], s, s, c)
        *body, last = self.decoder
        for blk in body:
            h = blk(h, train, False)
        # when the fused head is active, take the last block's SE gates
        # un-applied and fold them into the final conv (ops/pallas_head.py)
        want_gate = self.fused_head and self.use_decoder_se
        out = last(h, train, want_gate)
        h, gate = out if want_gate else (out, None)
        x = self.final_conv(h, gate)
        return nn.sigmoid(x.astype(jnp.float32))

    def __call__(self, x, z_rng=None, deterministic: bool = False,
                 train: bool = False):
        mu, logvar = self.encode(x, train=train)
        if deterministic:
            z = mu
        else:
            if z_rng is None:
                z_rng = self.make_rng("reparam")
            z, _ = reparameterize_and_kl(z_rng, mu, logvar)
        recon = self.decode(z, train=train)
        return recon, mu, logvar, z


@dataclass
class BetaVAE:
    """Config-bound convenience wrapper (the reference's ``BetaVAE`` surface).

    Holds the flax module + config-derived loss attributes and exposes jitted
    ``encode/decode/forward/sample_prior/traverse`` over explicit variables.
    """

    module: BetaVAEModule
    cfg: Any = None
    deterministic: bool = False
    latent_reg_lambda: float = 0.0
    recon_loss_type: str = "mse"
    beta: float = 1.0

    def __post_init__(self):
        self._encode_j = jax.jit(
            lambda v, x: self.module.apply(v, x, method=BetaVAEModule.encode)
        )
        self._decode_j = jax.jit(
            lambda v, z: self.module.apply(v, z, method=BetaVAEModule.decode)
        )
        self._forward_det_j = jax.jit(
            lambda v, x: self.module.apply(v, x, deterministic=True)
        )
        self._forward_sto_j = jax.jit(
            lambda v, x, key: self.module.apply(v, x, z_rng=key,
                                                deterministic=False)
        )

    @property
    def latent_dim(self) -> int:
        return self.module.latent_dim

    def init_variables(self, key) -> dict:
        x = jnp.zeros(
            (1, self.module.image_size, self.module.image_size,
             self.module.in_channels),
            jnp.float32,
        )
        params_key, rp_key = jax.random.split(key)
        # compile the init program instead of op-by-op tracing (much faster on
        # slow hosts; identical result)
        return jax.jit(partial(self.module.init, train=False))(
            {"params": params_key, "reparam": rp_key}, x
        )

    def variables_template(self):
        """Abstract variables pytree (ShapeDtypeStructs) — no compilation.

        Used as the unflatten target when loading checkpoints; avoids paying
        a full init compile just to learn the parameter structure.
        """
        return jax.eval_shape(self.init_variables, jax.random.PRNGKey(0))

    def encode(self, variables, x):
        return self._encode_j(variables, jnp.asarray(x))

    def decode(self, variables, z):
        return self._decode_j(variables, jnp.asarray(z))

    def forward(self, variables, x, key=None, deterministic: bool | None = None):
        if deterministic is None:
            deterministic = self.deterministic
        x = jnp.asarray(x)
        if deterministic:
            return self._forward_det_j(variables, x)
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._forward_sto_j(variables, x, key)

    def sample_prior(self, variables, n: int, key):
        z = jax.random.normal(key, (n, self.latent_dim), dtype=jnp.float32)
        return self.decode(variables, z)

    def traverse(self, variables, x, dim: int, steps: int = 7, span: float = 3.0):
        """Single-dim set-to-value sweep (ref ``beta_vae.py:278-287``)."""
        mu, _ = self.encode(variables, x)
        vals = jnp.linspace(-span, span, steps)
        outs = []
        for v in vals:
            z = mu.at[:, dim].set(v)
            outs.append(self.decode(variables, z))
        return jnp.stack(outs, axis=1), vals


def _resolve_fused_head(value) -> bool:
    """``training.fused_head``: auto (default) resolves to OFF.

    The fused SE-gate∘conv head kernel is correct and hardware-validated but
    measured 2293 img/s vs 4172 img/s end-to-end at the flagship shape — the
    per-sample-grid Pallas pattern loses to XLA's fusions on this chip (same
    verdict as ``ops/pallas_gn.py``; numbers in docs/DESIGN.md §3.0.2).
    Kept as an explicit opt-in for future Mosaic versions.
    """
    if value in (True, "true"):
        return True
    if value in (False, "false", None, "none"):
        return False
    if value == "auto":
        return os.environ.get("BETAVAE_HEAD_INTERPRET") == "1"
    raise ValueError(f"training.fused_head must be auto/true/false, "
                     f"got {value!r}")


def model_from_config(cfg=None, mixed_precision: bool | None = None) -> BetaVAE:
    """Build the flagship model from the active config (ref ``beta_vae.py:69-129``)."""
    cfg = cfg or get_config()
    mcfg, dcfg = cfg.model, cfg.data
    if mixed_precision is None:
        mixed_precision = bool(get(cfg.training, "mixed_precision", False))
    logvar_clamp = get(mcfg, "logvar_clamp", None)
    module = BetaVAEModule(
        image_size=int(dcfg.image_size),
        in_channels=1 if dcfg.grayscale else 3,
        latent_dim=int(mcfg.latent_dim),
        base_channels=int(mcfg.base_channels),
        num_blocks=int(mcfg.num_blocks),
        activation=str(mcfg.activation),
        norm_type=str(mcfg.encoder_norm),
        se_reduction=int(mcfg.se_reduction_ratio),
        use_decoder_se=bool(mcfg.use_decoder_se),
        encoder_pooling=str(get(mcfg, "encoder_pooling", "flatten")),
        logvar_clamp=tuple(logvar_clamp) if logvar_clamp else None,
        latent_clamp=get(mcfg, "latent_clamp", None),
        dtype=jnp.bfloat16 if mixed_precision else jnp.float32,
        remat=get(cfg.training, "remat", False),
        fused_head=_resolve_fused_head(get(cfg.training, "fused_head",
                                           "auto")),
    )
    return BetaVAE(
        module=module,
        cfg=cfg,
        deterministic=bool(get(mcfg, "deterministic_overfit", False)),
        latent_reg_lambda=float(get(mcfg, "latent_reg_lambda", 0.0)),
        recon_loss_type=str(mcfg.reconstruction_loss),
        beta=float(mcfg.beta),
    )
