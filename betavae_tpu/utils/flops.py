"""Analytic FLOP accounting for the β-VAE: per-layer counts + roofline util.

Used by ``bench.py --verbose`` and the design docs to report how far the
train step is from the chip's peak — the reference had no performance
accounting at all (SURVEY.md §5/§6).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class LayerFlops:
    name: str
    flops: int          # forward multiply-adds × 2
    out_shape: tuple


def _conv_flops(out_h, out_w, cout, kh, kw, cin):
    return 2 * out_h * out_w * cout * kh * kw * cin


def model_forward_flops(image_size: int, in_channels: int, latent_dim: int,
                        base_channels: int, num_blocks: int,
                        use_decoder_se: bool = True,
                        se_reduction: int = 8):
    """Per-image forward FLOPs of BetaVAEModule (convs + dense + SE)."""
    layers = []
    chs = [base_channels * (2**i) for i in range(num_blocks)]

    # encoder
    s = image_size
    cin = in_channels
    for i, c in enumerate(chs):
        s = (s + 1) // 2
        layers.append(LayerFlops(f"enc_{i}.conv",
                                 _conv_flops(s, s, c, 3, 3, cin), (s, s, c)))
        r = max(1, c // se_reduction)
        layers.append(LayerFlops(f"enc_{i}.se", 2 * (c * r * 2), (c,)))
        cin = c
    flat = chs[-1] * s * s
    layers.append(LayerFlops("fc_mu", 2 * flat * latent_dim, (latent_dim,)))
    layers.append(LayerFlops("fc_logvar", 2 * flat * latent_dim,
                             (latent_dim,)))
    layers.append(LayerFlops("fc_dec", 2 * latent_dim * flat, (flat,)))

    # decoder
    dec_chs = list(reversed(chs))
    cin = dec_chs[0]
    for i in range(num_blocks):
        cout = dec_chs[i + 1] if i + 1 < len(dec_chs) else dec_chs[-1]
        s = s * 2
        layers.append(LayerFlops(f"dec_{i}.conv",
                                 _conv_flops(s, s, cout, 3, 3, cin),
                                 (s, s, cout)))
        if use_decoder_se:
            r = max(1, cout // se_reduction)
            layers.append(LayerFlops(f"dec_{i}.se", 2 * (cout * r * 2),
                                     (cout,)))
        cin = cout
    layers.append(LayerFlops("final_conv",
                             _conv_flops(s, s, in_channels, 3, 3, cin),
                             (s, s, in_channels)))
    return layers


def train_step_flops(image_size: int, in_channels: int, latent_dim: int,
                     base_channels: int, num_blocks: int, batch_size: int,
                     remat: bool = False, **kw) -> dict:
    """Total train-step FLOPs: fwd + ~2x fwd backward (+1x fwd if remat)."""
    layers = model_forward_flops(image_size, in_channels, latent_dim,
                                 base_channels, num_blocks, **kw)
    fwd = sum(l.flops for l in layers)
    mult = 4.0 if remat else 3.0
    return {
        "forward_flops_per_image": fwd,
        "train_flops_per_image": int(fwd * mult),
        "train_flops_per_step": int(fwd * mult * batch_size),
        "layers": layers,
    }


def utilization(step_seconds: float, flops_per_step: int,
                peak_tflops: float = 197.0) -> dict:
    """Achieved TFLOPS and fraction of peak (default: v5e bf16)."""
    achieved = flops_per_step / step_seconds / 1e12
    return {"achieved_tflops": round(achieved, 2),
            "peak_tflops": peak_tflops,
            "mxu_utilization": round(achieved / peak_tflops, 4)}
