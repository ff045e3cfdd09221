"""Convert official LPIPS (AlexNet) torch weights to this framework's format.

The reference used the ``lpips`` pip package with downloaded pretrained
weights (``src/training/losses.py:47-51``).  This environment is zero-egress,
so ``betavae_tpu.ops.lpips`` runs with deterministic random frozen features
unless real weights are supplied.  If you have the official files —
torchvision's ``alexnet-owt-*.pth`` and lpips' ``alex.pth`` linear heads —
this script converts them into the ``.npz`` our flax module loads via
``loss.lpips_weights_path`` / ``$LPIPS_WEIGHTS``.

Usage:
  python scripts/convert_lpips_weights.py \
      --alexnet alexnet-owt-7be5be79.pth --linear alex.pth \
      --out weights/lpips_alex.npz

Mapping:
  torch AlexNet features conv weights (OIHW) -> flax HWIO under
  ``net/conv{i}``; lpips ``lin{i}.model.1.weight`` (1x1 conv, (1, C, 1, 1))
  -> our per-channel head vector ``lin{i}``.
"""
import argparse
import os

import _bootstrap  # noqa: F401
import numpy as np

# torch AlexNet `features` indices of the five conv layers
_TORCH_CONV_IDX = (0, 3, 6, 8, 10)


def convert(alexnet_path: str, linear_path: str, out_path: str) -> str:
    import torch

    feats = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lins = torch.load(linear_path, map_location="cpu", weights_only=True)

    flat = {}
    for i, ti in enumerate(_TORCH_CONV_IDX):
        w = feats[f"features.{ti}.weight"].numpy()        # (O, I, H, W)
        b = feats[f"features.{ti}.bias"].numpy()
        flat[f"net/conv{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        flat[f"net/conv{i}/bias"] = b
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lins:  # some releases omit the dropout layer
            key = f"lin{i}.model.0.weight"
        flat[f"lin{i}"] = lins[key].numpy().reshape(-1)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **flat)

    # validate against the flax module's parameter structure
    from betavae_tpu.io.checkpoint import unflatten_like
    from betavae_tpu.ops.lpips import _load_or_init_params

    module, params = _load_or_init_params(None)
    unflatten_like(params, dict(np.load(out_path)))  # raises on mismatch
    return out_path


def main():
    parser = argparse.ArgumentParser(
        description="Convert official LPIPS torch weights to npz.")
    parser.add_argument("--alexnet", required=True,
                        help="torchvision AlexNet state dict (.pth)")
    parser.add_argument("--linear", required=True,
                        help="lpips alex.pth linear-head state dict")
    parser.add_argument("--out", default="weights/lpips_alex.npz")
    args = parser.parse_args()
    out = convert(args.alexnet, args.linear, args.out)
    print(f"Wrote {out}; set loss.lpips_weights_path: {out} "
          "(or LPIPS_WEIGHTS env) to use it.")


if __name__ == "__main__":
    main()
