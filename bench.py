"""Training-throughput benchmark: images/sec/chip on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference PyTorch run sustains ≈61 images/s at
batch 32, 128px, AMP on an unspecified CUDA GPU (≈1.90 steps/s including
val/checkpoint overhead, from its committed log timestamps).  This benchmark
times the steady-state fused train step (forward + backward + optimizer +
on-device augmentation, bf16 policy, FFL on — the production
``beta_vae_se.yaml`` loss) on one chip at the same batch size.
"""

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

BASELINE_IMG_PER_SEC = 61.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.models.losses import LossSpec
    from betavae_tpu.train.loop import init_state, make_train_step
    from betavae_tpu.train.optim import build_optimizer
    from __graft_entry__ import _flagship_model

    reset_config_cache()
    cfg = get_config(os.path.join(_REPO_ROOT, "configs", "beta_vae_se.yaml"))

    model = _flagship_model(image_size=args.image_size, mixed_precision=True)
    spec = LossSpec(recon_loss_type="mse", use_ffl=True, ffl_weight=0.5,
                    ffl_alpha=1.0)
    tx = build_optimizer(cfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))

    # synthetic device-resident dataset, production shapes
    n = max(1024, 4 * args.batch_size)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (n, args.image_size, args.image_size, 1),
                     np.uint8))
    step = make_train_step(
        model, tx, spec,
        aug_kwargs={"use_flip": True, "degrees": 10.0, "brightness": 0.1},
        use_capacity=True,
    )
    sched = {k: jnp.float32(v) for k, v in
             dict(beta=1.0, capacity=30.0, capacity_weight=1.0,
                  free_bits=0.0, lr=5e-4).items()}
    mask = np.ones(args.batch_size, np.float32)
    key = jax.random.PRNGKey(1)

    def batch_idx(i):
        s = (i * args.batch_size) % (n - args.batch_size)
        return np.arange(s, s + args.batch_size, dtype=np.int32)

    for i in range(args.warmup):
        key, sub = jax.random.split(key)
        state, m = step(state, images, batch_idx(i), mask, sub, sched)
    jax.block_until_ready(m["total"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, m = step(state, images, batch_idx(i), mask, sub, sched)
    jax.block_until_ready(m["total"])
    dt = time.perf_counter() - t0

    img_per_sec = args.batch_size * args.steps / dt
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_128px_bs32",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
