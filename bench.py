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
    parser.add_argument("--steps", type=int, default=96)
    parser.add_argument("--warmup", type=int, default=16)
    parser.add_argument("--verbose", action="store_true",
                        help="print a FLOP/roofline breakdown to stderr")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.models.losses import LossSpec
    from betavae_tpu.train.loop import init_state, make_train_multi_step
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
    # K steps per dispatch via lax.scan — the same multi-step program the
    # training loop uses; amortizes host dispatch overhead
    K = 16
    step = make_train_multi_step(
        model, tx, spec,
        aug_kwargs={"use_flip": True, "degrees": 10.0, "brightness": 0.1},
        use_capacity=True,
    )
    sched_k = {k: jnp.full((K,), v, jnp.float32) for k, v in
               dict(beta=1.0, capacity=30.0, capacity_weight=1.0,
                    free_bits=0.0, lr=5e-4).items()}
    mask_kb = np.ones((K, args.batch_size), np.float32)
    key = jax.random.PRNGKey(1)

    def chunk_idx(c):
        out = np.empty((K, args.batch_size), np.int32)
        for j in range(K):
            s = ((c * K + j) * args.batch_size) % (n - args.batch_size)
            out[j] = np.arange(s, s + args.batch_size, dtype=np.int32)
        return out

    n_chunks = max(1, args.steps // K)
    warm_chunks = max(1, args.warmup // K)
    for c in range(warm_chunks):
        key, sub = jax.random.split(key)
        keys_k = jax.random.split(sub, K)
        state, m = step(state, images, chunk_idx(c), mask_kb, keys_k, sched_k)
    # NOTE: sync via device_get, not block_until_ready — on tunneled TPU
    # runtimes the latter can return before execution finishes, inflating
    # throughput by orders of magnitude (verified empirically).
    float(np.asarray(m["total"])[-1])

    t0 = time.perf_counter()
    for c in range(n_chunks):
        key, sub = jax.random.split(key)
        keys_k = jax.random.split(sub, K)
        state, m = step(state, images, chunk_idx(c), mask_kb, keys_k, sched_k)
    float(np.asarray(m["total"])[-1])
    dt = time.perf_counter() - t0

    img_per_sec = args.batch_size * K * n_chunks / dt
    if args.verbose:
        from betavae_tpu.utils.flops import train_step_flops, utilization

        fl = train_step_flops(args.image_size, 1, 64, 64, 4,
                              batch_size=args.batch_size)
        util = utilization(dt / (K * n_chunks), fl["train_flops_per_step"])
        print(json.dumps({"step_ms": round(dt / (K * n_chunks) * 1e3, 3),
                          **{k: v for k, v in fl.items() if k != "layers"},
                          **util}), file=sys.stderr)
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_128px_bs32",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
