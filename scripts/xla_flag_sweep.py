"""A/B sweep of XLA TPU compiler options over the production train step.

The reference has no compiler-tuning surface (it is eager PyTorch); on TPU
the one remaining lever after the kernel work of docs/DESIGN.md §3.0.1-3.0.3
is XLA's own pass configuration.  This CLI lowers the fused multi-step train
program ONCE for the active config, then compiles it per candidate option
set via ``lowered.compile(compiler_options=...)`` and times best-of-reps
timed passes, so every variant runs byte-identical HLO through a different
pass pipeline.  Option names the backend rejects are recorded, not fatal.

Measured result (2026-08-18, v5e via remote compile service, production
128px/bs32/K=192 program — recorded in DESIGN.md §3.0.4): every accepted
variant is within run noise of the default pipeline (7.371-7.386 ms/step);
shrinking/growing the scoped-vmem limit is strictly worse (8.1 / 9.5 ms).
Kept as the reproducible harness for future XLA/Mosaic toolchain upgrades.

Examples:
    python scripts/xla_flag_sweep.py                       # default candidates
    python scripts/xla_flag_sweep.py --steps 48 --reps 5
    python scripts/xla_flag_sweep.py --options-json '[
        ["my_variant", {"xla_tpu_scoped_vmem_limit_kib": 32768}]]'

Sync discipline: scalar ``np.asarray`` pulls, never ``block_until_ready``
(unreliable through this relay — CLAUDE.md).
"""
import argparse
import json
import time

import _bootstrap  # noqa: F401
import numpy as np

# Each entry: (label, compiler_options dict).  The empty dict is the
# default-pipeline baseline every variant is compared against.
DEFAULT_CANDIDATES = [
    ("baseline", {}),
    ("scoped_vmem_112M", {"xla_tpu_scoped_vmem_limit_kib": 114688}),
    ("scoped_vmem_64M", {"xla_tpu_scoped_vmem_limit_kib": 65536}),
    ("latency_hiding_sched",
     {"xla_tpu_enable_latency_hiding_scheduler": True}),
    ("no_dot_strength_red",
     {"xla_tpu_enable_dot_strength_reduction": False}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": False}),
    ("licm_inflation_2", {"xla_tpu_licm_size_inflation_ratio": 2.0}),
]


def main():
    parser = argparse.ArgumentParser(
        description="Compile the production train step under candidate XLA "
                    "option sets and report ms/step for each.")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--steps", type=int, default=None,
                        help="K steps per dispatch (default: the config's "
                             "training.scan_chunk_steps).")
    parser.add_argument("--chunks", type=int, default=2,
                        help="Dispatches per timed pass.")
    parser.add_argument("--reps", type=int, default=3,
                        help="Timed passes per variant (best is kept).")
    parser.add_argument("--options-json", type=str, default=None,
                        help="JSON list of [label, options-dict] pairs "
                             "replacing the default candidates.")
    args = parser.parse_args()
    if args.config:
        import os
        os.environ["CONFIG_PATH"] = args.config

    import jax
    import jax.numpy as jnp

    from betavae_tpu.config import get, get_config
    from betavae_tpu.models.beta_vae import model_from_config
    from betavae_tpu.models.losses import loss_spec_from_config
    from betavae_tpu.train.loop import init_state, make_train_multi_step
    from betavae_tpu.train.optim import build_optimizer

    candidates = (json.loads(args.options_json) if args.options_json
                  else DEFAULT_CANDIDATES)

    cfg = get_config()
    B = int(cfg.training.batch_size)
    img = int(cfg.data.image_size)
    K = args.steps or int(get(cfg.training, "scan_chunk_steps", 48))

    model = model_from_config(cfg)
    spec = loss_spec_from_config(cfg)
    tx = build_optimizer(cfg)
    step = make_train_multi_step(
        model, tx, spec,
        aug_kwargs={"use_flip": True, "degrees": 10.0, "brightness": 0.1},
        use_capacity=True)

    n = max(4 * B, 1024)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (n, img, img, 1), np.uint8))
    mask_kb = np.ones((K, B), np.float32)
    sched_k = {k: jnp.full((K,), v, jnp.float32) for k, v in
               dict(beta=1.0, capacity=30.0, capacity_weight=1.0,
                    free_bits=0.0, lr=5e-4).items()}

    def chunk_idx(c):
        out = np.empty((K, B), np.int32)
        for j in range(K):
            s = ((c * K + j) * B) % (n - B)
            out[j] = np.arange(s, s + B, dtype=np.int32)
        return out

    state0 = init_state(model, tx, jax.random.PRNGKey(0))
    lowered = step.lower(state0, images, chunk_idx(0), mask_kb,
                         jax.random.split(jax.random.PRNGKey(1), K), sched_k)

    results = {}
    for name, opts in candidates:
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
        except Exception as e:  # backend rejects unknown/unsupported flags
            results[name] = f"REJECTED: {str(e)[:120]}"
            print(f"{name:24s} REJECTED: {str(e)[:120]}", flush=True)
            continue
        try:
            # fresh state per variant — donation consumes the previous one
            state = init_state(model, tx, jax.random.PRNGKey(0))
            key = jax.random.PRNGKey(1)
            for c in range(2):  # warm
                key, sub = jax.random.split(key)
                state, m = compiled(state, images, chunk_idx(c), mask_kb,
                                    jax.random.split(sub, K), sched_k)
            float(np.asarray(m["total"])[-1])
            dt = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for c in range(args.chunks):
                    key, sub = jax.random.split(key)
                    state, m = compiled(state, images, chunk_idx(c),
                                        mask_kb, jax.random.split(sub, K),
                                        sched_k)
                float(np.asarray(m["total"])[-1])
                dt = min(dt, time.perf_counter() - t0)
            ms = dt * 1e3 / (K * args.chunks)
            results[name] = round(ms, 3)
            print(f"{name:24s} {ms:7.3f} ms/step  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            results[name] = f"RUN FAIL: {str(e)[:120]}"
            print(f"{name:24s} RUN FAIL: {str(e)[:120]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
