"""Capture + summarize an XLA device trace of the production train step.

The reference has no profiling tooling (SURVEY.md §5); this CLI is the
framework's per-op performance lens: it builds the fused multi-step train
program for the active config on synthetic data, runs warmup, captures one
scan chunk under ``jax.profiler.trace``, and prints a per-op device-time
table (``betavae_tpu.utils.trace``).  Numbers like docs/DESIGN.md §3.0.2's
were produced with exactly this flow.

Examples:
    python scripts/profile_step.py --config configs/beta_vae_se.yaml
    python scripts/profile_step.py --filter "32,128,128,64" --top 30
    python scripts/profile_step.py --parse-only /tmp/jaxtrace
"""
import argparse
import os
import time

import _bootstrap  # noqa: F401
import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="Per-op XLA trace of the fused train step.")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--logdir", type=str, default="outputs/profile",
                        help="Where the jax profiler dump is written.")
    parser.add_argument("--steps", type=int, default=None,
                        help="Steps per traced dispatch (default: the "
                             "config's training.scan_chunk_steps).")
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--filter", type=str, default=None,
                        help="Regex over HLO long_name (shapes/layouts), "
                             "e.g. '32,128,128,64' for one decoder stage.")
    parser.add_argument("--parse-only", type=str, default=None,
                        help="Skip capture; summarize an existing profiler "
                             "logdir (or trace file) instead.")
    args = parser.parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config

    from betavae_tpu.utils.trace import find_perfetto_traces, parse_trace

    if args.parse_only:
        path = args.parse_only
        if os.path.isdir(path):
            traces = find_perfetto_traces(path)
            if not traces:
                raise FileNotFoundError(
                    f"no perfetto_trace.json.gz under {path}")
            path = traces[0]
        # steps count is unknown for foreign traces; report totals
        summary = parse_trace(path, steps=args.steps or 1,
                              name_filter=args.filter)
        print(f"trace: {path}")
        print(summary.table(args.top))
        return

    import jax
    import jax.numpy as jnp

    from betavae_tpu.config import get, get_config
    from betavae_tpu.models.beta_vae import model_from_config
    from betavae_tpu.models.losses import loss_spec_from_config
    from betavae_tpu.train.loop import init_state, make_train_multi_step
    from betavae_tpu.train.optim import build_optimizer

    cfg = get_config()
    B = int(cfg.training.batch_size)
    img = int(cfg.data.image_size)
    K = args.steps or int(get(cfg.training, "scan_chunk_steps", 48))

    model = model_from_config(cfg)
    spec = loss_spec_from_config(cfg)
    tx = build_optimizer(cfg)
    state = init_state(model, tx, jax.random.PRNGKey(0))
    step = make_train_multi_step(
        model, tx, spec,
        aug_kwargs={"use_flip": True, "degrees": 10.0, "brightness": 0.1},
        use_capacity=True)

    n = max(4 * B, 256)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (n, img, img, 1), np.uint8))
    mask_kb = np.ones((K, B), np.float32)
    sched_k = {k: jnp.full((K,), v, jnp.float32) for k, v in
               dict(beta=1.0, capacity=30.0, capacity_weight=1.0,
                    free_bits=0.0, lr=5e-4).items()}
    idx = np.stack([np.arange(j * B, (j + 1) * B, dtype=np.int32) % (n - 1)
                    for j in range(K)])
    key = jax.random.PRNGKey(1)

    def one_chunk():
        nonlocal key, state
        key, sub = jax.random.split(key)
        state, m = step(state, images, idx, mask_kb,
                        jax.random.split(sub, K), sched_k)
        # sync through the tunnel (block_until_ready is unreliable here)
        return float(np.asarray(m["total"])[-1])

    one_chunk()   # compile
    t0 = time.perf_counter()
    one_chunk()   # warm timing
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"step time (warm, host-observed): {dt:.3f} ms  "
          f"({B / dt * 1e3:.0f} img/s)")

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
    one_chunk()
    jax.profiler.stop_trace()

    traces = find_perfetto_traces(args.logdir)
    if not traces:
        raise FileNotFoundError(
            f"profiler produced no perfetto trace under {args.logdir}")
    summary = parse_trace(traces[0], steps=K, name_filter=args.filter)
    print(f"trace: {traces[0]}")
    print(summary.table(args.top))


if __name__ == "__main__":
    main()
