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


def _encode_latency_p50_ms(model, state, image_size: int, reps: int = 30):
    """Host-observed p50 latency of a batch-1 encode dispatch.

    BASELINE.json's third north-star metric.  Each rep is synced by pulling a
    scalar through the tunnel (block_until_ready lies on relayed runtimes),
    so the number includes the relay round-trip — the latency a caller of
    ``infer/encode.py`` actually experiences per dispatch.
    """
    import jax
    import numpy as np

    x = jax.device_put(np.zeros((1, image_size, image_size, 1), np.float32))
    variables = state.model_variables()
    encode = jax.jit(lambda v, x: model.module.apply(
        v, x, method=model.module.encode))
    mu, _ = encode(variables, x)
    float(np.asarray(mu[0, 0]))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mu, _ = encode(variables, x)
        float(np.asarray(mu[0, 0]))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _encode_latency_device_ms(model, state, image_size: int,
                              iters: int = 100):
    """Amortized ON-DEVICE encode latency at batch 1.

    ``encode_p50_ms_bs1`` (above) includes the relay round-trip (~30 ms
    here), which masks on-device regressions under RTT noise (VERDICT r2
    weak #5).  This key chains ``iters`` encodes in ONE program via
    ``lax.fori_loop`` with a data dependency (so XLA cannot hoist or batch
    them), syncs once, and divides — the per-dispatch device time a local
    caller would see.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(np.zeros((1, image_size, image_size, 1), np.float32))
    variables = state.model_variables()

    @jax.jit
    def chain(v, x):
        def body(i, xc):
            mu, _ = model.module.apply(v, xc, method=model.module.encode)
            # tiny non-foldable feedback keeps the loop serial on device
            return xc + 1e-12 * mu[0, 0]

        return jax.lax.fori_loop(0, iters, body, x).sum()

    float(np.asarray(chain(variables, x)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(chain(variables, x)))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / iters


def _e2e_images_per_sec(epochs: int = 6, per_class_train: int = 1456,
                        per_class_test: int = 328, image_size: int = 128):
    """END-TO-END training throughput at real-dataset scale.

    The reference baseline (≈61 img/s, BASELINE.md) is wall-clock over
    whole epochs INCLUDING per-epoch validation, checkpoint saves, recon
    panels and probe fits (ref ``train.py:294-468``); the steady-state key
    above excludes them.  This runs the production ``beta_vae_se.yaml``
    pipeline (val scan + panels + probes + async coalescing checkpoints)
    on a synthetic dataset matched to the reference's scale (4×1456 =
    5,824 train images → 182 steps/epoch at batch 32) and reports
    images/sec over epochs 2..N (epoch 1 carries the cold compiles, which
    the reference's 100-epoch log amortizes away).
    """
    import logging

    import yaml

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.logging_utils import reset_logger
    from betavae_tpu.train.loop import train

    work = (f"/tmp/betavae_e2e_{image_size}px_{per_class_train}"
            f"_{per_class_test}")
    marker = os.path.join(work, ".complete")
    if not os.path.exists(marker):
        generate_demo_data(os.path.join(work, "processed"),
                           train_per_class=per_class_train,
                           test_per_class=per_class_test, size=image_size)
        with open(marker, "w") as f:
            f.write("ok")

    base = yaml.safe_load(
        open(os.path.join(_REPO_ROOT, "configs", "beta_vae_se.yaml")))
    base["paths"].update(
        raw_dir=os.path.join(work, "raw"),
        processed_dir=os.path.join(work, "processed"),
        outputs_dir=os.path.join(work, "outputs"),
        models_dir=os.path.join(work, "outputs/models"),
        figures_dir=os.path.join(work, "outputs/figures"),
        tables_dir=os.path.join(work, "outputs/tables"),
        run_id="bench_e2e",
    )
    base["data"]["image_size"] = int(image_size)
    base["training"]["epochs"] = int(epochs)
    base["logging"]["log_to_file"] = False
    cfg_path = os.path.join(work, "e2e.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base, f)

    walls = []
    tails = []

    class Capture(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if msg.startswith("METRICS "):
                d = json.loads(msg[len("METRICS "):])
                if d.get("phase") == "epoch_end":
                    walls.append(float(d["epoch_wall_seconds"]))
                    tails.append(d)

    reset_config_cache()
    reset_logger()
    cfg = get_config(cfg_path)
    # pre-registering the capture handler keeps init_logger from adding its
    # stdout handler — the e2e run stays quiet on the bench console
    logging.getLogger("beta_vae_se").addHandler(Capture())
    try:
        train()
    finally:
        reset_logger()
        reset_config_cache()
    n_train = 4 * per_class_train
    if len(walls) < 2:
        raise RuntimeError(f"expected >=2 epochs, got walls={walls}")
    # per-component tail breakdown over the steady epochs, for diagnosis
    steady_tails = tails[1:]
    breakdown = {
        k: round(sum(t[k] for t in steady_tails) / len(steady_tails), 3)
        for k in ("val_seconds", "probe_seconds", "ckpt_seconds",
                  "panel_seconds", "tail_seconds", "epoch_wall_seconds")
    }
    print(json.dumps({"e2e_epoch_breakdown": breakdown}), file=sys.stderr)
    steady = walls[1:]
    # Headline (round 5) = POOLED rate over CONTIGUOUS last-train-chunk
    # drain stamps: total images / (last stamp − first steady stamp) —
    # ground-truth wall clock, exactly how the reference's 61 img/s baseline
    # is computed from its log timestamps (BASELINE.md).  Estimator history:
    # r3 removed the per-epoch val-pull stall (±10% swings); r4 pooled
    # per-epoch `epoch_wall_seconds`, but those phase timers miss host time
    # BETWEEN phases (epoch_end logging, early-stop, schedule bookkeeping)
    # — measured r5: the walls-based rate claimed 4,708 img/s on a run whose
    # steady-state ceiling was 4,342 (physically impossible for a number
    # that includes tails) while the stamp-pooled truth was 3,970.  Drain
    # stamps are absolute and monotonic, so pooling telescopes every gap in.
    # The first span is dropped when there are spans to spare: epoch 1's
    # tail holds the val/panel cold compiles.
    n_win = 3 if len(steady) >= 3 else 1
    rate_walls = n_train * len(steady) / sum(steady)
    stamps = [t.get("t_drain_mono") for t in tails]
    if all(s is not None for s in stamps) and len(stamps) >= 2:
        ds = stamps[1:] if len(stamps) >= 3 else stamps
        span_wall = [ds[i + 1] - ds[i] for i in range(len(ds) - 1)]
        # Per-span rates are HOST-stamp attributed and can jitter by
        # construction: each stamp carries the single-core host's current
        # lag behind the device (the host drifts for an epoch or two, then
        # catches up in a burst), so a single span can come out shorter than
        # the device could physically compute an epoch.  Only the pooled
        # rate (lag deltas telescoped away) is a stability signal — keyed
        # `_hostjitter` so nobody reads the per-span values as one
        # (VERDICT r4 weak #5).
        breakdown["span_rates_hostjitter"] = _windowed_rates(
            span_wall, n_train, n_win)
        rate = n_train * len(span_wall) / (ds[-1] - ds[0])
        # the phase-timer rate rides along as a diagnostic: rate_walls >>
        # headline means host time is leaking between phase timers
        breakdown["walls_rate_images_per_sec"] = round(rate_walls, 1)
    else:  # pre-stamp logs: fall back to the (gap-blind) phase-timer rate
        breakdown["span_rates_hostjitter"] = _windowed_rates(
            steady, n_train, n_win)
        rate = rate_walls
    return rate, breakdown


def _windowed_rates(span_wall, n_train: int, n_win: int):
    """Per-window rates over ALL spans: the first windows get
    ``n_spans // n_win`` spans each and the LAST absorbs the remainder, so
    a tail anomaly in the final epoch cannot vanish from the diagnostic
    while still moving the pooled headline (r5 review finding — the old
    equal-size windows silently dropped trailing spans)."""
    n_spans = len(span_wall)
    n_eff = max(1, min(n_win, n_spans))
    bounds = [w * (n_spans // n_eff) for w in range(n_eff)] + [n_spans]
    return sorted(
        round(n_train * (bounds[w + 1] - bounds[w]) /
              sum(span_wall[bounds[w]:bounds[w + 1]]), 1)
        for w in range(n_eff))


def _pallas_canary():
    """Mosaic-regression canary for the two non-default Pallas kernels.

    ``ops/pallas_gn.py`` and ``ops/pallas_head.py`` are kept as measured
    negative results (docs/DESIGN.md §3.0.1–§3.0.2) — correct, hardware-
    validated building blocks that XLA beats end-to-end.  Their CPU tests
    run the TPU *interpreter*; this canary is the only place they compile
    through the real Mosaic toolchain each round, so a Mosaic/compile-
    service regression surfaces here rather than silently rotting the
    kernels.  Small shapes inside the hardware-validated envelope; outputs
    are checked against the XLA oracles, not just compiled.
    """
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.ops.pallas_elbo import tpu_backend_available
    from betavae_tpu.ops.pallas_gn import (fused_gn_relu_pool,
                                           reference_gn_relu_pool)
    from betavae_tpu.ops.pallas_head import (fused_se_conv_head,
                                             head_conv_reference)

    if not tpu_backend_available():
        return "skipped (cpu)"

    rng = np.random.default_rng(20260817)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 64)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=64).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)
    y, pooled = fused_gn_relu_pool(x, gamma, beta)
    y_ref, pooled_ref = reference_gn_relu_pool(x, gamma, beta)
    gn_err = max(float(jnp.abs(y - y_ref).max()),
                 float(jnp.abs(pooled - pooled_ref).max()))

    s = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 64)).astype(np.float32) * 0.1)
    out = fused_se_conv_head(x, s, k)
    out_ref = head_conv_reference(x, s, k)
    head_err = float(jnp.abs(out - out_ref).max())

    # the head oracle's conv runs at TPU default precision (bf16 MXU
    # passes), so agreement is bf16-rounding-level — the kernel itself
    # accumulates fp32 (measured gn≈1e-6, head≈1e-2 on v5e)
    if gn_err > 1e-4 or head_err > 5e-2:
        raise ValueError(f"pallas canary drift: gn_err={gn_err:.2e} "
                         f"head_err={head_err:.2e}")
    return "ok"


def _prng_self_check():
    """Moments test on the pallas reparam kernel's hardware-PRNG noise.

    Only meaningful on a real TPU backend (the interpreter's PRNG returns
    zeros).  Returns "ok"/"skipped (cpu)"; raises on drift so regressions
    surface loudly in the BENCH tail (VERDICT r1 #7).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from betavae_tpu.ops.pallas_elbo import (fused_reparam_kl,
                                             tpu_backend_available)

    if not tpu_backend_available():
        return "skipped (cpu)"

    shape = (512, 512)  # 262k draws; mu=0, logvar=0 => z == eps
    zeros = jnp.zeros(shape, jnp.float32)

    @jax.jit
    def moments(seed):
        z, _ = fused_reparam_kl(seed, zeros, zeros)
        return jnp.stack([
            jnp.mean(z), jnp.std(z),
            jnp.mean(z**3),                       # skew proxy (std==1)
            jnp.mean((jnp.abs(z) > 2.0).astype(jnp.float32)),
            jnp.mean((jnp.abs(z) > 3.0).astype(jnp.float32)),
        ])

    vals = np.asarray(moments(jnp.int32(20260816)))
    mean, std, m3, tail2, tail3 = (float(v) for v in vals)
    n = shape[0] * shape[1]
    checks = [
        ("mean", abs(mean), 6.0 / n**0.5),          # ~6 sigma bounds
        ("std", abs(std - 1.0), 0.01),
        ("skew", abs(m3), 0.02),
        ("P(|z|>2)", abs(tail2 - 0.0455), 0.004),
        ("P(|z|>3)", abs(tail3 - 0.0027), 0.001),
    ]
    for name, err, tol in checks:
        if err >= tol:  # not assert: must survive python -O
            raise ValueError(
                f"hardware PRNG drift: {name} off by {err:.5f} "
                f"(tol {tol:.5f}); raw moments mean={mean:.5f} "
                f"std={std:.5f} m3={m3:.5f} tail2={tail2:.5f} "
                f"tail3={tail3:.5f}")
    return "ok"


def _last_chip_bench():
    """Most recent committed real-chip BENCH line (context for fallbacks).

    When the relay is down and the run degrades to the CPU verification,
    the JSON artifact still carries the last number that WAS measured on
    the chip, clearly labeled as historical — it is not this run's result.
    """
    import glob

    paths = sorted(glob.glob(os.path.join(_REPO_ROOT, "BENCH_r*.json")))
    for p in reversed(paths):
        try:
            with open(p) as f:
                d = json.load(f)
            d = d.get("parsed", d)  # driver wraps the line under "parsed"
            if isinstance(d, dict) and "value" in d and \
                    "cpu" not in str(d.get("backend", "")):
                return {"source": os.path.basename(p), **d}
        except Exception:
            continue
    return None


def _headline_fields(img_per_sec: float, e2e, vs_e2e,
                     image_size: int, batch_size: int) -> dict:
    """Choose the JSON line's headline metric.

    The headline is the like-for-like quantity: end-to-end wall-clock img/s
    over whole epochs incl. val/checkpoints/panels/probes — exactly what the
    reference's 61 img/s baseline counts (its log timestamps span the whole
    run, SURVEY §6). Steady-state rides along as a secondary key so the
    kernel-level number stays tracked. Falls back to a steady-state headline
    only when e2e was skipped or failed (``e2e`` non-numeric — e.g. the CPU
    derate path, which cannot measure a meaningful e2e)."""
    if isinstance(e2e, (int, float)):
        headline = {
            "metric": f"e2e_images_per_sec_per_chip_{image_size}px_"
                      f"bs{batch_size}",
            "value": e2e,
            "unit": "images/sec",
            "vs_baseline": vs_e2e,
        }
    else:
        headline = {
            "metric": f"train_images_per_sec_per_chip_{image_size}px_"
                      f"bs{batch_size}",
            "value": round(img_per_sec, 2),
            "unit": "images/sec",
            "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        }
    return headline


def _parse_device_count(stdout: str) -> int:
    """Last line of the probe subprocess's stdout that parses as an int.

    Tolerates banners/warnings around the count; anything unparseable means
    the backend is unusable (returns 0)."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            return int(line.strip())
        except ValueError:
            continue
    return 0


def _derate_args_for_cpu(args) -> None:
    """Cap the run at a small compile+step verification for the CPU host.

    Production shapes are unrunnable there (measured: ONE 128px/bs8 fwd+bwd
    step = ~120 s on the 1-core CPU, fp32 or bf16 alike) — derating keeps
    the JSON artifact landing in minutes.  Explicitly-passed smaller flags
    are respected (these are caps, not overrides); the metric name embeds
    the derated shape."""
    args.image_size = min(args.image_size, 64)
    # keep the cap a multiple of --data-parallel so the divisibility
    # check in main() can't kill the fallback path (e.g. dp=6 → cap 6,
    # not 8)
    cap = max(8, args.data_parallel)
    if args.data_parallel > 1:
        cap -= cap % args.data_parallel
    args.batch_size = min(args.batch_size, cap)
    args.scan_chunk = min(args.scan_chunk, 2)
    args.steps = min(args.steps, 2)
    args.warmup = min(args.warmup, 2)
    args.skip_e2e = True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=384)
    parser.add_argument("--warmup", type=int, default=192)
    parser.add_argument("--verbose", action="store_true",
                        help="print a FLOP/roofline breakdown to stderr")
    parser.add_argument("--scan-chunk", type=int, default=192,
                        help="train steps per lax.scan dispatch "
                             "(training.scan_chunk_steps equivalent)")
    parser.add_argument("--skip-e2e", action="store_true",
                        help="skip the end-to-end epochs measurement")
    # 9 steady epochs (first epoch carries cold compiles and is dropped):
    # at ~1.6 s/epoch the wider window is nearly free and roughly halves
    # the run-to-run jitter of the headline vs the previous 6-epoch window
    parser.add_argument("--e2e-epochs", type=int, default=10)
    parser.add_argument(
        "--data-parallel", type=int, default=0, metavar="N",
        help="run the steady-state step over an N-device data mesh "
             "(global batch unchanged, sharded over devices).  With fewer "
             "real devices than N the CPU backend is forced with N virtual "
             "devices — a sharded-compile/step verification; on a real "
             "N-chip slice the same flag IS the multi-chip throughput "
             "number.  Skips the auxiliary metrics.")
    args = parser.parse_args()

    # Probe the default (relayed TPU) backend in a SUBPROCESS with a bounded
    # timeout before committing this process's backend: the relay has outage
    # windows where jax.devices() hangs ~25 min then raises UNAVAILABLE
    # (observed 2026-08-17/18).  Without the probe, an outage turns the
    # round's BENCH artifact into a hang + traceback; with it, the run falls
    # back to CPU and says so in the JSON line's "backend" field, keeping
    # the artifact parseable and honest.  The probe runs out-of-process
    # because touching jax.devices() here would commit the backend before
    # _force_cpu_devices could switch it.
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=300)
        real_devices = (_parse_device_count(probe.stdout)
                        if probe.returncode == 0 else 0)
    except subprocess.TimeoutExpired:
        real_devices = 0

    backend_note = None
    mesh = None
    if args.data_parallel > 1:
        # Use the real backend when it actually has N devices; otherwise
        # force the CPU backend with N virtual devices (sharded
        # compile/step verification) — derated the same way as the outage
        # fallback, since it runs on the same 1-core host.
        if real_devices < args.data_parallel:
            from __graft_entry__ import _force_cpu_devices

            _force_cpu_devices(args.data_parallel)
            _derate_args_for_cpu(args)
    elif real_devices == 0:
        from __graft_entry__ import _force_cpu_devices

        _force_cpu_devices(1)
        backend_note = "cpu-fallback (default backend unavailable)"
        print("[BENCH] default backend unavailable/timed out; falling back "
              "to CPU — throughput below is NOT a chip number", file=sys.stderr)
        _derate_args_for_cpu(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.data_parallel:
        from betavae_tpu.parallel.mesh import data_parallel_mesh

        if len(jax.devices()) < args.data_parallel:
            raise RuntimeError(
                f"need {args.data_parallel} devices, have "
                f"{len(jax.devices())}")
        if args.batch_size % args.data_parallel:
            raise SystemExit(
                "--batch-size must be divisible by --data-parallel")
        mesh = data_parallel_mesh(
            devices=jax.devices()[: args.data_parallel])

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
    images_np = rng.integers(0, 255,
                             (n, args.image_size, args.image_size, 1),
                             np.uint8)
    if mesh is not None:
        from betavae_tpu.parallel.mesh import (chunk_batch_sharding,
                                               replicate_state,
                                               replicated_sharding)

        state = replicate_state(state, mesh)
        images = jax.device_put(images_np, replicated_sharding(mesh))
        _chunk_sh = chunk_batch_sharding(mesh)

        def put_idx(a):
            return jax.device_put(a, _chunk_sh)
    else:
        images = jax.device_put(images_np)

        def put_idx(a):
            return a
    # K steps per dispatch via lax.scan — the same multi-step program the
    # training loop uses (training.scan_chunk_steps default); amortizes host
    # dispatch overhead through the relay
    K = int(args.scan_chunk)
    step = make_train_multi_step(
        model, tx, spec,
        aug_kwargs={"use_flip": True, "degrees": 10.0, "brightness": 0.1},
        use_capacity=True,
    )
    sched_k = {k: jnp.full((K,), v, jnp.float32) for k, v in
               dict(beta=1.0, capacity=30.0, capacity_weight=1.0,
                    free_bits=0.0, lr=5e-4).items()}
    mask_kb = put_idx(np.ones((K, args.batch_size), np.float32))
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
        state, m = step(state, images, put_idx(chunk_idx(c)), mask_kb, keys_k, sched_k)
    # NOTE: sync via device_get, not block_until_ready — on tunneled TPU
    # runtimes the latter can return before execution finishes, inflating
    # throughput by orders of magnitude (verified empirically).
    float(np.asarray(m["total"])[-1])

    # best-of-3 timed passes: the relayed runtime adds a few percent of
    # run-to-run jitter; the fastest pass is the chip's sustained rate
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for c in range(n_chunks):
            key, sub = jax.random.split(key)
            keys_k = jax.random.split(sub, K)
            state, m = step(state, images, put_idx(chunk_idx(c)), mask_kb, keys_k,
                            sched_k)
        float(np.asarray(m["total"])[-1])
        dt = min(dt, time.perf_counter() - t0)

    img_per_sec = args.batch_size * K * n_chunks / dt
    # MFU / speed-of-light fractions in the DEFAULT artifact (VERDICT r4 #2):
    # pure arithmetic on the already-measured steady step, computed always so
    # the driver's BENCH_r*.json tracks utilization round-over-round.  Peak
    # rates model the v5e (197 bf16 TFLOPS / 819 GB/s); on the CPU-fallback
    # path the numbers are meaningless and the "backend" field says so.
    from betavae_tpu.utils.flops import (speed_of_light_ms, train_step_flops,
                                         utilization)

    fl = train_step_flops(args.image_size, 1, 64, 64, 4,
                          batch_size=args.batch_size)
    step_s = dt / (K * n_chunks)
    util = utilization(step_s, fl["train_flops_per_step"])
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(state.params))
    sol = speed_of_light_ms(args.image_size, 1, 64, 64, 4,
                            batch_size=args.batch_size, param_count=n_params)
    sol_fraction = round(sol["sol_step_ms"] / (step_s * 1e3), 4)
    if args.verbose:
        from betavae_tpu.utils.flops import data_parallel_scaling

        dp8 = data_parallel_scaling(step_s * 1e3, n_params, 8)
        print(json.dumps({"step_ms": round(step_s * 1e3, 3),
                          **{k: v for k, v in fl.items() if k != "layers"},
                          **util,
                          "sol_step_ms": sol["sol_step_ms"],
                          "sol_fraction": sol_fraction,
                          "dp8_pred_efficiency":
                              dp8["efficiency_overlapped"],
                          "dp8_pred_comm_ms": dp8["comm_ms"]}),
              file=sys.stderr)
    if mesh is not None:
        # mesh mode: the headline is the sharded-program rate itself; the
        # single-chip auxiliary metrics don't apply
        print(json.dumps({
            "metric": (f"train_images_per_sec_dp{args.data_parallel}_"
                       f"{args.image_size}px_bs{args.batch_size}"),
            "value": round(img_per_sec, 2),
            "unit": "images/sec",
            "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
            "backend": jax.default_backend(),
            "mesh_devices": args.data_parallel,
        }))
        return

    try:
        encode_p50 = round(_encode_latency_p50_ms(
            model, state, args.image_size,
            reps=5 if backend_note else 30), 2)
    except Exception as e:  # auxiliary metric must not eat the headline one
        encode_p50 = f"FAIL: {e}"
    try:
        encode_dev = round(_encode_latency_device_ms(
            model, state, args.image_size,
            iters=10 if backend_note else 100), 3)
    except Exception as e:
        encode_dev = f"FAIL: {e}"
    # end-to-end epochs (val + panels + probes + checkpoints included) at
    # real-dataset scale — the like-for-like comparison against the
    # reference's wall-clock 61 img/s (VERDICT r2 #1)
    if args.skip_e2e:
        e2e, vs_e2e, e2e_breakdown = "skipped", "skipped", "skipped"
    else:
        try:
            e2e, e2e_breakdown = _e2e_images_per_sec(
                epochs=args.e2e_epochs, image_size=args.image_size)
            e2e = round(e2e, 2)
            vs_e2e = round(e2e / BASELINE_IMG_PER_SEC, 3)
        except Exception as e:
            e2e = f"FAIL: {e}"
            vs_e2e = "FAIL"
            e2e_breakdown = "FAIL"
    # PRNG drift must be loud (VERDICT r1 #7) but must not eat the headline
    # metric: print the JSON line FIRST, then re-raise so the run still fails.
    prng_error = None
    try:
        prng_status = _prng_self_check()
    except Exception as e:  # drift or tunnel flake
        prng_error = e
        prng_status = f"FAIL: {e}"
    # Mosaic-regression canary for the kept-as-negative-result kernels
    # (DESIGN §3.0.2 decision record): compile+run through the real
    # toolchain each round; parity-checked against the XLA oracles.
    # Same loudness contract as the PRNG check: the JSON line prints
    # first, then the failure re-raises so the run's exit status fails.
    pallas_error = None
    try:
        pallas_status = _pallas_canary()
    except Exception as e:
        pallas_error = e
        pallas_status = f"FAIL: {e}"

    print(json.dumps({
        **_headline_fields(img_per_sec, e2e, vs_e2e,
                           args.image_size, args.batch_size),
        "steady_state_images_per_sec": round(img_per_sec, 2),
        "vs_baseline_steady_state": round(
            img_per_sec / BASELINE_IMG_PER_SEC, 3),
        "step_ms": round(step_s * 1e3, 3),
        "mxu_utilization": util["mxu_utilization"],
        "sol_step_ms": sol["sol_step_ms"],
        "sol_fraction": sol_fraction,
        "e2e_images_per_sec": e2e,
        "vs_baseline_e2e": vs_e2e,
        "e2e_epoch_breakdown": e2e_breakdown,
        "encode_p50_ms_bs1": encode_p50,
        "encode_device_ms_bs1": encode_dev,
        "prng_check": prng_status,
        "pallas_canary": pallas_status,
        **({"backend": backend_note,
            "last_chip_bench": _last_chip_bench()} if backend_note else {}),
    }))
    if prng_error is not None:
        raise prng_error
    if pallas_error is not None:
        raise pallas_error


if __name__ == "__main__":
    main()
