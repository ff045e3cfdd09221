"""Train the β-VAE (CLI entry point).

Capability parity with reference ``src/training/train.py:481-485``:
``--config`` sets ``CONFIG_PATH``; ``--resume best|latest|none``.
"""
import argparse
import os

import _bootstrap  # noqa: F401


def _parse_args():
    parser = argparse.ArgumentParser(description="Train Beta-VAE model")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to YAML config file (optional)")
    parser.add_argument("--resume", type=str,
                        choices=["best", "latest", "none"], default="none",
                        help="Resume from a checkpoint in models_dir")
    parser.add_argument("--data-parallel", type=int, default=0, metavar="N",
                        help="Train data-parallel over the first N local "
                             "devices (0 = single device; -1 = all devices)")
    return parser.parse_args()


if __name__ == "__main__":
    args = _parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    from betavae_tpu.train.loop import train

    mesh = None
    if args.data_parallel:
        import jax

        from betavae_tpu.parallel.mesh import data_parallel_mesh

        n = args.data_parallel
        mesh = data_parallel_mesh(None if n < 0 else n)
        print(f"[MESH] data-parallel over {len(mesh.devices.flat)} device(s)")
    try:
        train(resume=args.resume, mesh=mesh)
    except KeyboardInterrupt:
        # SIGTERM/ctrl-C after the loop's graceful drain (checkpoints and
        # panels already landed; the [SHUTDOWN] hint was printed) — exit
        # with the conventional interrupted status, no traceback noise
        raise SystemExit(130)
