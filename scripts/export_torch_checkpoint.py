"""Export a checkpoint to the reference's torch-pickle shard format.

Thin CLI over :mod:`betavae_tpu.io.torch_compat` (write side).  The inverse
of the read-side interop: a model trained HERE becomes a
``<base>_shard{i}.pt`` set the reference's ``load_sharded_checkpoint``
(``src/utils/brain_tumor_utils/io.py:42-70``) and therefore its whole
eval/inference toolchain consume unchanged.  With ``--include-optimizer``
(round 5, VERDICT r4 #4) the optax Adam state is converted to a torch
``Adam.state_dict()`` payload too, so the reference's ``--resume``
(``src/training/train.py:266-280``) continues OUR optimizer trajectory
instead of restarting it; the exported ``param_groups`` carry the lr the
reference itself would have saved at that epoch (it steps its cosine
scheduler BEFORE saving, ``train.py:375-376,452``).
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get, get_config
from betavae_tpu.io.artifacts import model_checkpoint_path
from betavae_tpu.io.checkpoint import (load_sharded_checkpoint,
                                       normalize_base_path)
from betavae_tpu.io.torch_compat import (export_adam_optim_state,
                                         save_torch_reference_checkpoint)


def parse_args():
    ap = argparse.ArgumentParser(
        description="Export a checkpoint as reference-style torch shards.")
    ap.add_argument("--config", default=None,
                    help="YAML config to activate before resolving run paths.")
    ap.add_argument("--checkpoint", default="best",
                    help="'best', 'latest', or a checkpoint base path.")
    ap.add_argument("--output", required=True,
                    help="Base path for the torch shards (e.g. run_best.pt "
                         "-> run_best_shard{0,1}.pt next to it).")
    ap.add_argument("--num-shards", type=int, default=2,
                    help="Shard count for the exported files (default 2, "
                         "the reference's own).")
    ap.add_argument("--include-optimizer", action="store_true",
                    help="Also export the Adam optimizer state so the "
                         "reference's --resume continues this run's "
                         "optimizer trajectory.")
    return ap.parse_args()


def _lr_at_save(cfg, epoch: int, total_steps: int) -> float:
    """The lr the reference's optimizer would hold when saving ``epoch``.

    The reference steps its cosine scheduler at the END of each epoch's
    train phase, BEFORE ``save_latest`` (``train.py:375-376,452``) — so a
    checkpoint saved at epoch e carries cosine position e, not e-1; StepLR
    steps per batch (``train.py:331-332``).
    """
    from betavae_tpu.train.schedules import lr_at, resolve_total_epochs

    sch = str(cfg.optimization.scheduler).lower()
    total_epochs = resolve_total_epochs(cfg)
    return lr_at(epoch + (1 if sch == "cosine" else 0), total_steps,
                 base_lr=float(cfg.optimization.lr), scheduler=sch,
                 total_epochs=total_epochs)


def main():
    args = parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    cfg = get_config()  # fail early on a bad config; paths/hparams use it

    if args.checkpoint in ("best", "latest"):
        src_base = model_checkpoint_path(tag=args.checkpoint)
    else:
        src_base = normalize_base_path(args.checkpoint)
    payload = load_sharded_checkpoint(src_base)

    optim_torch = None
    if args.include_optimizer:
        optim_flat = payload.get("optim_state")
        if optim_flat:
            epoch = int(payload.get("epoch", 0))
            total_steps = int(payload.get("total_steps", 0))
            optim_torch = export_adam_optim_state(
                optim_flat, payload["model_state"],
                lr=_lr_at_save(cfg, epoch, total_steps),
                weight_decay=float(get(cfg.optimization, "weight_decay",
                                       0.0) or 0.0))
        else:
            print("WARNING: checkpoint carries no optim_state; exporting "
                  "without optimizer")

    out_base = normalize_base_path(args.output)
    parent = os.path.dirname(out_base)
    if parent:
        os.makedirs(parent, exist_ok=True)
    paths = save_torch_reference_checkpoint(out_base, payload,
                                            num_shards=args.num_shards,
                                            optim_state=optim_torch)
    opt_note = " (+ Adam optimizer state)" if optim_torch is not None else ""
    print(f"Exported {src_base} -> {len(paths)} torch shard(s){opt_note}:")
    print("\n".join(f"  - {p}" for p in paths))


if __name__ == "__main__":
    main()
