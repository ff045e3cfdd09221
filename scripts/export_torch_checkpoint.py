"""Export a checkpoint to the reference's torch-pickle shard format.

Thin CLI over :mod:`betavae_tpu.io.torch_compat` (write side).  The inverse
of the read-side interop: a model trained HERE becomes a
``<base>_shard{i}.pt`` set the reference's ``load_sharded_checkpoint``
(``src/utils/brain_tumor_utils/io.py:42-70``) and therefore its whole
eval/inference toolchain consume unchanged.  The optax optimizer state has
no torch equivalent and is omitted — the reference's ``--resume`` is the
one surface an export cannot feed (documented in the module docstring and
``docs/MIGRATION.md``).
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.io.artifacts import model_checkpoint_path
from betavae_tpu.io.checkpoint import (load_sharded_checkpoint,
                                       normalize_base_path)
from betavae_tpu.io.torch_compat import save_torch_reference_checkpoint


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
    return ap.parse_args()


def main():
    args = parse_args()
    if args.config:
        os.environ["CONFIG_PATH"] = args.config
    get_config()  # fail early on a bad config; model_checkpoint_path uses it

    if args.checkpoint in ("best", "latest"):
        src_base = model_checkpoint_path(tag=args.checkpoint)
    else:
        src_base = normalize_base_path(args.checkpoint)
    payload = load_sharded_checkpoint(src_base)

    out_base = normalize_base_path(args.output)
    parent = os.path.dirname(out_base)
    if parent:
        os.makedirs(parent, exist_ok=True)
    paths = save_torch_reference_checkpoint(out_base, payload,
                                            num_shards=args.num_shards)
    print(f"Exported {src_base} -> {len(paths)} torch shard(s):")
    print("\n".join(f"  - {p}" for p in paths))


if __name__ == "__main__":
    main()
