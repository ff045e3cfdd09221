"""Rewrite a checkpoint with more shards than it currently has.

Thin CLI over :mod:`betavae_tpu.io.checkpoint`.  Capability parity with
reference ``scripts/reshard_checkpoint.py:42-104`` (same flags, same
strictly-increasing shard-count rule); shard discovery and the merge/split
logic live in the package, not here.
"""
import argparse
import os

import _bootstrap  # noqa: F401

from betavae_tpu.config import get_config
from betavae_tpu.io.artifacts import model_checkpoint_path
from betavae_tpu.io.checkpoint import (checkpoint_shard_count, discover_shards,
                                       load_sharded_checkpoint,
                                       normalize_base_path,
                                       save_sharded_checkpoint)


def parse_args():
    ap = argparse.ArgumentParser(
        description="Increase the shard count of a saved checkpoint.")
    ap.add_argument("--config", default=None,
                    help="YAML config to activate before resolving run paths.")
    ap.add_argument("--checkpoint", default="latest",
                    help="'best', 'latest', or a checkpoint base path.")
    ap.add_argument("--num-shards", type=int, required=True,
                    help="Target shard count; must be larger than what exists.")
    ap.add_argument("--output", default=None,
                    help="Base path for the resharded files (default: in place).")
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
    dst_base = normalize_base_path(args.output) if args.output else src_base

    have = checkpoint_shard_count(src_base)
    if args.num_shards <= have:
        raise ValueError(
            f"--num-shards={args.num_shards} would not grow the checkpoint: "
            f"{have} shard(s) already exist at {src_base}")

    existing = discover_shards(src_base)
    if existing:
        print(f"Merging {len(existing)} input shard(s):")
        print("\n".join(f"  - {p}" for p in existing))
    else:
        print(f"Input is a single unsharded file: {src_base}")

    payload = load_sharded_checkpoint(src_base, num_shards=have)
    written = save_sharded_checkpoint(dst_base, payload,
                                      num_shards=args.num_shards)

    print(f"\nWrote {len(written)} shard(s):")
    print("\n".join(f"  - {p}" for p in written))


if __name__ == "__main__":
    main()
