"""Log repair: give val-phase records the preceding train step (thin CLI).

Logic lives in ``betavae_tpu.eval.logs.rewrite_val_steps``; parity with
reference ``scripts/fix_steps.py``.
Usage: python scripts/fix_steps.py input.log output.log
"""
import sys

import _bootstrap  # noqa: F401

from betavae_tpu.eval.logs import rewrite_val_steps


def fix_steps(input_path: str, output_path: str) -> int:
    return rewrite_val_steps(input_path, output_path)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: python fix_steps.py input.log output.log")
        sys.exit(1)
    n = fix_steps(sys.argv[1], sys.argv[2])
    print(f"Rewrote {n} val-phase step value(s) -> {sys.argv[2]}")
