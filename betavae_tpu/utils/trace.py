"""XLA profiler-trace parsing: per-op device-time tables from perfetto dumps.

The reference has no profiling at all (SURVEY.md §5 "tracing: none"); this
module is the analysis half of this framework's profiling story (the capture
half is ``jax.profiler.start_trace(..., create_perfetto_trace=True)``, wired
into ``scripts/profile_step.py``).  It was used to produce every per-op
number in docs/DESIGN.md §3.0.2-§3.0.3.

Works on the ``perfetto_trace.json.gz`` files jax writes under
``<logdir>/plugins/profile/<run>/``; only the stdlib is needed.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from dataclasses import dataclass


@dataclass
class OpRow:
    name: str                 # fusion name, trailing .N stripped
    total_us: float           # device time over the traced region
    count: int                # number of executions
    example: str = ""         # one long_name (HLO text with shapes/layouts)


@dataclass
class TraceSummary:
    rows: list                # OpRow, sorted by total_us desc
    device_total_us: float    # Σ over XLA ops (excl. the outer while)
    steps: int = 1

    def per_step(self):
        """[(name, us/step, count/step)] using the declared step count."""
        return [(r.name, r.total_us / self.steps, r.count / self.steps)
                for r in self.rows]

    def table(self, top: int = 20) -> str:
        lines = [f"{'us/step':>10} {'n/step':>7}  op"]
        for name, us, n in self.per_step()[:top]:
            lines.append(f"{us:10.1f} {n:7.1f}  {name}")
        lines.append(f"{self.device_total_us / self.steps:10.1f} {'':7s}  "
                     f"TOTAL (device, excl. outer while)")
        return "\n".join(lines)


def find_perfetto_traces(logdir: str) -> list:
    """Newest-first perfetto trace files under a jax profiler logdir."""
    pats = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "perfetto_trace.json.gz")),
        key=os.path.getmtime, reverse=True)
    return pats


def parse_trace(path: str, steps: int = 1,
                name_filter: str | None = None) -> TraceSummary:
    """Aggregate device-side XLA op durations from a perfetto trace.

    ``steps``: how many train steps the traced region contained (a
    ``lax.scan`` multi-step program counts as its chunk length).
    ``name_filter``: regex; keep only ops whose ``long_name`` (HLO text,
    includes operand shapes/layouts) matches — e.g. ``"32,128,128,64"`` to
    isolate one decoder stage.
    """
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

    flt = re.compile(name_filter) if name_filter else None
    agg = collections.Counter()
    cnt = collections.Counter()
    example = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if not pids.get(e["pid"], "").startswith("/device:"):
            continue
        if tids.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        ln = (e.get("args") or {}).get("long_name", "")
        if flt and not flt.search(ln):
            continue
        name = re.sub(r"\.\d+$", "", e["name"])
        dur = e.get("dur", 0)
        if name != "while":
            total += dur
        agg[name] += dur
        cnt[name] += 1
        if name not in example and ln:
            example[name] = ln
    rows = [OpRow(n, agg[n], cnt[n], example.get(n, ""))
            for n, _ in agg.most_common()]
    return TraceSummary(rows=rows, device_total_us=total, steps=steps)
