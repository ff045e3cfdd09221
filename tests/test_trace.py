"""utils/trace.py perfetto-trace parsing + profile_step.py --parse-only."""

import gzip
import importlib
import json
import os
import sys

SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS_DIR not in sys.path:
    sys.path.insert(0, SCRIPTS_DIR)


def _write_fake_trace(path):
    """Minimal perfetto dump: device XLA-op thread + a host thread to skip."""
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 2, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        # device ops: two fusions (same family, .N suffixes) + a while
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.12", "dur": 100,
         "ts": 0, "args": {"long_name":
                           "%fusion.12 = bf16[32,128,128,64]{...} ..."}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.13", "dur": 50,
         "ts": 100, "args": {"long_name":
                             "%fusion.13 = f32[32,64]{...} ..."}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "while", "dur": 500,
         "ts": 0, "args": {"long_name": "%while = ..."}},
        # host event that must be ignored
        {"ph": "X", "pid": 2, "tid": 1, "name": "fusion.12", "dur": 999,
         "ts": 0, "args": {}},
    ]
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_parse_trace_aggregates_and_filters(tmp_path):
    from betavae_tpu.utils.trace import parse_trace

    run = tmp_path / "plugins" / "profile" / "run1"
    run.mkdir(parents=True)
    path = str(run / "perfetto_trace.json.gz")
    _write_fake_trace(path)

    s = parse_trace(path, steps=2)
    by_name = {r.name: r for r in s.rows}
    assert by_name["fusion"].total_us == 150       # .12 + .13 merged
    assert by_name["fusion"].count == 2
    assert s.device_total_us == 150                # while excluded, host skipped
    per_step = dict((n, us) for n, us, _ in s.per_step())
    assert per_step["fusion"] == 75.0
    assert "TOTAL" in s.table()

    s2 = parse_trace(path, steps=1, name_filter="32,128,128,64")
    assert s2.device_total_us == 100               # only the matching fusion


def test_find_perfetto_traces_and_parse_only_cli(tmp_path, monkeypatch,
                                                 capsys):
    from betavae_tpu.utils.trace import find_perfetto_traces

    run = tmp_path / "plugins" / "profile" / "run1"
    run.mkdir(parents=True)
    path = str(run / "perfetto_trace.json.gz")
    _write_fake_trace(path)
    assert find_perfetto_traces(str(tmp_path)) == [path]

    mod = importlib.import_module("profile_step")
    monkeypatch.setattr(sys, "argv", [
        "profile_step.py", "--parse-only", str(tmp_path), "--steps", "2"])
    mod.main()
    out = capsys.readouterr().out
    assert "fusion" in out and "TOTAL" in out
