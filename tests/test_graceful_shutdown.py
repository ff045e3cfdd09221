"""Graceful SIGTERM shutdown: preemption-safe training (SURVEY.md §5).

A SIGTERM mid-run must unwind through the loop's finally-block — draining
the async checkpoint writer and the background panel thread — and leave a
CONSISTENT latest checkpoint on disk (both shards from the same epoch,
loadable), with the resume hint printed.  Run in a subprocess because the
handler installs on the main thread of the training process.
"""

import json
import os
import signal
import subprocess
import sys
import time
import zipfile

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["CONFIG_PATH"] = {cfg!r}
import jax
jax.config.update("jax_platforms", "cpu")
from betavae_tpu.train.loop import train
train()
"""


def test_sigterm_drains_and_leaves_consistent_checkpoint(tmp_path,
                                                         demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.io.checkpoint import load_sharded_checkpoint

    cfg_path = demo_config_factory(
        **{"debug.epochs": 500,            # far more than we let it run
           "debug.max_train_batches": 2,
           "debug.max_val_batches": 1,
           "training.async_checkpoint": True,
           "logging.log_to_file": True})
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=4,
                       test_per_class=2, size=cfg.data.image_size)
    log_path = os.path.join(cfg.paths.outputs_dir, "logs",
                            f"{cfg.paths.run_id}.log")

    runner = tmp_path / "runner.py"
    runner.write_text(_RUNNER.format(repo=REPO_ROOT, cfg=cfg_path))
    proc = subprocess.Popen([sys.executable, str(runner)],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    try:
        # wait until a few epochs have completed (compile finished, at least
        # one checkpoint queued) before delivering the signal
        deadline = time.time() + 420
        while time.time() < deadline:
            if os.path.exists(log_path):
                vals = sum(1 for line in open(log_path)
                           if '"phase": "val"' in line)
                if vals >= 3:
                    break
            if proc.poll() is not None:
                pytest.fail(f"training exited early:\n{proc.stdout.read()}")
            time.sleep(0.5)
        else:
            pytest.fail("training never reached epoch 3")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode != 0                      # interrupted, not clean
    assert "[SHUTDOWN] interrupted" in out
    assert "--resume latest" in out

    # both shards of 'latest' must exist and agree on the epoch (a torn
    # 2-shard write would leave mixed-epoch shards => corrupt merge)
    base = os.path.join(cfg.paths.models_dir, f"{cfg.paths.run_id}_latest.pt")
    epochs = []
    for i in range(2):
        shard = base.replace(".pt", f"_shard{i}.pt")
        assert os.path.exists(shard), shard
        with zipfile.ZipFile(shard) as zf:
            epochs.append(json.loads(zf.read("__meta__.json"))["epoch"])
    assert epochs[0] == epochs[1]
    payload = load_sharded_checkpoint(base)          # merges + validates
    assert payload["epoch"] == epochs[0] >= 1
    assert "model_state" in payload and payload["model_state"]
