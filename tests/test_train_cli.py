"""scripts/train.py CLI surface in a subprocess: --data-parallel wiring.

The library mesh path is covered by ``test_mesh_train.py``; this exercises
the actual argparse → mesh → ``train()`` wiring end-to-end the way a user
invokes it, on the 8-virtual-device CPU backend.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_cli_data_parallel(demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data

    # global batch must divide over the 8-device mesh
    cfg_path = demo_config_factory(batch_size=8)
    cfg = get_config(cfg_path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=6,
                       test_per_class=3, size=cfg.data.image_size)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    # force CPU before the sitecustomize TPU plugin commits a backend
    env["PYTHONSTARTUP"] = ""
    res = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys;"
         f"sys.argv = ['train.py', '--config', {cfg_path!r},"
         " '--data-parallel', '-1'];"
         f"sys.path.insert(0, {os.path.join(REPO_ROOT, 'scripts')!r});"
         f"runpy.run_path({os.path.join(REPO_ROOT, 'scripts', 'train.py')!r},"
         " run_name='__main__')"],
        capture_output=True, text=True, timeout=900, cwd=REPO_ROOT, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    out = res.stdout + res.stderr
    assert "[MESH] data-parallel over 8 device(s)" in out
    assert '"phase": "val"' in out  # training actually ran and logged
