"""Test harness: CPU backend with a virtual 8-device mesh, isolated configs.

Multi-device sharding tests follow the strategy in SURVEY.md §4: the CPU
backend is forced and split into 8 virtual devices via
``--xla_force_host_platform_device_count`` so data-parallel code paths run in
CI without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize registers the TPU PJRT plugin and imports
# jax before any test code runs, so env vars alone don't take effect — force
# the platform through the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# the fast lane (VERDICT r3 #5): unit/golden modules whose tests avoid full
# train() runs — `pytest -m fast` finishes in minutes on the 1-core host.
# Everything else (end-to-end/integration, anything that trains) is `slow`.
_FAST_MODULES = {
    "test_augment", "test_bench_helpers", "test_checkpoint", "test_config",
    "test_data", "test_golden_parity", "test_logs_module", "test_losses_ops",
    "test_lpips_convert", "test_model", "test_native", "test_pallas_elbo",
    "test_pallas_gn", "test_pallas_head", "test_probe_alignment",
    "test_profiling_utils", "test_reference_artifacts", "test_schedules",
    "test_trace", "test_upsample", "test_utils_misc",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(pytest.mark.fast if name in _FAST_MODULES
                        else pytest.mark.slow)


@pytest.fixture(autouse=True)
def _fresh_config():
    """Reset the config + logger singletons around every test."""
    from betavae_tpu.config import reset_config_cache
    from betavae_tpu.logging_utils import reset_logger

    reset_config_cache()
    reset_logger()
    old_env = os.environ.pop("CONFIG_PATH", None)
    yield
    reset_config_cache()
    reset_logger()
    if old_env is not None:
        os.environ["CONFIG_PATH"] = old_env
    else:
        os.environ.pop("CONFIG_PATH", None)


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_demo_config(tmp_path, *, image_size=32, latent_dim=8,
                       base_channels=8, num_blocks=2, batch_size=4,
                       class_mode="multiclass", **overrides):
    """A tiny self-contained config rooted in tmp_path."""
    import yaml

    with open(os.path.join(REPO_ROOT, "configs", "beta_vae_se_debug.yaml")) as f:
        cfg = yaml.safe_load(f)
    root = str(tmp_path)
    cfg["paths"].update(
        raw_dir=os.path.join(root, "raw"),
        processed_dir=os.path.join(root, "processed"),
        outputs_dir=os.path.join(root, "outputs"),
        models_dir=os.path.join(root, "outputs", "models"),
        figures_dir=os.path.join(root, "outputs", "figures"),
        tables_dir=os.path.join(root, "outputs", "tables"),
        run_id="testrun",
    )
    cfg["data"].update(image_size=image_size, class_mode=class_mode)
    cfg["model"].update(latent_dim=latent_dim, base_channels=base_channels,
                        num_blocks=num_blocks)
    cfg["training"].update(batch_size=batch_size, mixed_precision=False)
    cfg["loss"].update(use_lpips=False, use_ffl=False)
    cfg["logging"].update(log_to_file=False)
    for key, val in overrides.items():
        sec, _, name = key.partition(".")
        if name:
            cfg[sec][name] = val
        else:
            cfg[sec] = val
    path = os.path.join(root, "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture
def demo_config_factory(tmp_path):
    def make(**overrides):
        return _write_demo_config(tmp_path, **overrides)

    return make


@pytest.fixture
def demo_env(tmp_path):
    """Demo dataset + tiny config, config singleton loaded."""
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data

    path = _write_demo_config(tmp_path)
    cfg_raw = get_config(path)
    generate_demo_data(
        cfg_raw.paths.processed_dir,
        train_per_class=6, test_per_class=3,
        size=cfg_raw.data.image_size,
    )
    return path
