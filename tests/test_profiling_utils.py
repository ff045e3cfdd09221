"""utils/profiling.StepProfiler + utils/compile_cache on the CPU backend."""

import glob
import os


def test_step_profiler_captures_first_n_steps(tmp_path):
    from betavae_tpu.utils.profiling import StepProfiler

    import jax
    import jax.numpy as jnp

    out = str(tmp_path / "profile")
    p = StepProfiler(profile_steps=2, out_dir=out)
    p.maybe_start()
    assert p.active
    f = jax.jit(lambda x: x * 2 + 1)
    for _ in range(2):
        float(f(jnp.float32(3.0)))
        p.after_step()
    assert not p.active and p.remaining <= 0
    # the jax profiler wrote a dump under the requested directory
    assert glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    # idempotent off-state: further calls are no-ops
    p.after_step()
    p.stop()


def test_step_profiler_zero_is_noop(tmp_path):
    from betavae_tpu.utils.profiling import StepProfiler

    p = StepProfiler(profile_steps=0, out_dir=str(tmp_path / "x"))
    p.maybe_start()
    assert not p.active
    assert not (tmp_path / "x").exists()


def test_compilation_cache_config(tmp_path):
    import jax

    from betavae_tpu.utils.compile_cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xlacache")
        enable_compilation_cache(d)
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
