"""betavae_tpu — a TPU-native (JAX/XLA/Pallas) beta-VAE research framework.

A from-scratch rebuild of the capabilities of the jtang25/Beta-VAE reference
(PyTorch, single-GPU) as an idiomatic JAX framework:

- pure-functional Flax model with a single fused, jitted train step
  (donated state, in-graph metric accumulation),
- device-resident packed dataset with on-device augmentation,
- bf16 mixed-precision policy (fp32 params/optimizer, fp32 KL/FFT paths),
- data-parallel scaling via ``jax.sharding.Mesh`` + NamedSharding,
- sharded checkpoints compatible with the reference's
  ``<run_id>_{latest,best}_shard{i}`` naming and reshard CLI,
- the full preprocessing / evaluation / inference / analysis tool suite
  and the structured ``METRICS {json}`` log-line protocol.

Reference layer map: see SURVEY.md sections 1-2.
"""

__version__ = "0.1.0"

from .config import get_config, load_config, reset_config_cache  # noqa: F401
