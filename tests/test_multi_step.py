"""Multi-step (lax.scan) trainer equivalence with the single-step path."""

import jax
import jax.numpy as jnp
import numpy as np

from betavae_tpu.models.beta_vae import BetaVAE, BetaVAEModule
from betavae_tpu.models.losses import LossSpec
from betavae_tpu.train.loop import (init_state, make_train_multi_step,
                                    make_train_step)
from betavae_tpu.train.optim import build_optimizer


def test_scan_chunk_equals_sequential_steps():
    from betavae_tpu.config import get_config

    cfg = get_config("configs/beta_vae_se.yaml")
    model = BetaVAE(module=BetaVAEModule(
        image_size=16, in_channels=1, latent_dim=8, base_channels=8,
        num_blocks=2, norm_type="layer", se_reduction=8, use_decoder_se=True,
        logvar_clamp=(-10.0, 5.0)))
    spec = LossSpec(recon_loss_type="mse")
    tx = build_optimizer(cfg)
    aug = {"use_flip": True, "degrees": 5.0, "brightness": 0.1}

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(0, 255, (32, 16, 16, 1), np.uint8))
    K, B = 4, 8
    idx_kb = np.arange(K * B, dtype=np.int32).reshape(K, B)
    mask_kb = np.ones((K, B), np.float32)
    root = jax.random.PRNGKey(3)
    keys = [jax.random.fold_in(root, j) for j in range(K)]
    lrs = [1e-3, 9e-4, 8e-4, 7e-4]
    scheds = [dict(beta=0.5, capacity=0.0, capacity_weight=1.0,
                   free_bits=0.0, lr=lr) for lr in lrs]

    # sequential single steps
    single = make_train_step(model, tx, spec, aug_kwargs=aug,
                             use_capacity=False, donate=False)
    state_a = init_state(model, tx, jax.random.PRNGKey(0))
    ms = []
    for j in range(K):
        sched = {k: jnp.float32(v) for k, v in scheds[j].items()}
        state_a, m = single(state_a, images, idx_kb[j], mask_kb[j], keys[j],
                            sched)
        ms.append(m)

    # one scanned chunk
    multi = make_train_multi_step(model, tx, spec, aug_kwargs=aug,
                                  use_capacity=False, donate=False)
    state_b = init_state(model, tx, jax.random.PRNGKey(0))
    sched_k = {name: jnp.asarray([s[name] for s in scheds], jnp.float32)
               for name in scheds[0]}
    state_b, mk = multi(state_b, images, idx_kb, mask_kb, jnp.stack(keys),
                        sched_k)

    for j in range(K):
        np.testing.assert_allclose(float(ms[j]["total"]),
                                   float(mk["total"][j]), rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        # scanned and sequential programs fuse differently (e.g. the
        # depthwise-transposed-conv upsample reassociates); semantic
        # equivalence, not bitwise, is the contract
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=1e-7)


def test_train_loop_uses_scan_path(demo_env, monkeypatch):
    """Run the real train() with a tiny scan chunk so the scan path executes."""
    import yaml

    from betavae_tpu.config import get_config, reset_config_cache
    from betavae_tpu.train.loop import train

    cfg_path = demo_env
    raw = yaml.safe_load(open(cfg_path))
    raw["training"]["scan_chunk_steps"] = 2
    raw["debug"]["max_train_batches"] = 5   # 2 chunks of 2 + 1 single
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    reset_config_cache()
    get_config(cfg_path)
    state = train()
    assert state is not None
