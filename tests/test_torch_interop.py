"""Read-side interop with reference torch-pickle checkpoints (VERDICT r1 #4).

Builds a torch BetaVAE state dict with the reference's exact module naming
(``/root/reference/src/models/beta_vae.py:94-127``), saves it via
``torch.save`` in the reference shard layout (``io.py:14-39``), and asserts:

1. our sharded loader reads + converts it into flax naming,
2. the converted params load into our model (shape-checked unflatten),
3. the *math* matches: a torch forward through an equivalent minimal model
   equals our flax forward with the converted weights (the NCHW→NHWC flatten
   permutation on the fc heads is the part that silently breaks otherwise).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from betavae_tpu.io.checkpoint import load_sharded_checkpoint, unflatten_like
from betavae_tpu.io.torch_compat import (convert_model_state,
                                         looks_like_torch_state)

# tiny geometry: 16px, 2 blocks, base 4 -> bottleneck (8, 4, 4), flat 128
IMG, BLOCKS, BASE, LATENT, RED = 16, 2, 4, 6, 2
CHS = [1] + [BASE * 2**i for i in range(BLOCKS)]
SIDE = IMG // 2**BLOCKS
FLAT = CHS[-1] * SIDE * SIDE


def _rng_tensor(rng, *shape):
    return torch.from_numpy(rng.normal(0, 0.3, shape).astype(np.float32))


def _build_torch_state(rng, norm="layer", dec_se=True):
    """State dict keyed exactly like the reference model's ``state_dict()``."""
    sd = {}

    def block(prefix, cin, cout, conv_key):
        sd[f"{prefix}.{conv_key}.weight"] = _rng_tensor(rng, cout, cin, 3, 3)
        sd[f"{prefix}.{conv_key}.bias"] = _rng_tensor(rng, cout)
        if norm == "layer":
            sd[f"{prefix}.norm.weight"] = _rng_tensor(rng, cout).abs() + 0.5
            sd[f"{prefix}.norm.bias"] = _rng_tensor(rng, cout)
        se_r = max(1, cout // RED)
        sd[f"{prefix}.se.block.fc.0.weight"] = _rng_tensor(rng, se_r, cout)
        sd[f"{prefix}.se.block.fc.0.bias"] = _rng_tensor(rng, se_r)
        sd[f"{prefix}.se.block.fc.2.weight"] = _rng_tensor(rng, cout, se_r)
        sd[f"{prefix}.se.block.fc.2.bias"] = _rng_tensor(rng, cout)

    for i in range(BLOCKS):
        block(f"encoder.{i}", CHS[i], CHS[i + 1], "conv")
    for head, (o, i) in {"fc_mu": (LATENT, FLAT), "fc_logvar": (LATENT, FLAT),
                         "fc_dec": (FLAT, LATENT)}.items():
        sd[f"{head}.weight"] = _rng_tensor(rng, o, i)
        sd[f"{head}.bias"] = _rng_tensor(rng, o)
    dec_chs = list(reversed(CHS[1:]))
    for i in range(BLOCKS):
        cin = dec_chs[i]
        cout = dec_chs[i + 1] if i + 1 < len(dec_chs) else dec_chs[-1]
        block(f"decoder_blocks.{i}", cin, cout, "up.1")
        if not dec_se:
            for k in list(sd):
                if k.startswith(f"decoder_blocks.{i}.se."):
                    del sd[k]
    sd["final_conv.weight"] = _rng_tensor(rng, 1, dec_chs[-1], 3, 3)
    sd["final_conv.bias"] = _rng_tensor(rng, 1)
    return sd


def _save_reference_style(base_path, sd, num_shards=2):
    """torch.save shards exactly like reference ``io.py:14-39``."""
    keys = sorted(sd.keys())
    shards = [[] for _ in range(num_shards)]
    for idx, k in enumerate(keys):
        shards[idx % num_shards].append(k)
    root, ext = os.path.splitext(base_path)
    for si, shard_keys in enumerate(shards):
        payload = {
            "epoch": 7, "total_steps": 1234, "val_total": 81.5,
            "model_state": {k: sd[k] for k in shard_keys},
            "optim_state": {"state": {0: {"exp_avg": torch.zeros(2)}},
                            "param_groups": [{"lr": 1e-3}]},
            "shard_id": si, "num_shards": num_shards,
        }
        torch.save(payload, f"{root}_shard{si}{ext}")


def _torch_forward_mu_recon(sd, x_nchw):
    """The reference forward (deterministic) in raw torch ops."""
    def se(prefix, h):
        b, c = h.shape[:2]
        y = h.mean(dim=(2, 3))
        y = F.relu(F.linear(y, sd[f"{prefix}.se.block.fc.0.weight"],
                            sd[f"{prefix}.se.block.fc.0.bias"]))
        y = torch.sigmoid(F.linear(y, sd[f"{prefix}.se.block.fc.2.weight"],
                                   sd[f"{prefix}.se.block.fc.2.bias"]))
        return h * y.view(b, c, 1, 1)

    def gn(prefix, h):
        return F.group_norm(h, 1, sd[f"{prefix}.norm.weight"],
                            sd[f"{prefix}.norm.bias"])

    h = x_nchw
    for i in range(BLOCKS):
        p = f"encoder.{i}"
        h = F.conv2d(h, sd[f"{p}.conv.weight"], sd[f"{p}.conv.bias"],
                     stride=2, padding=1)
        h = se(p, F.relu(gn(p, h)))
    flat = h.reshape(h.shape[0], -1)
    mu = F.linear(flat, sd["fc_mu.weight"], sd["fc_mu.bias"])
    h = F.linear(mu, sd["fc_dec.weight"], sd["fc_dec.bias"])
    h = h.view(-1, CHS[-1], SIDE, SIDE)
    for i in range(BLOCKS):
        p = f"decoder_blocks.{i}"
        h = F.interpolate(h, scale_factor=2, mode="bilinear",
                          align_corners=False)
        h = F.conv2d(h, sd[f"{p}.up.1.weight"], sd[f"{p}.up.1.bias"],
                     padding=1)
        h = se(p, F.relu(gn(p, h)))
    recon = torch.sigmoid(
        F.conv2d(h, sd["final_conv.weight"], sd["final_conv.bias"],
                 padding=1))
    return mu, recon


@pytest.fixture
def tiny_cfg(demo_config_factory):
    from betavae_tpu.config import get_config

    path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10]})
    return get_config(path)


def test_loader_reads_reference_shards(tmp_path, tiny_cfg):
    rng = np.random.default_rng(0)
    sd = _build_torch_state(rng)
    base = str(tmp_path / "ref_best.pt")
    _save_reference_style(base, sd, num_shards=2)

    payload = load_sharded_checkpoint(base)
    assert payload["epoch"] == 7
    assert payload["total_steps"] == 1234
    assert payload["val_total"] == 81.5
    # the fixture's placeholder optim_state (1 bogus entry) can't map onto
    # the model's params: the import must bail loudly, not half-convert
    assert "torch_adam_moments" not in payload
    assert "optim_state" not in payload
    state = payload["model_state"]
    assert not looks_like_torch_state(state)  # converted to flax naming
    assert "params/enc_0/conv/kernel" in state
    assert state["params/enc_0/conv/kernel"].shape == (3, 3, 1, BASE)

    from betavae_tpu.models.beta_vae import model_from_config

    model = model_from_config(tiny_cfg)
    variables = unflatten_like(model.variables_template(), state)
    assert variables["params"]["fc_mu"]["kernel"].shape == (FLAT, LATENT)


def test_converted_forward_matches_torch(tmp_path, tiny_cfg):
    """Deterministic forward parity torch vs flax through converted weights."""
    import jax.numpy as jnp

    from betavae_tpu.models.beta_vae import model_from_config

    rng = np.random.default_rng(1)
    sd = _build_torch_state(rng)
    base = str(tmp_path / "ref_latest.pt")
    _save_reference_style(base, sd, num_shards=3)

    model = model_from_config(tiny_cfg)
    variables = unflatten_like(model.variables_template(),
                               load_sharded_checkpoint(base)["model_state"])

    x = rng.uniform(size=(2, IMG, IMG, 1)).astype(np.float32)
    recon, mu, logvar, _ = model.forward(variables, jnp.asarray(x),
                                         deterministic=True)
    want_mu, want_recon = _torch_forward_mu_recon(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon)[..., 0],
                               want_recon.numpy()[:, 0],
                               rtol=1e-4, atol=1e-5)


def test_unmapped_keys_raise():
    with pytest.raises(ValueError, match="does not look like"):
        convert_model_state({"totally.unknown.weight": np.zeros(3)})


def test_gap_pooling_roundtrip(tmp_path, demo_config_factory):
    """GAP-pooled models have flat_dim == C: no flatten permutation.

    Builds a torch state with fc heads sized (LATENT, C) and asserts forward
    parity of the mu head through the converted weights.
    """
    import jax.numpy as jnp

    from betavae_tpu.config import get_config
    from betavae_tpu.models.beta_vae import model_from_config

    c_last = CHS[-1]
    rng = np.random.default_rng(3)
    sd = _build_torch_state(rng)
    for head, (o, i) in {"fc_mu": (LATENT, c_last),
                         "fc_logvar": (LATENT, c_last),
                         "fc_dec": (c_last, LATENT)}.items():
        sd[f"{head}.weight"] = _rng_tensor(rng, o, i)
        sd[f"{head}.bias"] = _rng_tensor(rng, o)
    base = str(tmp_path / "gap_best.pt")
    _save_reference_style(base, sd, num_shards=2)

    path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10],
           "model.encoder_pooling": "gap"})
    cfg = get_config(path)
    model = model_from_config(cfg)
    variables = unflatten_like(model.variables_template(),
                               load_sharded_checkpoint(base)["model_state"])

    x = rng.uniform(size=(2, IMG, IMG, 1)).astype(np.float32)
    _, mu, _, _ = model.forward(variables, jnp.asarray(x), deterministic=True)

    # torch-side: encoder trunk -> GAP -> fc_mu
    import torch as _torch

    h = _torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    import torch.nn.functional as _F
    for i in range(BLOCKS):
        p = f"encoder.{i}"
        h = _F.conv2d(h, sd[f"{p}.conv.weight"], sd[f"{p}.conv.bias"],
                      stride=2, padding=1)
        h = _F.group_norm(h, 1, sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
        h = _F.relu(h)
        b, c = h.shape[:2]
        y = h.mean(dim=(2, 3))
        y = _F.relu(_F.linear(y, sd[f"{p}.se.block.fc.0.weight"],
                              sd[f"{p}.se.block.fc.0.bias"]))
        y = _torch.sigmoid(_F.linear(y, sd[f"{p}.se.block.fc.2.weight"],
                                     sd[f"{p}.se.block.fc.2.bias"]))
        h = h * y.view(b, c, 1, 1)
    pooled = h.mean(dim=(2, 3))
    want_mu = _F.linear(pooled, sd["fc_mu.weight"], sd["fc_mu.bias"])
    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_eval_driver_loads_torch_checkpoint(tmp_path, demo_config_factory):
    """run_evaluation.load_model on reference-style torch shards end-to-end
    (VERDICT r1 #4's done-criterion, through the actual driver entry)."""
    import jax.numpy as jnp

    from betavae_tpu.config import get_config
    from betavae_tpu.eval.run_evaluation import load_model

    path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10]})
    cfg = get_config(path)
    os.makedirs(cfg.paths.models_dir, exist_ok=True)

    rng = np.random.default_rng(4)
    sd = _build_torch_state(rng)
    base = os.path.join(cfg.paths.models_dir, f"{cfg.paths.run_id}_best.pt")
    _save_reference_style(base, sd, num_shards=2)

    model, variables = load_model("best")
    x = rng.uniform(size=(1, IMG, IMG, 1)).astype(np.float32)
    recon, mu, logvar, _ = model.forward(variables, jnp.asarray(x),
                                         deterministic=True)
    want_mu, want_recon = _torch_forward_mu_recon(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    # float reassociation between jax and torch conv stacks: ~1e-4 relative
    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(),
                               rtol=1e-3, atol=5e-5)


# ---------------------------------------------------------------------------
# torch Adam optimizer-state import (VERDICT r3 #6)
# ---------------------------------------------------------------------------

def _adam_optim_state(sd):
    """A realistic torch ``Adam.state_dict()`` for ``sd``'s parameters.

    Param indices follow ``model.parameters()`` = registration order, which
    for the fixture equals ``sd``'s insertion order (it is built in the
    reference's module order).  Moments are derived elementwise from the
    parameter (``exp_avg = 0.5·p``, ``exp_avg_sq = p²``) so the converted
    trees can be checked against the converted params exactly — any
    ordering or layout slip breaks the elementwise relation.
    """
    state = {}
    for i, name in enumerate(sd):
        p = sd[name]
        state[i] = {"step": torch.tensor(1234.0),
                    "exp_avg": 0.5 * p,
                    "exp_avg_sq": p * p}
    return {"state": state,
            "param_groups": [{"lr": 1e-3, "betas": (0.9, 0.999),
                              "eps": 1e-8, "weight_decay": 0.0,
                              "params": list(range(len(sd)))}]}


def _save_reference_style_with_optim(base_path, sd, num_shards=2):
    """Reference shard layout with the REAL duplicated Adam optim_state
    (``src/utils/brain_tumor_utils/io.py:32-35``)."""
    optim = _adam_optim_state(sd)
    keys = sorted(sd.keys())
    shards = [[] for _ in range(num_shards)]
    for idx, k in enumerate(keys):
        shards[idx % num_shards].append(k)
    root, ext = os.path.splitext(base_path)
    for si, shard_keys in enumerate(shards):
        torch.save({
            "epoch": 7, "total_steps": 1234, "val_total": 81.5,
            "model_state": {k: sd[k] for k in shard_keys},
            "optim_state": optim,
            "shard_id": si, "num_shards": num_shards,
        }, f"{root}_shard{si}{ext}")


def test_adam_moments_convert_elementwise_with_params(tmp_path):
    """Converted mu/nu must sit at the same flax path, in the same layout,
    as their parameter: mu == 0.5·param and nu == param² for EVERY leaf."""
    rng = np.random.default_rng(11)
    sd = _build_torch_state(rng)
    base = str(tmp_path / "ref_latest.pt")
    _save_reference_style_with_optim(base, sd, num_shards=2)

    payload = load_sharded_checkpoint(base)
    moments = payload["torch_adam_moments"]
    assert moments["count"] == 1234
    params = {k[len("params/"):]: v for k, v in
              payload["model_state"].items() if k.startswith("params/")}
    assert set(moments["mu"]) == set(params)
    assert set(moments["nu"]) == set(params)
    for k, p in params.items():
        np.testing.assert_allclose(moments["mu"][k], 0.5 * np.asarray(p),
                                   rtol=1e-6, err_msg=f"mu at {k}")
        np.testing.assert_allclose(moments["nu"][k], np.asarray(p) ** 2,
                                   rtol=1e-6, err_msg=f"nu at {k}")


def test_graft_adam_moments_onto_optax_state(tmp_path, tiny_cfg):
    """The moments land inside the live optax chain state (ScaleByAdamState
    mu/nu trees + count), ready for the next update step."""
    import jax
    import optax

    from betavae_tpu.train.loop import init_state
    from betavae_tpu.train.optim import build_optimizer, graft_adam_moments
    from betavae_tpu.models.beta_vae import model_from_config

    rng = np.random.default_rng(12)
    sd = _build_torch_state(rng)
    base = str(tmp_path / "ref_latest.pt")
    _save_reference_style_with_optim(base, sd, num_shards=2)
    moments = load_sharded_checkpoint(base)["torch_adam_moments"]

    model = model_from_config(tiny_cfg)
    state = init_state(model, build_optimizer(tiny_cfg), jax.random.PRNGKey(0))
    new_opt = graft_adam_moments(state.opt_state, moments)

    adam_states = [n for n in jax.tree_util.tree_leaves(
        new_opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(n, optax.ScaleByAdamState)]
    assert len(adam_states) == 1
    adam = adam_states[0]
    assert int(adam.count) == 1234
    from betavae_tpu.io.checkpoint import flatten_pytree

    grafted_mu = flatten_pytree(adam.mu)
    for k, v in moments["mu"].items():
        np.testing.assert_allclose(np.asarray(grafted_mu[k]),
                                   np.asarray(v), rtol=1e-6, err_msg=k)


def test_train_resumes_with_torch_momentum(tmp_path, demo_config_factory):
    """End-to-end: ``--resume latest`` from a reference torch checkpoint
    announces the moment import and trains on (VERDICT r3 #6 done-criterion)."""
    from betavae_tpu.config import get_config
    from betavae_tpu.data.demo import generate_demo_data
    from betavae_tpu.train import loop

    cfg_path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10],
           "debug.epochs": 9, "debug.max_train_batches": 2,
           "debug.max_val_batches": 1})
    cfg = get_config(cfg_path)
    os.makedirs(cfg.paths.models_dir, exist_ok=True)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=4,
                       test_per_class=2, size=IMG)

    rng = np.random.default_rng(13)
    sd = _build_torch_state(rng)
    base = os.path.join(cfg.paths.models_dir, f"{cfg.paths.run_id}_latest.pt")
    _save_reference_style_with_optim(base, sd, num_shards=2)

    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        loop.train(resume="latest")
    out = buf.getvalue()
    assert "[RESUME] imported torch Adam moments (step count 1234)" in out
    assert "restarting at epoch 8" in out


def test_sgd_config_falls_back_fresh(tmp_path, tiny_cfg):
    """Adam moments + an sgd optimizer config: loud warning, fresh state."""
    import jax

    from betavae_tpu.train.loop import init_state
    from betavae_tpu.train.optim import build_optimizer, graft_adam_moments
    from betavae_tpu.models.beta_vae import model_from_config

    rng = np.random.default_rng(14)
    sd = _build_torch_state(rng)
    base = str(tmp_path / "ref_latest.pt")
    _save_reference_style_with_optim(base, sd, num_shards=2)
    moments = load_sharded_checkpoint(base)["torch_adam_moments"]

    class _Opt:
        optimizer = "sgd"
        lr = 1e-3

    class _Cfg:
        optimization = _Opt()
        training = tiny_cfg.training

    model = model_from_config(tiny_cfg)
    state = init_state(model, build_optimizer(_Cfg()), jax.random.PRNGKey(0))
    with pytest.warns(UserWarning, match="no Adam state"):
        new_opt = graft_adam_moments(state.opt_state, moments)
    assert len(jax.tree_util.tree_leaves(new_opt)) == \
        len(jax.tree_util.tree_leaves(state.opt_state))


# ---------------------------------------------------------------------------
# write side: export our checkpoints into the reference's torch format
# ---------------------------------------------------------------------------

def _init_flax_state(cfg):
    import jax

    from betavae_tpu.models.beta_vae import model_from_config

    model = model_from_config(cfg)
    variables = model.init_variables(jax.random.PRNGKey(5))
    return model, variables


def test_export_roundtrips_through_read_side(tmp_path, tiny_cfg):
    """export -> torch shards -> read-side convert must be the identity."""
    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.io.torch_compat import save_torch_reference_checkpoint

    _, variables = _init_flax_state(tiny_cfg)
    flat = flatten_pytree(variables)
    base = str(tmp_path / "export_best.pt")
    paths = save_torch_reference_checkpoint(
        base, {"epoch": 3, "total_steps": 99, "val_total": 12.5,
               "model_state": flat}, num_shards=2)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)

    payload = load_sharded_checkpoint(base)
    assert payload["epoch"] == 3
    assert payload["val_total"] == 12.5
    assert payload["exported_by"] == "betavae_tpu"
    back = payload["model_state"]
    assert set(back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(flat[k]), err_msg=k)


def test_exported_state_matches_reference_naming_and_torch_forward(tmp_path,
                                                                   tiny_cfg):
    """The exported dict IS a reference state_dict: raw-torch forward through
    it equals our flax forward with the original weights (fc-permutation
    inversion is the part that silently breaks otherwise)."""
    import jax.numpy as jnp

    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.io.torch_compat import export_model_state

    model, variables = _init_flax_state(tiny_cfg)
    sd_np = export_model_state(flatten_pytree(variables))
    # exact reference module naming, ready for load_state_dict
    assert "encoder.0.conv.weight" in sd_np
    assert "decoder_blocks.0.up.1.weight" in sd_np
    assert sd_np["fc_mu.weight"].shape == (LATENT, FLAT)
    sd = {k: torch.from_numpy(v) for k, v in sd_np.items()}

    rng = np.random.default_rng(6)
    x = rng.uniform(size=(2, IMG, IMG, 1)).astype(np.float32)
    recon, mu, _, _ = model.forward(variables, jnp.asarray(x),
                                    deterministic=True)
    want_mu, want_recon = _torch_forward_mu_recon(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon)[..., 0],
                               want_recon.numpy()[:, 0],
                               rtol=1e-4, atol=1e-5)


def test_export_gap_pooling_roundtrip(tmp_path, demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.io.torch_compat import save_torch_reference_checkpoint

    path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10],
           "model.encoder_pooling": "gap"})
    cfg = get_config(path)
    _, variables = _init_flax_state(cfg)
    flat = flatten_pytree(variables)
    base = str(tmp_path / "gap_export.pt")
    save_torch_reference_checkpoint(base, {"epoch": 1, "model_state": flat},
                                    num_shards=3)
    back = load_sharded_checkpoint(base)["model_state"]
    for k in flat:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(flat[k]), err_msg=k)


def test_export_batchnorm_emits_running_stats(tmp_path, demo_config_factory):
    from betavae_tpu.config import get_config
    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.io.torch_compat import export_model_state

    path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10],
           "model.encoder_norm": "batch"})
    cfg = get_config(path)
    _, variables = _init_flax_state(cfg)
    sd = export_model_state(flatten_pytree(variables))
    assert "encoder.0.norm.running_mean" in sd
    assert "encoder.0.norm.running_var" in sd
    assert sd["encoder.0.norm.num_batches_tracked"].dtype == np.int64


def test_export_unknown_keys_raise(tiny_cfg):
    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.io.torch_compat import export_model_state

    _, variables = _init_flax_state(tiny_cfg)
    flat = flatten_pytree(variables)
    flat["params/mystery/kernel"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unexported"):
        export_model_state(flat)


def test_export_cli(tmp_path, demo_config_factory, monkeypatch):
    """scripts/export_torch_checkpoint.py end-to-end over a saved checkpoint."""
    import sys

    from betavae_tpu.config import get_config
    from betavae_tpu.io.checkpoint import (flatten_pytree,
                                           save_sharded_checkpoint)

    path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10]})
    cfg = get_config(path)
    os.makedirs(cfg.paths.models_dir, exist_ok=True)
    _, variables = _init_flax_state(cfg)
    flat = flatten_pytree(variables)
    base = os.path.join(cfg.paths.models_dir, f"{cfg.paths.run_id}_best.pt")
    save_sharded_checkpoint(base, {"epoch": 2, "total_steps": 10,
                                   "model_state": flat}, num_shards=2)

    out = str(tmp_path / "for_reference.pt")
    script_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    monkeypatch.syspath_prepend(script_dir)
    monkeypatch.setattr(sys, "argv",
                        ["export_torch_checkpoint.py", "--config", path,
                         "--checkpoint", "best", "--output", out])
    import importlib

    mod = importlib.import_module("export_torch_checkpoint")
    mod.main()

    back = load_sharded_checkpoint(out)
    assert back["exported_by"] == "betavae_tpu"
    for k in flat:
        np.testing.assert_array_equal(np.asarray(back["model_state"][k]),
                                      np.asarray(flat[k]), err_msg=k)


def test_export_loads_into_actual_reference_model(demo_config_factory,
                                                  monkeypatch):
    """The definitive write-side check: strict ``load_state_dict`` into the
    REAL reference ``BetaVAE`` (imported read-only from ``/root/reference``)
    and deterministic forward parity against our flax model.  Skipped where
    the reference tree is not mounted."""
    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference tree not available")

    import jax.numpy as jnp

    from betavae_tpu.config import get_config
    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.io.torch_compat import export_model_state

    cfg_path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10]})
    cfg = get_config(cfg_path)
    model, variables = _init_flax_state(cfg)
    sd_np = export_model_state(flatten_pytree(variables))

    monkeypatch.syspath_prepend(ref_src)
    monkeypatch.setenv("CONFIG_PATH", cfg_path)
    import importlib

    ref_cp = importlib.import_module("utils.brain_tumor_utils.config_parser")
    # the reference caches its config in a module global; reset so THIS
    # test's CONFIG_PATH wins regardless of import order
    ref_cp._config_cache = None
    ref_beta_vae = importlib.import_module("models.beta_vae")
    ref_model = ref_beta_vae.BetaVAE()
    ref_model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=True)
    ref_model.eval()

    rng = np.random.default_rng(8)
    x = rng.uniform(size=(2, IMG, IMG, 1)).astype(np.float32)
    # canonical NCHW strides: with C=1, a transposed view's size-1-axis
    # stride makes torch infer channels_last and its convs then propagate
    # that layout into the reference's `.view()` flatten, which raises — a
    # latent reference bug its own (canonically-strided) DataLoader batches
    # never trigger.  `.contiguous()` is a no-op here (a C=1 tensor is
    # "contiguous" under either layout), so force the re-stride explicitly.
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).clone(
        memory_format=torch.contiguous_format)
    assert xt.stride() == (IMG * IMG, IMG * IMG, IMG, 1)
    with torch.no_grad():
        mu_t, _ = ref_model.encode(xt)
        recon_t = ref_model.decode(mu_t)

    recon, mu, _, _ = model.forward(variables, jnp.asarray(x),
                                    deterministic=True)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recon)[..., 0],
                               recon_t.numpy()[:, 0], rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# write side: Adam optimizer-state export (VERDICT r4 #4)
# ---------------------------------------------------------------------------

def _flax_state_with_moments(cfg):
    """Init our model + optax Adam state with ``mu = 0.5·p``, ``nu = p²``.

    Elementwise-from-param moments make any ordering or layout slip in the
    export break the relation (mirror of ``_adam_optim_state`` on the read
    side)."""
    import jax
    import jax.numpy as jnp
    import optax

    from betavae_tpu.io.checkpoint import flatten_pytree
    from betavae_tpu.train.optim import build_optimizer

    model, variables = _init_flax_state(cfg)
    params = variables["params"]
    opt_state = build_optimizer(cfg).init(params)

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=jnp.asarray(1234, jnp.asarray(node.count).dtype),
                mu=jax.tree_util.tree_map(lambda p: 0.5 * p, params),
                nu=jax.tree_util.tree_map(lambda p: p * p, params))
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(walk(v) for v in node)
        return node

    return (model, flatten_pytree(variables),
            flatten_pytree(walk(opt_state)))


def test_export_adam_optim_state_elementwise(tiny_cfg):
    """Exported moments must sit at the reference's param index, in torch
    layout: exp_avg == 0.5·W and exp_avg_sq == W² for EVERY index."""
    from betavae_tpu.io.torch_compat import (_torch_param_order,
                                             export_adam_optim_state,
                                             export_model_state)

    _, model_flat, optim_flat = _flax_state_with_moments(tiny_cfg)
    assert any(k.startswith("inner_state/") for k in optim_flat)

    out = export_adam_optim_state(optim_flat, model_flat,
                                  lr=2e-4, weight_decay=0.01)
    assert out is not None
    sd = export_model_state(model_flat)
    order = _torch_param_order(sd.keys())
    assert set(out["state"]) == set(range(len(order)))
    for i, name in enumerate(order):
        st = out["state"][i]
        assert float(st["step"]) == 1234.0
        np.testing.assert_allclose(st["exp_avg"].numpy(), 0.5 * sd[name],
                                   rtol=1e-6, err_msg=f"{i}:{name}")
        np.testing.assert_allclose(st["exp_avg_sq"].numpy(),
                                   sd[name].astype(np.float64) ** 2,
                                   rtol=1e-5, err_msg=f"{i}:{name}")
    (group,) = out["param_groups"]
    assert group["params"] == list(range(len(order)))
    assert group["lr"] == 2e-4 and group["weight_decay"] == 0.01
    assert group["betas"] == (0.9, 0.999) and group["eps"] == 1e-8


def test_export_optim_state_bails_without_adam(tiny_cfg):
    """SGD trace state has no torch-Adam analog: bail loudly, never a
    half-converted payload."""
    from betavae_tpu.io.torch_compat import export_adam_optim_state

    _, model_flat, optim_flat = _flax_state_with_moments(tiny_cfg)
    sgd_like = {k: v for k, v in optim_flat.items() if "/mu/" not in k}
    with pytest.warns(UserWarning, match="optimizer-state export skipped"):
        assert export_adam_optim_state(sgd_like, model_flat, lr=1e-3) is None


def test_reference_resume_consumes_exported_optimizer(tmp_path,
                                                      demo_config_factory,
                                                      monkeypatch):
    """The VERDICT r4 #4 'done' check: the ACTUAL reference resume path
    (``src/training/train.py:266-280`` — its ``load_sharded_checkpoint``,
    ``model.load_state_dict``, ``optimizer.load_state_dict`` on an optimizer
    built by its own ``get_optimizer``) consumes our ``--include-optimizer``
    export, its Adam state carries our moments elementwise, and one
    ``optimizer.step()`` is driven by them."""
    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference tree not available")
    import importlib
    import sys

    from betavae_tpu.config import get_config
    from betavae_tpu.io.torch_compat import (export_adam_optim_state,
                                             save_torch_reference_checkpoint)

    cfg_path = demo_config_factory(
        image_size=IMG, latent_dim=LATENT, base_channels=BASE,
        num_blocks=BLOCKS,
        **{"model.se_reduction_ratio": RED, "model.logvar_clamp": [-10, 10]})
    cfg = get_config(cfg_path)
    _, model_flat, optim_flat = _flax_state_with_moments(cfg)
    optim_torch = export_adam_optim_state(
        optim_flat, model_flat, lr=float(cfg.optimization.lr),
        weight_decay=0.0)
    base = str(tmp_path / "testrun_latest.pt")
    save_torch_reference_checkpoint(
        base, {"epoch": 7, "total_steps": 1234, "val_total": 3.25,
               "model_state": model_flat},
        num_shards=2, optim_state=optim_torch)

    monkeypatch.syspath_prepend(ref_src)
    monkeypatch.setenv("CONFIG_PATH", cfg_path)
    ref_cp = importlib.import_module("utils.brain_tumor_utils.config_parser")
    ref_cp._config_cache = None  # module-global singleton; make ours win
    ref_beta_vae = importlib.import_module("models.beta_vae")
    ref_callbacks = importlib.import_module("training.callbacks")
    ref_io = importlib.import_module("utils.brain_tumor_utils.io")

    # --- the reference's exact resume sequence (train.py:266-280) ---
    ref_model = ref_beta_vae.BetaVAE()
    optimizer = ref_callbacks.get_optimizer(ref_model)
    payload = ref_io.load_sharded_checkpoint(base, map_location="cpu")
    ref_model.load_state_dict(payload.get("model_state", payload))
    assert "optim_state" in payload
    optimizer.load_state_dict(payload["optim_state"])
    assert payload.get("epoch") == 7 and payload.get("total_steps") == 1234

    # Adam state carries OUR moments: exp_avg == 0.5·p / exp_avg_sq == p²
    # for every reference parameter (p was loaded from the same export, so
    # this closes registration order + layout conversion + torch mapping)
    n_checked = 0
    for p in ref_model.parameters():
        st = optimizer.state[p]
        assert float(st["step"]) == 1234.0
        torch.testing.assert_close(st["exp_avg"], 0.5 * p.data,
                                   rtol=1e-6, atol=1e-7)
        torch.testing.assert_close(st["exp_avg_sq"], p.data * p.data,
                                   rtol=1e-5, atol=1e-8)
        n_checked += 1
    assert n_checked == len(optim_torch["state"])

    # the moments actively drive the next update: with zero gradients a
    # fresh Adam is a no-op, a resumed one moves by -lr·mû/(√ν̂+ε).  Flax
    # zero-initializes biases, so their mu=0.5·p moments are legitimately
    # zero — require movement only where the moments are nonzero.
    before = [p.detach().clone() for p in ref_model.parameters()]
    for p in ref_model.parameters():
        p.grad = torch.zeros_like(p)
    optimizer.step()
    stuck = [bool(b.abs().sum() > 0) and torch.equal(b, p.detach())
             for b, p in zip(before, ref_model.parameters())]
    assert not any(stuck), "loaded moments did not drive the optimizer update"
    assert sum(bool(b.abs().sum() > 0) for b in before) > 0


def test_lr_at_save_matches_reference_scheduler(demo_config_factory,
                                                monkeypatch):
    """The lr synthesized into exported ``param_groups`` must equal what the
    reference's own scheduler holds at save time.  The reference steps its
    cosine scheduler at the END of each epoch's train phase, BEFORE
    ``save_latest`` (``src/training/train.py:375-376,452``) — so a
    checkpoint saved at (1-based) epoch e carries cosine position e; StepLR
    steps once per batch (``train.py:331-332``)."""
    import importlib
    import sys

    import torch

    from betavae_tpu.config import get_config, reset_config_cache

    script_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    monkeypatch.syspath_prepend(script_dir)
    mod = importlib.import_module("export_torch_checkpoint")

    epochs = 4
    path = demo_config_factory(**{"debug.epochs": epochs})
    reset_config_cache()
    cfg = get_config(path)
    base_lr = float(cfg.optimization.lr)
    assert str(cfg.optimization.scheduler).lower() == "cosine"

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    for epoch in range(1, epochs + 1):
        sch.step()  # the reference steps before saving epoch `epoch`
        np.testing.assert_allclose(
            mod._lr_at_save(cfg, epoch, total_steps=epoch * 6),
            opt.param_groups[0]["lr"], rtol=1e-12,
            err_msg=f"cosine position after saving epoch {epoch}")

    # StepLR: per-batch stepping — lr depends on total_steps, not epoch
    path = demo_config_factory(**{"debug.epochs": epochs,
                                  "optimization.scheduler": "step"})
    reset_config_cache()
    cfg = get_config(path)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=30, gamma=0.5)
    for step in range(1, 100):
        sch.step()
        if step in (1, 29, 30, 59, 60, 95):
            np.testing.assert_allclose(
                mod._lr_at_save(cfg, 1, total_steps=step),
                opt.param_groups[0]["lr"], rtol=1e-12,
                err_msg=f"StepLR after {step} batches")
