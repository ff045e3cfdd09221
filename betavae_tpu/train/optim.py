"""Optimizer construction (optax) with reference-parity update rules.

Capability parity with reference ``src/training/callbacks.py:92-114``
(``get_optimizer``/``build_scheduler``) and the AMP wrapper semantics of
``GradScalerWrapper`` (``callbacks.py:7-30``):

- adam / adamw / sgd(momentum=0.9) with ``optimization.lr`` /
  ``weight_decay``; torch ``Adam(weight_decay=w)`` couples decay into the
  gradient (L2) while ``AdamW`` decouples it — both reproduced,
- global-norm gradient clipping at ``training.grad_clip`` applied before the
  optimizer update (the reference clips after unscale, ``callbacks.py:21-23``),
- NO loss-scaling GradScaler analog: TPU bf16 keeps fp32 exponent range, so
  ``training.mixed_precision`` selects the bf16 compute policy instead
  (SURVEY.md §2.3); grads and optimizer state stay fp32,
- the learning rate is injected as a hyperparameter so the host-computed
  schedule (``schedules.lr_at``) updates it without recompiling the step.
"""

from __future__ import annotations

import optax

from ..config import get, get_config


def build_optimizer(cfg=None) -> optax.GradientTransformation:
    cfg = cfg or get_config()
    opt_cfg = cfg.optimization
    name = str(opt_cfg.optimizer).lower()
    lr = float(opt_cfg.lr)
    wd = float(get(opt_cfg, "weight_decay", 0.0) or 0.0)
    clip = float(get(cfg.training, "grad_clip", 0.0) or 0.0)

    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "adam":
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))  # torch-coupled L2
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "adamw":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))  # decoupled
    elif name == "sgd":
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.trace(decay=0.9, nesterov=False))
    else:
        raise ValueError("unsupported optimizer")

    def make(learning_rate):
        return optax.chain(*chain, optax.scale_by_learning_rate(learning_rate))

    return optax.inject_hyperparams(make)(learning_rate=lr)


def graft_adam_moments(opt_state, moments: dict):
    """Graft imported Adam moments onto a freshly-initialized optax state.

    ``moments``: ``{"count": int, "mu": {<param path>: arr}, "nu": {...}}``
    from :func:`betavae_tpu.io.torch_compat.convert_adam_moments` (reference
    ``--resume`` counterpart: ``src/training/train.py:266-280`` restoring
    ``optimizer.load_state_dict``).  Every ``ScaleByAdamState`` node in the
    (possibly nested) chain gets its ``mu``/``nu`` trees and step count
    replaced; shape/path mismatches raise via ``unflatten_like``.  If the
    configured optimizer has no Adam state (e.g. sgd), warns and returns
    the state unchanged — a fresh optimizer, the pre-import behavior.
    """
    import warnings

    import jax.numpy as jnp

    from ..io.checkpoint import unflatten_like

    grafted = [0]

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            grafted[0] += 1
            return node._replace(
                count=jnp.asarray(moments["count"],
                                  jnp.asarray(node.count).dtype),
                mu=unflatten_like(node.mu, moments["mu"]),
                nu=unflatten_like(node.nu, moments["nu"]))
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(walk(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(walk(v) for v in node)
        return node

    new_state = walk(opt_state)
    if not grafted[0]:
        warnings.warn("checkpoint carries Adam moments but the configured "
                      "optimizer has no Adam state — resuming with a fresh "
                      "optimizer")
        return opt_state
    return new_state
