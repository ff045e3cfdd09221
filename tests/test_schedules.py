"""β/capacity/LR schedule tests against closed-form values.

Mirrors the reference semantics in ``src/training/schedulers.py`` and the LR
stepping rules in ``train.py:332-333,375-376`` (SURVEY.md §2, §8).
"""

import math

from betavae_tpu.train.schedules import (BetaSchedule, CapacitySchedule, lr_at)


def _cfg(beta_schedule=None, loss=None, model=None):
    d = {}
    if beta_schedule is not None:
        d["beta_schedule"] = beta_schedule
    if loss is not None:
        d["loss"] = loss
    if model is not None:
        d["model"] = model
    return d


def test_beta_constant():
    s = BetaSchedule(_cfg({"type": "constant", "end_beta": 2.5}), 10)
    assert s.value(0) == 2.5
    assert s.value(9) == 2.5


def test_beta_linear_warmup():
    s = BetaSchedule(
        _cfg({"type": "linear", "start_beta": 0.0, "end_beta": 1.0,
              "warmup_epochs": 10}), 20)
    assert s.value(0) == 0.0
    assert abs(s.value(5) - 0.5) < 1e-9
    assert s.value(10) == 1.0
    assert s.value(15) == 1.0


def test_beta_linear_alias_keys():
    s = BetaSchedule(_cfg({"type": "linear", "start": 1.0, "end": 3.0,
                           "warmup": 4}), 8)
    assert abs(s.value(2) - 2.0) < 1e-9


def test_beta_cosine():
    s = BetaSchedule(_cfg({"type": "cosine", "start_beta": 0.0,
                           "end_beta": 1.0}), 11)
    assert s.value(0) == 0.0
    assert abs(s.value(10) - 1.0) < 1e-9
    assert abs(s.value(5) - 0.5) < 1e-9


def test_beta_cyclical():
    s = BetaSchedule(_cfg({"type": "cyclical", "start_beta": 0.0,
                           "end_beta": 1.0, "cycle_length": 4}), 12)
    assert s.value(0) == 0.0
    assert s.value(1) == 0.25
    assert s.value(4) == 0.0  # wraps


def test_beta_fallback_to_model_beta():
    s = BetaSchedule(_cfg(model={"beta": 7.0}), 5)
    assert s.value(3) == 7.0


def test_capacity_disabled_returns_none():
    s = CapacitySchedule(_cfg(loss={"capacity_schedule": {"enabled": False}}), 10)
    assert s.value(5) is None
    s2 = CapacitySchedule(_cfg(), 10)
    assert s2.value(5) is None


def test_capacity_linear_then_hold():
    s = CapacitySchedule(
        _cfg(loss={"capacity_schedule": {
            "enabled": True, "C_start": 30.0, "C_end": 128.0,
            "warmup_epochs": 30, "total_epochs": 100}}), 100)
    assert s.value(0) == 30.0
    assert abs(s.value(15) - (30 + 0.5 * 98)) < 1e-9
    assert s.value(30) == 128.0
    assert s.value(99) == 128.0  # hold after warmup (ref quirk: total ignored)


def test_lr_cosine_per_epoch():
    # torch CosineAnnealingLR(T_max=100): epoch 1 at lr0, epoch 51 at half-ish
    lr0 = 5e-4
    assert lr_at(1, 0, base_lr=lr0, scheduler="cosine", total_epochs=100) == lr0
    mid = lr_at(51, 9999, base_lr=lr0, scheduler="cosine", total_epochs=100)
    assert abs(mid - 0.5 * lr0 * (1 + math.cos(math.pi * 0.5))) < 1e-12


def test_lr_step_per_batch():
    # StepLR(30, 0.5) stepped per batch (reference unit quirk preserved)
    lr0 = 1e-3
    assert lr_at(1, 0, base_lr=lr0, scheduler="step", total_epochs=10) == lr0
    assert lr_at(1, 29, base_lr=lr0, scheduler="step", total_epochs=10) == lr0
    assert lr_at(1, 30, base_lr=lr0, scheduler="step", total_epochs=10) == lr0 / 2
    assert lr_at(2, 65, base_lr=lr0, scheduler="step", total_epochs=10) == lr0 / 4


def test_lr_none():
    assert lr_at(7, 123, base_lr=0.01, scheduler="none", total_epochs=10) == 0.01
