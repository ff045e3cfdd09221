"""Dataset scan/label/shuffle semantics + demo data + preprocessing."""

import os

import numpy as np
import pytest

from betavae_tpu.config import get_config
from betavae_tpu.data.dataset import build_datasets, load_split
from betavae_tpu.data.demo import generate_demo_data
from betavae_tpu.data.pipeline import BatchPlan


def test_demo_data_and_scan(demo_env):
    cfg = get_config()
    train_ds, test_ds = build_datasets()
    assert len(train_ds) == 24 and len(test_ds) == 12
    assert train_ds.images.dtype == np.uint8
    assert train_ds.images.shape == (24, 32, 32, 1)
    for name, lab in zip(train_ds.class_names, train_ds.labels):
        assert train_ds.class_to_idx[name] == lab


def test_binary_labels(demo_config_factory):
    path = demo_config_factory(class_mode="binary")
    cfg = get_config(path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=2,
                       test_per_class=2, size=32)
    ds = load_split("train")
    # binary labels: notumor -> 0, others -> 1 (ref datautils.py:52); the
    # cosmetic {"healthy":0,"tumor":1} map is kept for artifact parity
    assert ds.class_to_idx == {"healthy": 0, "tumor": 1}
    for name, lab in zip(ds.class_names, ds.labels):
        assert lab == (0 if name == "notumor" else 1)


def test_multiclass_labels(demo_config_factory):
    path = demo_config_factory(class_mode="multiclass")
    cfg = get_config(path)
    generate_demo_data(cfg.paths.processed_dir, train_per_class=2,
                       test_per_class=2, size=32)
    ds = load_split("train")
    # sorted class order: glioma, meningioma, notumor, pituitary
    assert ds.class_to_idx == {"glioma": 0, "meningioma": 1, "notumor": 2,
                               "pituitary": 3}
    for name, lab in zip(ds.class_names, ds.labels):
        assert ds.class_to_idx[name] == lab


def test_seeded_shuffle_deterministic(demo_env):
    a = load_split("train")
    b = load_split("train")
    assert a.paths == b.paths  # same seed, same order
    t = load_split("test")
    assert t.paths != a.paths[: len(t.paths)]  # test uses seed+1


def test_sample_limit(demo_env):
    ds = load_split("train", sample_limit=5)
    assert len(ds) == 5


def test_missing_split_raises(demo_config_factory):
    path = demo_config_factory()
    get_config(path)
    with pytest.raises(FileNotFoundError):
        load_split("train")


def test_batch_plan_shapes_and_padding():
    plan = BatchPlan(10, 4, shuffle=True, seed=0)
    batches = list(plan.batches(epoch=1))
    assert len(batches) == 3
    for idx, mask in batches:
        assert idx.shape == (4,) and mask.shape == (4,)
    # last batch has 2 real samples
    assert batches[-1][1].sum() == 2
    # every real index appears exactly once
    seen = np.concatenate([idx[mask.astype(bool)] for idx, mask in batches])
    assert sorted(seen.tolist()) == list(range(10))


def test_batch_plan_epoch_shuffling():
    plan = BatchPlan(32, 8, shuffle=True, seed=1)
    o1 = plan.epoch_order(1)
    o2 = plan.epoch_order(2)
    assert not np.array_equal(o1, o2)
    np.testing.assert_array_equal(o1, plan.epoch_order(1))  # deterministic
    noshuf = BatchPlan(8, 4, shuffle=False, seed=1)
    np.testing.assert_array_equal(noshuf.epoch_order(3), np.arange(8))


def test_preprocess_split_and_verify(demo_config_factory):
    from betavae_tpu.data.preprocess import (preprocess_dataset,
                                             split_from_raw, verify_processed)
    from betavae_tpu.data.demo import write_split

    path = demo_config_factory()
    cfg = get_config(path)
    # build a raw tree with per-class folders (no presplit)
    write_split(cfg.paths.raw_dir, ".", ["glioma", "notumor"], 10, 32, seed=0)
    # move class dirs up (write_split nests under "./")
    split_from_raw()
    verify_processed()
    train_dir = os.path.join(cfg.paths.processed_dir, "train")
    test_dir = os.path.join(cfg.paths.processed_dir, "test")
    n_train = sum(len(files) for _, _, files in os.walk(train_dir))
    n_test = sum(len(files) for _, _, files in os.walk(test_dir))
    assert n_train == 16 and n_test == 4  # 80/20 of 10 per class
    preprocess_dataset(compute_stats=True, normalization_mode="global_z")
    verify_processed()


def test_global_stats(demo_env):
    from betavae_tpu.data.preprocess import compute_global_stats

    cfg = get_config()
    stats = compute_global_stats(
        [os.path.join(cfg.paths.processed_dir, "train")])
    assert 0.0 < stats["mean"] < 1.0
    assert 0.0 < stats["std"] < 1.0
