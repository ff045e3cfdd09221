"""Native C++ packer: build, decode parity vs PIL, fallback behavior."""

import glob
import os

import numpy as np
import pytest

from betavae_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "native packer failed to build/load"


def test_pack_matches_pil(tmp_path):
    from PIL import Image

    from betavae_tpu.data.demo import generate_demo_data

    generate_demo_data(tmp_path, train_per_class=4, test_per_class=1, size=48)
    paths = sorted(glob.glob(str(tmp_path / "train" / "*" / "*.png")))
    arr = native.pack_images(paths, 48, 1)
    assert arr is not None and arr.shape == (len(paths), 48, 48, 1)
    ref = np.stack([
        np.asarray(Image.open(p).convert("L"), np.uint8)[..., None]
        for p in paths
    ])
    np.testing.assert_array_equal(arr, ref)


def test_pack_rgb(tmp_path):
    from PIL import Image

    p = tmp_path / "rgb.png"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    Image.fromarray(img, "RGB").save(p)
    arr = native.pack_images([str(p)], 32, 3)
    np.testing.assert_array_equal(arr[0], img)


def test_pack_jpeg(tmp_path):
    from PIL import Image

    p = tmp_path / "img.jpg"
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 40), np.uint8)
    Image.fromarray(img, "L").save(p, quality=95)
    arr = native.pack_images([str(p)], 40, 1)
    ref = np.asarray(Image.open(p).convert("L"), np.uint8)
    # both go through the same libjpeg; decoded bytes must agree
    np.testing.assert_array_equal(arr[0, ..., 0], ref)


def test_resize_path(tmp_path):
    from PIL import Image

    p = tmp_path / "big.png"
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64), np.uint8)
    Image.fromarray(img, "L").save(p)
    arr = native.pack_images([str(p)], 32, 1)
    assert arr.shape == (1, 32, 32, 1)
    assert arr.min() >= img.min() and arr.max() <= img.max()


def test_bad_file_returns_none(tmp_path):
    p = tmp_path / "junk.png"
    p.write_bytes(b"not an image at all")
    assert native.pack_images([str(p)], 16, 1) is None


def test_dataset_uses_native(demo_env, monkeypatch):
    """load_split native path and PIL fallback produce identical datasets."""
    from betavae_tpu.data.dataset import load_split

    a = load_split("train")
    monkeypatch.setenv("BETAVAE_NO_NATIVE", "1")
    # force the fallback by reloading the native module state
    monkeypatch.setattr(native, "_lib", None, raising=False)
    monkeypatch.setattr(native, "_tried", False, raising=False)
    b = load_split("train")
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)
    monkeypatch.setattr(native, "_tried", False, raising=False)
