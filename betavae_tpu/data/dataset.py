"""Dataset scan + packed in-memory arrays (the TPU-first data representation).

Scan/label semantics mirror the reference
``src/utils/brain_tumor_utils/datautils.py:10-93``:

- scans ``processed/{train,test}/<class>/*`` for image files, classes sorted,
- shuffles with ``seed`` (train) / ``seed+1`` (test) then truncates to
  ``sample_limit`` (``datautils.py:34-37``),
- labels: multiclass = sorted-class index; binary = ``0 if cls=='notumor'
  else 1`` (``datautils.py:39-54``; the reference's binary ``class_to_idx`` is
  the cosmetic ``{"healthy":0,"tumor":1}`` map — kept for artifact parity),
- debug + ``deterministic_overfit`` aliases test set to the train set
  (``datautils.py:72-73``).

Representation is TPU-first: instead of a per-item PIL ``Dataset`` +
``DataLoader`` worker pool (reference ``datautils.py:59-93``), images are
decoded ONCE into a packed uint8 ``(N, H, W, C)`` array that the training
pipeline uploads to HBM whole; batches are device-side gathers (see
``data/pipeline.py``), so the steady-state input path does zero host work.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import numpy as np

from ..config import get_config

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".bmp", ".tiff")
TUMOR_CLASSES = ("glioma", "meningioma", "pituitary")


@dataclass
class ArrayDataset:
    """Packed split: uint8 images + labels + provenance."""

    images: np.ndarray          # (N, H, W, C) uint8
    labels: np.ndarray          # (N,) int32
    paths: list = field(default_factory=list)
    class_names: list = field(default_factory=list)      # per-sample class str
    original_classes: list = field(default_factory=list)  # sorted class dirs
    class_to_idx: dict = field(default_factory=dict)
    class_mode: str = "multiclass"

    def __len__(self) -> int:
        return int(self.images.shape[0])

    @property
    def idx_to_class(self) -> dict:
        return {v: k for k, v in self.class_to_idx.items()}


def scan_split(root_dir: str, split: str, sample_limit=None):
    """List (path, class) pairs with the reference's shuffle/limit semantics."""
    cfg = get_config()
    sub = cfg.data.train_subdir if split == "train" else cfg.data.test_subdir
    split_dir = os.path.join(root_dir, sub)
    if not os.path.exists(split_dir):
        raise FileNotFoundError(
            f"Processed data split not found: {split_dir}. "
            "Did you run preprocessing or create a demo set?"
        )
    classes = sorted(
        d for d in os.listdir(split_dir) if os.path.isdir(os.path.join(split_dir, d))
    )
    if len(classes) == 0:
        raise ValueError(
            f"No class folders found under {split_dir}. Expecting subdirectories per class."
        )
    samples = []
    for cls in classes:
        cls_dir = os.path.join(split_dir, cls)
        for fname in os.listdir(cls_dir):
            if fname.lower().endswith(IMAGE_EXTS):
                samples.append((os.path.join(cls_dir, fname), cls))
    if len(samples) == 0:
        raise ValueError(
            f"No images found under {split_dir}. Ensure raw data exists at "
            f"{cfg.paths.raw_dir} and run scripts/preprocess_data.py to populate "
            "processed splits."
        )
    rng = random.Random(cfg.data.seed if split == "train" else cfg.data.seed + 1)
    rng.shuffle(samples)
    if sample_limit is not None:
        samples = samples[:sample_limit]
    return samples, classes


def load_split(split: str, sample_limit=None) -> ArrayDataset:
    """Decode one split into a packed ArrayDataset at ``data.image_size``.

    Decoding uses the native C++ packer (``betavae_tpu.native``) when
    available — multithreaded libpng/libjpeg straight into the packed array,
    byte-identical to the PIL path (unit-tested) — falling back to PIL.
    """
    cfg = get_config()
    samples, classes = scan_split(cfg.paths.processed_dir, split, sample_limit)
    size = int(cfg.data.image_size)
    grayscale = bool(cfg.data.grayscale)
    c = 1 if grayscale else 3

    class_mode = cfg.data.class_mode
    if class_mode == "multiclass":
        class_to_idx = {cname: i for i, cname in enumerate(classes)}
    else:
        class_to_idx = {"healthy": 0, "tumor": 1}

    n = len(samples)
    labels = np.empty((n,), dtype=np.int32)
    paths = []
    names = []
    for i, (path, cls) in enumerate(samples):
        if class_mode == "multiclass":
            labels[i] = class_to_idx[cls]
        else:
            labels[i] = 0 if cls == "notumor" else 1
        paths.append(path)
        names.append(cls)

    from .. import native

    images = native.pack_images(paths, size, c)
    if images is None:
        from PIL import Image

        images = np.empty((n, size, size, c), dtype=np.uint8)
        for i, path in enumerate(paths):
            im = Image.open(path).convert("L" if grayscale else "RGB")
            if im.size != (size, size):
                im = im.resize((size, size))
            arr = np.asarray(im, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[..., None]
            images[i] = arr
    return ArrayDataset(
        images=images,
        labels=labels,
        paths=paths,
        class_names=names,
        original_classes=classes,
        class_to_idx=class_to_idx,
        class_mode=class_mode,
    )


def build_datasets(train_limit=None, test_limit=None):
    """Train/test ArrayDatasets with the reference's debug-alias rule."""
    from ..config import get

    cfg = get_config()
    train_ds = load_split("train", sample_limit=train_limit)
    test_ds = load_split("test", sample_limit=test_limit)
    if get(cfg.model, "deterministic_overfit", False) and get(
        cfg.debug, "enabled", False
    ):
        test_ds = train_ds
    return train_ds, test_ds
