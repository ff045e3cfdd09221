"""Synthetic 4-class demo dataset (fixture + smoke-test backend).

Capability parity with reference ``scripts/generate_demo_data.py:27-77``:
class-distinguishable grayscale patterns on a noisy canvas —
glioma = bright circle, meningioma = horizontal bands,
pituitary = cross-hatch, notumor = noise — written to
``processed/{train,test}/<class>/*.png`` with seeded RNG so the whole pipeline
can run without the real MRI dataset.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

CLASSES = ("glioma", "meningioma", "pituitary", "notumor")


def make_canvas(rng: np.random.Generator, size: int, base_level=0.3, noise=0.05):
    return np.clip(rng.normal(base_level, noise, size=(size, size)), 0, 1)


def pattern_for_class(cls: str, rng: np.random.Generator, size: int) -> np.ndarray:
    arr = make_canvas(rng, size, 0.25, 0.08)
    yy, xx = np.mgrid[:size, :size]
    if cls == "glioma":
        circle = (xx - size // 2) ** 2 + (yy - size // 2) ** 2 <= (size // 4) ** 2
        arr[circle] += 0.35
    elif cls == "meningioma":
        band = (yy % (size // 8)) < (size // 16)
        arr[band] += 0.25
    elif cls == "pituitary":
        diag = ((xx + yy) % (size // 6)) < (size // 16)
        anti = ((xx - yy) % (size // 6)) < (size // 16)
        arr[diag | anti] += 0.25
    else:
        arr += rng.normal(0.0, 0.02, size=arr.shape)
    return np.clip(arr, 0, 1)


def write_split(proc_root, split: str, classes, per_class: int, size: int, seed: int):
    from PIL import Image

    rng = np.random.default_rng(seed)
    for cls in classes:
        out_dir = Path(proc_root) / split / cls
        out_dir.mkdir(parents=True, exist_ok=True)
        for idx in range(per_class):
            arr = pattern_for_class(cls, rng, size)
            img = Image.fromarray((arr * 255).astype(np.uint8), mode="L")
            img.save(out_dir / f"{cls}_{idx}.png")


def generate_demo_data(proc_root, train_subdir="train", test_subdir="test",
                       train_per_class=24, test_per_class=12, size=128,
                       classes=CLASSES):
    """Write a seeded synthetic dataset (train seed 0, test seed 1 like the ref)."""
    write_split(proc_root, train_subdir, classes, train_per_class, size, seed=0)
    write_split(proc_root, test_subdir, classes, test_per_class, size, seed=1)
    return Path(proc_root)
