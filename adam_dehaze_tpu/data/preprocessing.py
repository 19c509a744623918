"""Dataset preprocessing & splitting CLIs + synthetic dataset generation.

Counterpart of the reference's preprocessing (reference:
data/preprocessing.py:6-129): resize every hazy/clear/dehazed triplet to the
target size and re-encode, then split 70/15/15 with a seeded shuffle.

`generate_synthetic_dataset` is new: it writes a fully-formed dataset tree
from procedural clear images + the on-device fog synthesiser
(data/synthetic.py), so every trainer/eval path is exercisable without the
25K-image corpus.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from adam_dehaze_tpu.data.dataset import INTENSITY_MAP

_ROLES = ("hazy", "clear", "dehazed")


def _write_rgb(path: str, img01: np.ndarray) -> None:
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    bgr = cv2.cvtColor((np.clip(img01, 0, 1) * 255).astype(np.uint8),
                       cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, bgr)


def resize_and_normalize(img: np.ndarray, size: int = 256) -> np.ndarray:
    """(reference: data/preprocessing.py:6-10)"""
    import cv2
    if img.shape[0] != size or img.shape[1] != size:
        img = cv2.resize(img, (size, size))
    img = img.astype(np.float32)
    if img.max() > 1.0:
        img = img / 255.0
    return img


def preprocess_dataset(raw_dir: str, processed_dir: str, size: int = 256) -> int:
    """Resize+renormalize every triplet under raw_dir into processed_dir
    (reference: data/preprocessing.py:12-64). Returns the number processed."""
    import cv2
    count = 0
    for intensity in ("low", "medium", "high"):
        hazy_dir = os.path.join(raw_dir, intensity, "hazy")
        if not os.path.isdir(hazy_dir):
            continue
        for name in sorted(os.listdir(hazy_dir)):
            if not name.endswith((".jpg", ".png")):
                continue
            ok = True
            imgs = {}
            for role in _ROLES:
                p = os.path.join(raw_dir, intensity, role, name)
                img = cv2.imread(p)
                if img is None:
                    ok = False
                    break
                imgs[role] = resize_and_normalize(
                    cv2.cvtColor(img, cv2.COLOR_BGR2RGB), size)
            if not ok:
                continue
            for role in _ROLES:
                _write_rgb(os.path.join(processed_dir, intensity, role, name),
                           imgs[role])
            count += 1
    return count


def split_dataset(processed_dir: str, train_ratio: float = 0.7,
                  val_ratio: float = 0.15, test_ratio: float = 0.15,
                  seed: int = 42) -> Dict[str, int]:
    """Seeded 70/15/15 split into {split}/{intensity}/{role}/
    (reference: data/preprocessing.py:66-129)."""
    import shutil
    rng = np.random.default_rng(seed)
    counts = {"train": 0, "val": 0, "test": 0}
    for intensity in ("low", "medium", "high"):
        hazy_dir = os.path.join(processed_dir, intensity, "hazy")
        if not os.path.isdir(hazy_dir):
            continue
        names = sorted(n for n in os.listdir(hazy_dir)
                       if n.endswith((".jpg", ".png")))
        order = rng.permutation(len(names))
        n_train = int(len(names) * train_ratio)
        n_val = int(len(names) * val_ratio)
        assignments = (["train"] * n_train + ["val"] * n_val
                       + ["test"] * (len(names) - n_train - n_val))
        for pos, split in zip(order, assignments):
            name = names[pos]
            for role in _ROLES:
                src = os.path.join(processed_dir, intensity, role, name)
                dst = os.path.join(processed_dir, split, intensity, role, name)
                if os.path.exists(src):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copy2(src, dst)
            counts[split] += 1
    return counts


def _procedural_clear_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """A structured random 'scene': gradient sky + colored rectangles."""
    img = np.zeros((size, size, 3), np.float32)
    base = rng.random(3) * 0.4 + 0.3
    grad = np.linspace(0.0, 1.0, size)[:, None, None]
    img += base * (0.6 + 0.4 * grad)
    for _ in range(rng.integers(4, 9)):
        h0, w0 = rng.integers(0, size - 4, 2)
        h1 = h0 + rng.integers(3, max(4, size // 2))
        w1 = w0 + rng.integers(3, max(4, size // 2))
        img[h0:h1, w0:w1] = rng.random(3)
    return np.clip(img, 0, 1)


def generate_synthetic_dataset(root: str, n_per_class: int = 4, size: int = 64,
                               seed: int = 0,
                               splits: Dict[str, float] = None) -> int:
    """Write a complete {split}/{intensity}/{hazy,clear,dehazed} tree using
    procedural scenes + the atmospheric-scattering fog model."""
    import jax
    import jax.numpy as jnp

    from adam_dehaze_tpu.data.synthetic import apply_fog, random_fog_params

    splits = splits or {"train": 0.5, "val": 0.25, "test": 0.25}
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    total = 0
    for intensity, label in INTENSITY_MAP.items():
        split_names: List[str] = []
        for s, frac in splits.items():
            split_names += [s] * max(1, int(round(n_per_class * frac)))
        split_names = split_names[:n_per_class]
        while len(split_names) < n_per_class:
            split_names.append("train")
        for i in range(n_per_class):
            clear = _procedural_clear_image(rng, size)
            key, sub = jax.random.split(key)
            beta, A = random_fog_params(sub, jnp.array([label]), 1)
            hazy = np.asarray(apply_fog(jnp.asarray(clear[None]), beta, A))[0]
            # 'dehazed' role: a plausible stand-in (blend), as in the corpus
            # the reference expects pre-computed dehazed images for.
            dehazed = np.clip(0.7 * clear + 0.3 * hazy, 0, 1)
            name = f"{intensity}_{i:04d}.png"
            split = split_names[i]
            for role, img in (("hazy", hazy), ("clear", clear), ("dehazed", dehazed)):
                _write_rgb(os.path.join(root, split, intensity, role, name), img)
            total += 1
    return total
