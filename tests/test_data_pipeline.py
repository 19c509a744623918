import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.data.augment import augment_triplet
from adam_dehaze_tpu.data.dataset import DataLoader, HazyImageDataset, get_dataloader
from adam_dehaze_tpu.data.preprocessing import (
    generate_synthetic_dataset,
    split_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    n = generate_synthetic_dataset(root, n_per_class=6, size=32, seed=0)
    assert n == 18
    return root


def test_dataset_walk(synth_root):
    ds = HazyImageDataset(synth_root, split="train", img_size=32)
    assert len(ds) > 0
    item = ds.load(0)
    assert item["hazy"].shape == (32, 32, 3)
    assert item["hazy"].dtype == np.float32
    assert 0 <= item["hazy"].min() and item["hazy"].max() <= 1
    assert item["intensity"] in (0, 1, 2)
    assert item["name"].endswith(".png")


def test_dataloader_batches(synth_root):
    ds = HazyImageDataset(synth_root, split="train", img_size=32)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    for b in batches:
        assert b["hazy"].shape == (4, 32, 32, 3)
        assert b["clear"].shape == (4, 32, 32, 3)
        assert b["intensity"].shape == (4,)
        assert len(b["name"]) == 4


def test_dataloader_padding_mask(synth_root):
    ds = HazyImageDataset(synth_root, split="val", img_size=32)
    dl = DataLoader(ds, batch_size=4, shuffle=False, drop_remainder=False)
    total_valid = sum(int(b["mask"].sum()) for b in dl)
    assert total_valid == len(ds)
    for b in dl:
        assert b["hazy"].shape[0] == 4  # static shape even when padded


def test_get_dataloader_config(synth_root):
    cfg = default_config()
    cfg["dataset"]["train_path"] = synth_root
    cfg["dataset"]["img_size"] = 32
    cfg["dataset"]["batch_size"] = 2
    dl = get_dataloader(cfg, "train")
    b = next(iter(dl))
    assert b["hazy"].shape == (2, 32, 32, 3)


def test_augment_triplet_consistency(key, rng):
    batch = {
        "hazy": jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32)),
        "clear": jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32)),
        "dehazed": jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32)),
        "intensity": jnp.array([0, 1, 2, 0]),
    }
    out = jax.jit(augment_triplet)(key, batch)
    assert out["hazy"].shape == (4, 16, 16, 3)
    assert bool(jnp.all(out["intensity"] == batch["intensity"]))
    # Pairing invariant: if hazy got flipped horizontally, clear did too.
    # Check via correlation of the flip pattern: augmented hazy should be a
    # photometric transform of either hazy or its flip — compare structure by
    # correlating spatial gradients sign with both candidates.
    for name in ("hazy", "clear"):
        a = np.asarray(out[name])
        assert a.min() >= 0 and a.max() <= 1


def test_augment_flip_is_shared(key):
    # Make hazy and clear identical; after augmentation they must still be
    # identical (all transforms are shared across the triplet).
    img = jnp.broadcast_to(
        jnp.linspace(0, 1, 16)[None, :, None, None], (4, 16, 16, 3))
    batch = {"hazy": img, "clear": img, "dehazed": img}
    out = augment_triplet(key, batch)
    np.testing.assert_allclose(np.asarray(out["hazy"]), np.asarray(out["clear"]),
                               atol=1e-7)


def test_split_dataset(tmp_path):
    import cv2
    root = str(tmp_path / "proc")
    rng = np.random.default_rng(0)
    for intensity in ("low", "medium", "high"):
        for role in ("hazy", "clear", "dehazed"):
            d = os.path.join(root, intensity, role)
            os.makedirs(d)
            for i in range(10):
                img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(d, f"im_{i}.png"), img)
    counts = split_dataset(root, seed=42)
    assert counts["train"] == 21  # 7 per intensity
    assert counts["val"] == 3
    assert counts["test"] == 6
    ds = HazyImageDataset(root, split="train", img_size=8)
    assert len(ds) == 21
