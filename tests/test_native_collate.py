"""Native collate/normalize stage: C++ vs numpy parity and pipeline wiring."""
import numpy as np
import pytest

from adam_dehaze_tpu.data import native_collate
from adam_dehaze_tpu.data.native_collate import normalize_u8


def _numpy_reference(u8, mean, std):
    return ((u8.astype(np.float32) / 255.0 - mean) / std).astype(np.float32)


def test_native_lib_builds_and_matches_numpy(rng):
    lib = native_collate._load_lib()
    assert lib is not None, "libcollate.so failed to build"
    u8 = rng.integers(0, 256, (3, 17, 23, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = normalize_u8(u8, mean, std, n_threads=3)
    want = _numpy_reference(u8, mean, std)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_plain_unit_range(rng):
    u8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    got = normalize_u8(u8)
    np.testing.assert_allclose(got, u8.astype(np.float32) / 255.0, atol=1e-7)
    assert got.dtype == np.float32


def test_single_image_rank3(rng):
    u8 = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    got = normalize_u8(u8)
    np.testing.assert_allclose(got, u8.astype(np.float32) / 255.0, atol=1e-7)


def test_numpy_fallback_matches(rng, monkeypatch):
    u8 = rng.integers(0, 256, (2, 6, 6, 3), dtype=np.uint8)
    mean = np.array([0.5, 0.4, 0.3], np.float32)
    std = np.array([0.2, 0.3, 0.4], np.float32)
    native = normalize_u8(u8, mean, std)
    monkeypatch.setattr(native_collate, "_load_lib", lambda: None)
    fallback = normalize_u8(u8, mean, std)
    np.testing.assert_allclose(native, fallback, atol=1e-6)


def test_imread_uses_native_path(tmp_path, rng):
    import cv2

    from adam_dehaze_tpu.data.dataset import _imread_rgb

    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    out = _imread_rgb(p)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    # round-trips the stored bytes exactly (PNG is lossless)
    np.testing.assert_allclose(
        out, cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0,
        atol=1e-7)
