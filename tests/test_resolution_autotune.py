"""Quality-guarded resolution dispatch (resolution_autotune.py).

The tuner may only adopt the lowres guided-lift dial when its measured PSNR
on a held-out probe clears the floor relative to full resolution; these
tests pin both sides of the gate with constructed branches whose corrections
are exactly liftable (identity / low-frequency) or exactly NOT (checkerboard
high-frequency), plus the cache/policy plumbing the serving API consumes.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.resolution_autotune import (
    DEFAULT_CANDIDATES,
    load_policy,
    policy_to_lowres,
    tune_resolution_policy,
)

SIZE = 32


def _smooth_probe(n=6, seed=0):
    """Low-frequency hazy images in [0.1, 0.9]: per-image affine ramps."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE] / (SIZE - 1)
    a = rng.uniform(0.1, 0.4, (n, 1, 1, 3)).astype(np.float32)
    b = rng.uniform(0.0, 0.3, (n, 1, 1, 3)).astype(np.float32)
    img = a + b * yy[None, :, :, None] + (0.9 - a - b) * 0.5 * xx[None, :, :, None]
    return np.clip(img, 0.1, 0.9).astype(np.float32)


def _identity(x):
    return x


def _checker_apply(x):
    """Exact at full res, unliftable at half res: adds a pixel-rate
    checkerboard (pure Nyquist content — gone after 2x down/up)."""
    h, w = x.shape[1], x.shape[2]
    checker = ((jnp.arange(h)[:, None] + jnp.arange(w)[None, :]) % 2
               ).astype(jnp.float32) * 0.1
    return jnp.clip(x * 0.8 + checker[None, :, :, None], 0.0, 1.0)


def _levels(n):
    return np.tile(np.arange(3), -(-n // 3))[:n]


def test_identity_branch_adopts_lowres():
    """Zero-correction branches lift exactly (guided filter of a zero map is
    zero), so lowres ties full on PSNR and wins on the FLOP proxy."""
    hazy = _smooth_probe(6)
    policy = tune_resolution_policy(
        [_identity] * 3, hazy, hazy, _levels(6),
        floor_db=0.0, batch=2, time_candidates=False)
    for level, entry in policy["levels"].items():
        assert entry["choice"] == "guided_r4_s2", (level, entry)
        assert entry["scale"] == 2 and entry["mode"] == "guided"
        assert entry["table"]["guided_r4_s2"]["eligible"]


def test_high_frequency_branch_keeps_full():
    hazy = _smooth_probe(6, seed=1)
    clear = np.asarray(_checker_apply(jnp.asarray(hazy)))
    policy = tune_resolution_policy(
        [_checker_apply] * 3, hazy, clear, _levels(6),
        floor_db=0.0, batch=2, time_candidates=False)
    for level, entry in policy["levels"].items():
        assert entry["choice"] == "full", (level, entry)
        assert not entry["table"]["guided_r4_s2"]["eligible"]
        # and the quality gap it measured is real (checker is Nyquist)
        assert (entry["psnr_full"]
                - entry["table"]["guided_r4_s2"]["psnr"]) > 3.0


def test_floor_knob_licenses_lossy_lowres():
    """A huge floor makes the lossy candidate eligible — the gate is the
    floor, not a hardcoded preference."""
    hazy = _smooth_probe(6, seed=2)
    clear = np.asarray(_checker_apply(jnp.asarray(hazy)))
    policy = tune_resolution_policy(
        [_checker_apply], hazy, clear, np.zeros(6, np.int64),
        floor_db=1000.0, batch=2, time_candidates=False)
    # both lowres candidates are now eligible; ties on the FLOP proxy break
    # toward higher PSNR — either way, full must lose.
    assert policy["levels"]["low"]["choice"] != "full"


def test_missing_probe_class_defaults_full():
    hazy = _smooth_probe(4, seed=3)
    policy = tune_resolution_policy(
        [_identity] * 3, hazy, hazy, np.zeros(4, np.int64),
        floor_db=0.0, batch=2, time_candidates=False)
    assert policy["levels"]["low"]["choice"] == "guided_r4_s2"
    assert policy["levels"]["medium"]["choice"] == "full"
    assert policy["levels"]["high"]["choice"] == "full"


def test_timed_path_and_cache_roundtrip(tmp_path):
    """time_candidates=True exercises the on-device timing path (CPU here);
    the cached file reloads into the same policy and converts to the
    serving-API lowres dict."""
    hazy = _smooth_probe(3, seed=4)
    cache = str(tmp_path / "resolution_policy.json")
    policy = tune_resolution_policy(
        [_identity], hazy, hazy, np.zeros(3, np.int64),
        floor_db=0.0, batch=2, iters=1, time_candidates=True,
        cache_path=cache)
    assert os.path.exists(cache)
    loaded = load_policy(cache)
    assert loaded["levels"]["low"]["choice"] == policy["levels"]["low"]["choice"]
    assert "ms" in loaded["levels"]["low"]["table"]["full"]
    lowres = policy_to_lowres(loaded)
    if loaded["levels"]["low"]["choice"] == "full":
        assert "low" not in lowres
    else:
        # the TIMED winner depends on host speed (guided_r2_s2 and
        # guided_r4_s2 are both candidates) — assert the conversion
        # contract, not which guided radius won the race
        assert lowres["low"]["mode"] == "guided"
        assert lowres["low"]["scale"] == 2
        assert lowres["low"]["radius"] in (2, 4)


def test_policy_to_lowres_shapes():
    policy = {"levels": {
        "low": {"choice": "full"},
        "medium": {"choice": "guided_r2_s2", "mode": "guided", "radius": 2,
                   "scale": 2},
        "high": {"choice": "guided_r4_s2", "mode": "guided", "radius": 4,
                 "scale": 2},
    }}
    lowres = policy_to_lowres(policy)
    assert set(lowres) == {"medium", "high"}
    assert lowres["medium"]["radius"] == 2


def test_norm_lowres_forms():
    from adam_dehaze_tpu.serving import AdaptiveDehazer
    norm = AdaptiveDehazer._norm_lowres
    assert norm(()) == {}
    assert norm(("high",), 4, "bilinear") == {
        "high": {"scale": 4, "mode": "bilinear", "radius": 4}}
    d = {"medium": {"scale": 2}, "high": {"scale": 2, "mode": "guided",
                                          "radius": 8}}
    out = norm(d)
    assert out["medium"] == {"scale": 2, "mode": "guided", "radius": 4}
    assert out["high"]["radius"] == 8


def test_load_policy_missing_and_corrupt(tmp_path):
    assert load_policy(str(tmp_path / "nope.json")) is None
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_policy(str(bad)) is None
