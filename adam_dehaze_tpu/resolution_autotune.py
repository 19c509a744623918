"""Quality-guarded resolution dispatch: choose, per branch, between full
resolution and the lowres guided-lift dial (ops/resolution.py) by MEASURING
both on a held-out probe set and only adopting lowres when its PSNR clears a
floor relative to full resolution.

Why this exists: serving_autotune.py may only A/B equivalence-tested paths —
the resolution dial changes outputs, so it can never be a candidate there.
But on the trained system the dial is not merely "acceptable": the guided
lift of the half-res correction measured ABOVE full resolution
(benchmarks/round_results/resolution_scheduling.json: high-only +0.37 dB on
the branch's own traffic at ~0.5x the cost). Leaving it opt-in forfeits a
~2x serving win that a quality gate would have licensed. This module is that
gate: a deployment-time tuner that scores each branch's candidates on probe
images OF THAT BRANCH'S CLASS (oracle labels — routing noise must not leak
into a per-branch quality decision), times them at the serving batch, and
picks the cheapest candidate whose PSNR >= full - floor_db. Full resolution
always satisfies its own floor, so the tuner degrades to the exact serving
path whenever the dial loses quality (e.g. a future model whose corrections
carry high-frequency content).

The decision is a property of the TRAINED WEIGHTS and corpus statistics, so
the policy is cached per experiment (`resolution_policy.json`) and consumed
by the product API:

    python tools/autotune_resolution.py --experiment experiments/x   # once
    dehazer.route_hard(images, lowres="auto")                        # serve

The probe split must be HELD OUT from any reported evaluation (the tool uses
the val split; quality numbers are reported on test) — tuning the dial on
the same images you score would leak.

No reference counterpart: the reference serves every branch at full
resolution, always (/root/reference/models/high_intensity.py).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.models.routing import INTENSITY_ORDER
from adam_dehaze_tpu.ops.image import psnr
from adam_dehaze_tpu.ops.resolution import make_lowres_apply

# Candidate dials per branch, cheapest-first is NOT assumed — each is timed
# (or FLOP-ranked when timing is disabled). Names are stable cache keys.
DEFAULT_CANDIDATES = (
    {"name": "guided_r4_s2", "mode": "guided", "radius": 4, "scale": 2},
    {"name": "guided_r2_s2", "mode": "guided", "radius": 2, "scale": 2},
)


def _sync(out) -> float:
    """Axon-safe execution sync: device->host scalar fetch (CLAUDE.md)."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def _time_ms(fn: Callable, x: jax.Array, iters: int, warm: int = 1) -> float:
    for _ in range(warm):
        out = fn(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def _batched_psnr(apply_fn: Callable, hazy: np.ndarray, clear: np.ndarray,
                  batch: int) -> float:
    """Mean PSNR of apply_fn over (n, H, W, C) probe pairs, served in padded
    fixed-shape batches so one compiled program covers the whole probe."""
    n = hazy.shape[0]
    vals = []
    for i in range(0, n, batch):
        idx = np.arange(i, min(i + batch, n))
        pad = batch - idx.size
        full = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
        out = apply_fn(jnp.asarray(hazy[full]))
        p = np.asarray(psnr(jnp.asarray(out, jnp.float32)[:idx.size],
                            jnp.asarray(clear[idx])))
        vals.append(p)
    return float(np.concatenate(vals).mean())


def tune_resolution_policy(
        branch_applies: Sequence[Callable],
        probe_hazy: np.ndarray, probe_clear: np.ndarray,
        probe_levels: np.ndarray,
        floor_db: float = 0.0,
        candidates: Sequence[dict] = DEFAULT_CANDIDATES,
        batch: int = 16, iters: int = 5,
        time_candidates: bool = True,
        cache_path: Optional[str] = None) -> dict:
    """Measure {full} ∪ candidates per branch on that branch's probe images;
    return (and optionally cache) the policy.

    branch_applies: serving applies in INTENSITY_ORDER (already dispatched —
    chains/s2d/canonical; the dial wraps whatever the serving path is).
    probe_*: held-out hazy/clear pairs with oracle intensity labels (n,).
    floor_db: lowres is eligible only if psnr >= psnr_full - floor_db.
    time_candidates: False skips on-device timing (CPU tests, dry runs) and
    ranks eligible candidates by FLOP proxy 1/scale² instead, tie-broken by
    PSNR — full resolution then only loses to a candidate that both reduces
    FLOPs and clears the floor.
    """
    probe_levels = np.asarray(probe_levels)
    policy: Dict[str, dict] = {}
    for lvl_i, level in enumerate(INTENSITY_ORDER):
        if lvl_i >= len(branch_applies):
            break
        base = jax.jit(branch_applies[lvl_i])
        sel = probe_levels == lvl_i
        if not sel.any():
            policy[level] = {"choice": "full", "reason": "no probe images"}
            continue
        hz, cl = probe_hazy[sel], probe_clear[sel]
        psnr_full = _batched_psnr(base, hz, cl, batch)
        x_t = None
        if time_candidates:
            # Time at the same padded batch shape _batched_psnr served, so
            # the timed executable is the one the PSNR pass compiled.
            reps = -(-batch // hz.shape[0])
            x_t = jnp.asarray(np.tile(hz, (reps, 1, 1, 1))[:batch])
        ms_full = (_time_ms(base, x_t, iters) if time_candidates else None)
        table: Dict[str, dict] = {
            "full": {"psnr": round(psnr_full, 4),
                     **({"ms": round(ms_full, 3)} if ms_full is not None
                        else {})}}
        # (cost, -psnr) minimisation; full's cost proxy is 1.0.
        best = ((ms_full if time_candidates else 1.0), -psnr_full, "full",
                None)
        for cand in candidates:
            fn = jax.jit(make_lowres_apply(
                branch_applies[lvl_i], scale=cand["scale"],
                mode=cand["mode"], radius=cand.get("radius", 4)))
            try:
                psnr_c = _batched_psnr(fn, hz, cl, batch)
                ms_c = (_time_ms(fn, x_t, iters) if time_candidates else None)
            except Exception as e:  # alignment/OOM: candidate just loses
                table[cand["name"]] = {
                    "error": f"{type(e).__name__}: {e}"[:160]}
                continue
            row = {"psnr": round(psnr_c, 4)}
            if ms_c is not None:
                row["ms"] = round(ms_c, 3)
            eligible = psnr_c >= psnr_full - floor_db
            row["eligible"] = bool(eligible)
            table[cand["name"]] = row
            if eligible:
                cost = ms_c if time_candidates else 1.0 / cand["scale"] ** 2
                key = (cost, -psnr_c, cand["name"], cand)
                if key[:2] < best[:2]:
                    best = key
        _, _, choice, cand = best
        entry = {"choice": choice, "psnr_full": round(psnr_full, 4),
                 "n_probe": int(sel.sum()), "table": table}
        if cand is not None:
            entry.update({k: cand[k] for k in ("mode", "radius", "scale")
                          if k in cand})
            entry["psnr_choice"] = table[choice]["psnr"]
        policy[level] = entry
    import jaxlib
    result = {
        "floor_db": floor_db,
        "batch": batch,
        "timed": bool(time_candidates),
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        # Compiler version stamp: cost rankings can flip on Mosaic/XLA
        # updates (VERDICT r3 weak #6) — consumers can detect staleness.
        "jaxlib": getattr(jaxlib, "__version__", "unknown"),
        "levels": policy,
    }
    if cache_path:
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2, sort_keys=True)
        os.replace(tmp, cache_path)
    return result


def load_policy(path: str) -> Optional[dict]:
    if not path or not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def policy_to_lowres(policy: dict) -> Dict[str, dict]:
    """Policy -> the per-level lowres params `AdaptiveDehazer._branch_applies`
    consumes: {level: {scale, mode, radius}} for levels not chosen 'full'."""
    out: Dict[str, dict] = {}
    for level, entry in (policy.get("levels") or {}).items():
        if entry.get("choice", "full") == "full":
            continue
        out[level] = {"scale": int(entry.get("scale", 2)),
                      "mode": entry.get("mode", "guided"),
                      "radius": int(entry.get("radius", 4))}
    return out
