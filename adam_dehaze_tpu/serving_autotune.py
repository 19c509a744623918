"""Measurement-gated serving dispatch, automated.

Every serving-path choice in this repo came from a fair-dtype A/B probe on
the attached chip (tools/probe_*.py; e.g. the medium branch stays canonical
because the XLA s2d tail measured slower IN CONTEXT, ROUND3.md). Those
decisions are correct for the probed backend, batch shape, dtype, and
channel widths — and silently stale for any other combination (a new TPU
generation, CPU fallback, a retrained model with different
`base_channels`, int8 weights...).

This module runs the same A/B at deployment time on the ACTUAL attached
backend and caches the winner per branch:

    from adam_dehaze_tpu.serving_autotune import load_or_tune
    fn, report = load_or_tune(model, variables, dtype=jnp.bfloat16,
                              sample_shape=(16, 256, 256, 3),
                              cache_path="exp/serving_autotune.json")

or transparently through the product API:

    d = AdaptiveDehazer.from_experiment("experiments/x", autotune=True)

Candidates are the equivalence-tested serving paths (every one is pinned
to the canonical forward by tests/test_s2d.py, test_pallas_kernels.py,
test_tail_chain.py), so autotuning can never change results beyond
compute-dtype rounding — only speed. Timing uses the axon-safe sync
discipline (device->host scalar fetch, CLAUDE.md): `jax.block_until_ready`
alone under-measures pure-jit chains on remote runtimes.

The cache key includes backend, model class, channel width, dtype, and
sample shape; a cache hit skips all timing (and therefore all extra
compiles) on subsequent loads.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _sync(out) -> float:
    """Force execution on remote runtimes: fetch a scalar."""
    return float(jnp.sum(out))


def candidate_builders(model, variables, dtype) -> Dict[str, Callable]:
    """name -> zero-arg builder returning a serving apply for `model`.

    Builders may raise (Pallas alignment constraints, unsupported
    architecture); the tuner skips those candidates. Pallas-kernel
    candidates are only offered on TPU — interpret mode is a correctness
    tool, not a serving path.
    """
    from adam_dehaze_tpu.models.branches import (
        HighIntensityDehazeModel,
        LightweightDehazeModel,
        MediumIntensityDehazeModel,
    )
    from adam_dehaze_tpu.ops import s2d

    on_tpu = jax.default_backend() == "tpu"
    cands: Dict[str, Callable] = {
        "canonical": lambda: (
            lambda x: model.apply(variables, x, train=False)),
    }
    if isinstance(model, LightweightDehazeModel):
        cands["s2d"] = lambda: s2d.make_lightweight_s2d_apply(
            variables, dtype=dtype)
        if on_tpu:
            from adam_dehaze_tpu.ops.pallas.s2d_chain import (
                make_lightweight_chain_apply,
            )
            cands["chain"] = lambda: make_lightweight_chain_apply(
                variables, dtype=dtype)
    elif isinstance(model, MediumIntensityDehazeModel):
        cands["s2d"] = lambda: s2d.make_medium_s2d_apply(
            model, variables, dtype=dtype)
        if on_tpu:
            cands["chain_hybrid"] = lambda: s2d.make_medium_chain_apply(
                model, variables, dtype=dtype)
            cands["s2d_tail_chain"] = lambda: s2d.make_medium_s2d_apply(
                model, variables, dtype=dtype, tail_chain=True)
    elif isinstance(model, HighIntensityDehazeModel):
        cands["s2d"] = lambda: s2d.make_high_s2d_apply(
            model, variables, dtype=dtype)
        if on_tpu:
            cands["s2d_res_chain_e2b"] = lambda: s2d.make_high_s2d_apply(
                model, variables, dtype=dtype, res_chain=("e2b",))
            cands["s2d_tail_chain"] = lambda: s2d.make_high_s2d_apply(
                model, variables, dtype=dtype, tail_chain=True)
            cands["s2d_res_e2b_tail_chain"] = (
                lambda: s2d.make_high_s2d_apply(
                    model, variables, dtype=dtype, res_chain=("e2b",),
                    tail_chain=True))
    return cands


def _cache_key(model, dtype, sample_shape) -> str:
    base = getattr(model, "base_channels", 0)
    shape = "x".join(str(int(s)) for s in sample_shape)
    # device_kind distinguishes TPU generations (v5e vs v6e ...): a cached
    # winner is exactly as stale across generations as across backends.
    # jaxlib version keys compiler updates the same way (VERDICT r3 weak
    # #6: e.g. the pallas-in-switch scheduling-barrier loss could flip when
    # Mosaic changes) — a toolchain bump invalidates the cache and the next
    # autotune pass re-probes.
    kind = jax.devices()[0].device_kind.replace(" ", "_")
    import jaxlib
    jl = getattr(jaxlib, "__version__", "unknown")
    return (f"{jax.default_backend()}:{kind}:jaxlib{jl}:"
            f"{type(model).__name__}:{base}:"
            f"{jnp.dtype(dtype).name}:{shape}")


def _read_cache(cache_path: Optional[str]) -> Dict:
    if not cache_path or not os.path.exists(cache_path):
        return {}
    try:
        with open(cache_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def load_cached(model, variables, dtype, sample_shape, cache_path):
    """Read-only cache consultation: (apply_fn, entry) when the cache holds
    a buildable winner for this key, else (None, None). Never times, never
    writes — bench.py uses this so the driver benchmark adopts on-chip
    autotune decisions without timing candidates itself."""
    hit = _read_cache(cache_path).get(_cache_key(model, dtype, sample_shape))
    if not hit:
        return None, None
    cands = candidate_builders(model, variables, dtype)
    if hit.get("best") not in cands:
        return None, None
    return cands[hit["best"]](), {**hit, "cached": True}


def autotune(model, variables, dtype, sample_shape,
             iters: int = 5, warm: int = 2,
             candidates: Optional[Dict[str, Callable]] = None,
             ) -> Tuple[str, Dict[str, float]]:
    """Time every candidate at `sample_shape`; return (winner, ms table,
    winner_fn). winner_fn is the ALREADY-JITTED (and compiled, at
    sample_shape) timed function — callers should reuse it rather than
    rebuild, since axon compiles are terminal-side and expensive
    (CLAUDE.md).

    Candidates that fail to build or run land in the table as `null` and
    never win. All contenders run at the same serving dtype (the
    fair-dtype rule, ROUND3.md)."""
    cands = candidates or candidate_builders(model, variables, dtype)
    x = jax.random.uniform(jax.random.PRNGKey(0), tuple(sample_shape),
                           jnp.float32)
    table: Dict[str, Optional[float]] = {}
    best: Tuple[Optional[str], float, Optional[Callable]] = (
        None, float("inf"), None)
    for name, build in cands.items():
        try:
            fn = jax.jit(build())
            out = None
            for _ in range(warm):
                out = fn(x)
            _sync(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x)
            _sync(out)
            ms = (time.perf_counter() - t0) / iters * 1000.0
            table[name] = round(ms, 4)
            if ms < best[1]:
                best = (name, ms, fn)
        except Exception as e:  # alignment constraint, OOM, ...
            table[name] = None
            table[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    if best[0] is None:
        raise RuntimeError(f"no serving candidate ran: {table}")
    return best[0], table, best[2]


def load_or_tune(model, variables, dtype, sample_shape,
                 cache_path: Optional[str] = None,
                 iters: int = 5, warm: int = 2):
    """Return (apply_fn, report). A cache hit skips timing entirely; on a
    miss the returned fn is the jitted winner that was timed (already
    compiled at sample_shape — no second compile)."""
    key = _cache_key(model, dtype, sample_shape)
    cache = _read_cache(cache_path)
    cands = candidate_builders(model, variables, dtype)
    hit = cache.get(key)
    if hit and hit.get("best") in cands:
        fn = cands[hit["best"]]()
        return fn, {**hit, "cached": True}

    best_name, table, best_fn = autotune(
        model, variables, dtype, sample_shape,
        iters=iters, warm=warm, candidates=cands)
    report = {"best": best_name, "table": table, "cached": False}
    if cache_path:
        cache[key] = {"best": best_name, "table": table}
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=2, sort_keys=True)
        os.replace(tmp, cache_path)
    return best_fn, report
