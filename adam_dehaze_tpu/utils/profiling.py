"""Tracing/profiling and debug utilities.

Replaces the reference's minimal timing helpers
(reference: utils/helpers.py:110-154) with:
- `trace(log_dir)`: a jax.profiler trace context (view in TensorBoard or
  Perfetto).
- `benchmark(fn, *args)`: wall-clock + imgs/sec with block_until_ready.
- `enable_debug_checks()`: jax NaN/inf checking (the framework's answer to
  "race detection/sanitizers: n/a for single-program XLA; numeric sanitizers
  instead", SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, n_warmup: int = 5, n_iters: int = 20,
              batch_dim: int = 0) -> Dict[str, float]:
    """Time a jitted callable; returns seconds/call and items/sec."""
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - start) / n_iters
    items = args[0].shape[batch_dim] if args and hasattr(args[0], "shape") else 1
    return {
        "sec_per_call": per_call,
        "ms_per_item": per_call / items * 1000.0,
        "items_per_sec": items / per_call,
    }


def enable_debug_checks(nans: bool = True, disable_jit: bool = False):
    """Turn on numeric sanitizers (debug_nans) and optionally disable jit for
    step-through debugging."""
    jax.config.update("jax_debug_nans", nans)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def model_flops(fn: Callable, *args) -> Optional[float]:
    """Total FLOPs of one call of a jittable fn, from XLA's cost analysis
    (the reference reports per-branch GFLOPs, README.md:146-148 — this is the
    measurement tool for parity tables). Returns None if the backend does not
    report cost analysis."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def device_flops_estimate() -> float:
    """Rough peak bf16 FLOP/s for the attached device (v5e default)."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "")
    table = {
        "TPU v5 lite": 394e12 / 2,   # v5e bf16 ~197 TFLOPs
        "TPU v4": 275e12,
        "TPU v6": 918e12,
    }
    for k, v in table.items():
        if k in str(kind):
            return v
    return 100e12
