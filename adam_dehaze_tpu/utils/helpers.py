"""Utility helpers: seeding, timing, model introspection.

TPU-native counterpart of the reference's utils/helpers.py:10-154. The fog
synthesis utilities live in data/synthetic.py (on-device, batched) instead of
the reference's per-image OpenCV loops (reference: utils/helpers.py:156-299).
"""
from __future__ import annotations

import os
import random
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key.

    JAX randomness is functional (explicit keys) so, unlike the reference
    (utils/helpers.py:10-19), determinism does not depend on global state;
    we still seed numpy/python for host-side shuffling.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def count_params(params) -> int:
    """Total number of scalars in a parameter pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def model_info(module, variables) -> Dict[str, Any]:
    """Model introspection dict (reference: BaseDehazeModel.get_info,
    models/dehazing/base_model.py:90-96): type, parameter counts, size."""
    params = variables.get("params", variables)
    n = count_params(params)
    info = {
        "model_type": type(module).__name__,
        "params": n,
        "trainable_params": n,  # all params train unless a mask says otherwise
        "size_mb": calculate_model_size(params),
    }
    for attr in ("base_channels", "n_blocks", "model_name", "num_classes"):
        if hasattr(module, attr):
            info[attr] = getattr(module, attr)
    return info


def calculate_model_size(params) -> float:
    """Model size in MB (reference: utils/helpers.py:110-121)."""
    total = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
    return total / 1024 ** 2


def calculate_inference_time(fn, *args, n_warmup: int = 10, n_samples: int = 100) -> float:
    """Average wall-clock seconds per call of a jitted `fn` on its args.

    Blocks on device completion each call (reference: utils/helpers.py:123-142
    used CUDA-synchronous timing; here we use block_until_ready).
    """
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n_samples):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n_samples


def get_device_memory_usage() -> Optional[Dict[str, float]]:
    """Per-device HBM usage in MB, where the backend reports it
    (reference: utils/helpers.py:144-154)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            return None
        if s:
            stats[str(d)] = {
                "allocated_mb": s.get("bytes_in_use", 0) / 1024 ** 2,
                "limit_mb": s.get("bytes_limit", 0) / 1024 ** 2,
            }
    return stats or None


def to_nhwc(x: np.ndarray) -> np.ndarray:
    """Convert a torch-style NCHW/CHW array to the framework's NHWC/HWC."""
    if x.ndim == 4:
        return np.transpose(x, (0, 2, 3, 1))
    if x.ndim == 3 and x.shape[0] in (1, 3):
        return np.transpose(x, (1, 2, 0))
    return x


def tree_cast(tree, dtype):
    """Cast all floating leaves of a pytree to `dtype`."""
    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)
