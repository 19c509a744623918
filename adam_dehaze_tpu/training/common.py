"""Shared trainer plumbing: state (de)serialisation and batch transfer."""
from __future__ import annotations

from typing import Any, Dict

import flax
import jax.numpy as jnp
import numpy as np


def state_to_tree(state) -> Dict[str, Any]:
    """TrainState (incl. optax state) -> plain nested dict for orbax."""
    return flax.serialization.to_state_dict(state)


def tree_to_state(template_state, tree):
    """Plain dict from orbax -> TrainState with the template's structure."""
    return flax.serialization.from_state_dict(template_state, tree)


def device_batch(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Strip non-array fields and move arrays to device (NHWC float32)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jnp.asarray(v)
    return out


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid rows of a padded batch."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def device_prefetch(loader, depth: int = 2):
    """Iterate a host DataLoader with device-side lookahead: the next batch's
    host->device transfer overlaps the current step's compute (JAX transfers
    are async). Yields device batches."""
    import collections
    queue = collections.deque()
    it = iter(loader)
    try:
        for _ in range(depth):
            queue.append(device_batch(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(device_batch(next(it)))
        except StopIteration:
            pass
        yield batch
