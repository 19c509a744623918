"""Device-mesh construction and sharding rules.

The reference is single-device by construction (`cuda:1`,
reference: config/config.yaml:85; SURVEY.md §2.3) — this layer is new design,
not a port. Axes:

- `data`    — batch dimension (pure data parallelism; gradient psum rides ICI
              via XLA's sharding propagation).
- `spatial` — image H dimension (spatial partitioning; XLA inserts halo
              exchanges for the convolutions automatically).
- `model`   — reserved for channel/tensor parallelism of the widest stages.

`mesh.data: 0` in the config means "all remaining devices".
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "spatial", "model")


def make_mesh(sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over `devices` with the requested axis sizes.

    sizes: {axis: n}, where one axis may be 0 = "all remaining devices".
    Defaults to pure data parallelism over every device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = dict(sizes or {})
    for ax in AXES:
        sizes.setdefault(ax, 1 if ax != "data" else 0)
    fixed = int(np.prod([s for s in sizes.values() if s > 0]))
    free_axes = [ax for ax, s in sizes.items() if s == 0]
    if len(free_axes) > 1:
        raise ValueError("At most one mesh axis may be 0 (auto)")
    if free_axes:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {sizes}")
        sizes[free_axes[0]] = n // fixed
    total = int(np.prod([sizes[ax] for ax in AXES]))
    if total != n:
        raise ValueError(f"Mesh {sizes} needs {total} devices, have {n}")
    dev_array = np.array(devices).reshape([sizes[ax] for ax in AXES])
    return Mesh(dev_array, AXES)


def mesh_from_config(config, devices=None) -> Mesh:
    return make_mesh(config.get("tpu", {}).get("mesh"), devices)


def batch_spec() -> P:
    """Images (N, H, W, C): batch over data, H over spatial."""
    return P("data", "spatial", None, None)


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    return {
        "images": NamedSharding(mesh, batch_spec()),
        "labels": NamedSharding(mesh, P("data")),
        "replicated": NamedSharding(mesh, P()),
    }


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place a host batch onto the mesh with DP+SP sharding."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim == 4:
            out[k] = jax.device_put(v, sh["images"])
        elif hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, sh["labels"])
        else:
            out[k] = v
    return out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
