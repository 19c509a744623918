"""Spatially-sharded inference for large images.

The image analogue of sequence parallelism (SURVEY.md §5 "long-context"):
images too large for one chip's HBM/VMEM budget are sharded along H across
the mesh's 'spatial' axis; XLA's sharding propagation inserts the halo
exchanges the convolutions need, so results are bitwise-equal to the
unsharded forward (verified in tests on the virtual mesh).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_infer(apply_fn: Callable, mesh: Mesh,
                       spatial_axis: str = "spatial",
                       data_axis: str = "data") -> Callable:
    """Wrap a bound (N, H, W, 3) -> (N, H, W, 3) model apply with
    batch-over-data + H-over-spatial sharding.

    H must be divisible by the spatial axis size (pad the image otherwise).
    """
    in_sh = NamedSharding(mesh, P(data_axis, spatial_axis, None, None))
    return jax.jit(apply_fn, in_shardings=in_sh, out_shardings=in_sh)


def shard_image_batch(mesh: Mesh, images, spatial_axis: str = "spatial",
                      data_axis: str = "data"):
    """Place an image batch with DP+SP sharding."""
    return jax.device_put(
        images, NamedSharding(mesh, P(data_axis, spatial_axis, None, None)))
