"""Tensor-parallel sharding hooks for model code.

Model definitions stay mesh-agnostic; a trainer/benchmark that wants channel
(tensor) parallelism activates `channel_sharding(mesh)` around tracing and
the branch bottlenecks then constrain their widest activations to shard the
channel dim over the mesh's 'model' axis. XLA propagates the weight sharding
and inserts the collectives.

This is the TP story for a conv framework: the 4x-width bottleneck stages
(e.g. 384 channels in the medium branch, reference: medium_intensity.py:32-45
analogue) are the only tensors wide enough to be worth splitting.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Optional[NamedSharding] = None


@contextlib.contextmanager
def channel_sharding(mesh: Mesh, axis: str = "model"):
    """Within this context, `shard_channels` constrains NHWC activations to
    shard C over `axis`. Trace (jit) the model inside the context.

    The spec COMPOSES with the DP+SP batch sharding: batch stays on 'data'
    and H on 'spatial' where those axes exist in the mesh. Constraining them
    to None would demand a replicating reshard that XLA's SPMD partitioner
    can only satisfy by involuntary full rematerialization of the activation
    (seen as spmd_partitioner.cc warnings in the r1 multichip dryrun)."""
    global _ACTIVE
    if axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        yield
        return

    def dim(name):
        return name if (name in mesh.axis_names and mesh.shape[name] > 1
                        and name != axis) else None

    prev = _ACTIVE
    _ACTIVE = NamedSharding(mesh, P(dim("data"), dim("spatial"), None, axis))
    try:
        yield
    finally:
        _ACTIVE = prev


def shard_channels(x: jax.Array) -> jax.Array:
    """Constrain an NHWC activation's channel dim (no-op outside the
    channel_sharding context)."""
    if _ACTIVE is None:
        return x
    return jax.lax.with_sharding_constraint(x, _ACTIVE)
