"""Expert parallelism for the three dehazing branches.

The router + 3-branch structure is exactly a 3-expert MoE (SURVEY.md §2.3).
The branches are architecturally heterogeneous (different channel widths and
depths), so they cannot be stacked into one weight tensor and sharded along
an expert axis the way homogeneous MoE layers are. Instead each branch is
compiled onto its own SUBMESH (a disjoint group of devices) and the three
executions overlap through XLA's asynchronous dispatch: the host enqueues
low/medium/high back-to-back, each group computes concurrently, and the
blend gathers the results.

For soft routing this turns the reference's sequential triple forward
(reference: models/routing.py:114-118) into three concurrent device-group
forwards — wall-clock ~max(branch) instead of sum(branch).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

INTENSITY_ORDER = ("low", "medium", "high")


def split_devices(devices: Optional[Sequence] = None, n_groups: int = 3) -> List[List]:
    """Partition devices into n contiguous groups (sizes as equal as possible)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_groups:
        # Fewer devices than experts: experts share devices round-robin.
        return [[devices[i % len(devices)]] for i in range(n_groups)]
    sizes = [len(devices) // n_groups] * n_groups
    for i in range(len(devices) % n_groups):
        sizes[i] += 1
    out, pos = [], 0
    for s in sizes:
        out.append(devices[pos:pos + s])
        pos += s
    return out


class ExpertParallelRouter:
    """Soft/hard adaptive routing with branches placed on disjoint submeshes.

    Args:
      branch_modules: {level: flax module}
      branch_variables: {level: {'params':..., 'batch_stats':...}}
      classifier_apply: bound fn x -> (logits, features) (runs on group 0).
      temperature: soft-routing temperature.
    """

    def __init__(self, branch_modules: Dict, branch_variables: Dict,
                 classifier_apply: Callable, temperature: float = 0.5,
                 devices: Optional[Sequence] = None):
        self.temperature = temperature
        groups = split_devices(devices, len(INTENSITY_ORDER))
        self.meshes = {}
        self.branch_fns = {}
        for level, group in zip(INTENSITY_ORDER, groups):
            mesh = Mesh(np.array(group).reshape(len(group)), ("data",))
            self.meshes[level] = mesh
            repl = NamedSharding(mesh, P())
            variables = jax.device_put(branch_variables[level], repl)
            module = branch_modules[level]
            # Computation follows the input's placement (submesh).
            self.branch_fns[level] = jax.jit(
                lambda x, m=module, v=variables: m.apply(v, x))
        self._cls = classifier_apply
        self._blend = jax.jit(
            lambda w, a, b, c: (w[:, 0, None, None, None] * a
                                + w[:, 1, None, None, None] * b
                                + w[:, 2, None, None, None] * c))

    def _input_sharding(self, level: str, batch: int) -> NamedSharding:
        """Shard the batch over the group when divisible, else replicate."""
        mesh = self.meshes[level]
        n = mesh.shape["data"]
        return NamedSharding(mesh, P("data") if batch % n == 0 else P())

    def __call__(self, x: jax.Array):
        """Soft-routed dehaze: (N, H, W, 3) -> (dehazed, info)."""
        logits, _ = self._cls(x)
        weights = jax.nn.softmax(logits / self.temperature, axis=1)
        # Enqueue all three branch programs; they run concurrently on their
        # disjoint device groups (async dispatch).
        outs = {}
        for level in INTENSITY_ORDER:
            xg = jax.device_put(x, self._input_sharding(level, x.shape[0]))
            outs[level] = self.branch_fns[level](xg)
        # Gather the branch outputs onto one submesh (device-to-device ICI
        # transfer, no host round-trip) and blend there.
        target = NamedSharding(self.meshes[INTENSITY_ORDER[0]], P())
        ys = [jax.device_put(outs[level], target) for level in INTENSITY_ORDER]
        w = jax.device_put(weights, target)
        blended = self._blend(w, *ys)
        return blended, {"weights": weights, "individual_outputs": outs}
