"""Pipeline parallelism for the serving path.

The reference has no pipeline structure at all (SURVEY.md §2.3: branches run
sequentially even in SoftRouter). The adaptive pipeline is naturally two
stages — (1) fog classifier, (2) routed dehazing branches — so serving can
pipeline them across two device groups: while group B dehazes batch i,
group A is already classifying batch i+1. JAX's asynchronous dispatch gives
the overlap; this class handles placement and the one-batch skew.

Testable on the virtual CPU mesh: outputs must equal the unpipelined path.
"""
from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TwoStagePipeline:
    """classifier (stage A devices) -> soft-blend dehaze (stage B devices).

    Args:
      classifier_apply: x -> (logits, features); params bound.
      branch_applies: [low, medium, high]: x -> dehazed; params bound.
      temperature: soft-routing temperature.
      devices: devices to split between the two stages (default: all).
    """

    def __init__(self, classifier_apply: Callable,
                 branch_applies: Sequence[Callable],
                 temperature: float = 0.5,
                 devices: Optional[Sequence] = None):
        devices = list(devices if devices is not None else jax.devices())
        half = max(len(devices) // 2, 1)
        self.stage_a = devices[:half]
        self.stage_b = devices[half:] or devices[:1]
        mesh_a = Mesh(np.array(self.stage_a), ("data",))
        mesh_b = Mesh(np.array(self.stage_b), ("data",))
        self._repl_a = NamedSharding(mesh_a, P())
        self._repl_b = NamedSharding(mesh_b, P())

        self._classify = jax.jit(lambda x: classifier_apply(x)[0])

        def dehaze(x, logits):
            w = jax.nn.softmax(logits / temperature, axis=1)
            ys = [f(x) for f in branch_applies]
            return sum(w[:, i, None, None, None] * y for i, y in enumerate(ys))

        self._dehaze = jax.jit(dehaze)

    def _stage_a(self, x):
        xa = jax.device_put(x, self._repl_a)
        return xa, self._classify(xa)

    def _stage_b(self, x, logits):
        xb = jax.device_put(x, self._repl_b)
        lb = jax.device_put(logits, self._repl_b)
        return self._dehaze(xb, lb)

    def run(self, batches: Iterable) -> Iterator[jax.Array]:
        """Stream batches through the two stages with one-batch skew; yields
        dehazed batches in order."""
        in_flight: Optional[Tuple] = None
        for x in batches:
            x = jnp.asarray(x)
            staged = self._stage_a(x)  # enqueued on stage-A devices
            if in_flight is not None:
                yield self._stage_b(*in_flight)
            in_flight = staged
        if in_flight is not None:
            yield self._stage_b(*in_flight)

    def __call__(self, x) -> jax.Array:
        """Single batch (no pipelining benefit; correctness path)."""
        return self._stage_b(*self._stage_a(jnp.asarray(x)))
