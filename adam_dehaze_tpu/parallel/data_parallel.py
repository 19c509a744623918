"""Data/spatial-parallel training over a device mesh.

jit + sharding annotations (no pmap): the batch is sharded over
('data', 'spatial'), parameters/optimiser state are replicated, and XLA
inserts the gradient all-reduce (psum over 'data') and convolution halo
exchanges (over 'spatial') from the sharding propagation — the scaling-book
recipe. No NCCL-style explicit collectives anywhere.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adam_dehaze_tpu.parallel.mesh import batch_spec


def shard_train_step(step_fn: Callable, mesh: Mesh,
                     batch_template: Dict) -> Callable:
    """Wrap a pure (state, batch, key) -> (state, metrics) train step with
    mesh shardings.

    `batch_template` gives the batch keys/ranks so each entry gets the right
    PartitionSpec (images over data+spatial, vectors over data).
    """
    repl = NamedSharding(mesh, P())
    batch_shardings = {}
    for k, v in batch_template.items():
        ndim = getattr(v, "ndim", None)
        if ndim == 4:
            batch_shardings[k] = NamedSharding(mesh, batch_spec())
        elif ndim and ndim >= 1:
            batch_shardings[k] = NamedSharding(mesh, P("data"))
        else:
            batch_shardings[k] = repl

    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
    )


def shard_eval_step(step_fn: Callable, mesh: Mesh,
                    batch_template: Dict) -> Callable:
    repl = NamedSharding(mesh, P())
    batch_shardings = {}
    for k, v in batch_template.items():
        ndim = getattr(v, "ndim", None)
        if ndim == 4:
            batch_shardings[k] = NamedSharding(mesh, batch_spec())
        elif ndim and ndim >= 1:
            batch_shardings[k] = NamedSharding(mesh, P("data"))
        else:
            batch_shardings[k] = repl
    return jax.jit(step_fn, in_shardings=(repl, batch_shardings),
                   out_shardings=repl)
