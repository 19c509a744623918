"""Minimal on-chip compile probe for the fused high tail chain
(ops/pallas/tail_chain.py): random-init model, one jitted apply at the
serving geometry. Exists to bisect Mosaic compile crashes without paying
probe_tail.py's full stage ladder."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from adam_dehaze_tpu.models.branches import HighIntensityDehazeModel
from adam_dehaze_tpu.ops.pallas.tail_chain import make_high_tail_chain
from adam_dehaze_tpu.ops.s2d import depth_to_space, space_to_depth


def main():
    dt = jnp.bfloat16
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3),
                           jnp.float32)
    model = HighIntensityDehazeModel(use_pallas=True, dtype=dt)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    c = model.base_channels
    h2 = 128
    d1 = jax.random.normal(jax.random.PRNGKey(2), (1, h2, h2, 4 * c), dt)
    f0s = jax.random.normal(jax.random.PRNGKey(3), (1, h2, h2, 4 * c), dt)
    x2 = space_to_depth(x).astype(dt)
    tfn = make_high_tail_chain(model, variables, dtype=dt, strip=16)
    chain = jax.jit(lambda d, f, z: depth_to_space(tfn(d, f, z)))
    t0 = time.time()
    out = chain(d1, f0s, x2)
    print("COMPILED+RAN ok in", round(time.time() - t0, 1), "s; out",
          out.shape, float(jnp.sum(out)))


if __name__ == "__main__":
    main()
