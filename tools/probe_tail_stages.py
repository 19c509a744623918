"""On-chip stage bisection for the high tail-chain Mosaic compile crash.

Compiles make_high_tail_chain with cumulative stage subsets (the `stages`
debug hook) until one fails — the first failing addition names the stage
whose ops Mosaic's vector-layout pass rejects. Individual-stage rows then
confirm whether the stage fails alone or only in combination.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from adam_dehaze_tpu.models.branches import HighIntensityDehazeModel  # noqa: E402
from adam_dehaze_tpu.ops.pallas.tail_chain import make_high_tail_chain  # noqa: E402
from adam_dehaze_tpu.ops.s2d import depth_to_space, space_to_depth  # noqa: E402

ORDER = ("up", "res", "attn_gate", "attn_spatial", "head1", "head2",
         "guid", "out")


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

    def attempt(stages):
        tfn = make_high_tail_chain(model, variables, dtype=dt, strip=16,
                                   stages=stages)
        fn = jax.jit(lambda d, f, z: depth_to_space(tfn(d, f, z)))
        t0 = time.time()
        out = fn(d1, f0s, x2)
        s = float(jnp.sum(out))
        return time.time() - t0, s

    sets = [tuple(ORDER[:i + 1]) for i in range(len(ORDER))]
    if "--single" in sys.argv:
        sets = [(s,) for s in ORDER]
    for stages in sets:
        try:
            dt_s, s = attempt(stages)
            print(f"PASS {'+'.join(stages)}  ({dt_s:.1f}s, sum={s:.3f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL {'+'.join(stages)}  {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
