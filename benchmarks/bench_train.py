#!/usr/bin/env python
"""Training-throughput measurement: full joint train step (classifier +
router + 3 branches + VGG/LPIPS joint loss + Adam) on the real chip.
Records images/sec for PARITY.md; not the official bench."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 16
SIZE = 256


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.losses.dehazing import get_joint_loss
    from adam_dehaze_tpu.training.state import TrainState, make_optimizer
    from adam_dehaze_tpu.training.train_joint import build_router_state, make_train_step

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"
    config["dataset"]["img_size"] = SIZE

    key = jax.random.PRNGKey(0)
    router, state, tx = build_router_state(config, key)
    joint_loss = get_joint_loss(config)
    loss_params = joint_loss.init(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))
    step = make_train_step(router, tx, joint_loss, loss_params,
                           augmentation=True)

    batch = {
        "hazy": jax.random.uniform(key, (BATCH, SIZE, SIZE, 3)),
        "clear": jax.random.uniform(jax.random.PRNGKey(2),
                                    (BATCH, SIZE, SIZE, 3)),
        "dehazed": jnp.zeros((BATCH, SIZE, SIZE, 3)),
        "intensity": jnp.arange(BATCH) % 3,
    }

    def _sync(st):
        # Axon: a device->host scalar fetch is the only reliable sync
        # (block_until_ready alone does not force pure-jit chains).
        return float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0]))

    for _ in range(3):
        state, metrics = step(state, batch, key)
    _sync(state)
    start = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    _sync(state)
    sec = (time.perf_counter() - start) / iters
    print(json.dumps({
        "metric": "joint_train_images_per_sec_256",
        "value": round(BATCH / sec, 2),
        "sec_per_step": round(sec, 4),
        "loss": float(metrics["total"]),
    }))


if __name__ == "__main__":
    main()
