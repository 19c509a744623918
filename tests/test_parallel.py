"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.parallel.expert_parallel import (
    ExpertParallelRouter,
    split_devices,
)
from adam_dehaze_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_auto():
    mesh = make_mesh({"data": 0, "spatial": 1, "model": 1})
    assert mesh.shape == {"data": 8, "spatial": 1, "model": 1}
    mesh2 = make_mesh({"data": 0, "spatial": 2, "model": 2})
    assert mesh2.shape == {"data": 2, "spatial": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "spatial": 1, "model": 1})


def test_shard_batch_and_replicate(rng):
    mesh = make_mesh({"data": 4, "spatial": 2, "model": 1})
    batch = {
        "hazy": rng.random((8, 16, 16, 3), dtype=np.float32),
        "intensity": np.zeros(8, np.int32),
    }
    sharded = shard_batch(mesh, batch)
    assert sharded["hazy"].sharding.spec == jax.sharding.PartitionSpec(
        "data", "spatial", None, None)
    params = replicate(mesh, {"w": jnp.ones((4, 4))})
    assert params["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_dp_sp_train_step_conv_model(rng, key):
    """A conv train step compiles and runs under DP+SP sharding and matches
    the single-device result (halo exchange correctness)."""
    from flax import linen as nn

    from adam_dehaze_tpu.parallel.data_parallel import shard_train_step

    class TinyConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))(x)
            x = nn.relu(x)
            x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)))(x)
            return x

    model = TinyConv()
    x0 = rng.random((8, 16, 16, 3), dtype=np.float32)
    y0 = rng.random((8, 16, 16, 3), dtype=np.float32)
    params = model.init(key, jnp.asarray(x0))

    def step(params, batch, _key):
        def loss(p):
            out = model.apply(p, batch["x"])
            return jnp.mean((out - batch["y"]) ** 2)
        g = jax.grad(loss)(params)
        new = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, params, g)
        return new, jax.tree_util.tree_map(lambda v: jnp.mean(v), g)

    batch = {"x": jnp.asarray(x0), "y": jnp.asarray(y0)}
    ref_params, _ = jax.jit(step)(params, batch, key)

    mesh = make_mesh({"data": 4, "spatial": 2, "model": 1})
    sharded_step = shard_train_step(step, mesh, batch)
    new_params, _ = sharded_step(params, batch, key)

    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_split_devices():
    groups = split_devices(n_groups=3)
    assert sum(len(g) for g in groups) == 8
    assert [len(g) for g in groups] == [3, 3, 2]
    overlap = set(map(id, groups[0])) & set(map(id, groups[1]))
    assert not overlap


def test_expert_parallel_router_matches_local(key, rng):
    from adam_dehaze_tpu.models.branches import LightweightDehazeModel

    modules = {
        "low": LightweightDehazeModel(base_channels=4, n_blocks=1),
        "medium": LightweightDehazeModel(base_channels=6, n_blocks=1),
        "high": LightweightDehazeModel(base_channels=8, n_blocks=1),
    }
    x = jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32))
    variables = {n: m.init(jax.random.PRNGKey(i), x)
                 for i, (n, m) in enumerate(modules.items())}

    def fake_classifier(img):
        b = img.mean(axis=(1, 2, 3))
        return jnp.stack([b, 2 * b, 3 * b], axis=1), None

    ep = ExpertParallelRouter(modules, variables, fake_classifier,
                              temperature=0.5)
    dehazed, info = ep(x)

    # Local (single-device) soft routing reference.
    logits, _ = fake_classifier(x)
    w = jax.nn.softmax(logits / 0.5, axis=1)
    want = sum(np.asarray(w[:, i, None, None, None]) *
               np.asarray(modules[n].apply(variables[n], x))
               for i, n in enumerate(["low", "medium", "high"]))
    np.testing.assert_allclose(np.asarray(dehazed), want, rtol=1e-5, atol=1e-6)
