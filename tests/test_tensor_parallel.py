"""Tensor (channel) parallelism of the branch bottlenecks over the 'model'
mesh axis."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from adam_dehaze_tpu.models.branches import MediumIntensityDehazeModel
from adam_dehaze_tpu.parallel.mesh import make_mesh
from adam_dehaze_tpu.parallel.sharding import channel_sharding, shard_channels


def test_shard_channels_noop_outside_context(key):
    x = jax.random.uniform(key, (1, 8, 8, 4))
    assert shard_channels(x) is x


def test_branch_forward_under_tp(key):
    mesh = make_mesh({"data": 2, "spatial": 1, "model": 4})
    model = MediumIntensityDehazeModel(base_channels=8)
    x = jax.random.uniform(key, (2, 32, 32, 3))
    vars_ = model.init(key, x)

    y_ref = model.apply(vars_, x)

    with channel_sharding(mesh):
        f = jax.jit(
            lambda v, img: model.apply(v, img),
            in_shardings=(NamedSharding(mesh, P()),
                          NamedSharding(mesh, P("data", None, None, None))),
            out_shardings=NamedSharding(mesh, P()))
        y_tp = f(vars_, x)

    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_channel_sharding_degrades_without_model_axis(key):
    mesh = make_mesh({"data": 8, "spatial": 1, "model": 1})
    with channel_sharding(mesh):
        x = jax.random.uniform(key, (1, 8, 8, 4))
        # model axis size 1 -> context is a no-op.
        assert shard_channels(x) is x
