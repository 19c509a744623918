"""Spatially-sharded large-image inference equals the unsharded forward."""
import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.models.branches import MediumIntensityDehazeModel
from adam_dehaze_tpu.parallel.mesh import make_mesh
from adam_dehaze_tpu.parallel.spatial import make_spatial_infer, shard_image_batch


def test_spatial_sharded_inference_matches(key, rng):
    mesh = make_mesh({"data": 2, "spatial": 4, "model": 1})
    model = MediumIntensityDehazeModel(base_channels=8)
    # "Large" image for the test mesh: H sharded 4-way.
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    vars_ = model.init(key, x)

    ref = model.apply(vars_, x)

    infer = make_spatial_infer(lambda img: model.apply(vars_, img), mesh)
    xs = shard_image_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(
        "data", "spatial", None, None)
    out = infer(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
