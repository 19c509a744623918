"""Rematerialisation option: gradients identical with and without remat."""
import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.losses.dehazing import get_dehazing_loss
from adam_dehaze_tpu.models.branches import create_low_intensity_model
from adam_dehaze_tpu.training.state import TrainState, make_optimizer
from adam_dehaze_tpu.training.train_dehazing import make_train_step


def test_remat_matches_plain(key, rng):
    cfg = default_config()
    cfg["tpu"].update(use_pallas=False, compute_dtype="float32")
    cfg["dehazing"]["low"].update(channels=4, blocks=1)
    model = create_low_intensity_model(cfg)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    variables = model.init(key, x)
    loss = get_dehazing_loss(cfg)
    loss_params = loss.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    tx = make_optimizer(1e-3)

    batch = {"hazy": x,
             "clear": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
             "dehazed": x,
             "intensity": jnp.zeros((2,), jnp.int32)}
    results = []
    for remat in (False, True):
        # Fresh buffers each round: the train step donates its input state,
        # so sharing `variables`' arrays across rounds would step deleted
        # buffers the second time.
        fresh = jax.tree_util.tree_map(jnp.copy, variables)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=fresh["params"],
                           batch_stats=fresh["batch_stats"],
                           opt_state=tx.init(fresh["params"]))
        step = make_train_step(model, tx, loss, loss_params,
                               augmentation=False, remat=remat)
        new_state, comps = step(state, batch, key)
        results.append((new_state.params, float(comps["total"])))

    (p0, l0), (p1, l1) = results
    assert abs(l0 - l1) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
