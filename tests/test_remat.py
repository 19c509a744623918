"""Rematerialisation options.

- full remat (`tpu.remat: true`): step-level jax.checkpoint — gradients
  identical to the plain step.
- selective remat (`tpu.remat: fullres`): STRUCTURAL — branch models build
  their full-resolution blocks as nn.remat twins (nn/blocks.py:remat_twin).
  Must preserve the parameter tree exactly (checkpoints restore across the
  flag), match plain outputs/gradients, and actually shed full-resolution
  residuals (the checkpoint_name policy approach measurably did NOT —
  DESIGN.md §15).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adam_dehaze_tpu.config import default_config
from adam_dehaze_tpu.losses.dehazing import get_dehazing_loss
from adam_dehaze_tpu.models.branches import create_low_intensity_model
from adam_dehaze_tpu.training.state import TrainState, make_optimizer
from adam_dehaze_tpu.training.train_dehazing import make_train_step


def _cfg(remat=False):
    cfg = default_config()
    cfg["tpu"].update(use_pallas=False, compute_dtype="float32", remat=remat)
    cfg["dehazing"]["low"].update(channels=4, blocks=1)
    return cfg


def test_remat_matches_plain(key, rng):
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    batch = {"hazy": x,
             "clear": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
             "dehazed": x,
             "intensity": jnp.zeros((2,), jnp.int32)}
    results = []
    for remat in (False, True, "fullres"):
        cfg = _cfg(remat)
        model = create_low_intensity_model(cfg)
        # paths are identical across the flag, so one init tree serves all
        variables = model.init(key, x)
        loss = get_dehazing_loss(cfg)
        loss_params = loss.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
        tx = make_optimizer(1e-3)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]))
        step = make_train_step(model, tx, loss, loss_params,
                               augmentation=False, remat=remat, img_size=32)
        new_state, comps = step(state, batch, key)
        results.append((new_state.params, float(comps["total"])))

    (p0, l0) = results[0]
    for p1, l1 in results[1:]:
        assert abs(l0 - l1) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_remat_twin_preserves_param_tree(key):
    """nn.remat renames module classes (param-path fork!); remat_twin must
    keep init trees byte-identical so checkpoints restore across the flag."""
    x = jnp.ones((1, 16, 16, 3))
    plain = create_low_intensity_model(_cfg(False))
    twin = create_low_intensity_model(_cfg("fullres"))
    vp = plain.init(key, x)
    vt = twin.init(key, x)
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vt))
    for a, b in zip(jax.tree_util.tree_leaves(vp),
                    jax.tree_util.tree_leaves(vt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fullres_model_matches_plain_forward_and_grad(key, rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    plain = create_low_intensity_model(_cfg(False))
    twin = create_low_intensity_model(_cfg("fullres"))
    variables = plain.init(key, x)

    def run(model, v):
        return model.apply(v, x, True, mutable=["batch_stats"])[0]

    np.testing.assert_allclose(np.asarray(run(plain, variables)),
                               np.asarray(run(twin, variables)),
                               rtol=1e-6, atol=1e-7)

    def loss(model):
        return lambda p: jnp.sum(run(model, {
            "params": p, "batch_stats": variables["batch_stats"]}))

    gp = jax.grad(loss(plain))(variables["params"])
    gt = jax.grad(loss(twin))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_selective_remat_saves_fullres_residuals(key):
    """The structural twins must shed full-resolution float residuals
    (introspected with saved_residuals; full remat sheds at least as much)."""
    try:
        from jax._src.ad_checkpoint import saved_residuals
    except ImportError:
        pytest.skip("saved_residuals introspection unavailable")

    x = jnp.ones((1, 16, 16, 3))
    plain = create_low_intensity_model(_cfg(False))
    twin = create_low_intensity_model(_cfg("fullres"))
    variables = plain.init(key, x)

    def bytes_fullres(model, wrap=None):
        def fwd(params, xx):
            return jnp.sum(model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xx, True, mutable=["batch_stats"])[0])
        if wrap:
            fwd = wrap(fwd)
        res = saved_residuals(fwd, variables["params"], x)
        return sum(v.size * v.dtype.itemsize for (v, _) in res
                   if getattr(v, "ndim", 0) == 4 and v.shape[1] == 16
                   and str(v.dtype) == "float32" and v.shape[-1] >= 4)

    b_plain = bytes_fullres(plain)
    b_twin = bytes_fullres(twin)
    b_full = bytes_fullres(plain, wrap=jax.checkpoint)
    assert b_plain > 0
    assert b_twin < b_plain, (b_twin, b_plain)
    assert b_full <= b_twin, (b_full, b_twin)
