"""Gradients of the Pallas custom-vjp ops match their XLA references."""
import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.ops.pallas import blend, cbam


def test_spatial_gate_grad_matches_reference(key, monkeypatch):
    # Route the fused forward through interpret mode on CPU.
    original = cbam.spatial_gate_pallas
    monkeypatch.setattr(cbam, "spatial_gate_pallas",
                        lambda x, w: original(x, w, interpret=True))
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (1, 16, 16, 8), jnp.float32)
    w = jax.random.normal(k2, (7, 7, 2, 1), jnp.float32) * 0.1
    g = jax.random.normal(k3, (1, 16, 16, 8), jnp.float32)

    def f_fused(x, w):
        return jnp.sum(cbam.spatial_gate(x, w) * g)

    def f_ref(x, w):
        return jnp.sum(cbam.spatial_gate_reference(x, w) * g)

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4,
                               atol=1e-5)


def test_blend3_grad_matches_reference(key, monkeypatch):
    monkeypatch.setattr(
        blend, "blend3_pallas",
        lambda w, a, b, c: blend.blend3_reference(w, a, b, c))
    ks = jax.random.split(key, 5)
    w = jax.nn.softmax(jax.random.normal(ks[0], (2, 3)), -1)
    low = jax.random.uniform(ks[1], (2, 8, 8, 3))
    med = jax.random.uniform(ks[2], (2, 8, 8, 3))
    high = jax.random.uniform(ks[3], (2, 8, 8, 3))
    g = jax.random.normal(ks[4], (2, 8, 8, 3))

    def f_fused(w, low, med, high):
        return jnp.sum(blend.blend3(w, low, med, high) * g)

    def f_ref(w, low, med, high):
        return jnp.sum(blend.blend3_reference(w, low, med, high) * g)

    grads = jax.grad(f_fused, argnums=(0, 1, 2, 3))(w, low, med, high)
    refs = jax.grad(f_ref, argnums=(0, 1, 2, 3))(w, low, med, high)
    for a, b in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
