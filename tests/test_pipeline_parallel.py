import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.models.branches import LightweightDehazeModel
from adam_dehaze_tpu.parallel.pipeline import TwoStagePipeline


def _setup(key):
    models = {
        "low": LightweightDehazeModel(base_channels=4, n_blocks=1),
        "medium": LightweightDehazeModel(base_channels=6, n_blocks=1),
        "high": LightweightDehazeModel(base_channels=8, n_blocks=1),
    }
    x0 = jnp.zeros((2, 16, 16, 3))
    variables = {n: m.init(jax.random.PRNGKey(i), x0)
                 for i, (n, m) in enumerate(models.items())}
    applies = [
        (lambda v, m: (lambda img: m.apply(v, img)))(variables[n], models[n])
        for n in ("low", "medium", "high")
    ]

    def classifier(img):
        b = img.mean(axis=(1, 2, 3))
        return jnp.stack([b, 2 * b, 3 * b], axis=1) * 5, None

    return classifier, applies, variables, models


def _reference_soft(classifier, applies, x, temperature=0.5):
    logits, _ = classifier(x)
    w = jax.nn.softmax(logits / temperature, axis=1)
    return sum(np.asarray(w[:, i, None, None, None]) * np.asarray(f(x))
               for i, f in enumerate(applies))


def test_pipeline_stage_split():
    classifier, applies, _, _ = _setup(jax.random.PRNGKey(0))
    pipe = TwoStagePipeline(classifier, applies)
    assert len(pipe.stage_a) == 4 and len(pipe.stage_b) == 4
    assert not (set(map(id, pipe.stage_a)) & set(map(id, pipe.stage_b)))


def test_pipeline_matches_sequential(key, rng):
    classifier, applies, _, _ = _setup(key)
    pipe = TwoStagePipeline(classifier, applies, temperature=0.5)
    batches = [jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
               for _ in range(4)]
    outs = list(pipe.run(batches))
    assert len(outs) == 4
    for x, y in zip(batches, outs):
        want = _reference_soft(classifier, applies, x)
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)

    # Single-call path agrees too.
    y0 = pipe(batches[0])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(outs[0]),
                               rtol=1e-6, atol=1e-7)
