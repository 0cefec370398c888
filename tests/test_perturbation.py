"""Perturbation-eval behavior (reference pertubation_eval_from_hdf5.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.evals.perturbation import (
    PERTURBATION_STEPS,
    run_perturbation_eval,
    upsample_token_relevance,
    _mask_top_pixels,
)


def test_mask_top_pixels_removes_exactly_k():
    key = jax.random.PRNGKey(0)
    images = jnp.ones((2, 3, 8, 8))
    rel = jax.random.normal(key, (2, 64))
    from conceptattention_tpu.evals.perturbation import _pixel_ranks

    masked = _mask_top_pixels(images, _pixel_ranks(rel), jnp.asarray(10))
    removed = np.asarray((masked[:, 0] == 0).sum(axis=(1, 2)))
    np.testing.assert_array_equal(removed, [10, 10])
    # the removed pixels are exactly the top-10 by relevance
    for b in range(2):
        top = set(np.argsort(np.asarray(rel[b]))[::-1][:10].tolist())
        gone = set(np.flatnonzero(np.asarray(masked[b, 0]).reshape(-1) == 0).tolist())
        assert top == gone


def test_relevant_masking_hurts_more_than_random():
    """An explanation that matches the classifier's true evidence must show a
    steeper positive-perturbation accuracy drop than an anti-explanation."""
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (3 * 16 * 16, 5)) * 0.3
    # classifier: average-pool 4x4 cells -> linear; evidence concentrated in
    # the top-left quadrant via a fixed spatial gate
    gate = jnp.zeros((16, 16)).at[:8, :8].set(1.0)

    def classify(images):
        gated = images * gate
        return gated.reshape(images.shape[0], -1) @ w

    images = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 16, 16)) + 1.0
    labels = jnp.argmax(classify(images), axis=-1)

    true_rel = jnp.broadcast_to(gate.reshape(1, -1), (8, 256))
    anti_rel = 1.0 - true_rel

    good = run_perturbation_eval(classify, images, labels, true_rel)
    bad = run_perturbation_eval(classify, images, labels, anti_rel)
    assert good.auc < bad.auc  # masking true evidence hurts accuracy more
    assert good.accuracy[-1] <= bad.accuracy[0] + 1e-6
    assert len(good.accuracy) == len(PERTURBATION_STEPS)
    d = good.as_dict()
    assert set(d) == {"steps", "accuracy", "target_prob_drop", "auc"}


def test_negative_mode_flips_order():
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (2, 3, 8, 8))
    rel = jax.random.normal(jax.random.PRNGKey(4), (2, 64))
    w = jax.random.normal(jax.random.PRNGKey(5), (192, 4))

    def classify(x):
        # distinct per-class weights: an all-ones classifier gives uniform
        # softmax for ANY masking, which would make this test vacuous
        return x.reshape(x.shape[0], -1) @ w

    pos = run_perturbation_eval(classify, images, jnp.zeros(2, jnp.int32), rel)
    neg = run_perturbation_eval(
        classify, images, jnp.zeros(2, jnp.int32), rel, negative=True
    )
    assert pos.accuracy.shape == neg.accuracy.shape
    # The two modes mask DISJOINT pixel sets at low fractions (most- vs
    # least-relevant first), so the masked logits — and therefore the
    # probability drops — must differ; equal drops would mean negative=True
    # is being ignored.
    assert not np.allclose(pos.target_prob_drop, neg.target_prob_drop)


def test_upsample_token_relevance():
    tok = jnp.arange(4.0).reshape(1, 2, 2)
    up = upsample_token_relevance(tok, 4)
    assert up.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(up[0, :2, :2]), 0.0)
    np.testing.assert_allclose(np.asarray(up[0, 2:, 2:]), 3.0)
