"""Batched-image segmentation path: `segment_batch` must be
output-identical to sequential per-image calls (it is the eval harness's
throughput lever — one batched VAE encode + one stopped forward per group,
`bench.py --encode` measures the ~2.9x marginal-cost drop on-chip).

Parity anchors: the per-image path itself is mask-level reference-equal
(tests/test_seg_protocol_parity.py); these tests pin batched == per-image so
the chain stays closed."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

import conceptattention_tpu as cat
from conceptattention_tpu.evals.segmentation import FluxTapSegmentationModel

from test_imagenet_seg_harness import _make_mat

SIZE = 64


@pytest.fixture(scope="module")
def pipe():
    return cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(40 + 8 * i, 48, 3), dtype=np.uint8)
        for i in range(n)
    ]


class TestEncodePixelsBatch:
    def test_matches_per_image(self, pipe):
        """One batched encoder forward == B per-image encodes (the VAE
        reparameterization draw is broadcast to match the per-image keys)."""
        images = _images(3)
        batched = pipe._encode_pixels_batch(images, SIZE, SIZE, seed=5)
        singles = jnp.concatenate(
            [pipe._encode_pixels(im, SIZE, SIZE, seed=5) for im in images]
        )
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(singles), rtol=1e-5, atol=1e-6
        )

    def test_chunked_encoder_path(self, pipe, monkeypatch):
        """On TPU-like backends (decode_dtype bf16) the encoder runs chunk=1
        (B>=2 at 1024^2 measured RESOURCE_EXHAUSTED beside the resident DiT);
        chunking must not change the latents."""
        images = _images(3)
        full = pipe._encode_pixels_batch(images, SIZE, SIZE, seed=5)
        monkeypatch.setattr(pipe, "decode_dtype", jnp.bfloat16)
        chunked = pipe._encode_pixels_batch(images, SIZE, SIZE, seed=5)
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-6
        )

    def test_posterior_mean_mode(self, pipe):
        images = _images(2)
        batched = pipe._encode_pixels_batch(images, SIZE, SIZE, seed=5,
                                            sample=False)
        singles = jnp.concatenate(
            [pipe._encode_pixels(im, SIZE, SIZE, seed=5, sample=False)
             for im in images]
        )
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(singles), rtol=1e-5, atol=1e-6
        )


class TestSegmentBatch:
    @pytest.mark.parametrize("num_samples", [1, 2])
    def test_matches_sequential(self, pipe, num_samples):
        model = FluxTapSegmentationModel(
            pipe, tap="output", num_steps=2, noise_timestep=1,
            num_samples=num_samples, width=SIZE, height=SIZE,
            layer_indices=[0, 1],
        )
        images = _images(3)
        targets = ["cat", "dog", "sky"]
        concepts_list = [
            ["cat", "grass", "sky"], ["dog", "grass", "sky"],
            ["sky", "grass", "cat"],
        ]
        b_masks, b_coeffs, b_recon = model.segment_batch(
            images, targets, concepts_list, captions=targets
        )
        for b, image in enumerate(images):
            masks, coeffs, _ = model(
                [image], target_concepts=[targets[b]],
                concepts=concepts_list[b], captions=[targets[b]],
            )
            np.testing.assert_allclose(
                b_coeffs[b], coeffs[0], rtol=2e-4, atol=1e-6,
                err_msg=f"image {b} coefficients diverge",
            )
            # Identical coefficients + identical threshold rule -> identical
            # masks (a boundary flip would mean the numerics diverged).
            np.testing.assert_array_equal(b_masks[b], masks[0])
        assert b_recon == [None] * 3

    def test_other_tap_and_ablation(self, pipe):
        """The spec fields (tap, cross/self ablations) must flow through the
        batched path too."""
        model = FluxTapSegmentationModel(
            pipe, tap="cross_attention", num_steps=2, noise_timestep=1,
            width=SIZE, height=SIZE, layer_indices=[0],
            concept_self_attention=False,
        )
        images = _images(2, seed=3)
        cl = [["cat", "sky"], ["dog", "sky"]]
        b_masks, b_coeffs, _ = model.segment_batch(
            images, ["cat", "dog"], cl, captions=["a cat", "a dog"]
        )
        for b, image in enumerate(images):
            _, coeffs, _ = model(
                [image], target_concepts=[cl[b][0]], concepts=cl[b],
                captions=["a cat", "a dog"][b:b + 1],
            )
            np.testing.assert_allclose(
                b_coeffs[b], coeffs[0], rtol=2e-4, atol=1e-6
            )

    def test_unequal_concept_lengths_rejected(self, pipe):
        model = FluxTapSegmentationModel(
            pipe, tap="output", num_steps=2, noise_timestep=1,
            width=SIZE, height=SIZE, layer_indices=[0],
        )
        with pytest.raises(AssertionError):
            model.segment_batch(
                _images(2), ["cat", "dog"],
                [["cat", "sky"], ["dog"]], captions=["cat", "dog"],
            )


class TestEncodeImages:
    def test_matches_sequential_encode_image(self, pipe):
        """The served coalescing path: per-image concepts, prompts, AND
        seeds must each reproduce what that image's own encode_image call
        draws."""
        images = _images(3, seed=7)
        concepts_list = [["cat", "sky"], ["dog", "sky"], ["sky", "cat"]]
        prompts = ["a cat", "a dog", "the sky"]
        seeds = [0, 11, 42]
        outs = pipe.encode_images(
            images, concepts_list, prompts=prompts, seeds=seeds,
            width=SIZE, height=SIZE, num_samples=2, num_steps=2,
            noise_timestep=1, layer_indices=[0, 1],
            return_pil_heatmaps=False,
        )
        assert len(outs) == 3
        for b in range(3):
            direct = pipe.encode_image(
                images[b], concepts_list[b], prompt=prompts[b],
                width=SIZE, height=SIZE, num_samples=2, num_steps=2,
                noise_timestep=1, layer_indices=[0, 1], seed=seeds[b],
                return_pil_heatmaps=False,
            )
            np.testing.assert_allclose(
                outs[b].concept_heatmaps, direct.concept_heatmaps,
                rtol=2e-4, atol=1e-6, err_msg=f"image {b} heatmaps diverge",
            )
            np.testing.assert_allclose(
                outs[b].cross_attention_maps, direct.cross_attention_maps,
                rtol=2e-4, atol=1e-6,
            )

    def test_shared_concepts_and_defaults(self, pipe):
        images = _images(2)
        outs = pipe.encode_images(
            images, ["cat", "sky"], width=SIZE, height=SIZE,
            num_steps=2, noise_timestep=1, layer_indices=[0],
            return_pil_heatmaps=False,
        )
        direct = pipe.encode_image(
            images[0], ["cat", "sky"], width=SIZE, height=SIZE,
            num_steps=2, noise_timestep=1, layer_indices=[0],
            return_pil_heatmaps=False,
        )
        np.testing.assert_allclose(
            outs[0].concept_heatmaps, direct.concept_heatmaps,
            rtol=2e-4, atol=1e-6,
        )


def test_harness_image_batch_matches_per_image(tmp_path):
    """`--image_batch 2` over 3 synthetic images produces the same running
    metrics state as the per-image harness run."""
    mat = str(tmp_path / "gtsegs.mat")
    _make_mat(mat)
    env = {
        **os.environ, "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/root/repo/.jax_cache",
    }
    base = [
        sys.executable, "experiments/imagenet_segmentation/run_experiment.py",
        "--mat_path", mat, "--model_name", "flux-tiny",
        "--width", "64", "--label_size", "40", "--num_steps", "2",
        "--noise_timestep", "1", "--layers", "0", "1",
        "--num_images", "3",
    ]
    states = {}
    for tag, extra in {
        "per_image": [], "batched": ["--image_batch", "2"],
    }.items():
        state = str(tmp_path / f"state_{tag}.json")
        r = subprocess.run(
            base + extra + ["--state_path", state],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "FINAL" in r.stdout
        states[tag] = json.load(open(state))
    a, b = states["per_image"], states["batched"]
    assert a["next_index"] == b["next_index"] == 3
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], dtype=np.float64),
            np.asarray(b[k], dtype=np.float64),
            rtol=1e-6, err_msg=f"state field {k} diverges",
        )
