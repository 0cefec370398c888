"""Causal 3D video VAE + diffusers-like pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.models.video import vae as vvae


class TestVideoVAE:
    @pytest.fixture(scope="class")
    def params(self):
        return vvae.init_video_vae_params(
            jax.random.PRNGKey(0), ch=8, ch_mult=(1, 2, 2, 2), z_channels=4
        )

    def test_encode_shapes(self, params):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 32, 32))
        z = vvae.encode(params["encoder"], x)
        # 8x spatial, 4x temporal (causal ceil): 9 -> 5 -> 3
        assert z.shape == (1, 4, 3, 4, 4)

    def test_decode_shapes(self, params):
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 4, 4))
        x = vvae.decode(params["decoder"], z)
        assert x.shape[1] == 3
        assert x.shape[3] == 32 and x.shape[4] == 32
        assert x.shape[2] >= 9  # temporal upsample may overshoot; callers slice

    def test_causality(self, params):
        """Frame t of the latent must not depend on pixel frames > 4t."""
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (1, 3, 9, 32, 32))
        z1 = vvae.encode(params["encoder"], x)
        # Perturb ONLY the last pixel frame; early latent frames must not move.
        x2 = x.at[:, :, -1].add(100.0)
        z2 = vvae.encode(params["encoder"], x2)
        np.testing.assert_allclose(
            np.asarray(z1[:, :, 0]), np.asarray(z2[:, :, 0]), rtol=1e-5
        )


class TestDiffusersLikePipeline:
    def test_call_with_concept_kwargs(self):
        import conceptattention_tpu as cat
        from conceptattention_tpu.pipeline.diffusers_like import (
            FluxWithConceptAttentionPipeline,
        )

        base = cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)
        pipe = FluxWithConceptAttentionPipeline(base)
        out = pipe(
            prompt="a cat in a garden",
            height=64, width=64,
            num_inference_steps=2,
            concept_attention_kwargs={
                "concepts": ["cat", "garden"],
                "timesteps": [0, 1],
                "layers": [0, 1],
            },
        )
        assert len(out.images) == 1
        assert len(out.concept_attention_maps) == 2
        assert out.images[0].size == (64, 64)

    def test_true_cfg_branch(self):
        import conceptattention_tpu as cat
        from conceptattention_tpu.pipeline.diffusers_like import (
            FluxWithConceptAttentionPipeline,
        )

        base = cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)
        pipe = FluxWithConceptAttentionPipeline(base)
        out_cfg = pipe(
            prompt="a cat", negative_prompt="blurry",
            height=64, width=64, num_inference_steps=1,
            guidance_scale=2.0, true_cfg=1.5,
            concept_attention_kwargs={"concepts": ["cat"]},
            output_type="np",
        )
        out_plain = pipe(
            prompt="a cat",
            height=64, width=64, num_inference_steps=1,
            concept_attention_kwargs={"concepts": ["cat"]},
            output_type="np",
        )
        assert not np.array_equal(np.asarray(out_cfg.images[0]), np.asarray(out_plain.images[0]))
