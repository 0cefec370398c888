"""HF-diffusers-style pipeline wrapper (pipeline/diffusers_like.py)."""

import jax.numpy as jnp
import numpy as np

import conceptattention_tpu as cat
from conceptattention_tpu.pipeline.diffusers_like import (
    FluxWithConceptAttentionPipeline,
)


class TestDiffusersLikePipeline:
    def test_call_with_concept_kwargs(self):
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
        assert not np.array_equal(
            np.asarray(out_cfg.images[0]), np.asarray(out_plain.images[0])
        )
