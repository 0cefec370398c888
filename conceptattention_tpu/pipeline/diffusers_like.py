"""Diffusers-style pipeline variant with `concept_attention_kwargs` and true CFG.

Capability parity with `FluxWithConceptAttentionPipeline`
(`concept_attention/diffusers/flux/flux_with_concept_attention_pipeline.py:48-1022`
in manuragkhullar/ConceptAttention): the HF-ecosystem-shaped entry point —
`__call__(prompt, ..., guidance_scale, true_cfg, negative_prompt,
concept_attention_kwargs={"concepts", "timesteps", "layers"})` — where the
concept pass is gated to selected timesteps/layers and an optional true-CFG
branch runs a second (negative-prompt) forward.

Note the reference's diffusers variant normalizes maps with softmax over the
*patch* axis (dim=-1, `:983`) unlike the core pipeline's concept axis — a
documented inconsistency (SURVEY.md §7); here the axis is a parameter with the
diffusers behavior as default for drop-in parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.ops.attention import ConceptAttentionSpec, default_backend
from conceptattention_tpu.ops.packing import make_img_ids, pack_latents
from conceptattention_tpu.ops.schedule import get_schedule
from conceptattention_tpu.pipeline.heatmaps import apply_attention_norm, heatmaps_to_pil
from conceptattention_tpu.sampling.rectified_flow import denoise, get_noise


@dataclasses.dataclass
class FluxConceptAttentionOutput:
    images: List[Any]
    concept_attention_maps: List[Any]


@functools.partial(jax.jit, static_argnames=("cfg", "spec", "true_cfg"))
def _denoise_cfg(
    params, cfg, img, img_ids, txt, txt_ids, vec,
    neg_txt, neg_vec, concepts, concept_ids, concept_vec,
    timesteps, guidance, guidance_scale, spec, true_cfg,
):
    # One Euler loop implementation for both pipelines: the CFG branch lives
    # in sampling/rectified_flow.denoise.
    return denoise(
        params, cfg, img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
        vec=vec, timesteps=timesteps, guidance=guidance,
        concepts=concepts, concept_ids=concept_ids, concept_vec=concept_vec,
        spec=spec, neg_txt=neg_txt, neg_vec=neg_vec,
        guidance_scale=guidance_scale, true_cfg=true_cfg,
    )


class FluxWithConceptAttentionPipeline:
    """HF-shaped wrapper over the same TPU forward path."""

    def __init__(self, base_pipeline):
        """base_pipeline: a ConceptAttentionFluxPipeline (shares weights)."""
        self.base = base_pipeline

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 4,
        guidance_scale: float = 0.0,
        true_cfg: float = 1.0,
        seed: int = 0,
        concept_attention_kwargs: Optional[Dict[str, Any]] = None,
        output_type: str = "pil",
        cmap: str = "plasma",
    ) -> FluxConceptAttentionOutput:
        base = self.base
        kwargs = concept_attention_kwargs or {}
        concepts: List[str] = kwargs.get("concepts", [])
        assert concepts, "concept_attention_kwargs['concepts'] is required"
        map_timesteps: Optional[Sequence[int]] = kwargs.get("timesteps")
        layers: Optional[Sequence[int]] = kwargs.get("layers")
        if layers is None:
            layers = list(range(max(0, base.cfg.depth - 4), base.cfg.depth))

        noise = get_noise(
            jax.random.PRNGKey(seed), 1, height, width, base.dtype,
            channels=base.spec.ae_params.z_channels, vae_factor=base.vae_factor,
        )
        b, _, lh, lw = noise.shape
        schedule = get_schedule(
            num_inference_steps, (lh // 2) * (lw // 2), shift=(not base.is_schnell)
        )
        txt, txt_ids, vec = base._prepare_text(prompt, b)
        neg_txt, _, neg_vec = base._prepare_text(negative_prompt, b)
        c_emb, c_ids, c_vec = base._prepare_concepts(concepts, b)

        use_true_cfg = true_cfg > 1.0
        latents, saliency = _denoise_cfg(
            base.params, base.cfg, pack_latents(noise),
            make_img_ids(lh // 2, lw // 2, b),
            txt, txt_ids, vec, neg_txt, neg_vec,
            c_emb, c_ids, c_vec, jnp.asarray(schedule), guidance_scale,
            true_cfg,
            ConceptAttentionSpec(taps=("output",), backend=default_backend()),
            use_true_cfg,
        )

        maps = saliency["output"]  # [S, L, B, C, P]
        # JAX gathers clamp silently; validate like heatmaps.reduce_maps.
        if map_timesteps is not None:
            bad = [t for t in map_timesteps if not (0 <= int(t) < maps.shape[0])]
            if bad:
                raise ValueError(
                    f"concept_attention_kwargs timesteps {bad} out of range "
                    f"for {maps.shape[0]} inference steps"
                )
            maps = maps[jnp.asarray(list(map_timesteps))]
        bad = [l for l in layers if not (0 <= int(l) < maps.shape[1])]
        if bad:
            raise ValueError(
                f"concept_attention_kwargs layers {bad} out of range for "
                f"{maps.shape[1]} double-stream layers"
            )
        maps = maps[:, jnp.asarray(list(layers))]
        # Diffusers-variant normalization: softmax over PATCHES (dim=-1).
        maps = apply_attention_norm(maps, "softmax", axis=-1)
        maps = jnp.mean(maps, axis=(0, 1))[0].reshape(len(concepts), lh // 2, lw // 2)

        image = base._decode_to_image(latents, (lh // 2, lw // 2), output_type != "pil")
        map_arr = np.asarray(maps, dtype=np.float32)
        if output_type == "pil":
            map_out = heatmaps_to_pil(map_arr, cmap)
        else:
            map_out = list(map_arr)
        return FluxConceptAttentionOutput(images=[image], concept_attention_maps=map_out)
