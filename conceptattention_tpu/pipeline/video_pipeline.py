"""Video concept-attention pipeline: generate a video + per-frame heatmaps.

Capability parity with `ModifiedCogVideoXPipeline`
(`experiments/video_model/cogvideox/pipeline.py:15-435` in
manuragkhullar/ConceptAttention): classifier-free-guidance DDIM denoising of a
3D video DiT with concept tokens, producing per-frame concept heatmaps
`[concepts, frames, h, w]` (post-proc at :378-419).

TPU-first: the whole CFG loop is one lax.scan under jit; saliency maps come
out as `[steps, depth, B, C, F*P]` reductions, never full vector stashes. CFG
doubles the batch (cond/uncond) exactly like the reference, but concept maps
are taken from the conditional half only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.models.text.encoders import StubTextEncoders, TextEncoders
from conceptattention_tpu.models.video.dit import (
    VideoDiTConfig,
    init_video_dit_params,
    make_video_ids,
    video_dit_forward,
)
from conceptattention_tpu.ops.attention import ConceptAttentionSpec, default_backend
from conceptattention_tpu.pipeline.heatmaps import apply_attention_norm
from conceptattention_tpu.sampling.ddim import DDIMSchedule, ddim_step, make_ddim_schedule


@dataclasses.dataclass
class VideoConceptPipelineOutput:
    video_latents: jax.Array  # [B, F, C, H, W]
    concept_heatmaps: np.ndarray  # [concepts, frames, h, w]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "guidance_scale", "num_train_timesteps", "scheduler"),
)
def _cfg_denoise(
    params, cfg, latents, video_ids, text_cond, text_uncond,
    concepts, timesteps_idx, sched_alphas, final_alpha,
    guidance_scale, spec, num_train_timesteps, scheduler="ddim",
):
    from conceptattention_tpu.sampling.dpm import dpm_init, dpm_step

    sched = DDIMSchedule(
        timesteps=timesteps_idx, alphas_cumprod=sched_alphas,
        final_alpha_cumprod=final_alpha,
    )
    text = jnp.concatenate([text_uncond, text_cond], axis=0)
    b = latents.shape[0]
    step_gap = num_train_timesteps // timesteps_idx.shape[0]

    def guided_pred(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t_norm = t.astype(jnp.float32) / num_train_timesteps
        t_vec = jnp.full((2 * b,), t_norm, dtype=jnp.float32)
        # Concepts ride only on the conditional half; maps sliced after.
        pred, saliency = video_dit_forward(
            params, cfg, x2, jnp.concatenate([video_ids, video_ids], 0),
            text, t_vec,
            concepts=jnp.concatenate([concepts, concepts], 0),
            spec=spec,
        )
        uncond, cond = jnp.split(pred, 2, axis=0)
        guided = uncond + guidance_scale * (cond - uncond)
        saliency = {k: v[:, b:] for k, v in saliency.items()}
        return guided, saliency

    if scheduler == "dpm":
        def step(state, t):
            guided, saliency = guided_pred(state.sample, t)
            state = dpm_step(sched, state, guided, t, t - step_gap)
            return state, saliency

        state, saliency = jax.lax.scan(step, dpm_init(latents), timesteps_idx)
        return state.sample, saliency

    def step(x, t):
        guided, saliency = guided_pred(x, t)
        x = ddim_step(sched, guided, t, t - step_gap, x)
        return x, saliency

    latents, saliency = jax.lax.scan(step, latents, timesteps_idx)
    return latents, saliency


class VideoConceptAttentionPipeline:
    """Generate video latents with per-frame concept saliency heatmaps."""

    def __init__(
        self,
        cfg: Optional[VideoDiTConfig] = None,
        params: Optional[Dict[str, Any]] = None,
        text_encoders: Optional[TextEncoders] = None,
        dtype=jnp.bfloat16,
        init_seed: int = 0,
    ):
        self.cfg = cfg or VideoDiTConfig()
        self.dtype = dtype
        self.params = params or init_video_dit_params(
            jax.random.PRNGKey(init_seed), self.cfg, dtype
        )
        self.text_encoders = text_encoders or StubTextEncoders(
            t5_dim=self.cfg.text_dim, clip_dim=768, t5_max_length=226
        )

    def generate_video(
        self,
        prompt: str,
        concepts: List[str],
        negative_prompt: str = "",
        num_frames: int = 4,
        height_tokens: int = 8,
        width_tokens: int = 8,
        num_inference_steps: int = 10,
        guidance_scale: float = 6.0,
        concept_timesteps: Optional[Sequence[int]] = None,
        layer_indices: Optional[Sequence[int]] = None,
        attention_norm: str = "softmax",
        scheduler: str = "ddim",  # "ddim" | "dpm" (DPM-Solver++ 2M)
        seed: int = 0,
    ) -> VideoConceptPipelineOutput:
        """Run CFG DDIM sampling; returns latents + [C, F, h, w] heatmaps."""
        cfg = self.cfg
        if layer_indices is None:
            layer_indices = list(range(cfg.depth))

        text_cond = self.text_encoders.encode_t5([prompt]).astype(self.dtype)
        text_uncond = self.text_encoders.encode_t5([negative_prompt]).astype(self.dtype)
        concept_tokens = []
        for c in concepts:
            concept_tokens.append(self.text_encoders.encode_t5([c])[0, 0])
        concepts_emb = jnp.stack(concept_tokens)[None].astype(self.dtype)

        f, h, w = num_frames, height_tokens, width_tokens
        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (1, f * h * w, cfg.in_channels), self.dtype
        )
        video_ids = make_video_ids(f, h, w, batch_size=1)

        sched = make_ddim_schedule(num_inference_steps)
        latents, saliency = _cfg_denoise(
            self.params, cfg, latents, video_ids, text_cond, text_uncond,
            concepts_emb, sched.timesteps, sched.alphas_cumprod,
            sched.final_alpha_cumprod, guidance_scale,
            ConceptAttentionSpec(taps=("output",), backend=default_backend()), 1000, scheduler,
        )

        maps = saliency["output"]  # [S, depth, B, C, F*P]
        if concept_timesteps is not None:
            maps = maps[jnp.asarray(concept_timesteps)]
        maps = apply_attention_norm(maps, attention_norm, axis=-2)
        maps = maps[:, jnp.asarray(layer_indices)]
        maps = jnp.mean(maps, axis=(0, 1))[0]  # [C, F*P]
        maps = maps.reshape(len(concepts), f, h, w)

        latents = latents.reshape(1, f, h, w, cfg.in_channels)
        return VideoConceptPipelineOutput(
            video_latents=latents,
            concept_heatmaps=np.asarray(maps, dtype=np.float32),
        )
