"""Video concept-attention pipeline: generate a video + per-frame heatmaps.

Parity with `ModifiedCogVideoXPipeline`
(`experiments/video_model/cogvideox/pipeline.py:15-434` in
manuragkhullar/ConceptAttention):

  - `encode_concepts` (:38-87): first T5 token per concept, zero-padded to
    `max_text_seq_length` (226) so the concept stream matches the text
    stream's sequence length — the padding slots participate in the concept
    softmax exactly as upstream;
  - CFG batch-doubling (:315), concept maps taken from the conditional half
    (modified_dit.py:398 `[1]` batch index);
  - per-step in-model reduction (modified_dit.py:395-425): select layers,
    softmax over ALL padded concept slots, slice the real concepts, mean
    over layers; then at pipeline level select steps and mean (:381-419 —
    including the reference's second softmax on the cross-attention maps).

TPU-first: the whole CFG loop is one lax.scan under jit; the per-step map
reduction runs inside the scan so only `[steps, C, F*P]` leaves the device.
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
    CogVideoXConfig,
    init_video_dit_params,
    video_dit_forward,
)
from conceptattention_tpu.ops.attention import ConceptAttentionSpec, default_backend
from conceptattention_tpu.sampling.ddim import DDIMSchedule, ddim_step, make_ddim_schedule

VideoDiTConfig = CogVideoXConfig  # round-1 alias


@dataclasses.dataclass
class VideoConceptPipelineOutput:
    video_latents: jax.Array  # [B, F, C, H, W]
    concept_heatmaps: np.ndarray  # [concepts, frames, h, w]
    cross_attention_maps: Optional[np.ndarray] = None
    video_frames: Optional[np.ndarray] = None  # uint8 [F_pix, H_pix, W_pix, 3]


def _reduce_step_maps(maps: jax.Array, layer_indices, n_concepts: int) -> jax.Array:
    """Per-step reduction (modified_dit.py:398-425): [L, B, C_pad, P] ->
    [C, P]: conditional batch half, layer select, softmax over ALL padded
    concept slots, slice, mean over layers."""
    cond = maps[:, -1]  # [L, C_pad, P]; batch index 1 of the CFG pair
    sel = cond[jnp.asarray(layer_indices)]
    sel = jax.nn.softmax(sel, axis=-2)
    return jnp.mean(sel[:, :n_concepts], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "spec", "guidance_scale", "num_train_timesteps", "scheduler",
        "layer_indices", "n_concepts",
    ),
)
def _cfg_denoise(
    params, cfg, latents, text_cond, text_uncond,
    concepts, timesteps_idx, sched_alphas, final_alpha,
    guidance_scale, spec, num_train_timesteps, scheduler,
    layer_indices, n_concepts,
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
        t_vec = jnp.full((2 * b,), t, dtype=jnp.float32)
        pred, saliency = video_dit_forward(
            params, cfg, x2, text, t_vec,
            concepts=jnp.concatenate([concepts, concepts], 0),
            spec=spec,
        )
        uncond, cond = jnp.split(pred, 2, axis=0)
        guided = uncond + guidance_scale * (cond - uncond)
        reduced = {
            k: _reduce_step_maps(v, layer_indices, n_concepts)
            for k, v in saliency.items()
        }
        return guided, reduced

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
        cfg: Optional[CogVideoXConfig] = None,
        params: Optional[Dict[str, Any]] = None,
        text_encoders: Optional[TextEncoders] = None,
        dtype=jnp.bfloat16,
        init_seed: int = 0,
        vae_params: Optional[Dict[str, Any]] = None,
        vae_cfg=None,
        quantize=False,  # False | True/"w8" (int8 weights) | "w8a8" | "w4"
        # LoRA adapters: safetensors path(s) in diffusers CogVideoX naming or
        # already-converted adapter pytree(s) (weights/lora.py); merged before
        # quantization like the flux pipeline.
        lora: Optional[Any] = None,
        lora_strength=1.0,
    ):
        self.cfg = cfg or CogVideoXConfig()
        self.dtype = dtype
        self.params = params or init_video_dit_params(
            jax.random.PRNGKey(init_seed), self.cfg, dtype
        )
        if lora is not None:
            from conceptattention_tpu.weights.convert import load_safetensors
            from conceptattention_tpu.weights.lora import (
                convert_cogvideox_lora_state_dict,
                merge_loras,
            )

            items = lora if isinstance(lora, (list, tuple)) else [lora]
            adapters = [
                convert_cogvideox_lora_state_dict(load_safetensors(it), self.cfg)
                if isinstance(it, str)
                else it
                for it in items
            ]
            strengths = (
                list(lora_strength)
                if isinstance(lora_strength, (list, tuple))
                else [float(lora_strength)] * len(adapters)
            )
            if len(strengths) != len(adapters):
                raise ValueError(
                    f"{len(adapters)} LoRA adapter(s) but "
                    f"{len(strengths)} strengths"
                )
            self.params = merge_loras(self.params, adapters, strengths)
        if quantize:
            from conceptattention_tpu.ops.quant import (
                quantize_video_dit_params,
                resolve_quant_mode,
            )

            self.params = quantize_video_dit_params(
                self.params, mode=resolve_quant_mode(quantize)
            )
        self.text_encoders = text_encoders or StubTextEncoders(
            t5_dim=self.cfg.text_embed_dim, clip_dim=768,
            t5_max_length=self.cfg.max_text_seq_length,
        )
        # Video VAE (models/video/vae.py, diffusers AutoencoderKLCogVideoX
        # layout): pass converted checkpoint params for real use; lazily
        # random-initialized otherwise (shapes/kernels identical).
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params

    def _vae(self):
        from conceptattention_tpu.models.video import vae as vvae

        if self.vae_cfg is None:
            self.vae_cfg = vvae.CogVideoXVAEConfig(
                latent_channels=self.cfg.in_channels
            )
        if self.vae_params is None:
            self.vae_params = vvae.init_video_vae_params(
                jax.random.PRNGKey(7), self.vae_cfg, jnp.float32
            )
        return vvae, self.vae_cfg, self.vae_params

    def decode_latents(self, latents: jax.Array) -> np.ndarray:
        """[B, F, C, h, w] DiT latents -> uint8 pixel frames
        [1 + (F-1)*t_ratio, h*8, w*8, 3] through the 3D causal VAE (the
        reference decodes via diffusers AutoencoderKLCogVideoX;
        pipeline.py:278-288)."""
        vvae, vae_cfg, vae_params = self._vae()
        z = jnp.transpose(latents.astype(jnp.float32), (0, 2, 1, 3, 4))
        pixels = vvae.decode(vae_params, vae_cfg, z)
        arr = np.asarray(jnp.clip(pixels[0], -1.0, 1.0), dtype=np.float32)
        return ((arr.transpose(1, 2, 3, 0) + 1.0) * 127.5).astype(np.uint8)

    def encode_concepts(self, concepts: List[str], seq_length: Optional[int] = None):
        """First T5 token per concept, zero-padded to seq_length
        (reference pipeline.py:38-87)."""
        seq_length = seq_length or self.cfg.max_text_seq_length
        if len(concepts) > seq_length:
            raise ValueError(
                f"{len(concepts)} concepts exceed max_text_seq_length="
                f"{seq_length} (the concept stream shares the text slots)"
            )
        tokens = [self.text_encoders.encode_t5([c])[0, 0] for c in concepts]
        emb = jnp.stack(tokens)[None].astype(self.dtype)  # [1, C, D]
        pad = jnp.zeros(
            (1, seq_length - len(concepts), emb.shape[-1]), self.dtype
        )
        return jnp.concatenate([emb, pad], axis=1)

    def _encode_text(self, prompt: str) -> jax.Array:
        emb = self.text_encoders.encode_t5([prompt]).astype(self.dtype)
        t = self.cfg.max_text_seq_length
        if emb.shape[1] < t:
            emb = jnp.concatenate(
                [emb, jnp.zeros((emb.shape[0], t - emb.shape[1], emb.shape[-1]), self.dtype)],
                axis=1,
            )
        return emb[:, :t]

    def generate_video(
        self,
        prompt: str,
        concepts: List[str],
        negative_prompt: str = "",
        num_frames: int = 4,
        height: int = 32,
        width: int = 32,
        num_inference_steps: int = 10,
        guidance_scale: float = 6.0,
        concept_timesteps: Optional[Sequence[int]] = None,
        layer_indices: Optional[Sequence[int]] = None,
        return_cross_attention: bool = False,
        scheduler: str = "ddim",  # "ddim" | "dpm" (DPM-Solver++ 2M)
        seed: int = 0,
        decode: bool = False,
    ) -> VideoConceptPipelineOutput:
        """Run CFG DDIM/DPM sampling; returns latents + [C, F, h, w] maps.

        height/width are LATENT pixel sizes (pre-patchify)."""
        cfg = self.cfg
        if height % cfg.patch_size or width % cfg.patch_size:
            raise ValueError(
                f"latent height/width ({height}x{width}) must be divisible "
                f"by patch_size={cfg.patch_size}"
            )
        if layer_indices is None:
            layer_indices = list(range(cfg.num_layers))
        bad = [int(l) for l in layer_indices
               if not (0 <= int(l) < cfg.num_layers)]
        if bad:
            # JAX gathers clamp silently inside the jitted scan.
            raise ValueError(
                f"layer_indices {bad} out of range for {cfg.num_layers} layers"
            )

        text_cond = self._encode_text(prompt)
        text_uncond = self._encode_text(negative_prompt)
        concepts_emb = self.encode_concepts(concepts)

        f, h, w = num_frames, height, width
        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (1, f, cfg.in_channels, h, w), self.dtype
        )

        taps = ("output", "cross_attention") if return_cross_attention else ("output",)
        sched = make_ddim_schedule(num_inference_steps)
        latents, saliency = _cfg_denoise(
            self.params, cfg, latents, text_cond, text_uncond,
            concepts_emb, sched.timesteps, sched.alphas_cumprod,
            sched.final_alpha_cumprod, guidance_scale,
            ConceptAttentionSpec(taps=taps, backend=default_backend()),
            1000, scheduler, tuple(layer_indices), len(concepts),
        )

        p = cfg.patch_size
        gh, gw = h // p, w // p

        def finalize(maps, extra_softmax):
            # maps: [S, C, F*P] already per-step reduced.
            if concept_timesteps is not None:
                n_steps = maps.shape[0]
                bad = [int(t) for t in concept_timesteps
                       if not (0 <= int(t) < n_steps)]
                if bad:
                    # JAX gather clamps silently; same validation as
                    # heatmaps.reduce_maps.
                    raise ValueError(
                        f"concept_timesteps {bad} out of range for "
                        f"{n_steps} inference steps"
                    )
                maps = maps[jnp.asarray(concept_timesteps)]
            if extra_softmax:
                # The reference re-softmaxes the (already softmaxed, sliced)
                # cross maps at pipeline level (pipeline.py:404-406).
                maps = jax.nn.softmax(maps, axis=-2)
            maps = jnp.mean(maps, axis=0)  # [C, F*P]
            return np.asarray(
                maps.reshape(len(concepts), f, gh, gw), dtype=np.float32
            )

        return VideoConceptPipelineOutput(
            video_latents=latents,
            concept_heatmaps=finalize(saliency["output"], extra_softmax=False),
            cross_attention_maps=(
                finalize(saliency["cross_attention"], extra_softmax=True)
                if return_cross_attention else None
            ),
            video_frames=self.decode_latents(latents) if decode else None,
        )
