"""Rectified-flow Euler sampler, fully jit-compiled.

Parity target: `flux/src/flux/sampling.py:12-162` in the reference
(manuragkhullar/ConceptAttention). The reference runs a Python loop over
timesteps, re-dispatching the model each step and stacking per-step activation
dicts on host (`sampling.py:96-152`). Here the *entire* denoise loop is one
`jax.lax.scan` under jit: the DiT (itself a scan over blocks) is traced once,
per-step concept saliency maps are accumulated on device as a
`[steps, depth, B, C, P]` array, and only that small tensor ever leaves HBM.

Noise is drawn from JAX's threefry PRNG — same distribution, different bit
stream than torch's Philox (`get_noise`, reference sampling.py:12-29); parity
tests inject torch-generated noise explicitly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.models.flux.dit import flux_forward
from conceptattention_tpu.ops.attention import ConceptAttentionSpec
from conceptattention_tpu.ops.packing import latent_noise_shape, make_img_ids, pack_latents


def get_noise(
    key: jax.Array,
    num_samples: int,
    height: int,
    width: int,
    dtype=jnp.bfloat16,
    channels: int = 16,
    vae_factor: int = 8,
) -> jax.Array:
    """Seeded latent noise in packed-compatible shape [B, C, 2⌈h/16⌉, 2⌈w/16⌉]."""
    return jax.random.normal(
        key, latent_noise_shape(num_samples, height, width, channels, vae_factor), dtype
    )


def get_noise_torch_parity(
    seed: int,
    num_samples: int,
    height: int,
    width: int,
    dtype=jnp.bfloat16,
    channels: int = 16,
    vae_factor: int = 8,
) -> jax.Array:
    """Latent noise drawn from torch's CPU Philox stream — bit-identical to
    the reference's `get_noise` (sampling.py:12-29) for the same seed, so
    end-to-end outputs can be compared against the PyTorch implementation
    when weights are shared. Production sampling uses the native JAX PRNG
    (`get_noise`)."""
    import numpy as np
    import torch

    shape = latent_noise_shape(num_samples, height, width, channels, vae_factor)
    gen = torch.Generator(device="cpu").manual_seed(seed)
    torch_dtype = torch.bfloat16 if dtype == jnp.bfloat16 else torch.float32
    x = torch.randn(*shape, generator=gen, dtype=torch_dtype)
    return jnp.asarray(x.float().numpy(), dtype=dtype)


def prepare_image_tokens(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, C, H, W] latents -> (packed [B, P, C*4] tokens, img_ids [B, P, 3])."""
    b, _, h, w = x.shape
    return pack_latents(x), make_img_ids(h // 2, w // 2, batch_size=b)


def prepare(text_encoders, img: jax.Array, prompt) -> Dict[str, jax.Array]:
    """Build the DiT input dict from latents + a prompt (API parity with the
    reference's `prepare(t5, clip, img, prompt)`, sampling.py:31-65).

    Returns {img, img_ids, txt, txt_ids, vec} with img 2x2-packed.
    """
    prompts = [prompt] if isinstance(prompt, str) else list(prompt)
    b = max(img.shape[0], len(prompts))
    packed, img_ids = prepare_image_tokens(img)
    if packed.shape[0] == 1 and b > 1:
        packed = jnp.broadcast_to(packed, (b, *packed.shape[1:]))
        img_ids = jnp.broadcast_to(img_ids, (b, *img_ids.shape[1:]))
    txt = text_encoders.encode_t5(prompts)
    if txt.shape[0] == 1 and b > 1:
        txt = jnp.broadcast_to(txt, (b, *txt.shape[1:]))
    vec = text_encoders.encode_clip(prompts)
    if vec.shape[0] == 1 and b > 1:
        vec = jnp.broadcast_to(vec, (b, *vec.shape[1:]))
    return {
        "img": packed.astype(img.dtype),
        "img_ids": img_ids,
        "txt": txt.astype(img.dtype),
        "txt_ids": jnp.zeros((b, txt.shape[1], 3), jnp.float32),
        "vec": vec.astype(img.dtype),
    }


def denoise(
    params: Dict[str, Any],
    cfg: FluxConfig,
    img: jax.Array,
    img_ids: jax.Array,
    txt: jax.Array,
    txt_ids: jax.Array,
    vec: jax.Array,
    timesteps: jax.Array,
    guidance: float = 4.0,
    concepts: Optional[jax.Array] = None,
    concept_ids: Optional[jax.Array] = None,
    concept_vec: Optional[jax.Array] = None,
    spec: ConceptAttentionSpec = ConceptAttentionSpec(),
    neg_txt: Optional[jax.Array] = None,
    neg_vec: Optional[jax.Array] = None,
    guidance_scale: float = 1.0,
    true_cfg: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Euler rectified-flow loop: x_{t_prev} = x_t + (t_prev - t_curr) * v(x_t).

    Args:
      timesteps: [S+1] descending schedule (1 -> 0).
      true_cfg: run a second (negative-prompt) forward per step and combine
        `neg + guidance_scale * (pos - neg)` — the diffusers-variant
        classifier-free-guidance branch
        (flux_with_concept_attention_pipeline.py:928-942). `guidance` stays
        the embedded (distilled) guidance strength.

    Returns:
      (final latents [B, P, C*4], saliency dict of [S, depth, B, C, P] maps).
    """
    b = img.shape[0]
    guidance_vec = jnp.full((b,), guidance, dtype=jnp.float32)
    ts = jnp.asarray(timesteps, dtype=jnp.float32)
    steps = (ts[:-1], ts[1:])

    def step(x, t_pair):
        t_curr, t_prev = t_pair
        t_vec = jnp.full((b,), t_curr, dtype=jnp.float32)
        pred, saliency = flux_forward(
            params, cfg,
            img=x, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
            timesteps=t_vec, y=vec,
            guidance=guidance_vec if cfg.guidance_embed else None,
            concepts=concepts, concept_ids=concept_ids, concept_vec=concept_vec,
            spec=spec,
        )
        if true_cfg:
            neg_pred, _ = flux_forward(
                params, cfg,
                img=x, img_ids=img_ids, txt=neg_txt, txt_ids=txt_ids,
                timesteps=t_vec, y=neg_vec,
                guidance=guidance_vec if cfg.guidance_embed else None,
            )
            pred = neg_pred + guidance_scale * (pred - neg_pred)
        # Euler step with float32 accumulation (strictly more accurate than
        # the reference's bf16-in-place update).
        x = (x.astype(jnp.float32) + (t_prev - t_curr) * pred.astype(jnp.float32)).astype(x.dtype)
        if spec.stash_dtype == "bf16":
            # Round only the scan-stacked copy (similarity is computed in
            # f32); halves the [S, L, B, C, P]-per-tap stash bytes — the
            # flux-dev 50-step heatmap-overhead lever (see the spec field).
            saliency = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16), saliency
            )
        return x, saliency

    img, saliency = jax.lax.scan(step, img, steps)
    return img, saliency


def forward_noise(x: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """Rectified-flow forward noising: x_t = t * eps + (1 - t) * x
    (reference segmentation.py:85-113)."""
    t = jnp.asarray(t, dtype=jnp.float32)
    return (t * noise.astype(jnp.float32) + (1.0 - t) * x.astype(jnp.float32)).astype(noise.dtype)
