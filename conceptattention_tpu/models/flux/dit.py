"""Flux DiT forward pass: jit-compiled, scan-over-layers, optional concept stream.

Parity target: `concept_attention/modified_flux_dit.py:75-163` (and the
vanilla `flux/src/flux/model.py:27-112`) in manuragkhullar/ConceptAttention.
With `concepts=None` this *is* the vanilla Flux forward; with concepts it adds
the third token stream and emits per-layer concept saliency.

TPU-first design:
  - both block stacks run under `jax.lax.scan` over stacked params (one
    compiled block body instead of 19+38 unrolled calls — much faster compiles
    and lets XLA double-buffer layer weights from HBM);
  - RoPE tables are computed once per forward and sliced per segment;
  - per-layer saliency is reduced to [B, C, P] maps inside the scan
    (sufficient statistics for the heatmap post-processing) instead of
    stashing full attention outputs per layer;
  - `stop_after_multimodal_attentions` (the reference's early exit at
    modified_flux_dit.py:152-153) is a static flag that simply drops the
    single-block scan from the traced graph.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.models.flux.blocks import double_block, last_layer, single_block
from conceptattention_tpu.ops.attention import ConceptAttentionSpec
from conceptattention_tpu.ops.embeddings import mlp_embedder, timestep_embedding
from conceptattention_tpu.ops.rope import embed_nd


def _conditioning_vector(params, cfg: FluxConfig, timesteps, guidance, y):
    vec = mlp_embedder(timestep_embedding(timesteps, 256), params["time_in"])
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance_embed model requires a guidance strength")
        vec = vec + mlp_embedder(timestep_embedding(guidance, 256), params["guidance_in"])
    return vec + mlp_embedder(y, params["vector_in"])


def _controlnet_per_layer(samples, depth: int, repeat: bool):
    """[n, B, P, D] ControlNet residuals -> [depth, B, P, D] scan xs (sample
    i % n when `repeat` — Xlabs layout — else i // ceil(depth/n), matching
    diffusers' interval_control). None passes through (the scan body then
    skips the add statically)."""
    if samples is None:
        return None
    n = samples.shape[0]
    if repeat:
        idx = [i % n for i in range(depth)]
    else:
        interval = -(-depth // n)  # ceil
        idx = [min(i // interval, n - 1) for i in range(depth)]
    return samples[jnp.asarray(idx)]


def flux_forward(
    params: Dict[str, Any],
    cfg: FluxConfig,
    img: jax.Array,
    img_ids: jax.Array,
    txt: jax.Array,
    txt_ids: jax.Array,
    timesteps: jax.Array,
    y: jax.Array,
    guidance: Optional[jax.Array] = None,
    concepts: Optional[jax.Array] = None,
    concept_ids: Optional[jax.Array] = None,
    concept_vec: Optional[jax.Array] = None,
    stop_after_multimodal_attentions: bool = False,
    spec: ConceptAttentionSpec = ConceptAttentionSpec(),
    remat: bool = False,
    controlnet_block_samples: Optional[jax.Array] = None,
    controlnet_single_block_samples: Optional[jax.Array] = None,
    controlnet_blocks_repeat: bool = False,
) -> Tuple[Optional[jax.Array], Dict[str, jax.Array]]:
    """Run the DiT.

    Args:
      img: [B, P, in_channels] packed latents.
      img_ids / txt_ids / concept_ids: [B, L, 3] position ids.
      txt: [B, T, context_in_dim] T5 sequence embeddings.
      timesteps: [B] flow time in [0, 1].
      y: [B, vec_in_dim] CLIP pooled vector.
      concepts: [B, C, context_in_dim] per-concept T5 embeddings, or None.
      concept_vec: [B, vec_in_dim] concept CLIP vector (zeros in the reference
        method — utils.py:31).
      controlnet_block_samples: [n, B, P, hidden] residuals added to the img
        stream after each double block — reference diffusers wrapper
        flux_dit_with_concept_attention.py:224-235: sample i // ceil(depth/n)
        per layer, or i % n when `controlnet_blocks_repeat` (Xlabs layout).
      controlnet_single_block_samples: [m, B, P, hidden] residuals added to
        the image slice after each single block (reference :261-268).

    Returns:
      (pred, saliency): pred is [B, P, in_channels] (None when
      stop_after_multimodal_attentions); saliency maps are [depth, B, C, P]
      float32 per tap (or stacked raw vectors in parity mode); empty dict when
      concepts is None.
    """
    if img.ndim != 3 or txt.ndim != 3:
        raise ValueError("img and txt must be [B, L, D]")
    has_concepts = concepts is not None

    img = img @ params["img_in"]["w"] + params["img_in"]["b"]
    txt = txt @ params["txt_in"]["w"] + params["txt_in"]["b"]
    # Conditioning vector in the stream compute dtype (timesteps arrive f32).
    vec = _conditioning_vector(params, cfg, timesteps, guidance, y).astype(img.dtype)

    pe = embed_nd(jnp.concatenate([txt_ids, img_ids], axis=1), cfg.axes_dim, cfg.theta)

    concept_pe = None
    cvec = None
    if has_concepts:
        # Concept modulation vector: timestep (+guidance) embedding plus
        # vector_in of the (zeroed) concept CLIP vector
        # (modified_flux_dit.py:112-120).
        cvec = _conditioning_vector(params, cfg, timesteps, guidance, concept_vec).astype(img.dtype)
        concepts = concepts @ params["txt_in"]["w"] + params["txt_in"]["b"]
        concept_pe = embed_nd(
            jnp.concatenate([concept_ids, img_ids], axis=1), cfg.axes_dim, cfg.theta
        )

    def _dequant_layer(layer_params):
        # int8 weights are consumed natively by the block matmuls (scales fold
        # into outputs). The barrier pins the int8->bf16 operand converts
        # INSIDE the scan body: without it XLA can rewrite convert(slice(x))
        # -> slice(convert(x)) and hoist a full-depth bf16 weight copy
        # (23 GB) out of the loop.
        return jax.lax.optimization_barrier(layer_params)

    def double_step(carry, xs):
        img, txt, concepts = carry
        layer_params, cn = xs
        layer_params = _dequant_layer(layer_params)
        img, txt, concepts, saliency = double_block(
            layer_params, img, txt, vec, pe, cfg.num_heads,
            concepts=concepts, concept_vec=cvec, concept_pe=concept_pe,
            spec=spec,
        )
        if cn is not None:
            img = img + cn.astype(img.dtype)
        return (img, txt, concepts), saliency

    cn_double = _controlnet_per_layer(
        controlnet_block_samples, cfg.depth, controlnet_blocks_repeat
    )
    if remat:
        # Rematerialize per layer under grad: backward recomputes each block's
        # activations from its boundary carry instead of saving every
        # intermediate of all depth layers (training/train_step.py sets this).
        double_step = jax.checkpoint(double_step)
    (img, txt, concepts), saliency = jax.lax.scan(
        double_step, (img, txt, concepts), (params["double"], cn_double)
    )

    if stop_after_multimodal_attentions:
        return None, saliency

    x = jnp.concatenate([txt, img], axis=1)

    t_len = txt.shape[1]

    def single_step(x, xs):
        layer_params, cn = xs
        x = single_block(
            _dequant_layer(layer_params), x, vec, pe, cfg.num_heads,
            cfg.mlp_hidden_dim, backend=spec.backend,
            block_q=spec.block_q, block_k=spec.block_k,
            int8_qk=spec.int8_qk,
        )
        if cn is not None:
            # residual lands on the image slice only (reference :261-268)
            x = jnp.concatenate(
                [x[:, :t_len], x[:, t_len:] + cn.astype(x.dtype)], axis=1
            )
        return x, None

    cn_single = _controlnet_per_layer(
        controlnet_single_block_samples, cfg.depth_single_blocks, False
    )
    if remat:
        single_step = jax.checkpoint(single_step)
    x, _ = jax.lax.scan(single_step, x, (params["single"], cn_single))
    x = x[:, txt.shape[1] :]
    pred = last_layer(params["final"], x, vec)
    return pred, saliency


def make_jitted_forward(cfg: FluxConfig, **static_kwargs):
    """Convenience: a jitted forward with static config closed over.

    Array inputs must be passed by KEYWORD (`fwd(params, img=..., ...)`):
    cfg occupies the second positional slot of flux_forward, so positional
    arrays would collide with it."""
    def fwd(params, **kwargs):
        return flux_forward(params, cfg=cfg, **static_kwargs, **kwargs)

    return jax.jit(fwd)
