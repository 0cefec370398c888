"""Flux DiT block bodies as pure functions.

One parameterized double-stream block covers all four of the reference's
copies of this attention pattern (vanilla `DoubleStreamBlock` at
flux/src/flux/modules/layers.py:129-191, `ModifiedDoubleStreamBlock` at
concept_attention/modified_double_stream_block.py:43-204, the diffusers block
wrapper, and the CogVideoX processor): the concept stream is a first-class
*optional* input, not a monkey-patched subclass.

Concept-stream semantics (parity with modified_double_stream_block.py):
  - concepts reuse the *txt* weights (txt_norm1 / txt_qkv / txt_mod applied to
    concept_vec) — lines :86,100-104 in the reference;
  - concept queries attend over [concept; img] keys with their own softmax
    denominator (:121-168);
  - concepts get their own residual+MLP update with txt weights (:201-202);
  - image/text streams are computed exactly as if concepts were absent.

Saliency taps are emitted as reduced [B, C, P] float32 maps (concept-x-patch
similarities) rather than the reference's full per-layer vector stash — the
reference materializes [T, 19, B, 4096, 3072] activations
(modified_flux_dit.py:122-146), which is its biggest inefficiency; the maps
are sufficient statistics for `compute_heatmaps_from_vectors`
(concept_attention_pipeline.py:29-91) because the concept-axis normalization
happens *after* the dot products.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.ops.attention import (
    ConceptAttentionSpec,
    joint_concept_attention,
    merge_heads,
    similarity_map_heads,
    sdpa,
    similarity_map,
)
from conceptattention_tpu.ops.norms import layer_norm, modulation, rms_norm
from conceptattention_tpu.ops.rope import apply_rope


def _linear(x, p, psum_axis=None):
    """Linear with optional int8 weights.

    - {"q", "scale"}: weight-only int8 — per-output-channel scales fold into
      the OUTPUT (x @ (q*s) == (x @ q) * s), so dequantized weights never
      materialize; the int8->bf16 convert fuses into the matmul operand.
    - {"qa", "scale"}: w8a8 — activations are dynamically quantized per token
      and the dot runs int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e);
      both scales fold into the output.
    - {"q4p", "gscale"}: group-wise int4 weights — scales vary along the INPUT
      axis so they cannot fold into the output; the single layer's weight is
      dequantized in-scan (small transient, int4 HBM residency).
    - psum_axis: Megatron row-parallel mode — the weight's INPUT axis is
      sharded over that mesh axis, each shard computes a partial product, and
      the psum runs BEFORE the bias (adding b per shard would scale it by the
      axis size). Output-channel quant scales are full-width, so they fold in
      before the psum unchanged.
    """
    w = p["w"]
    if isinstance(w, dict) and "qa" in w:
        from conceptattention_tpu.ops.quant import quantize_activations_per_token

        xq, xs = quantize_activations_per_token(x)
        y32 = jax.lax.dot_general(
            xq, w["qa"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * xs).astype(x.dtype) * w["scale"][0]
    elif isinstance(w, dict) and "q4p" in w:
        from conceptattention_tpu.ops.quant import dequantize_w4

        y = x @ dequantize_w4(w, x.dtype)
    elif isinstance(w, dict):  # {"q": int8, "scale": [1, out]}
        y = x @ w["q"].astype(x.dtype)
        y = y * w["scale"][0]
    else:
        y = x @ w
    if psum_axis is not None:
        y = jax.lax.psum(y, psum_axis)
    if "b" in p:
        y = y + p["b"]
    return y


def _qkv_heads(x_mod, qkv_p, qnorm, knorm, num_heads):
    """Fused qkv projection -> QK-normalized per-head (q, k, v).

    Weight is [D, 3, H, head_dim] (head-axis shardable); one MXU matmul.
    Quantized weights keep int8 in the dot, scales fold into the output.
    """
    w = qkv_p["w"]
    if isinstance(w, dict) and "qa" in w:
        from conceptattention_tpu.ops.quant import quantize_activations_per_token

        xq, xs = quantize_activations_per_token(x_mod)
        qkv32 = jnp.einsum(
            "bld,dkhe->kbhle", xq, w["qa"], preferred_element_type=jnp.int32
        )
        qkv = (qkv32.astype(jnp.float32) * xs[None, :, None]).astype(x_mod.dtype)
        qkv = qkv * w["scale"][0][:, None, :, None, :]
    elif isinstance(w, dict) and "q4p" in w:
        from conceptattention_tpu.ops.quant import dequantize_w4

        qkv = jnp.einsum(
            "bld,dkhe->kbhle", x_mod, dequantize_w4(w, x_mod.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x_mod.dtype)
    elif isinstance(w, dict):
        qkv = jnp.einsum(
            "bld,dkhe->kbhle", x_mod, w["q"].astype(x_mod.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x_mod.dtype)
        qkv = qkv * w["scale"][0][:, None, :, None, :]
    else:
        qkv = jnp.einsum(
            "bld,dkhe->kbhle", x_mod, w,
            preferred_element_type=jnp.float32,
        ).astype(x_mod.dtype)
    if "b" in qkv_p:
        qkv = qkv + qkv_p["b"][:, None, :, None, :]
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = rms_norm(q, qnorm).astype(v.dtype)
    k = rms_norm(k, knorm).astype(v.dtype)
    return q, k, v


def _mlp(x, p_in, p_out, psum_axis=None):
    """Column-parallel in (sharded hidden + per-channel bias), row-parallel
    out (psum) — the classic Megatron MLP decomposition when psum_axis set."""
    return _linear(
        jax.nn.gelu(_linear(x, p_in), approximate=True), p_out,
        psum_axis=psum_axis,
    )


def _round_up_pow2(x: int) -> int:
    n = 8
    while n < x:
        n <<= 1
    return n


def double_block(
    p: Dict[str, Any],
    img: jax.Array,
    txt: jax.Array,
    vec: jax.Array,
    pe: Tuple[jax.Array, jax.Array],
    num_heads: int,
    concepts: Optional[jax.Array] = None,
    concept_vec: Optional[jax.Array] = None,
    concept_pe: Optional[Tuple[jax.Array, jax.Array]] = None,
    spec: ConceptAttentionSpec = ConceptAttentionSpec(),
    tp_axis: Optional[str] = None,
):
    """One double-stream block step.

    Returns (img, txt, concepts, saliency) where saliency is a dict of
    [B, C, P] float32 maps keyed by tap name (or raw vectors when
    spec.return_raw_vectors), empty when concepts is None.

    tp_axis: run Megatron tensor-parallel INSIDE a shard_map whose mesh has
    that axis — qkv/mlp_in weights arrive column-sharded (local heads / local
    hidden), proj/mlp_out row-sharded, and this body inserts the psums after
    the row-parallel matmuls and over the head-summed saliency maps. The
    result equals the dense block exactly (tests/test_sharding.py); this is
    what makes pp x tp composition real rather than per-stage replication
    (parallel/pipeline.py layer_param_spec).
    """
    if tp_axis is not None and spec.return_raw_vectors:
        raise ValueError(
            "return_raw_vectors emits merged-head vectors, which are "
            "partial-width under tensor parallelism; use the reduced taps"
        )
    img_mod1, img_mod2 = modulation(vec, p["img_mod"]["w"], p["img_mod"]["b"], double=True)
    txt_mod1, txt_mod2 = modulation(vec, p["txt_mod"]["w"], p["txt_mod"]["b"], double=True)

    img_modulated = (1 + img_mod1.scale) * layer_norm(img) + img_mod1.shift
    img_qkv = _qkv_heads(img_modulated, p["img_qkv"], p["img_qnorm"], p["img_knorm"], num_heads)

    txt_modulated = (1 + txt_mod1.scale) * layer_norm(txt) + txt_mod1.shift
    txt_qkv = _qkv_heads(txt_modulated, p["txt_qkv"], p["txt_qnorm"], p["txt_knorm"], num_heads)

    concept_qkv = None
    con_mod1 = con_mod2 = None
    if concepts is not None:
        # Concepts reuse txt weights, with their own modulation vector.
        con_mod1, con_mod2 = modulation(
            concept_vec, p["txt_mod"]["w"], p["txt_mod"]["b"], double=True
        )
        con_modulated = (1 + con_mod1.scale) * layer_norm(concepts) + con_mod1.shift
        concept_qkv = _qkv_heads(
            con_modulated, p["txt_qkv"], p["txt_qnorm"], p["txt_knorm"], num_heads
        )

    txt_attn, img_attn, concept_attn, extras = joint_concept_attention(
        txt_qkv, img_qkv, concept_qkv, pe, concept_pe, spec
    )

    saliency: Dict[str, jax.Array] = {}
    if concepts is not None:
        if spec.return_raw_vectors:
            # Parity mode: the reference's 4 vector sets
            # (modified_double_stream_block.py:185-191).
            saliency = {
                "output_space_concept_vectors": concept_attn,
                "output_space_image_vectors": img_attn,
                "cross_attention_concept_vectors": extras["concept_q"],
                "cross_attention_image_vectors": extras["img_q"],
            }
        else:
            # Head-form similarity == merged-head similarity (sum over h, d);
            # avoids feeding the merged residual tensors into an einsum that
            # would flip the scan carry's layout (ops/attention.py).
            if "output" in spec.taps:
                saliency["output"] = similarity_map_heads(
                    extras["concept_out_h"], extras["img_out_h"]
                )
            if "cross_attention" in spec.taps:
                saliency["cross_attention"] = similarity_map_heads(
                    extras["concept_q"], extras["img_q"]
                )
            if "value" in spec.taps:
                saliency["value"] = similarity_map_heads(
                    extras["concept_v"], extras["img_v"]
                )
            if tp_axis is not None:
                # the head sum ran over LOCAL heads only; psum completes it
                saliency = {
                    k: jax.lax.psum(v, tp_axis) for k, v in saliency.items()
                }

    # Residual + MLP updates (attn-proj and mlp_out are row-parallel under
    # tp_axis: partial products psum'd before the bias).
    img = img + img_mod1.gate * _linear(img_attn, p["img_proj"], psum_axis=tp_axis)
    img = img + img_mod2.gate * _mlp(
        (1 + img_mod2.scale) * layer_norm(img) + img_mod2.shift,
        p["img_mlp_in"], p["img_mlp_out"], psum_axis=tp_axis,
    )
    txt = txt + txt_mod1.gate * _linear(txt_attn, p["txt_proj"], psum_axis=tp_axis)
    txt = txt + txt_mod2.gate * _mlp(
        (1 + txt_mod2.scale) * layer_norm(txt) + txt_mod2.shift,
        p["txt_mlp_in"], p["txt_mlp_out"], psum_axis=tp_axis,
    )
    if concepts is not None:
        concepts = concepts + con_mod1.gate * _linear(
            concept_attn, p["txt_proj"], psum_axis=tp_axis
        )
        concepts = concepts + con_mod2.gate * _mlp(
            (1 + con_mod2.scale) * layer_norm(concepts) + con_mod2.shift,
            p["txt_mlp_in"], p["txt_mlp_out"], psum_axis=tp_axis,
        )

    return img, txt, concepts, saliency


def single_block(
    p: Dict[str, Any],
    x: jax.Array,
    vec: jax.Array,
    pe: Tuple[jax.Array, jax.Array],
    num_heads: int,
    mlp_hidden_dim: int,
    backend: str = "xla",
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    int8_qk: bool = False,
) -> jax.Array:
    """Single-stream block (parallel attention+MLP) — reference
    flux/src/flux/modules/layers.py:194-239. The reference's fused
    linear1/linear2 are held as separate qkv/mlp_in/proj/mlp_out leaves
    (identical math, shardable); XLA fuses the sibling matmuls.

    backend='pallas' runs the 4608-token self-attention through the blockwise
    flash kernel (no [L, L] matrix in HBM — the XLA path materializes ~2 GB of
    fp32 logits per block at 1024^2). int8_qk additionally computes the
    attention scores int8 x int8 on the MXU (Pallas backends only — a
    non-Pallas backend with int8_qk raises rather than silently running
    bf16)."""
    mod, _ = modulation(vec, p["mod"]["w"], p["mod"]["b"], double=False)
    x_mod = (1 + mod.scale) * layer_norm(x) + mod.shift
    q, k, v = _qkv_heads(x_mod, p["qkv"], p["qnorm"], p["knorm"], num_heads)
    mlp = _linear(x_mod, p["mlp_in"])
    if backend in ("pallas", "pallas_interpret"):
        from conceptattention_tpu.kernels.flash_saliency import (
            expand_rope_tables,
            fused_concept_flash_attention,
        )

        l = q.shape[2]
        # None = exact-divisor auto tiles (kernels/flash_saliency._auto_tiles;
        # masked-tail pad waste at 512/1024 cost ~20% MXU on S=4352). The
        # kernel still handles non-divisible lengths with masked tail tiles.
        from conceptattention_tpu.kernels.flash_saliency import _auto_tiles

        auto_q, auto_k = _auto_tiles(l)
        bq = min(block_q or auto_q, _round_up_pow2(l))
        bk = min(block_k or auto_k, _round_up_pow2(l))
        rope_cos, rope_sin = expand_rope_tables([pe], l)
        out = fused_concept_flash_attention(
            q, k, v, txt_len=l, img_len=0, concept_len=0,
            block_q=bq, block_k=bk,
            interpret=(backend == "pallas_interpret"),
            rope_cos=rope_cos, rope_sin=rope_sin, int8_qk=int8_qk,
        )
        attn = merge_heads(out[:, :, :l])
    else:
        if int8_qk:
            raise ValueError(
                f"int8_qk requires a Pallas attention backend, got {backend!r}"
            )
        q, k = apply_rope(q, k, pe)
        attn = merge_heads(sdpa(q, k, v))
    # linear2(concat([attn, gelu(mlp)])) == attn @ W_proj + gelu(mlp) @ W_mlp_out + b
    out = _linear(attn, p["proj"]) + _linear(jax.nn.gelu(mlp, approximate=True), p["mlp_out"])
    return x + mod.gate * out


def last_layer(
    p: Dict[str, Any], x: jax.Array, vec: jax.Array
) -> jax.Array:
    """Final AdaLN + projection (reference layers.py:242-253)."""
    mod = jax.nn.silu(vec) @ p["adaln"]["w"] + p["adaln"]["b"]
    shift, scale = jnp.split(mod, 2, axis=-1)
    x = (1 + scale[:, None, :]) * layer_norm(x) + shift[:, None, :]
    return _linear(x, p["linear"])
