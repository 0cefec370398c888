"""Video DiT with a concept-token stream (CogVideoX-style joint attention).

Capability parity with the reference's video variant
(`experiments/video_model/cogvideox/modified_dit.py:20-460` and
`modified_attention_layer.py:20-293` in manuragkhullar/ConceptAttention):
a single-stream 3D DiT where text and video tokens share one attention over
the concatenated sequence, AdaLN-Zero modulation conditions both streams
separately, and an appended concept stream (reusing the text pathway) attends
over [concept; video] with its own softmax — emitting per-layer, per-frame
concept saliency.

TPU-first design differences:
  - 3D multi-axis RoPE over (frame, y, x) ids instead of learned/sincos
    absolute embeddings — same rope machinery as the Flux DiT
    (ops/rope.embed_nd), compiler-friendly and resolution-generalizing;
  - one parameterized block scanned over depth (lax.scan), not 30 modules;
  - the same fused dual-pass attention contract as the image DiT: the video
    K/V (~17k tokens at 81 frames) stream once per layer for both the joint
    and the concept pass (kernels/flash_saliency.py), with a `seq` mesh axis
    available for context parallelism.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.ops.attention import (
    ConceptAttentionSpec,
    joint_concept_attention,
    merge_heads,
    similarity_map,
)
from conceptattention_tpu.ops.embeddings import mlp_embedder, timestep_embedding
from conceptattention_tpu.ops.norms import layer_norm, modulation, rms_norm
from conceptattention_tpu.ops.rope import embed_nd


@dataclasses.dataclass(frozen=True)
class VideoDiTConfig:
    in_channels: int = 64  # packed latent channels (16 x 2x2 patch)
    text_dim: int = 4096
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 48
    depth: int = 30
    axes_dim: Tuple[int, ...] = (16, 24, 24)  # (frame, y, x)
    theta: int = 10_000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    def __post_init__(self):
        if sum(self.axes_dim) != self.head_dim:
            raise ValueError(f"axes_dim {self.axes_dim} != head_dim {self.head_dim}")


def make_video_ids(
    frames: int, h_tokens: int, w_tokens: int, batch_size: int = 1
) -> jax.Array:
    """(frame, y, x) id triples -> [B, F*h*w, 3] float32."""
    shape = (frames, h_tokens, w_tokens)
    f = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    y = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    x = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    ids = jnp.stack([f, y, x], axis=-1).reshape(1, -1, 3)
    return jnp.broadcast_to(ids, (batch_size, ids.shape[1], 3))


# Shared linear/qkv helpers (incl. weight-only int8 handling).
from conceptattention_tpu.models.flux.blocks import _linear, _qkv_heads


def _video_block(
    p: Dict[str, Any],
    text: jax.Array,
    video: jax.Array,
    vec: jax.Array,
    cvec: Optional[jax.Array],
    pe,
    concept_pe,
    concepts: Optional[jax.Array],
    num_heads: int,
    spec: ConceptAttentionSpec,
):
    """Joint text+video attention block with optional concept stream.

    Shared qkv/proj/mlp weights across modalities (CogVideoX-style), separate
    AdaLN modulation per modality; concepts modulate with the text pathway
    (reference modified_attention_layer.py:30-149)."""
    t_mod1, t_mod2 = modulation(vec, p["text_mod"]["w"], p["text_mod"]["b"], double=True)
    v_mod1, v_mod2 = modulation(vec, p["video_mod"]["w"], p["video_mod"]["b"], double=True)

    text_in = (1 + t_mod1.scale) * layer_norm(text) + t_mod1.shift
    video_in = (1 + v_mod1.scale) * layer_norm(video) + v_mod1.shift
    text_qkv = _qkv_heads(text_in, p["qkv"], p["qnorm"], p["knorm"], num_heads)
    video_qkv = _qkv_heads(video_in, p["qkv"], p["qnorm"], p["knorm"], num_heads)

    concept_qkv = None
    c_mod1 = c_mod2 = None
    if concepts is not None:
        c_mod1, c_mod2 = modulation(
            cvec, p["text_mod"]["w"], p["text_mod"]["b"], double=True
        )
        con_in = (1 + c_mod1.scale) * layer_norm(concepts) + c_mod1.shift
        concept_qkv = _qkv_heads(con_in, p["qkv"], p["qnorm"], p["knorm"], num_heads)

    text_attn, video_attn, concept_attn, extras = joint_concept_attention(
        text_qkv, video_qkv, concept_qkv, pe, concept_pe, spec
    )

    saliency: Dict[str, jax.Array] = {}
    if concepts is not None:
        if "output" in spec.taps:
            saliency["output"] = similarity_map(concept_attn, video_attn)
        if "cross_attention" in spec.taps:
            saliency["cross_attention"] = similarity_map(
                merge_heads(extras["concept_q"]), merge_heads(extras["img_q"])
            )

    text = text + t_mod1.gate * _linear(text_attn, p["proj"])
    video = video + v_mod1.gate * _linear(video_attn, p["proj"])

    def ff(x, mod2):
        h = (1 + mod2.scale) * layer_norm(x) + mod2.shift
        h = _linear(h, p["mlp_in"])
        return _linear(jax.nn.gelu(h, approximate=True), p["mlp_out"])

    text = text + t_mod2.gate * ff(text, t_mod2)
    video = video + v_mod2.gate * ff(video, v_mod2)
    if concepts is not None:
        concepts = concepts + c_mod1.gate * _linear(concept_attn, p["proj"])
        concepts = concepts + c_mod2.gate * ff(concepts, c_mod2)

    return text, video, concepts, saliency


def video_dit_forward(
    params: Dict[str, Any],
    cfg: VideoDiTConfig,
    video: jax.Array,
    video_ids: jax.Array,
    text: jax.Array,
    timesteps: jax.Array,
    concepts: Optional[jax.Array] = None,
    spec: ConceptAttentionSpec = ConceptAttentionSpec(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run the video DiT.

    Args:
      video: [B, F*P, in_channels] packed latent patches.
      video_ids: [B, F*P, 3] (frame, y, x) ids.
      text: [B, T, text_dim] encoder states.
      timesteps: [B] diffusion times (0..1 scale).
      concepts: [B, C, text_dim] first-token concept embeddings.

    Returns (pred [B, F*P, in_channels], saliency dict of [depth, B, C, F*P]).
    """
    b, _, _ = video.shape
    t_len = text.shape[1]

    video = _linear(video, params["video_in"])
    text = _linear(text, params["text_in"])
    vec = mlp_embedder(
        timestep_embedding(timesteps, 256), params["time_in"]
    ).astype(video.dtype)

    text_ids = jnp.zeros((b, t_len, 3), jnp.float32)
    pe = embed_nd(jnp.concatenate([text_ids, video_ids], 1), cfg.axes_dim, cfg.theta)

    concept_pe = None
    cvec = None
    if concepts is not None:
        concepts = _linear(concepts, params["text_in"])
        c_len = concepts.shape[1]
        concept_ids = jnp.zeros((b, c_len, 3), jnp.float32)
        concept_pe = embed_nd(
            jnp.concatenate([concept_ids, video_ids], 1), cfg.axes_dim, cfg.theta
        )
        cvec = vec

    def step(carry, layer_params):
        text, video, concepts = carry
        text, video, concepts, saliency = _video_block(
            layer_params, text, video, vec, cvec, pe, concept_pe, concepts,
            cfg.num_heads, spec,
        )
        return (text, video, concepts), saliency

    (text, video, concepts), saliency = jax.lax.scan(
        step, (text, video, concepts), params["blocks"]
    )

    # Final AdaLN + projection (video tokens only).
    mod = jax.nn.silu(vec) @ params["final"]["adaln"]["w"] + params["final"]["adaln"]["b"]
    shift, scale = jnp.split(mod, 2, axis=-1)
    video = (1 + scale[:, None, :]) * layer_norm(video) + shift[:, None, :]
    pred = _linear(video, params["final"]["linear"])
    return pred, saliency


def init_video_dit_params(
    key: jax.Array, cfg: VideoDiTConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    d, m = cfg.hidden_size, cfg.mlp_hidden_dim
    keys = jax.random.split(key, 8)

    def lin(k, din, dout, bias=True):
        p = {"w": (jax.random.normal(k, (din, dout), jnp.float32) / din**0.5).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def block(k):
        ks = jax.random.split(k, 6)
        qkv_w = (
            jax.random.normal(ks[0], (d, 3, cfg.num_heads, cfg.head_dim), jnp.float32)
            / d**0.5
        ).astype(dtype)
        return {
            "text_mod": lin(ks[1], d, 6 * d),
            "video_mod": lin(ks[2], d, 6 * d),
            "qkv": {"w": qkv_w, "b": jnp.zeros((3, cfg.num_heads, cfg.head_dim), dtype)},
            "qnorm": jnp.ones((cfg.head_dim,), dtype),
            "knorm": jnp.ones((cfg.head_dim,), dtype),
            "proj": lin(ks[3], d, d),
            "mlp_in": lin(ks[4], d, m),
            "mlp_out": lin(ks[5], m, d),
        }

    bkeys = jax.random.split(keys[0], cfg.depth)
    blocks = [block(k) for k in bkeys]
    return {
        "video_in": lin(keys[1], cfg.in_channels, d),
        "text_in": lin(keys[2], cfg.text_dim, d),
        "time_in": {"in": lin(keys[3], 256, d), "out": lin(keys[4], d, d)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final": {
            "adaln": lin(keys[5], d, 2 * d),
            "linear": lin(keys[6], d, cfg.in_channels),
        },
    }
