"""CogVideoX-faithful video DiT with a concept-token stream.

Checkpoint-level parity with the reference's video variant
(`experiments/video_model/cogvideox/modified_dit.py:296-459` and
`modified_attention_layer.py:19-293` in manuragkhullar/ConceptAttention),
which subclasses diffusers' `CogVideoXTransformer3DModel`:

  - `CogVideoXPatchEmbed`: per-frame 2x2 conv patchify of the video latents +
    a text projection, concatenated `[text; video]` (modified_dit.py:341-352:
    concepts go through the SAME patch_embed call as text, so they share the
    text slots — including the 2B variant's absolute positional embeddings);
  - `CogVideoXLayerNormZero` blocks: one affine LayerNorm + a
    `silu(temb) @ W` producing 6 chunks (shift/scale/gate for the video
    stream and for the text-or-concept stream);
  - per-head **LayerNorm** q/k normalization (eps 1e-6, affine) — not RMSNorm;
  - 3D rotary embeddings on the video segment only (text/concept tokens get
    position 0 == identity rotation), axes (t, h, w) = head_dim * (2/8, 3/8,
    3/8), interleaved pairs — the same convention as diffusers'
    `get_3d_rotary_pos_embed` / `apply_rotary_emb`;
  - taps (modified_attention_layer.py:91-137): `output` = merged-head
    concept-outputs x image-outputs; `cross_attention` = roped image queries
    x (un-roped) concept keys, MEAN over heads — note both differ from the
    Flux taps' pre-rope q x q;
  - final `norm_final` LayerNorm -> `norm_out` AdaLayerNorm
    (shift-then-scale chunk order, diffusers `AdaLayerNorm(chunk_dim=1)`) ->
    `proj_out` -> 2x2 unpatchify.

The reference class itself cannot be executed in this environment (it
imports `diffusers`, which is not installed and cannot be fetched), so
numeric parity is tested against a from-scratch tiny torch oracle that
replicates the diffusers math (tests/test_video.py), and the converter
(`weights/convert.py::convert_cogvideox_state_dict`) is keyed to the
published `CogVideoXTransformer3DModel` state-dict layout.

TPU-first design (unchanged from round 1): one parameterized block scanned
over depth with `lax.scan`, the fused dual-pass flash attention kernel for
the ~17k-token sequences, fp32 softmax, and a `seq` mesh axis for context
parallelism.
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
    similarity_map_heads,
)
from conceptattention_tpu.ops.rope import apply_rope, embed_nd


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    """Mirrors `CogVideoXTransformer3DModel.__init__` defaults
    (modified_dit.py:78-109). 5B: num_layers=42, use_rotary=True;
    2B: num_layers=30, use_rotary=False."""

    num_attention_heads: int = 30
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    num_layers: int = 30
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    patch_size: int = 2
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    norm_eps: float = 1e-5
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mlp_hidden_dim(self) -> int:
        return 4 * self.hidden_size  # diffusers FeedForward default mult=4

    @property
    def rope_axes_dim(self) -> Tuple[int, int, int]:
        # get_3d_rotary_pos_embed: dim_t = d/4, dim_h = dim_w = 3d/8.
        d = self.attention_head_dim
        return (d // 4, 3 * d // 8, 3 * d // 8)


# Backwards-compatible alias (round-1 public name).
VideoDiTConfig = CogVideoXConfig


def cogvideox_5b_config(**overrides) -> CogVideoXConfig:
    base = dict(
        num_attention_heads=48,
        num_layers=42,
        use_rotary_positional_embeddings=True,
    )
    base.update(overrides)  # overrides may retarget the 5b defaults too
    return CogVideoXConfig(**base)


def make_video_ids(
    frames: int, h_tokens: int, w_tokens: int, batch_size: int = 1
) -> jax.Array:
    """(frame, y, x) id triples -> [B, F*h*w, 3] float32.

    Matches the grid diffusers' `get_3d_rotary_pos_embed` builds at the
    model's native resolution (integer iota per axis)."""
    shape = (frames, h_tokens, w_tokens)
    f = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    y = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    x = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
    ids = jnp.stack([f, y, x], axis=-1).reshape(1, -1, 3)
    return jnp.broadcast_to(ids, (batch_size, ids.shape[1], 3))


# Shared linear helper (incl. weight-only int8 handling).
from conceptattention_tpu.models.flux.blocks import _linear


def _timestep_embedding(t: jax.Array, dim: int, flip_sin_to_cos: bool,
                        freq_shift: int, max_period: float = 10_000.0) -> jax.Array:
    """diffusers `get_timestep_embedding`: t is the RAW scheduler timestep
    (0..999 ints), not flux's 0..1 scale."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
        / (half - freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


def _sincos_pos_embed_1d(dim: int, pos: jax.Array) -> jax.Array:
    """get_1d_sincos_pos_embed_from_grid: [L] -> [L, dim], [sin | cos]."""
    omega = 1.0 / (10_000.0 ** (jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)))
    out = pos.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def cogvideox_pos_embedding(cfg: CogVideoXConfig) -> jax.Array:
    """The 2B variant's absolute sincos positional embedding
    (CogVideoXPatchEmbed._get_positional_embeddings; a persistent=False
    buffer in diffusers, so it is computed, not loaded).

    Returns [1, max_text_seq_length + T_video, hidden] with zero text slots.
    """
    d = cfg.hidden_size
    p = cfg.patch_size
    h = cfg.sample_height // p
    w = cfg.sample_width // p
    f = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
    # get_3d_sincos_pos_embed: spatial 3/4 of dim (h+w halves), temporal 1/4.
    d_s = d // 4 * 3
    d_t = d // 4
    gh = jnp.arange(h, dtype=jnp.float32) / cfg.spatial_interpolation_scale
    gw = jnp.arange(w, dtype=jnp.float32) / cfg.spatial_interpolation_scale
    gt = jnp.arange(f, dtype=jnp.float32) / cfg.temporal_interpolation_scale
    # diffusers quirk, kept for checkpoint parity: get_3d_sincos_pos_embed
    # builds grid = meshgrid(grid_w, grid_h), and
    # get_2d_sincos_pos_embed_from_grid puts f(grid[0]) — the W mesh,
    # misleadingly named emb_h — in the FIRST half. The published CogVideoX-2B
    # weights were trained against that layout, so the first spatial half must
    # be the w-coordinate embedding (visible on the non-square 45x30 grid).
    wg, hg = jnp.meshgrid(gw, gh)  # each [h, w]
    emb_first = _sincos_pos_embed_1d(d_s // 2, wg)  # f(w): diffusers' "emb_h"
    emb_second = _sincos_pos_embed_1d(d_s // 2, hg)
    spatial = jnp.concatenate([emb_first, emb_second], axis=-1)  # [h*w, d_s]
    temporal = _sincos_pos_embed_1d(d_t, gt)  # [f, d_t]
    spatial = jnp.broadcast_to(spatial[None], (f, h * w, d_s))
    temporal = jnp.broadcast_to(temporal[:, None, :], (f, h * w, d_t))
    joint = jnp.concatenate([temporal, spatial], axis=-1).reshape(1, f * h * w, d)
    return jnp.concatenate(
        [jnp.zeros((1, cfg.max_text_seq_length, d), joint.dtype), joint], axis=1
    )


def patchify_latents(video: jax.Array, patch: int = 2) -> jax.Array:
    """[B, F, C, H, W] -> [B, F*(H/p)*(W/p), C*p*p] with (c, dy, dx) element
    order, so the conv patch kernel reshapes to a plain matmul weight."""
    b, f, c, h, w = video.shape
    x = video.reshape(b, f, c, h // patch, patch, w // patch, patch)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [B,F,h,w,C,p,p]
    return x.reshape(b, f * (h // patch) * (w // patch), c * patch * patch)


def unpatchify_latents(
    tokens: jax.Array, frames: int, h: int, w: int, out_channels: int, patch: int = 2
) -> jax.Array:
    """[B, F*h*w/p^2, C*p*p] -> [B, F, C, H, W] (modified_dit.py:443-446)."""
    b = tokens.shape[0]
    x = tokens.reshape(b, frames, h // patch, w // patch, out_channels, patch, patch)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, frames, out_channels, h, w)


def _ln(x: jax.Array, w=None, b=None, eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    if w is not None:
        out = out * w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _norm_zero(p: Dict[str, Any], temb: jax.Array, hidden: jax.Array,
               other: jax.Array, eps: float):
    """CogVideoXLayerNormZero: affine LN + 6-chunk AdaLN from temb.

    Returns (norm_hidden, norm_other, gate, other_gate)."""
    mod = _linear(jax.nn.silu(temb), p["lin"])  # quant-aware (int8 serving)
    shift, scale, gate, o_shift, o_scale, o_gate = jnp.split(mod, 6, axis=-1)
    nh = _ln(hidden, p["ln"]["w"], p["ln"]["b"], eps) * (1 + scale[:, None]) + shift[:, None]
    no = _ln(other, p["ln"]["w"], p["ln"]["b"], eps) * (1 + o_scale[:, None]) + o_shift[:, None]
    return nh, no, gate[:, None], o_gate[:, None]


def _qkv_heads_ln(x: jax.Array, qkv: Dict[str, Any], qnorm: Dict[str, Any],
                  knorm: Dict[str, Any], num_heads: int):
    """Fused qkv projection ([D, 3*H*hd] laid out (3, H, hd)) + per-head
    LayerNorm q/k norm (diffusers Attention(qk_norm="layer_norm", eps=1e-6)
    — affine, with bias)."""
    h = _linear(x, qkv)
    b, l, _ = h.shape
    hd = h.shape[-1] // (3 * num_heads)
    h = h.reshape(b, l, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q = _ln(h[0], qnorm["w"], qnorm["b"], eps=1e-6)
    k = _ln(h[1], knorm["w"], knorm["b"], eps=1e-6)
    return q, k, h[2]


def _video_block(
    p: Dict[str, Any],
    cfg: CogVideoXConfig,
    video: jax.Array,
    text: jax.Array,
    concepts: Optional[jax.Array],
    temb: jax.Array,
    pe,
    concept_pe,
    spec: ConceptAttentionSpec,
):
    """ModifiedCogVideoXBlock (modified_attention_layer.py:152-293): shared
    attention/FF weights across modalities; concepts ride the encoder branch
    of both LayerNormZeros, conditioned on the video hidden states."""
    n_video, n_text, v_gate, t_gate = _norm_zero(p["norm1"], temb, video, text, cfg.norm_eps)
    heads = cfg.num_attention_heads
    video_qkv = _qkv_heads_ln(n_video, p["qkv"], p["qnorm"], p["knorm"], heads)
    text_qkv = _qkv_heads_ln(n_text, p["qkv"], p["qnorm"], p["knorm"], heads)

    concept_qkv = None
    c_gate = None
    if concepts is not None:
        _, n_con, _, c_gate = _norm_zero(p["norm1"], temb, video, concepts, cfg.norm_eps)
        concept_qkv = _qkv_heads_ln(n_con, p["qkv"], p["qnorm"], p["knorm"], heads)

    text_attn, video_attn, concept_attn, extras = joint_concept_attention(
        text_qkv, video_qkv, concept_qkv, pe, concept_pe, spec
    )

    saliency: Dict[str, jax.Array] = {}
    if concepts is not None:
        if "output" in spec.taps:
            # concept_attention_maps: merged-head outputs dot product
            # (modified_attention_layer.py:125-131); computed head-form
            # (== merged, summed over h and d) to keep the carry row-major.
            saliency["output"] = similarity_map_heads(
                extras["concept_out_h"], extras["img_out_h"]
            )
        if "cross_attention" in spec.taps:
            # cross_attention_maps: ROPED image queries x un-roped concept
            # keys, mean over heads (modified_attention_layer.py:108-122).
            t_len = text.shape[1]
            cos, sin = pe
            img_pe = (cos[:, :, t_len:], sin[:, :, t_len:])
            img_q_r, _ = apply_rope(extras["img_q"], extras["img_q"], img_pe)
            saliency["cross_attention"] = jnp.einsum(
                "bhpd,bhcd->bcp", img_q_r, extras["concept_k"],
                preferred_element_type=jnp.float32,
            ) / heads

    # to_out projection, gated residuals (attention stream).
    video = video + v_gate * _linear(video_attn, p["proj"])
    text = text + t_gate * _linear(text_attn, p["proj"])
    if concepts is not None:
        concepts = concepts + c_gate * _linear(concept_attn, p["proj"])
        # Concept FF runs on its own LayerNormZero pass, conditioned on the
        # UPDATED concept states but the pre-attention video states
        # (modified_attention_layer.py:264-272).
        _, n_con, _, c_gate_ff = _norm_zero(p["norm2"], temb, video, concepts, cfg.norm_eps)
        ff_c = _linear(jax.nn.gelu(_linear(n_con, p["ff_in"]), approximate=True), p["ff_out"])
        concepts = concepts + c_gate_ff * ff_c

    n_video, n_text, v_gate_ff, t_gate_ff = _norm_zero(p["norm2"], temb, video, text, cfg.norm_eps)
    joint = jnp.concatenate([n_text, n_video], axis=1)
    ff = _linear(jax.nn.gelu(_linear(joint, p["ff_in"]), approximate=True), p["ff_out"])
    t_len = text.shape[1]
    video = video + v_gate_ff * ff[:, t_len:]
    text = text + t_gate_ff * ff[:, :t_len]
    return video, text, concepts, saliency


def video_dit_forward(
    params: Dict[str, Any],
    cfg: CogVideoXConfig,
    video: jax.Array,
    text: jax.Array,
    timestep: jax.Array,
    concepts: Optional[jax.Array] = None,
    video_ids: Optional[jax.Array] = None,
    spec: ConceptAttentionSpec = ConceptAttentionSpec(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run the CogVideoX DiT (modified_dit.py:295-459).

    Args:
      video: [B, F, C, H, W] latents (pre-patchify, like the reference).
      text: [B, T<=226, text_embed_dim] T5 encoder states.
      timestep: [B] RAW scheduler timesteps (0..999 ints as floats).
      concepts: [B, C_tokens, text_embed_dim] concept embeddings (the
        reference pads these to max_text_seq_length at the pipeline level;
        any length is accepted here).
      video_ids: optional [B, F*P, 3] rope ids (default: native iota grid).

    Returns (pred [B, F, C_out, H, W], saliency dict of [depth, B, C, F*P]).
    """
    b, f, c, h, w = video.shape
    p = cfg.patch_size
    t_len = text.shape[1]

    temb = _timestep_embedding(
        timestep, cfg.hidden_size, cfg.flip_sin_to_cos, cfg.freq_shift
    ).astype(video.dtype)
    temb = _linear(jax.nn.silu(_linear(temb, params["time_lin1"])), params["time_lin2"])

    tokens = _linear(patchify_latents(video, p), params["patch_proj"])
    text = _linear(text, params["text_proj"])

    has_concepts = concepts is not None
    if has_concepts:
        concepts = _linear(concepts, params["text_proj"])

    if not cfg.use_rotary_positional_embeddings:
        # 2B variant: absolute sincos embeddings over the joint sequence;
        # concepts pick up the same text-slot embeddings the reference's
        # second patch_embed call gives them (modified_dit.py:341-343).
        pos = cogvideox_pos_embedding(cfg).astype(tokens.dtype)
        tokens = tokens + pos[:, cfg.max_text_seq_length : cfg.max_text_seq_length + tokens.shape[1]]
        text = text + pos[:, :t_len]
        if has_concepts:
            concepts = concepts + pos[:, : concepts.shape[1]]

    if video_ids is None:
        video_ids = make_video_ids(f, h // p, w // p, batch_size=b)
    if cfg.use_rotary_positional_embeddings:
        axes = cfg.rope_axes_dim
        theta = 10_000
    else:
        # No rope for 2B: zero ids make the rotation the identity, letting
        # one code path serve both variants.
        video_ids = jnp.zeros_like(video_ids)
        axes = cfg.rope_axes_dim
        theta = 10_000
    text_ids = jnp.zeros((b, t_len, 3), jnp.float32)
    pe = embed_nd(jnp.concatenate([text_ids, video_ids], 1), axes, theta)
    concept_pe = None
    if has_concepts:
        concept_ids = jnp.zeros((b, concepts.shape[1], 3), jnp.float32)
        concept_pe = embed_nd(
            jnp.concatenate([concept_ids, video_ids], 1), axes, theta
        )

    def step(carry, layer_params):
        video_s, text_s, concepts_s = carry
        video_s, text_s, concepts_s, saliency = _video_block(
            layer_params, cfg, video_s, text_s, concepts_s, temb,
            pe, concept_pe, spec,
        )
        return (video_s, text_s, concepts_s), saliency

    (tokens, text, concepts), saliency = jax.lax.scan(
        step, (tokens, text, concepts if has_concepts else None), params["blocks"]
    )

    # norm_final on [text; video] then strip (per-token LN: equal to
    # normalizing the video segment alone; modified_dit.py:428-435).
    tokens = _ln(tokens, params["norm_final"]["w"], params["norm_final"]["b"], cfg.norm_eps)
    # norm_out: AdaLayerNorm(chunk_dim=1) -> SHIFT then SCALE order.
    mod = jax.nn.silu(temb) @ params["norm_out_lin"]["w"] + params["norm_out_lin"]["b"]
    shift, scale = jnp.split(mod, 2, axis=-1)
    tokens = _ln(tokens, params["norm_out_ln"]["w"], params["norm_out_ln"]["b"],
                 cfg.norm_eps) * (1 + scale[:, None]) + shift[:, None]
    tokens = _linear(tokens, params["proj_out"])
    pred = unpatchify_latents(tokens, f, h, w, cfg.out_channels, p)
    return pred, saliency


def init_video_dit_params(
    key: jax.Array, cfg: CogVideoXConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    d, m, te = cfg.hidden_size, cfg.mlp_hidden_dim, cfg.time_embed_dim
    hd = cfg.attention_head_dim
    keys = jax.random.split(key, 9)

    def lin(k, din, dout, bias=True):
        p = {"w": (jax.random.normal(k, (din, dout), jnp.float32) / din**0.5).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def ln_p():
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def block(k):
        ks = jax.random.split(k, 6)
        qkv_w = (
            jax.random.normal(ks[0], (d, 3 * d), jnp.float32) / d**0.5
        ).astype(dtype)
        return {
            "norm1": {"ln": ln_p(), "lin": lin(ks[1], te, 6 * d)},
            "norm2": {"ln": ln_p(), "lin": lin(ks[2], te, 6 * d)},
            "qkv": {"w": qkv_w, "b": jnp.zeros((3 * d,), dtype)},
            "qnorm": {"w": jnp.ones((hd,), dtype), "b": jnp.zeros((hd,), dtype)},
            "knorm": {"w": jnp.ones((hd,), dtype), "b": jnp.zeros((hd,), dtype)},
            "proj": lin(ks[3], d, d),
            "ff_in": lin(ks[4], d, m),
            "ff_out": lin(ks[5], m, d),
        }

    in_dim = cfg.in_channels * cfg.patch_size * cfg.patch_size
    out_dim = cfg.out_channels * cfg.patch_size * cfg.patch_size
    bkeys = jax.random.split(keys[0], cfg.num_layers)
    blocks = [block(k) for k in bkeys]
    return {
        "patch_proj": lin(keys[1], in_dim, d),
        "text_proj": lin(keys[2], cfg.text_embed_dim, d),
        "time_lin1": lin(keys[3], d, te),
        "time_lin2": lin(keys[4], te, te),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_final": ln_p(),
        "norm_out_ln": ln_p(),
        "norm_out_lin": lin(keys[5], te, 2 * d),
        "proj_out": lin(keys[6], d, out_dim),
    }
