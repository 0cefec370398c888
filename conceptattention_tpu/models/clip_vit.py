"""open_clip-compatible CLIP (ViT-H/14 class) with a closed-form PRS decomposition.

Capability parity with the reference's vendored `clip_text_span/` open_clip
fork (manuragkhullar/ConceptAttention,
`binary_segmentation_baselines/clip_text_span/utils/transformer.py:760-880`
VisionTransformer, `utils/model.py:228-270` CLIP, `prs_hook.py:13-183`
PRSLogger). The reference instruments the torch model with forward hooks
("attn_method='head'") to log, per layer, each source token's per-head
contribution to the CLS attention output, then linearizes the final LayerNorm
around the observed mean/std and projects everything into the shared
image-text embedding space.

TPU-first: no hook machinery. One `lax.scan` over the blocks carries both the
residual stream and an accumulator of summed (over layers and heads) per-token
CLS contributions; the final-LN linearization is an affine map applied once to
the accumulated sum (exact, because the reference's per-(layer, head)
normalization is affine and the baseline consumes only the (layer, head)-summed
maps — `clip_text_span_baseline.py:80-82` `attentions[:, :, 1:].sum(axis=(1, 3))`).

Checkpoint layout: `convert_open_clip_state_dict` consumes open_clip's
`visual.*` / text-tower key names (ViT-H/14 laion2b and friends).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OpenCLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    embed_dim: int = 1024
    in_channels: int = 3
    # open_clip ViT-H/14 uses exact-erf GELU; quick_gelu only for OpenAI ckpts.
    quick_gelu: bool = False
    ln_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class OpenCLIPTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    embed_dim: int = 1024
    quick_gelu: bool = False
    ln_eps: float = 1e-5


VIT_H_14 = OpenCLIPVisionConfig()
VIT_H_14_TEXT = OpenCLIPTextConfig()


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _gelu(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _qkv_split(x, p, num_heads):
    """[B, N, D] -> per-head q, k, v each [B, H, N, hd] (packed in_proj layout:
    output dim ordered (3, heads, head_dim) like torch MultiheadAttention)."""
    b, n, d = x.shape
    hd = d // num_heads
    qkv = (x @ p["qkv"]["w"] + p["qkv"]["b"]).reshape(b, n, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]


def _block_with_cls_contrib(p, cfg: OpenCLIPVisionConfig, x, with_contrib=True):
    """Pre-LN block forward; also returns each source token's contribution
    (summed over heads, including the out-proj bias spread as bias/(N*H) per
    (token, head) — reference transformer.py:490-515, prs_hook.py:28-38)
    to the CLS attention output: [B, N, D]. `with_contrib=False` skips the
    decomposition einsum (plain forward; returns None)."""
    h_in = _ln(x, p["ln1"], cfg.ln_eps)
    q, k, v = _qkv_split(h_in, p, cfg.num_heads)
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / (hd**0.5), axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    b, hn, n, _ = attn.shape
    merged = attn.transpose(0, 2, 1, 3).reshape(b, n, cfg.width)
    attn_out = merged @ p["out"]["w"] + p["out"]["b"]

    cls_contrib = None
    if with_contrib:
        # CLS-row decomposition: contribution of source token m via head h is
        # probs[b, h, 0, m] * v[b, h, m] @ W_O[h]; heads summed here since the
        # TextSpan baseline only consumes the head-summed maps.
        w_o = p["out"]["w"].reshape(cfg.num_heads, hd, cfg.width)
        cls_contrib = jnp.einsum(
            "bhm,bhmd,hde->bme", probs[:, :, 0, :], v, w_o,
            preferred_element_type=jnp.float32,
        )
        # out_proj bias spread bias/(N*H) per (token, head) -> bias/N per token.
        cls_contrib = cls_contrib + p["out"]["b"].astype(jnp.float32) / n

    x = x + attn_out
    h2 = _ln(x, p["ln2"], cfg.ln_eps)
    h2 = _gelu(h2 @ p["fc1"]["w"] + p["fc1"]["b"], cfg.quick_gelu)
    x = x + h2 @ p["fc2"]["w"] + p["fc2"]["b"]
    return x, cls_contrib


def _embed_patches(params, cfg: OpenCLIPVisionConfig, images):
    b = images.shape[0]
    ps = cfg.patch_size
    g = images.shape[-1] // ps
    x = images.reshape(b, cfg.in_channels, g, ps, g, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, cfg.in_channels * ps * ps)
    x = x @ params["patch_embed"]["w"]  # conv1 has no bias in open_clip
    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][: x.shape[1]]
    return _ln(x, params["ln_pre"], cfg.ln_eps)


def encode_image(params, cfg: OpenCLIPVisionConfig, images) -> jax.Array:
    """[B, 3, H, W] -> CLS representation in the shared space [B, embed_dim]
    (open_clip `encode_image(normalize=False)`). Plain forward — none of the
    per-layer PRS decomposition einsums or the fp32 contribution accumulator
    (those live in the scan carry and would not be dead-code-eliminated)."""
    x = _embed_patches(params, cfg, images)

    def step(x, p):
        x, _ = _block_with_cls_contrib(p, cfg, x, with_contrib=False)
        return x, None

    x, _ = jax.lax.scan(step, x, params["blocks"])
    pooled = x[:, 0].astype(jnp.float32)
    mean = jnp.mean(pooled, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.var(pooled, axis=-1, keepdims=True) + cfg.ln_eps)
    rep = (
        (pooled - mean) / std * params["ln_post"]["scale"].astype(jnp.float32)
        + params["ln_post"]["bias"].astype(jnp.float32)
    ) @ params["proj"].astype(jnp.float32)
    return rep


def prs_decomposition(
    params, cfg: OpenCLIPVisionConfig, images
) -> Tuple[jax.Array, jax.Array]:
    """Forward pass + PRS attention decomposition.

    Returns (representation [B, embed_dim],
             collapsed [B, N, embed_dim]) where collapsed[b, m] is the sum
    over layers and heads of token m's projected, LN-linearized, norm-divided
    contribution to the CLS representation — exactly the reference's
    `prs.finalize(...)[0].sum(axis=(1, 3))` (clip_text_span_baseline.py:78-82,
    prs_hook.py:89-111,133-155). Token 0 is CLS; callers typically slice [1:].
    """
    x = _embed_patches(params, cfg, images)
    b, n, _ = x.shape

    def step(carry, layer_params):
        x, acc = carry
        x, contrib = _block_with_cls_contrib(layer_params, cfg, x)
        return (x, acc + contrib), None

    acc0 = jnp.zeros((b, n, cfg.width), jnp.float32)
    (x, acc), _ = jax.lax.scan(step, (x, acc0), params["blocks"])

    # Final-LN statistics of the CLS token (the reference logs these from the
    # live forward, prs_hook.py:62-69, and linearizes LN around them).
    pooled = x[:, 0].astype(jnp.float32)
    mean = jnp.mean(pooled, axis=-1, keepdims=True)  # [B, 1]
    std = jnp.sqrt(jnp.var(pooled, axis=-1, keepdims=True) + cfg.ln_eps)
    rep = (
        (pooled - mean) / std * params["ln_post"]["scale"].astype(jnp.float32)
        + params["ln_post"]["bias"].astype(jnp.float32)
    ) @ params["proj"].astype(jnp.float32)

    # Affine LN linearization applied to the (layer, head)-summed accumulator:
    # each of the L*H per-(l, h) terms subtracts mean/(len_int*N*H) and adds
    # bias/(len_int*N*H) (prs_hook.py:89-111); summed over l and h that is
    # mean*L/(len_int*N) and bias*L/(len_int*N). len_intermediates = 2L+1
    # (L attentions + L MLPs + the ln_pre output, prs_hook.py:90,176-181).
    depth = jax.tree.leaves(params["blocks"])[0].shape[0]
    len_int = 2 * depth + 1
    frac = depth / (len_int * n)
    collapsed = (
        (acc - mean[:, None, :] * frac)
        * params["ln_post"]["scale"].astype(jnp.float32)
        / std[:, None, :]
        + params["ln_post"]["bias"].astype(jnp.float32) * frac
    ) @ params["proj"].astype(jnp.float32)
    collapsed = collapsed / jnp.linalg.norm(rep, axis=-1)[:, None, None]
    return rep, collapsed


def text_encode(params, cfg: OpenCLIPTextConfig, input_ids: jax.Array) -> jax.Array:
    """open_clip TextTransformer: causal blocks, ln_final, pooled at the
    argmax token id (EOT has the highest vocab id), @ text_projection.
    Returns [B, embed_dim] (unnormalized)."""
    l = input_ids.shape[1]
    x = params["token_embed"][input_ids] + params["pos_embed"][:l]
    causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)

    def step(x, p):
        h_in = _ln(x, p["ln1"], cfg.ln_eps)
        q, k, v = _qkv_split(h_in, p, cfg.num_heads)
        hd = q.shape[-1]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / (hd**0.5) + causal, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, _, n, _ = attn.shape
        merged = attn.transpose(0, 2, 1, 3).reshape(b, n, cfg.width)
        x = x + merged @ p["out"]["w"] + p["out"]["b"]
        h2 = _ln(x, p["ln2"], cfg.ln_eps)
        h2 = _gelu(h2 @ p["fc1"]["w"] + p["fc1"]["b"], cfg.quick_gelu)
        return x + h2 @ p["fc2"]["w"] + p["fc2"]["b"], None

    x, _ = jax.lax.scan(step, x, params["blocks"])
    x = _ln(x, params["ln_final"], cfg.ln_eps)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None].repeat(x.shape[-1], -1), 1)[:, 0]
    return pooled @ params["text_projection"]


# ---------------------------------------------------------------------------
# Converters: open_clip state-dict layout -> param pytrees.
# ---------------------------------------------------------------------------

def _np(x):
    import numpy as np

    if hasattr(x, "detach"):
        x = x.detach().float().cpu().numpy()
    return np.asarray(x, np.float32)


def _block_from_sd(sd, prefix, width, num_heads, dtype):
    """One resblock: torch Linear weights are [out, in] -> transpose; the
    packed in_proj keeps its (3, H, hd) output ordering."""

    def lin(key):
        return {
            "w": jnp.asarray(_np(sd[f"{key}.weight"]).T, dtype),
            "b": jnp.asarray(_np(sd[f"{key}.bias"]), dtype),
        }

    def ln(key):
        return {
            "scale": jnp.asarray(_np(sd[f"{key}.weight"]), dtype),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]), dtype),
        }

    return {
        "ln1": ln(f"{prefix}.ln_1"),
        "qkv": {
            "w": jnp.asarray(_np(sd[f"{prefix}.attn.in_proj_weight"]).T, dtype),
            "b": jnp.asarray(_np(sd[f"{prefix}.attn.in_proj_bias"]), dtype),
        },
        "out": lin(f"{prefix}.attn.out_proj"),
        "ln2": ln(f"{prefix}.ln_2"),
        "fc1": lin(f"{prefix}.mlp.c_fc"),
        "fc2": lin(f"{prefix}.mlp.c_proj"),
    }


def convert_open_clip_visual(sd, cfg: OpenCLIPVisionConfig, dtype=jnp.float32):
    """open_clip `visual.*` keys -> vision param pytree. conv1 [D, 3, ps, ps]
    flattens to the (c, py, px) patch layout `_embed_patches` produces."""
    conv = _np(sd["visual.conv1.weight"])  # [D, C, ps, ps]
    d = conv.shape[0]
    blocks = [
        _block_from_sd(sd, f"visual.transformer.resblocks.{i}", cfg.width,
                       cfg.num_heads, dtype)
        for i in range(cfg.depth)
    ]
    return {
        "patch_embed": {"w": jnp.asarray(conv.reshape(d, -1).T, dtype)},
        "cls_token": jnp.asarray(_np(sd["visual.class_embedding"]), dtype),
        "pos_embed": jnp.asarray(_np(sd["visual.positional_embedding"]), dtype),
        "ln_pre": {
            "scale": jnp.asarray(_np(sd["visual.ln_pre.weight"]), dtype),
            "bias": jnp.asarray(_np(sd["visual.ln_pre.bias"]), dtype),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_post": {
            "scale": jnp.asarray(_np(sd["visual.ln_post.weight"]), dtype),
            "bias": jnp.asarray(_np(sd["visual.ln_post.bias"]), dtype),
        },
        "proj": jnp.asarray(_np(sd["visual.proj"]), dtype),
    }


def convert_open_clip_text(sd, cfg: OpenCLIPTextConfig, dtype=jnp.float32):
    """open_clip text-tower keys -> text param pytree."""
    blocks = [
        _block_from_sd(sd, f"transformer.resblocks.{i}", cfg.width,
                       cfg.num_heads, dtype)
        for i in range(cfg.depth)
    ]
    return {
        "token_embed": jnp.asarray(_np(sd["token_embedding.weight"]), dtype),
        "pos_embed": jnp.asarray(_np(sd["positional_embedding"]), dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_final": {
            "scale": jnp.asarray(_np(sd["ln_final.weight"]), dtype),
            "bias": jnp.asarray(_np(sd["ln_final.bias"]), dtype),
        },
        "text_projection": jnp.asarray(_np(sd["text_projection"]), dtype),
    }


def init_open_clip_params(
    key: jax.Array, vis: OpenCLIPVisionConfig, txt: OpenCLIPTextConfig = None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Random params (testing / offline smoke); text tower included when a
    text config is given."""
    keys = jax.random.split(key, 12)

    def lin(k, din, dout):
        return {
            "w": (jax.random.normal(k, (din, dout)) / din**0.5).astype(dtype),
            "b": jnp.zeros((dout,), dtype),
        }

    def ln(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def blocks(k, width, heads, depth, mlp_ratio):
        m = int(width * mlp_ratio)

        def block(kk):
            ks = jax.random.split(kk, 4)
            return {
                "ln1": ln(width),
                "qkv": lin(ks[0], width, 3 * width),
                "out": lin(ks[1], width, width),
                "ln2": ln(width),
                "fc1": lin(ks[2], width, m),
                "fc2": lin(ks[3], m, width),
            }

        bs = [block(kk) for kk in jax.random.split(k, depth)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)

    vis_params = {
        "patch_embed": {
            "w": (
                jax.random.normal(
                    keys[0], (vis.in_channels * vis.patch_size**2, vis.width)
                ) * vis.width**-0.5
            ).astype(dtype)
        },
        "cls_token": (jax.random.normal(keys[1], (vis.width,)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(keys[2], (vis.num_tokens, vis.width)) * 0.02
        ).astype(dtype),
        "ln_pre": ln(vis.width),
        "blocks": blocks(keys[3], vis.width, vis.num_heads, vis.depth, vis.mlp_ratio),
        "ln_post": ln(vis.width),
        "proj": (
            jax.random.normal(keys[4], (vis.width, vis.embed_dim)) * vis.width**-0.5
        ).astype(dtype),
    }
    if txt is None:
        return {"visual": vis_params}
    txt_params = {
        "token_embed": (
            jax.random.normal(keys[5], (txt.vocab_size, txt.width)) * 0.02
        ).astype(dtype),
        "pos_embed": (
            jax.random.normal(keys[6], (txt.context_length, txt.width)) * 0.01
        ).astype(dtype),
        "blocks": blocks(keys[7], txt.width, txt.num_heads, txt.depth, txt.mlp_ratio),
        "ln_final": ln(txt.width),
        "text_projection": (
            jax.random.normal(keys[8], (txt.width, txt.embed_dim)) * txt.width**-0.5
        ).astype(dtype),
    }
    return {"visual": vis_params, "text": txt_params}
