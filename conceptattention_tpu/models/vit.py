"""Functional ViT with attention capture — backbone for the baseline zoo.

Capability parity targets in the reference (manuragkhullar/ConceptAttention):
  - DINO ViT (`binary_segmentation_baselines/dino_src/vision_transformer.py:134-290`):
    self-supervised ViT whose last-layer CLS attention gives concept-agnostic
    saliency;
  - Chefer explainability ViTs (`chefer_vit_explainability/ViT_new.py`,
    `ViT_LRP.py`): ViT-B/16 with per-layer attention maps (and gradients) for
    rollout / GradCAM / transformer-attribution.

One functional ViT serves all of them: `vit_forward(..., return_attn=True)`
returns per-layer attention probabilities as a stacked [depth, B, H, N, N]
array (collected through lax.scan), and jax.grad supplies the attention
gradients the Chefer methods need — no hook machinery required.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    # The Chefer explainability ViT leaves the FINAL LayerNorm at torch's
    # default eps 1e-5 while blocks use 1e-6 (ViT_LRP.py:267); DINO uses 1e-6
    # everywhere. Configurable for exact checkpoint parity.
    final_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


def _linear(x, p):
    return x @ p["w"] + p["b"]


def _ln(x, p, eps=1e-6):
    return layer_norm(x, eps=eps) * p["scale"] + p["bias"]


def _attention(p, x, num_heads, delta=None):
    b, n, d = x.shape
    hd = d // num_heads
    qkv = _linear(x, p["qkv"]).reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / (hd**0.5), axis=-1)
    if delta is not None:
        probs = probs + delta  # zero in forward; carries dlogit/dA in reverse
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return _linear(out, p["proj"]), probs


def vit_block(p, x, num_heads, delta=None):
    attn_out, probs = _attention(p["attn"], _ln(x, p["norm1"]), num_heads, delta)
    x = x + attn_out
    h = _linear(jax.nn.gelu(_linear(_ln(x, p["norm2"]), p["mlp_in"])), p["mlp_out"])
    return x + h, probs


def vit_forward(
    params: Dict[str, Any],
    cfg: ViTConfig,
    images: jax.Array,
    return_attn: bool = False,
    attn_deltas: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """images [B, 3, H, W] -> (logits [B, num_classes],
    attn [depth, B, H, N+1, N+1] when return_attn).

    `attn_deltas` (same shape as the attention stack) is added to each layer's
    attention probabilities — differentiating the target logit w.r.t. a zero
    delta yields dlogit/dA per layer, the quantity the Chefer relevance
    methods need (replaces the reference's backward hooks on attention
    modules, chefer_vit_explainability/ViT_new.py)."""
    b = images.shape[0]
    # Patchify: conv == reshape + matmul for non-overlapping patches.
    ps = cfg.patch_size
    g = images.shape[-1] // ps
    x = images.reshape(b, cfg.in_channels, g, ps, g, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, cfg.in_channels * ps * ps)
    x = _linear(x, params["patch_embed"])

    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:, : x.shape[1]]

    def step(x, xs):
        layer_params, delta = xs
        x, probs = vit_block(layer_params, x, cfg.num_heads, delta)
        return x, probs if return_attn else None

    deltas = attn_deltas
    if deltas is None:
        n = x.shape[1]
        deltas = jnp.zeros((cfg.depth, b, cfg.num_heads, n, n), x.dtype)
    x, attns = jax.lax.scan(step, x, (params["blocks"], deltas))
    x = _ln(x, params["norm"], eps=cfg.final_norm_eps)
    logits = _linear(x[:, 0], params["head"])
    return logits, attns


def init_vit_params(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    d, m = cfg.hidden_size, int(cfg.hidden_size * cfg.mlp_ratio)
    keys = jax.random.split(key, 8)

    def lin(k, din, dout):
        return {
            "w": (jax.random.normal(k, (din, dout), jnp.float32) / din**0.5).astype(dtype),
            "b": jnp.zeros((dout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def block(k):
        ks = jax.random.split(k, 4)
        return {
            "norm1": ln(),
            "attn": {"qkv": lin(ks[0], d, 3 * d), "proj": lin(ks[1], d, d)},
            "norm2": ln(),
            "mlp_in": lin(ks[2], d, m),
            "mlp_out": lin(ks[3], m, d),
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.depth)]
    return {
        "patch_embed": lin(keys[1], cfg.in_channels * cfg.patch_size**2, d),
        "cls_token": (jax.random.normal(keys[2], (1, 1, d)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(keys[3], (1, cfg.num_patches + 1, d)) * 0.02
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": ln(),
        "head": lin(keys[4], d, cfg.num_classes),
    }
