"""T5 encoder stack in functional JAX (for T5-XXL text conditioning on TPU).

The reference runs T5 through HuggingFace torch on the GPU
(`flux/src/flux/modules/conditioner.py:6-38` in
manuragkhullar/ConceptAttention). Here the encoder is a first-class JAX
function so the whole conditioning path jits/shards with the DiT:
relative-position-bucket attention bias, pre-RMSNorm blocks, gated-GELU FFN
(T5 v1.1), no biases — matching the T5EncoderModel architecture so HF
checkpoints convert directly (`convert_t5_state_dict`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from conceptattention_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """Bidirectional T5 bucketing (half for negative offsets, log-spaced tail)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def _attention_bias(p, cfg: T5Config, length: int) -> jax.Array:
    pos = jnp.arange(length)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = relative_position_bucket(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    return p["rel_bias"][buckets].transpose(2, 0, 1)[None]  # [1, H, L, L]


def _block(p, cfg: T5Config, x, bias, mask):
    # self attention (pre-norm, no scaling — T5 folds 1/sqrt(d) into init)
    h = rms_norm(x, p["ln1"])
    b, l, _ = h.shape
    q = (h @ p["q"]).reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
    k = (h @ p["k"]).reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
    v = (h @ p["v"]).reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, l, -1)
    x = x + attn @ p["o"]
    # gated-GELU FFN (T5 v1.1)
    h = rms_norm(x, p["ln2"])
    ff = jax.nn.gelu(h @ p["wi0"], approximate=True) * (h @ p["wi1"])
    return x + ff @ p["wo"]


def t5_encode(
    params: Dict[str, Any],
    cfg: T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array = None,
) -> jax.Array:
    """input_ids [B, L] -> last_hidden_state [B, L, d_model]."""
    x = params["embed"][input_ids]
    l = input_ids.shape[1]
    bias = _attention_bias(params, cfg, l)
    if attention_mask is None:
        mask = jnp.zeros((1, 1, 1, l), jnp.float32)
    else:
        mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

    for i in range(cfg.num_layers):
        x = _block(jax.tree.map(lambda t: t[i], params["blocks"]), cfg, x, bias, mask)
    return rms_norm(x, params["final_ln"])


def init_t5_params(key: jax.Array, cfg: T5Config, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, 4)

    def mat(k, a, b, scale=None):
        s = scale or a**-0.5
        return (jax.random.normal(k, (a, b), jnp.float32) * s).astype(dtype)

    inner = cfg.num_heads * cfg.d_kv

    def block(k):
        ks = jax.random.split(k, 7)
        return {
            "ln1": jnp.ones((cfg.d_model,), dtype),
            "q": mat(ks[0], cfg.d_model, inner, scale=(cfg.d_model * cfg.d_kv) ** -0.5),
            "k": mat(ks[1], cfg.d_model, inner),
            "v": mat(ks[2], cfg.d_model, inner),
            "o": mat(ks[3], inner, cfg.d_model),
            "ln2": jnp.ones((cfg.d_model,), dtype),
            "wi0": mat(ks[4], cfg.d_model, cfg.d_ff),
            "wi1": mat(ks[6], cfg.d_model, cfg.d_ff),  # independent of the
            # gate branch: ks[4] on both made gelu(h@W)*(h@W) at random init
            "wo": mat(ks[5], cfg.d_ff, cfg.d_model),
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "embed": (jax.random.normal(keys[1], (cfg.vocab_size, cfg.d_model), jnp.float32)).astype(dtype),
        "rel_bias": (
            jax.random.normal(keys[2], (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32) * 0.1
        ).astype(jnp.float32),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.ones((cfg.d_model,), dtype),
    }


def convert_t5_state_dict(sd, cfg: T5Config, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF T5EncoderModel state dict -> param pytree."""
    import numpy as np

    def g(key, transpose=True):
        x = sd[key]
        if hasattr(x, "detach"):
            x = x.detach().float().cpu().numpy()
        x = np.asarray(x, np.float32)
        return jnp.asarray(x.T if transpose else x, dtype)

    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        blocks.append({
            "ln1": g(f"{p}.layer.0.layer_norm.weight", False),
            "q": g(f"{p}.layer.0.SelfAttention.q.weight"),
            "k": g(f"{p}.layer.0.SelfAttention.k.weight"),
            "v": g(f"{p}.layer.0.SelfAttention.v.weight"),
            "o": g(f"{p}.layer.0.SelfAttention.o.weight"),
            "ln2": g(f"{p}.layer.1.layer_norm.weight", False),
            "wi0": g(f"{p}.layer.1.DenseReluDense.wi_0.weight"),
            "wi1": g(f"{p}.layer.1.DenseReluDense.wi_1.weight"),
            "wo": g(f"{p}.layer.1.DenseReluDense.wo.weight"),
        })
    return {
        "embed": g("shared.weight", False),
        "rel_bias": jnp.asarray(
            np.asarray(
                sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
            , np.float32),
            jnp.float32,
        ),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": g("encoder.final_layer_norm.weight", False),
    }
