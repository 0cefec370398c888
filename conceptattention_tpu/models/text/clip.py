"""CLIP text encoder in functional JAX (pooled vector conditioning on TPU).

The reference runs CLIP-L through HuggingFace torch
(`flux/src/flux/modules/conditioner.py:6-38`, pooler_output). This is the
text tower as a JAX function — causal transformer with quick-GELU, learned
positional embeddings, final LN, EOS-token pooling — matching
`transformers.CLIPTextModel` so its checkpoints convert directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 12
    max_position_embeddings: int = 77
    eos_token_id: int = 49407


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)) * p["scale"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block(p, cfg: CLIPTextConfig, x, causal_mask):
    h = _ln(x, p["ln1"])
    b, l, d = h.shape
    hd = d // cfg.num_heads

    def heads(y):
        return y.reshape(b, l, cfg.num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(h @ p["q"]["w"] + p["q"]["b"])
    k = heads(h @ p["k"]["w"] + p["k"]["b"])
    v = heads(h @ p["v"]["w"] + p["v"]["b"])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / (hd**0.5) + causal_mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, l, d)
    x = x + attn @ p["o"]["w"] + p["o"]["b"]
    h = _ln(x, p["ln2"])
    h = _quick_gelu(h @ p["fc1"]["w"] + p["fc1"]["b"])
    return x + h @ p["fc2"]["w"] + p["fc2"]["b"]


def clip_text_encode(
    params: Dict[str, Any], cfg: CLIPTextConfig, input_ids: jax.Array
) -> Dict[str, jax.Array]:
    """-> {"last_hidden_state" [B,L,D], "pooler_output" [B,D] (EOS token)}."""
    l = input_ids.shape[1]
    x = params["token_embed"][input_ids] + params["pos_embed"][:l]
    causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
    for i in range(cfg.num_layers):
        x = _block(jax.tree.map(lambda t: t[i], params["blocks"]), cfg, x, causal)
    x = _ln(x, params["final_ln"])
    # pool at the (first) EOS token, HF convention
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = jnp.take_along_axis(x, eos_pos[:, None, None].repeat(x.shape[-1], -1), 1)[:, 0]
    return {"last_hidden_state": x, "pooler_output": pooled}


def convert_clip_text_state_dict(sd, cfg: CLIPTextConfig, dtype=jnp.bfloat16):
    import numpy as np

    def g(key, transpose=False):
        x = sd[key]
        if hasattr(x, "detach"):
            x = x.detach().float().cpu().numpy()
        x = np.asarray(x, np.float32)
        return jnp.asarray(x.T if transpose else x, dtype)

    def lin(key):
        return {"w": g(f"{key}.weight", True), "b": g(f"{key}.bias")}

    def ln(key):
        return {"scale": g(f"{key}.weight"), "bias": g(f"{key}.bias")}

    pre = "text_model"
    blocks = []
    for i in range(cfg.num_layers):
        p = f"{pre}.encoder.layers.{i}"
        blocks.append({
            "ln1": ln(f"{p}.layer_norm1"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.layer_norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    return {
        "token_embed": g(f"{pre}.embeddings.token_embedding.weight"),
        "pos_embed": g(f"{pre}.embeddings.position_embedding.weight"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": ln(f"{pre}.final_layer_norm"),
    }
