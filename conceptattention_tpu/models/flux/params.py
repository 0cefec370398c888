"""Flux DiT parameter pytree: spec, random init, and stacked-layer layout.

The DiT is a pure function over a nested-dict param pytree. Per-layer params
are *stacked* along a leading `depth` axis so the block loop runs as a single
`jax.lax.scan` (one compiled block body, XLA-pipelined across layers) instead
of the reference's Python loop over 19/38 module objects
(`concept_attention/modified_flux_dit.py:129-157`).

Linear params are stored as {w: [in, out], b: [out]} (row-major matmul
orientation; torch checkpoints transpose on import — see weights/convert.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from conceptattention_tpu.config import FluxConfig

Params = Dict[str, Any]


def _linear(key, d_in, d_out, dtype, bias=True) -> Params:
    w_key, _ = jax.random.split(key)
    scale = 1.0 / (d_in**0.5)
    p = {"w": (jax.random.normal(w_key, (d_in, d_out), jnp.float32) * scale).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _mlp_embedder(key, d_in, d_hidden, dtype) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "in": _linear(k1, d_in, d_hidden, dtype),
        "out": _linear(k2, d_hidden, d_hidden, dtype),
    }


def _qkv(key, cfg: FluxConfig, dtype, bias: bool) -> Params:
    """Fused QKV stored 4D as [D, 3, H, head_dim] so tensor parallelism can
    shard the head axis cleanly (a flat [D, 3*H*head_dim] layout would split
    across the q/k/v boundary for tp > 3)."""
    d = cfg.hidden_size
    scale = 1.0 / (d**0.5)
    w = jax.random.normal(key, (d, 3, cfg.num_heads, cfg.head_dim), jnp.float32) * scale
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((3, cfg.num_heads, cfg.head_dim), dtype)
    return p


def _double_block(key, cfg: FluxConfig, dtype) -> Params:
    d, m = cfg.hidden_size, cfg.mlp_hidden_dim
    keys = jax.random.split(key, 12)
    p = {}
    for i, stream in enumerate(("img", "txt")):
        o = i * 6
        p[f"{stream}_mod"] = _linear(keys[o + 0], d, 6 * d, dtype)
        p[f"{stream}_qkv"] = _qkv(keys[o + 1], cfg, dtype, bias=cfg.qkv_bias)
        p[f"{stream}_qnorm"] = jnp.ones((cfg.head_dim,), dtype)
        p[f"{stream}_knorm"] = jnp.ones((cfg.head_dim,), dtype)
        p[f"{stream}_proj"] = _linear(keys[o + 2], d, d, dtype)
        p[f"{stream}_mlp_in"] = _linear(keys[o + 3], d, m, dtype)
        p[f"{stream}_mlp_out"] = _linear(keys[o + 4], m, d, dtype)
    return p


def _single_block(key, cfg: FluxConfig, dtype) -> Params:
    """Single block with the reference's fused linear1/linear2
    (layers.py:194-239) stored as separate qkv / mlp_in / proj / mlp_out
    leaves: mathematically identical (concatenated matmuls distribute), but
    shardable without crossing the attention/MLP boundary."""
    d, m = cfg.hidden_size, cfg.mlp_hidden_dim
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "mod": _linear(k1, d, 3 * d, dtype),
        "qkv": _qkv(k2, cfg, dtype, bias=True),
        "mlp_in": _linear(k3, d, m, dtype),
        "proj": _linear(k4, d, d, dtype),
        "mlp_out": _linear(k5, m, d, dtype, bias=False),
        "qnorm": jnp.ones((cfg.head_dim,), dtype),
        "knorm": jnp.ones((cfg.head_dim,), dtype),
    }


def init_flux_params(key: jax.Array, cfg: FluxConfig, dtype=jnp.bfloat16) -> Params:
    """Randomly-initialized Flux DiT params (production weights come from
    checkpoints via weights/convert.py)."""
    keys = jax.random.split(key, 8)
    d = cfg.hidden_size
    params: Params = {
        "img_in": _linear(keys[0], cfg.in_channels, d, dtype),
        "txt_in": _linear(keys[1], cfg.context_in_dim, d, dtype),
        "time_in": _mlp_embedder(keys[2], 256, d, dtype),
        "vector_in": _mlp_embedder(keys[3], cfg.vec_in_dim, d, dtype),
        "final": {
            "adaln": _linear(keys[4], d, 2 * d, dtype),
            "linear": _linear(keys[5], d, cfg.in_channels, dtype),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = _mlp_embedder(keys[6], 256, d, dtype)

    dkeys = jax.random.split(keys[7], cfg.depth + cfg.depth_single_blocks)
    double = [_double_block(k, cfg, dtype) for k in dkeys[: cfg.depth]]
    single = [_single_block(k, cfg, dtype) for k in dkeys[cfg.depth :]]
    params["double"] = jax.tree.map(lambda *xs: jnp.stack(xs), *double)
    params["single"] = jax.tree.map(lambda *xs: jnp.stack(xs), *single)
    return params


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
