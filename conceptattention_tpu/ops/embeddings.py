"""Scalar-conditioning embeddings.

Parity targets in the reference (manuragkhullar/ConceptAttention):
  - `timestep_embedding`: sinusoidal with time_factor=1000, cos-then-sin
    concat (`flux/src/flux/modules/layers.py:28-49`).
  - `MLPEmbedder`: Linear -> SiLU -> Linear (`layers.py:52-60`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(
    t: jax.Array, dim: int, max_period: int = 10_000, time_factor: float = 1000.0
) -> jax.Array:
    """Sinusoidal embedding of `[B]` (possibly fractional) timesteps -> `[B, dim]`.

    Computed in float32; cast to t's dtype if t is floating (matching the
    reference's `embedding.to(t)`).
    """
    tf = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = tf[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    if jnp.issubdtype(t.dtype, jnp.floating):
        emb = emb.astype(t.dtype)
    return emb


def mlp_embedder(x: jax.Array, params: dict) -> jax.Array:
    """Linear -> SiLU -> Linear. params: {in: {w, b}, out: {w, b}}."""
    h = x @ params["in"]["w"] + params["in"]["b"]
    h = jax.nn.silu(h)
    return h @ params["out"]["w"] + params["out"]["b"]
