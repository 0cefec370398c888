"""Latent 2x2 patch packing and position-id grids.

Parity target: `flux/src/flux/sampling.py:31-65,154-162` in the reference
(manuragkhullar/ConceptAttention): `[B, C, H, W]` latents are packed into
`[B, (H/2)*(W/2), C*4]` token sequences; image ids are `(0, y, x)` triples.

Implemented with reshape/transpose (XLA fuses these into the consumer matmul's
layout change — no data copy materializes on TPU).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def latent_noise_shape(
    num_samples: int, height: int, width: int, channels: int = 16, vae_factor: int = 8
) -> Tuple[int, int, int, int]:
    """Packed-compatible latent shape for pixel dims (reference sampling.py:12-29:
    [B, 16, 2⌈h/16⌉, 2⌈w/16⌉] for the 8x Flux VAE; generalized to any VAE
    downsample factor)."""
    denom = 2 * vae_factor
    return (
        num_samples,
        channels,
        2 * math.ceil(height / denom),
        2 * math.ceil(width / denom),
    )


def pack_latents(x: jax.Array) -> jax.Array:
    """[B, C, H, W] -> [B, (H/2)(W/2), C*4] with (c, ph, pw) channel order."""
    b, c, h, w = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    # b c h ph w pw -> b (h w) (c ph pw)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(x: jax.Array, h_tokens: int, w_tokens: int) -> jax.Array:
    """[B, (h w), C*4] -> [B, C, 2h, 2w] for a (h_tokens, w_tokens) grid."""
    b, _, cd = x.shape
    c = cd // 4
    x = x.reshape(b, h_tokens, w_tokens, c, 2, 2)
    # b h w c ph pw -> b c (h ph) (w pw)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h_tokens * 2, w_tokens * 2)


def make_img_ids(h_tokens: int, w_tokens: int, batch_size: int = 1) -> jax.Array:
    """(0, y, x) id triples for the packed image grid -> [B, h*w, 3] float32."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h_tokens, w_tokens), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h_tokens, w_tokens), 1)
    zeros = jnp.zeros((h_tokens, w_tokens), dtype=jnp.float32)
    ids = jnp.stack([zeros, ys, xs], axis=-1).reshape(1, h_tokens * w_tokens, 3)
    return jnp.broadcast_to(ids, (batch_size, h_tokens * w_tokens, 3))
