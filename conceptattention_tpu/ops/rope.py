"""Multi-axis rotary position embeddings (RoPE), TPU-first.

Behavior parity with the reference (`flux/src/flux/math.py:15-30` and
`flux/src/flux/modules/layers.py:11-25` in manuragkhullar/ConceptAttention):
multi-axis RoPE with theta=10_000, per-axis dims `axes_dim`, rotation applied
in float32 to interleaved (even, odd) channel pairs.

Design difference from the reference: instead of materializing a
`[B, 1, N, D/2, 2, 2]` rotation-matrix tensor, we keep a compact
`(cos, sin)` pair of `[B, N, D/2]` tables. That halves HBM traffic for the
positional state and lets XLA fuse the rotation into the attention prologue.
The frequency table is computed host-side in float64 (like the reference's
`torch.float64` path) since axes/theta are static.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_table(pos: jax.Array, dim: int, theta: int) -> Tuple[jax.Array, jax.Array]:
    """cos/sin rotation tables for one id axis.

    Args:
      pos: `[..., N]` positions (any numeric dtype).
      dim: number of channels this axis covers (must be even).
      theta: RoPE base.

    Returns:
      `(cos, sin)`, each `[..., N, dim // 2]` float32.
    """
    assert dim % 2 == 0, f"rope dim must be even, got {dim}"
    # Static frequency ladder in float64 for parity with the reference's
    # float64 omega computation.
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (float(theta) ** scale)  # [dim/2] float64
    omega = jnp.asarray(omega, dtype=jnp.float32)
    args = pos.astype(jnp.float32)[..., None] * omega  # [..., N, dim/2]
    return jnp.cos(args), jnp.sin(args)


def embed_nd(
    ids: jax.Array, axes_dim: Sequence[int], theta: int
) -> Tuple[jax.Array, jax.Array]:
    """Multi-axis RoPE tables from integer id grids.

    Args:
      ids: `[B, N, n_axes]` position ids (e.g. (0, y, x) for image patches).
      axes_dim: channels per axis; sum must equal head_dim.
      theta: RoPE base.

    Returns:
      `(cos, sin)`, each `[B, 1, N, head_dim // 2]` float32 — the singleton
      head axis broadcasts over attention heads.
    """
    n_axes = ids.shape[-1]
    assert n_axes == len(axes_dim), (ids.shape, axes_dim)
    cos_parts, sin_parts = [], []
    for i in range(n_axes):
        c, s = rope_table(ids[..., i], axes_dim[i], theta)
        cos_parts.append(c)
        sin_parts.append(s)
    cos = jnp.concatenate(cos_parts, axis=-1)[:, None]  # [B, 1, N, D/2]
    sin = jnp.concatenate(sin_parts, axis=-1)[:, None]
    return cos, sin


def apply_rope(
    xq: jax.Array, xk: jax.Array, pe: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Rotate q/k channel pairs by the positional tables.

    Channel pairing is interleaved — `(x[2i], x[2i+1])` form one complex pair —
    matching the reference's `reshape(*, -1, 1, 2)` convention
    (`flux/src/flux/math.py:25-30`). Computation in float32, output in the
    input dtype.
    """
    cos, sin = pe

    def rot(x):
        shape = x.shape
        xf = x.astype(jnp.float32).reshape(*shape[:-1], -1, 2)
        x0, x1 = xf[..., 0], xf[..., 1]
        out0 = cos * x0 - sin * x1
        out1 = sin * x0 + cos * x1
        return jnp.stack([out0, out1], axis=-1).reshape(shape).astype(x.dtype)

    return rot(xq), rot(xk)
