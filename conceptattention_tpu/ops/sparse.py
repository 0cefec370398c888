"""Sparse attention-normalizers: sparsemax and 1.5-entmax.

The reference (manuragkhullar/ConceptAttention) uses the external `entmax`
package for its heatmap normalization (`concept_attention_pipeline.py:5,64-71`
— an undeclared dependency there). These are from-scratch JAX implementations
of the exact sort-based algorithms:

  - sparsemax: Euclidean projection onto the simplex
    (Martins & Astudillo 2016).
  - entmax15: exact alpha=1.5 entmax via the sorted root-finding formula
    (Peters, Niculae & Martins 2019, Alg. 2).

Both are O(n log n) in the normalized axis, vectorize over all other axes, and
are jit/TPU friendly (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _move_axis_last(x: jax.Array, axis: int):
    axis = axis % x.ndim
    return jnp.moveaxis(x, axis, -1)


def sparsemax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Projection of x onto the probability simplex along `axis`."""
    dtype = x.dtype
    z = _move_axis_last(x, axis).astype(jnp.float32)
    n = z.shape[-1]
    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    k = jnp.arange(1, n + 1, dtype=jnp.float32)
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    support = 1.0 + k * z_sorted > z_cumsum
    k_support = jnp.sum(support, axis=-1, keepdims=True)  # >= 1 always
    idx = (k_support - 1).astype(jnp.int32)
    tau_sum = jnp.take_along_axis(z_cumsum, idx, axis=-1)
    tau = (tau_sum - 1.0) / k_support.astype(jnp.float32)
    p = jnp.maximum(z - tau, 0.0)
    return jnp.moveaxis(p, -1, axis % x.ndim).astype(dtype)


def entmax15(x: jax.Array, axis: int = -1) -> jax.Array:
    """Exact 1.5-entmax along `axis`."""
    dtype = x.dtype
    z = _move_axis_last(x, axis).astype(jnp.float32)
    n = z.shape[-1]
    # Stabilize and halve (alpha - 1 = 0.5 scaling).
    z = (z - jnp.max(z, axis=-1, keepdims=True)) / 2.0
    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    k = jnp.arange(1, n + 1, dtype=jnp.float32)
    mean = jnp.cumsum(z_sorted, axis=-1) / k
    mean_sq = jnp.cumsum(jnp.square(z_sorted), axis=-1) / k
    ss = k * (mean_sq - jnp.square(mean))
    delta = (1.0 - ss) / k
    delta_nz = jnp.maximum(delta, 0.0)
    tau = mean - jnp.sqrt(delta_nz)
    support = tau <= z_sorted
    k_support = jnp.sum(support, axis=-1, keepdims=True)
    idx = (k_support - 1).astype(jnp.int32)
    tau_star = jnp.take_along_axis(tau, idx, axis=-1)
    p = jnp.square(jnp.maximum(z - tau_star, 0.0))
    return jnp.moveaxis(p, -1, axis % x.ndim).astype(dtype)
