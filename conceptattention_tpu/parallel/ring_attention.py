"""Ring attention: context-parallel exact attention over the `seq` mesh axis.

Absent from the reference (manuragkhullar/ConceptAttention handles its longest
sequence — ~17.6k video tokens — with a single dense SDPA on one GPU,
SURVEY.md §5 long-context census); mandated here by the TPU design: for
video-DiT sequences the K/V shards rotate around the ICI ring while each
device's query shard accumulates exact softmax statistics online
(Liu et al. 2023), so no device ever holds the full sequence.

This is the shard_map/ppermute formulation: XLA schedules the collective
permute between per-chunk flash updates; a Pallas-RDMA fused variant
(pltpu.make_async_remote_copy double-buffering) is the planned upgrade path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _partial_update(q, k, v, m, l, acc, scale):
    """One online-softmax accumulation of q against a K/V chunk.

    q [B,H,Lq,D], k/v [B,H,Lk,D]; m/l [B,H,Lq,1], acc [B,H,Lq,D] float32.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
) -> jax.Array:
    """Exact attention with K/V rotating around the `axis_name` ring.

    Call inside shard_map with q/k/v sharded on the sequence axis:
    q/k/v local shards [B, H, L_local, D] -> output [B, H, L_local, D].
    """
    n = jax.lax.psum(1, axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    b, h, lq, d = q.shape

    m0 = jnp.full((b, h, lq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, lq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, lq, d), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(i, carry):
        m, l, acc, k_cur, v_cur = carry
        m, l, acc = _partial_update(q, k_cur, v_cur, m, l, acc, scale)
        # rotate K/V to the next device (skippable on the last step, but a
        # static-extra permute keeps the loop body uniform)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        return m, l, acc, k_cur, v_cur

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, body, (m0, l0, acc0, k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(v.dtype)


def make_ring_attention(mesh, axis_name: str = "seq"):
    """shard_map-wrapped ring attention over [B, H, L, D] inputs sharded on L."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis_name, None)
    kwargs = dict(
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    try:  # jax >= 0.8 renamed check_rep -> check_vma
        return shard_map(
            functools.partial(ring_attention, axis_name=axis_name),
            check_vma=False, **kwargs,
        )
    except TypeError:
        return shard_map(
            functools.partial(ring_attention, axis_name=axis_name),
            check_rep=False, **kwargs,
        )
