"""Ring attention: context-parallel exact attention over the `seq` mesh axis.

Absent from the reference (manuragkhullar/ConceptAttention handles its longest
sequence — ~17.6k video tokens — with a single dense SDPA on one GPU,
SURVEY.md §5 long-context census); mandated here by the TPU design: for
video-DiT sequences the K/V shards rotate around the ICI ring while each
device's query shard accumulates exact softmax statistics online
(Liu et al. 2023), so no device ever holds the full sequence.

This is the shard_map/ppermute formulation with software double-buffering:
the ring step count equals the (static) mesh-axis size, so the hop loop is
UNROLLED and each step issues the ppermute for chunk i+1 *before* computing
chunk i's online-softmax update — the permute and the update share no data
dependency, so XLA's latency-hiding scheduler turns the hop into an async
collective-permute-start/done pair that rides ICI underneath the matmuls
(and the wasted n-th rotation of the old fori_loop formulation is gone). The
Pallas-RDMA fused variant (pltpu.make_async_remote_copy inside the kernel,
kernels/ring_rdma.py, ConceptAttentionSpec(backend='ring_rdma')) implements
the same contract with the hop double-buffered in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e): online softmax runs in the exp2 domain


def _partial_update(q, k, v, m, l, acc, scale, allowed=None):
    """One online-softmax accumulation of q against a K/V chunk.

    q [B,H,Lq,D], k/v [B,H,Lk,D]; m/l [B,H,Lq,1], acc [B,H,Lq,D] float32.
    `allowed` is an optional [Lq, Lk] bool mask in GLOBAL index space.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if allowed is not None:
        s = jnp.where(allowed[None, None], s, NEG_INF)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    # exp2 domain (scale carries log2(e)) — same softmax, cheaper VPU exp
    p = jnp.exp2(s - m_new)
    if allowed is not None:
        p = jnp.where(allowed[None, None], p, 0.0)
    alpha = jnp.exp2(m - m_new)
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
    n = jax.lax.psum(1, axis_name)  # static: psum of a literal folds to the axis size
    scale = LOG2E / (q.shape[-1] ** 0.5)
    b, h, lq, d = q.shape

    m = jnp.full((b, h, lq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, lq, 1), jnp.float32)
    acc = jnp.zeros((b, h, lq, d), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    k_cur, v_cur = k, v
    for step in range(n):  # unrolled: n is the static mesh-axis size
        if step + 1 < n:
            # issue the next hop BEFORE the update — no data dependency, so
            # the collective-permute overlaps the matmuls (double-buffering)
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        m, l, acc = _partial_update(q, k_cur, v_cur, m, l, acc, scale)
        if step + 1 < n:
            k_cur, v_cur = k_nxt, v_nxt
    return (acc / jnp.maximum(l, 1e-30)).astype(v.dtype)


def _segment_mask(
    q_idx: jax.Array,
    k_idx: jax.Array,
    txt_len: int,
    img_len: int,
    concept_len: int,
    cross: bool,
    self_attention: bool,
) -> jax.Array:
    """[Lq, Lk] reachability over the fused [txt | img | concept | pad]
    sequence — the same contract as the flash kernel's masked tiles
    (kernels/flash_saliency.py): joint queries see joint keys; concept
    queries see image keys (cross) and/or concept keys (self); padding
    reaches nothing."""
    joint_end = txt_len + img_len
    concept_end = joint_end + concept_len
    qg = q_idx[:, None]
    kg = k_idx[None, :]
    q_joint = qg < joint_end
    q_concept = (qg >= joint_end) & (qg < concept_end)
    k_joint = kg < joint_end
    k_img = (kg >= txt_len) & (kg < joint_end)
    k_concept = (kg >= joint_end) & (kg < concept_end)
    allowed = q_joint & k_joint
    concept_keys = jnp.zeros_like(allowed)
    if cross:
        concept_keys = concept_keys | k_img
    if self_attention:
        concept_keys = concept_keys | k_concept
    return allowed | (q_concept & concept_keys)


def ring_concept_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    txt_len: int,
    img_len: int,
    concept_len: int,
    cross: bool = True,
    self_attention: bool = True,
) -> jax.Array:
    """Dual-pass (joint txt+img AND concept) exact attention with the fused
    sequence sharded over `axis_name` and K/V shards rotating around the ring.

    Local shards q/k/v [B, H, L_local, D]; global masking reconstructs each
    chunk's position from the ring step, so the result equals the dense
    fused attention (kernels/flash_saliency contract) with padded rows zero.
    """
    n = jax.lax.psum(1, axis_name)  # static: psum of a literal folds to the axis size
    my = jax.lax.axis_index(axis_name)
    scale = LOG2E / (q.shape[-1] ** 0.5)
    b, h, lq, d = q.shape

    iota = jnp.arange(lq, dtype=jnp.int32)
    q_idx = my * lq + iota

    m = jnp.full((b, h, lq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, lq, 1), jnp.float32)
    acc = jnp.zeros((b, h, lq, d), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    k_cur, v_cur = k, v
    for step in range(n):  # unrolled; see module docstring (double-buffering)
        if step + 1 < n:
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        src = jnp.mod(my - step, n)  # origin device of the current chunk
        k_idx = src * lq + iota
        allowed = _segment_mask(
            q_idx, k_idx, txt_len, img_len, concept_len, cross, self_attention
        )
        m, l, acc = _partial_update(q, k_cur, v_cur, m, l, acc, scale, allowed)
        if step + 1 < n:
            k_cur, v_cur = k_nxt, v_nxt
    safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padding) rows -> 0
    return (acc / safe_l).astype(v.dtype)


def make_ring_concept_attention(
    mesh,
    axis_name: str,
    txt_len: int,
    img_len: int,
    concept_len: int,
    cross: bool = True,
    self_attention: bool = True,
    batch_axis: str = None,
    head_axis: str = None,
):
    """shard_map-wrapped `ring_concept_attention` over [B, H, S, D] inputs
    sharded on S (S divisible by the mesh's `axis_name` size).

    `batch_axis` / `head_axis` compose the ring with data and tensor
    parallelism in ONE mesh (dp x sp x tp): batch shards over `batch_axis`,
    heads over `head_axis`, and each (data, model) slice runs its own
    independent seq ring — the online-softmax body is per-(batch, head), so
    nothing else changes."""
    from jax.sharding import PartitionSpec as P

    from conceptattention_tpu.parallel._compat import shard_map_compat

    spec = P(batch_axis, head_axis, axis_name, None)
    fn = functools.partial(
        ring_concept_attention,
        axis_name=axis_name,
        txt_len=txt_len,
        img_len=img_len,
        concept_len=concept_len,
        cross=cross,
        self_attention=self_attention,
    )
    return shard_map_compat(fn, mesh, (spec, spec, spec), spec)


def make_ring_attention(mesh, axis_name: str = "seq",
                        batch_axis: str = None, head_axis: str = None):
    """shard_map-wrapped ring attention over [B, H, L, D] inputs sharded on L
    (optionally also on batch/heads — see make_ring_concept_attention)."""
    from jax.sharding import PartitionSpec as P

    from conceptattention_tpu.parallel._compat import shard_map_compat

    spec = P(batch_axis, head_axis, axis_name, None)
    return shard_map_compat(
        functools.partial(ring_attention, axis_name=axis_name),
        mesh, (spec, spec, spec), spec,
    )
