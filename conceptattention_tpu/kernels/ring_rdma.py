"""Pallas-RDMA ring attention: fused in-kernel inter-chip double buffering.

The further upgrade path named in parallel/ring_attention.py: instead of the
shard_map/ppermute formulation (XLA collective-permute between jit ops), the
ring hop is issued *inside* the kernel with `pltpu.make_async_remote_copy`,
so the next K/V chunk streams over ICI while the current chunk's flash
update runs on the MXU — communication latency is hidden behind compute with
no XLA scheduler involvement, and the K/V working set never materializes in
HBM beyond one double-buffered chunk pair.

Absent from the reference (manuragkhullar/ConceptAttention runs single-GPU
dense SDPA for its longest ~17.6k-token video sequences, SURVEY.md §5);
this kernel exists because the TPU design shards those sequences over the
`seq` mesh axis (parallel/ring_attention.py docstring).

Design (per device, inside shard_map over the `seq` axis, N = ring size):

  - q/k/v local shards [B, H, Lc, D] live in HBM (`pl.ANY`); the kernel
    loops (fori) over the flattened (b, h) pairs so the VMEM working set is
    one head's chunk: q tile [Lc, D], double-buffered K/V [2, 2, Lc, D]
    (~1.1 MB at the 2208-token video shard, bf16), f32 accumulators.
  - The HBM communication buffer is an (ignored) kernel *output*
    `kv_comm [2, 2, Lc, D]` — slot-major double buffer holding the K and V
    chunk currently in flight. Remote DMAs copy slot `cur` to the right
    neighbor's slot `nxt` while the local compute reads slot `cur`.
  - Flow control is the guide's send/recv/free-credit protocol: per hop the
    sender waits one "free" credit from its right neighbor (which signals
    after it has both finished *reading* a slot and finished *sending* from
    it), so a slot is never overwritten in flight. Credits are balanced
    exactly (waits at ring steps 1..N-2 pair with signals at steps 0..N-3);
    per-neighbor "ready" semaphores fence consecutive (b, h) iterations so
    hop 0 of iteration i+1 cannot land in a neighbor still reading
    iteration i (counts are per-source, so a fast left neighbor cannot
    satisfy the wait meant for a slow right one).
  - The online-softmax state (m, l, acc) is carried as values through the
    UNROLLED ring-step loop (N is the static mesh-axis size), exactly the
    blockwise update of kernels/flash_saliency.py.

The masked variant reconstructs each chunk's GLOBAL key positions from the
ring step (`src = (my - step) mod N`) and applies the fused
[txt | img | concept | pad] segment reachability of
parallel/ring_attention._segment_mask, so the result equals the dense fused
concept attention (ops/attention.py contract) with padded rows zero.

Validation: the Pallas TPU *interpret* machine emulates remote DMA +
semaphores on a virtual CPU mesh (tests/test_ring_rdma.py asserts equality
with dense SDPA and with the ppermute formulation); real-chip multi-device
execution awaits multi-chip hardware (this host exposes one TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e): online softmax runs in the exp2 domain

_COLLECTIVE_ID = 7  # distinct from any other collective Pallas kernel here


def _flash_update(q, k_chunk, v_chunk, m, l, acc, scale, allowed):
    """One online-softmax accumulation of the stationary q tile against the
    K/V chunk currently in the ring buffer (parallel/ring_attention
    `_partial_update`, value-carried). Operands stay in their native dtype
    (bf16 rides the bf16 MXU path); accumulation is f32 via
    preferred_element_type, matching kernels/flash_saliency.py."""
    s = jax.lax.dot_general(
        q, k_chunk,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if allowed is not None:
        s = jnp.where(allowed, s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    # exp2 domain (scale carries log2(e)) — same softmax, cheaper VPU exp
    p = jnp.exp2(s - m_new)
    if allowed is not None:
        p = jnp.where(allowed, p, 0.0)
    alpha = jnp.exp2(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jax.lax.dot_general(
        p.astype(v_chunk.dtype), v_chunk,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


# The [txt | img | concept | pad] reachability contract is shared verbatim
# with the ppermute formulation — one definition keeps the two ring backends
# from desynchronizing (pure jnp index math, traces fine inside the kernel).
from conceptattention_tpu.parallel.ring_attention import _segment_mask


def _ring_kernel(
    q_hbm, k_hbm, v_hbm,          # inputs  [B, H, Lc, D] (ANY/HBM)
    o_hbm, kv_comm,               # outputs [B, H, Lc, D], [2, 2, Lc, D]
    send_sem, recv_sem,           # DMA semaphore arrays, one per slot
    free_sem, ready_l, ready_r,   # credit + per-neighbor iteration fences
    copy_sem,                     # local-DMA completion semaphore
    q_vmem, kv_vmem, o_vmem,      # VMEM staging tiles
    *,
    n, axis_name, masked, txt_len, img_len, concept_len, cross,
    self_attention,
):
    b_dim, h_dim, lc, d = q_hbm.shape
    bh = b_dim * h_dim
    scale = LOG2E / (d ** 0.5)
    my = jax.lax.axis_index(axis_name)
    # Dict-form MESH device ids: coordinates for unnamed axes default to this
    # device's own, so the ring stays within its (data, model, ...) slice on
    # multi-axis meshes (scalar LOGICAL ids are only correct on 1-D meshes).
    right = {axis_name: jax.lax.rem(my + 1, n)}
    left = {axis_name: jax.lax.rem(my - 1 + n, n)}

    if n > 1:
        # One global neighbor barrier before the first remote DMA, so no
        # device writes into a peer whose buffers are not yet live.
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, 1, device_id=left)
        pltpu.semaphore_signal(barrier, 1, device_id=right)
        pltpu.semaphore_wait(barrier, 2)

    iota_q = jax.lax.iota(jnp.int32, lc)

    def body(i, _):
        b = i // h_dim
        h = jax.lax.rem(i, h_dim)

        if n > 1:
            # Per-neighbor iteration fence: both neighbors finished their
            # previous (b, h) ring (reads + sends) before hop 0 may land.
            @pl.when(i > 0)
            def _wait_ready():
                pltpu.semaphore_wait(ready_l, 1)
                pltpu.semaphore_wait(ready_r, 1)

        # Stage this head's stationary q tile and seed comm slot 0 with the
        # LOCAL K/V chunk (HBM -> HBM; the first "chunk from the ring").
        cp_q = pltpu.make_async_copy(q_hbm.at[b, h], q_vmem, copy_sem)
        cp_k = pltpu.make_async_copy(k_hbm.at[b, h], kv_comm.at[0, 0], copy_sem)
        cp_v = pltpu.make_async_copy(v_hbm.at[b, h], kv_comm.at[0, 1], copy_sem)
        cp_q.start(); cp_k.start(); cp_v.start()
        cp_q.wait(); cp_k.wait(); cp_v.wait()

        q_t = q_vmem[...]
        m = jnp.full((lc, 1), NEG_INF, jnp.float32)
        acc_l = jnp.zeros((lc, 1), jnp.float32)
        acc = jnp.zeros((lc, d), jnp.float32)
        q_idx = my * lc + iota_q

        for step in range(n):  # unrolled: n is the static ring size
            cur, nxt = step % 2, (step + 1) % 2
            dma = None
            if step + 1 < n:
                if step >= 1:
                    # Credit: right finished reading AND sending from the
                    # slot this hop overwrites (its signal at step-1).
                    pltpu.semaphore_wait(free_sem, 1)
                dma = pltpu.make_async_remote_copy(
                    src_ref=kv_comm.at[cur],
                    dst_ref=kv_comm.at[nxt],
                    send_sem=send_sem.at[cur],
                    recv_sem=recv_sem.at[nxt],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
                dma.start()  # hop streams while the update below computes

            stage = pltpu.make_async_copy(kv_comm.at[cur], kv_vmem, copy_sem)
            stage.start()
            stage.wait()

            allowed = None
            if masked:
                src = jax.lax.rem(my - step + n, n)
                k_idx = src * lc + iota_q
                allowed = _segment_mask(
                    q_idx, k_idx, txt_len, img_len, concept_len,
                    cross, self_attention,
                )
            m, acc_l, acc = _flash_update(
                q_t, kv_vmem[0], kv_vmem[1], m, acc_l, acc, scale, allowed
            )

            if step + 1 < n:
                dma.wait_send()
                if step + 2 < n:
                    # Slot `cur` is free for the left neighbor's hop step+1
                    # (credits balance: signals 0..n-3 pair waits 1..n-2).
                    pltpu.semaphore_signal(free_sem, 1, device_id=left)
                dma.wait_recv()

        safe_l = jnp.where(acc_l == 0.0, 1.0, acc_l)  # padded rows -> 0
        o_vmem[...] = (acc / safe_l).astype(o_vmem.dtype)
        cp_o = pltpu.make_async_copy(o_vmem, o_hbm.at[b, h], copy_sem)
        cp_o.start()
        cp_o.wait()

        if n > 1:
            @pl.when(i < bh - 1)
            def _signal_ready():
                pltpu.semaphore_signal(ready_l, 1, device_id=right)
                pltpu.semaphore_signal(ready_r, 1, device_id=left)
        return 0

    jax.lax.fori_loop(0, bh, body, 0)


def ring_attention_rdma(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    ring_size: int,
    masked: bool = False,
    txt_len: int = 0,
    img_len: int = 0,
    concept_len: int = 0,
    cross: bool = True,
    self_attention: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused-RDMA ring attention over local shards [B, H, Lc, D].

    Call inside shard_map with q/k/v sharded on the sequence axis; the
    result equals parallel/ring_attention.ring_attention (masked=False) or
    ring_concept_attention (masked=True) to float tolerance.
    """
    b, h, lc, d = q.shape
    kernel = functools.partial(
        _ring_kernel,
        n=ring_size,
        axis_name=axis_name,
        masked=masked,
        txt_len=txt_len,
        img_len=img_len,
        concept_len=concept_len,
        cross=cross,
        self_attention=self_attention,
    )
    out, _ = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lc, d), v.dtype),
            jax.ShapeDtypeStruct((2, 2, lc, d), k.dtype),  # HBM ring buffer
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),      # send, one per slot
            pltpu.SemaphoreType.DMA((2,)),      # recv, one per slot
            pltpu.SemaphoreType.REGULAR,        # free credits (from right)
            pltpu.SemaphoreType.REGULAR,        # ready, signaled by left
            pltpu.SemaphoreType.REGULAR,        # ready, signaled by right
            pltpu.SemaphoreType.DMA,            # local staging copies
            pltpu.VMEM((lc, d), q.dtype),       # q tile
            pltpu.VMEM((2, lc, d), k.dtype),    # staged K/V chunk
            pltpu.VMEM((lc, d), v.dtype),       # output tile
        ],
        compiler_params=pltpu.CompilerParams(collective_id=_COLLECTIVE_ID),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(q, k, v)
    return out


def make_ring_attention_rdma(mesh, axis_name: str = "seq",
                             batch_axis: str = None, head_axis: str = None,
                             interpret: bool = False):
    """shard_map-wrapped `ring_attention_rdma` over [B, H, L, D] sharded on
    L — drop-in for parallel/ring_attention.make_ring_attention."""
    from jax.sharding import PartitionSpec as P

    from conceptattention_tpu.parallel._compat import shard_map_compat

    spec = P(batch_axis, head_axis, axis_name, None)
    fn = functools.partial(
        ring_attention_rdma,
        axis_name=axis_name,
        ring_size=mesh.shape[axis_name],
        interpret=interpret,
    )
    return shard_map_compat(fn, mesh, (spec, spec, spec), spec)


def make_ring_concept_attention_rdma(
    mesh,
    axis_name: str,
    txt_len: int,
    img_len: int,
    concept_len: int,
    cross: bool = True,
    self_attention: bool = True,
    batch_axis: str = None,
    head_axis: str = None,
    interpret: bool = False,
):
    """shard_map-wrapped masked variant — drop-in for
    parallel/ring_attention.make_ring_concept_attention (same fused
    [txt | img | concept | pad] contract), selected by
    ConceptAttentionSpec(backend='ring_rdma')."""
    from jax.sharding import PartitionSpec as P

    from conceptattention_tpu.parallel._compat import shard_map_compat

    spec = P(batch_axis, head_axis, axis_name, None)
    fn = functools.partial(
        ring_attention_rdma,
        axis_name=axis_name,
        ring_size=mesh.shape[axis_name],
        masked=True,
        txt_len=txt_len,
        img_len=img_len,
        concept_len=concept_len,
        cross=cross,
        self_attention=self_attention,
        interpret=interpret,
    )
    return shard_map_compat(fn, mesh, (spec, spec, spec), spec)
