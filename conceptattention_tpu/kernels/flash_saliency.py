"""Pallas TPU kernel: fused dual-pass flash attention for concept attention.

The reference runs TWO separate SDPA calls per double block — txt+img joint
attention and concept+img attention (`modified_double_stream_block.py:106-168`
in manuragkhullar/ConceptAttention) — reading the 4096-token image K/V twice
and materializing full attention matrices in the eager path.

This kernel computes BOTH passes in one blockwise flash-attention sweep over a
single fused sequence  S = [txt | img | concept_pad]  with a static segment
mask:

    q ∈ txt|img   ->  k ∈ txt|img          (the vanilla joint attention;
                                             concepts invisible to generation)
    q ∈ concept   ->  k ∈ img | concept    (the concept pass, with its own
                                             softmax denominator)

so the image K/V blocks stream from HBM once per layer instead of twice, no
[L_q, L_k] attention matrix ever materializes, and the concept pass costs one
extra query block. Online softmax follows Rabe & Staats / FlashAttention:
running row-max m, row-sum l, rescaled accumulator.

Ablation variants (`joint_attention_kwargs` parity): `cross`/`self_attention`
toggle which keys concept queries may see (reference :126-159).

Padded concept rows attend nothing; their l stays 0 and the finalizer emits
exact zeros (safe divide).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # log2(e): softmax runs in the exp2 domain

# Module-level default for the fused-rope K-stream index pinning (read at
# trace time by pallas_joint_concept_attention). The round-4 pin (d11d047)
# raised the ISOLATED kernel's rate (94.3 vs 89.2 TFLOP/s at S=4608) but a
# round-5 in-model interleaved A/B measured it ~9% SLOWER end-to-end
# (pin 0.531 vs no-pin 0.585 img/s mean of 3, same session): pinning the
# block index serializes the qi==0 cache-fill sweep's DMAs with the
# surrounding graph instead of overlapping them. Default off; kept as an
# A/B knob, not a user-facing option.
_PIN_K_STREAM = False


def _pair_swap(x_f32):
    """swap(x)[2i] = x[2i+1], swap(x)[2i+1] = x[2i] on the VPU: two lane rolls
    + select (a permutation matmul would steal MXU cycles from the main dots —
    measured ~3% slower end to end)."""
    rows, d = x_f32.shape
    left = pltpu.roll(x_f32, d - 1, 1)  # left[j]  = x[j+1]  (shift must be >= 0)
    right = pltpu.roll(x_f32, 1, 1)     # right[j] = x[j-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1)
    return jnp.where(lane % 2 == 0, left, right)


def _rot(x, cosf, sinf):
    """Interleaved-pair RoPE rotation with expanded [rows, D] tables:
    cosf[2i] = cosf[2i+1] = cos_i; sinf[2i] = -sin_i, sinf[2i+1] = +sin_i."""
    xf = x.astype(jnp.float32)
    return (xf * cosf + _pair_swap(xf) * sinf).astype(x.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, *rest,
    scale: float,
    txt_len: int,
    img_len: int,
    concept_len: int,
    block_q: int,
    block_k: int,
    cross: bool,
    self_attention: bool,
    seq_len: int,
    fuse_rope: bool = False,
    int8_qk: bool = False,
):
    if fuse_rope:
        (cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
         m_scratch, l_scratch, acc_scratch, qrot_scratch, krot_scratch,
         *q8_refs) = rest
    else:
        o_ref, m_scratch, l_scratch, acc_scratch, *q8_refs = rest
    if int8_qk:
        if fuse_rope:
            q8_scratch, qs_scratch, k8_scratch, ks_scratch = q8_refs
        else:
            q8_scratch, qs_scratch = q8_refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    def _quantize_rows(x_f32):
        # Per-row (per-query/key-token) symmetric int8: q/k are
        # RMS-normalized (QKNorm) so row max-abs is well-conditioned.
        s = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True) / 127.0
        x8 = jnp.round(x_f32 / jnp.maximum(s, 1e-9)).astype(jnp.int8)
        return x8, s

    # On the fused-rope path the attention scale is folded into the cached
    # roped-q tile: one (bq, d) multiply at fill time replaces a full
    # (bq, bk) VPU pass over every score tile (the kernel's ceiling is VPU
    # serialization, not MXU — see the K-cache comment below). The int8 row
    # scales absorb it automatically (qs is computed from the scaled q).
    q_prescaled = fuse_rope

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        if fuse_rope:
            # rotate the q tile once per q-block, reuse across all k tiles;
            # _rot keeps f32 internally so scale adds no extra bf16 rounding
            qf = q_ref[0].astype(jnp.float32)
            qrot_f32 = (qf * cosq_ref[0] + _pair_swap(qf) * sinq_ref[0]) * scale
            qrot_scratch[...] = qrot_f32.astype(qrot_scratch.dtype)
            if int8_qk:
                q8, qs = _quantize_rows(qrot_f32)
                q8_scratch[...] = q8
                qs_scratch[...] = jnp.broadcast_to(qs, qs_scratch.shape)
        elif int8_qk:
            q8, qs = _quantize_rows(q_ref[0].astype(jnp.float32))
            q8_scratch[...] = q8
            qs_scratch[...] = jnp.broadcast_to(qs, qs_scratch.shape)

    if fuse_rope:
        def q_tile():
            return qrot_scratch[...]

        # The roped K row is cached in VMEM across q tiles: the whole K
        # sequence is only nk*bk x d bf16 (~1.2 MB at flux shapes), while
        # re-rotating each k tile per q tile costs nq redundant VPU passes —
        # and the kernel's efficiency ceiling is VPU serialization, not MXU
        # (measured 93 TFLOP/s of 197 peak with 2x S^2 d MXU work). Fill on
        # the qi == 0 sweep, reuse for qi > 0; requires the q grid dimension
        # to iterate sequentially (dimension_semantics marks it arbitrary).
        @pl.when(qi == 0)
        def _fill_k_cache():
            krot = _rot(k_ref[0], cosk_ref[0], sink_ref[0])
            krot_scratch[pl.ds(ki * block_k, block_k), :] = krot
            if int8_qk:
                # Quantize each roped k tile ONCE at fill time; per-tile
                # re-quantization was the VPU cost that made int8 scores a
                # net loss (kernel docstring).
                k8, ks = _quantize_rows(krot.astype(jnp.float32))
                k8_scratch[pl.ds(ki * block_k, block_k), :] = k8
                ks_scratch[pl.ds(ki * block_k, block_k), :] = jnp.broadcast_to(
                    ks, (block_k, 128)
                )

        def k_tile():
            return krot_scratch[pl.ds(ki * block_k, block_k), :]
    else:
        def q_tile():
            return q_ref[0]

        def k_tile():
            return k_ref[0]

    joint_end = txt_len + img_len  # start of the concept segment
    concept_end = joint_end + concept_len

    q_start = qi * block_q
    k_start = ki * block_k

    # Static-shape block-level reachability: can ANY (q, k) pair in this tile
    # be unmasked? Computed from scalar ranges — lets us skip the MXU work for
    # (concept-q x txt-k) tiles and fully-padded tiles.
    q_is_joint = q_start < joint_end  # tile contains joint-segment queries
    q_has_concept = (q_start + block_q > joint_end) & (q_start < concept_end)
    k_is_joint = k_start < joint_end
    k_is_img = (k_start + block_k > txt_len) & (k_start < joint_end)
    k_has_concept = (k_start + block_k > joint_end) & (k_start < concept_end)

    joint_reach = q_is_joint & k_is_joint
    concept_reach = q_has_concept & (
        (k_is_img if cross else False) | (k_has_concept if self_attention else False)
    )
    block_reachable = joint_reach | concept_reach

    # Interior joint tiles (the vast majority at 1024^2: ~89%) need no mask.
    interior = (q_start + block_q <= joint_end) & (k_start + block_k <= joint_end)

    def _online_softmax_update(s, allowed):
        if allowed is not None:
            s = jnp.where(allowed, s, NEG_INF)
        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        # Rows that are still fully masked keep m == NEG_INF; exp underflows
        # to 0 so they contribute nothing. Scores arrive pre-scaled by
        # log2(e) (see `scale`), so exp2 here computes the exact softmax
        # weights with one fewer VPU multiply per score element than exp.
        p = jnp.exp2(s - m_new[:, :1])
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_scratch[...] = m_new
        l_scratch[...] = l_new
        v = v_ref[0]
        if seq_len % block_k:
            # tail tiles read past the array: zero the garbage rows, else a
            # masked p (0) times a NaN v row poisons the whole accumulator
            rows = k_start + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            v = jnp.where(rows < seq_len, v, 0)
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _scores():
        if int8_qk:
            # int8 x int8 -> int32 on the MXU (2x bf16 peak); per-row scales
            # restore magnitudes. q8 cached at ki == 0; k8 comes from the
            # fill-time cache under fused rope, else quantized per tile.
            if fuse_rope:
                k8 = k8_scratch[pl.ds(ki * block_k, block_k), :]
                ks_col = ks_scratch[pl.ds(ki * block_k, block_k), :1]
            else:
                k8, ks = _quantize_rows(k_tile().astype(jnp.float32))
                ks_col = ks
            s32 = jax.lax.dot_general(
                q8_scratch[...], k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = s32.astype(jnp.float32) * (
                qs_scratch[:, :1] * ks_col.reshape(1, -1)
            )
            return s if q_prescaled else s * scale
        s = jax.lax.dot_general(
            q_tile(), k_tile(), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s if q_prescaled else s * scale

    # When the whole grid is interior joint tiles (no concepts, exact-divisor
    # tiles) the masked branch is statically dead — eliding it at trace time
    # keeps its [bq, bk] temporaries out of the kernel's scoped-VMEM stack
    # frame (predicated-off branches still reserve stack space).
    all_interior = (
        concept_len == 0
        and seq_len == joint_end
        and seq_len % block_q == 0
        and seq_len % block_k == 0
    )

    if all_interior:
        _online_softmax_update(_scores(), None)
    else:
        @pl.when(block_reachable & interior)
        def _compute_unmasked():
            _online_softmax_update(_scores(), None)

        @pl.when(block_reachable & jnp.logical_not(interior))
        def _compute_masked():
            # Separable [bq, 1] x [1, bk] index vectors (the reachability
            # predicate factors over q and k) — full-tile int32 iotas cost
            # 2 * bq * bk * 4 bytes of scoped VMEM, which alone blew the 16 MB
            # stack limit at 544x2176 tiles.
            q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            q_joint = q_idx < joint_end
            q_concept = jnp.logical_and(q_idx >= joint_end, q_idx < concept_end)
            k_joint = k_idx < joint_end
            k_img = jnp.logical_and(k_idx >= txt_len, k_idx < joint_end)
            k_concept = jnp.logical_and(k_idx >= joint_end, k_idx < concept_end)

            allowed = jnp.logical_and(q_joint, k_joint)  # [bq, bk] via broadcast
            concept_keys = jnp.zeros_like(k_joint)
            if cross:
                concept_keys = jnp.logical_or(concept_keys, k_img)
            if self_attention:
                concept_keys = jnp.logical_or(concept_keys, k_concept)
            allowed = jnp.logical_or(
                allowed, jnp.logical_and(q_concept, concept_keys)
            )
            _online_softmax_update(_scores(), allowed)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scratch[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "txt_len", "img_len", "concept_len", "cross", "self_attention",
        "block_q", "block_k", "interpret", "int8_qk", "pin_k_stream",
    ),
)
def fused_concept_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    txt_len: int,
    img_len: int,
    concept_len: int,
    cross: bool = True,
    self_attention: bool = True,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
    rope_cos: jax.Array = None,
    rope_sin: jax.Array = None,
    int8_qk: bool = False,
    pin_k_stream: bool = True,
) -> jax.Array:
    """Fused dual-pass attention over S = [txt | img | concept | pad].

    Args:
      q/k/v: [B, H, S, D] with S = txt_len + img_len + padded concept block
        (S divisible by block sizes).
      concept_len: number of REAL concept tokens (<= padded block).
      rope_cos/rope_sin: optional expanded [S, D] float32 rotation tables —
        when given, RoPE is applied INSIDE the kernel (q once per tile row,
        k per tile) and q/k must be passed unroped; the XLA-level rotation
        and its f32 copies (~7% of a DiT step) disappear.
      int8_qk: quantize q/k per row to int8 and compute scores as
        int8 x int8 -> int32. Accuracy is fine (max |Δ| ~8e-3, tested), but
        MEASURED SLOWER on v5e (29.6 vs 25.0 ms at b8 S=4608 512/1536 tiles,
        0.845x): the per-tile quantize VPU work exceeds the MXU saving at
        d=128 tile shapes. Kept as a tested opt-in for hardware where the
        int8 MXU ratio is higher; not used by any default path.

    Returns [B, H, S, D]; padded rows are zero.
    """
    b, h, s, d = q.shape
    bh = b * h
    q3 = q.reshape(bh, s, d)
    k3 = k.reshape(bh, s, d)
    v3 = v.reshape(bh, s, d)

    grid = (bh, pl.cdiv(s, block_q), pl.cdiv(s, block_k))
    kernel = functools.partial(
        _flash_kernel,
        # log2(e) folded into the attention scale: the online softmax runs in
        # the exp2 domain (numerically the same softmax).
        scale=LOG2E / (d**0.5),
        txt_len=txt_len,
        img_len=img_len,
        concept_len=concept_len,
        block_q=block_q,
        block_k=block_k,
        cross=cross,
        self_attention=self_attention,
        seq_len=s,
        fuse_rope=rope_cos is not None,
        int8_qk=int8_qk,
    )
    # Scoped-VMEM budget: fp32 score/prob temporaries (~6 copies of
    # [bq, bk] x 4B) PLUS the whole-sequence roped-K cache on the fused-rope
    # path — at f32 inputs that cache alone can dominate (the VAE's 16k-token
    # d=512 mid-attention: 33.5 MB, which silently exceeded the old
    # temporaries-only 32 MB floor and crashed the remote AOT compile of the
    # pipeline's f32 decode; bf16 paths fit by luck). The default 16 MB stack
    # limit also rejects 544x2176 tiles, so raise the ceiling with headroom
    # for operands (v5e VMEM is far larger than the conservative default).
    scratch_bytes = 6 * block_q * block_k * 4
    if rope_cos is not None:
        scratch_bytes += pl.cdiv(s, block_k) * block_k * d * q.dtype.itemsize
        scratch_bytes += block_q * d * q.dtype.itemsize
    if int8_qk:
        scratch_bytes += block_q * (d + 512)
        if rope_cos is not None:
            scratch_bytes += pl.cdiv(s, block_k) * block_k * (d + 512)
    vmem_limit = min(
        128 * 1024 * 1024,
        max(32 * 1024 * 1024, int(1.5 * scratch_bytes)),
    )
    # CompilerParams was TPUCompilerParams before the pallas rename; resolve
    # whichever exists (an AttributeError here would escape the TypeError
    # fallbacks below).
    _cp_cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams", None
    )
    # With the fused-rope K cache the q grid dimension carries a cross-
    # iteration dependency (qi == 0 fills the roped-K scratch that later q
    # tiles read), so it must iterate sequentially.
    dims = (
        ("parallel", "arbitrary", "arbitrary")
        if rope_cos is not None
        else ("parallel", "parallel", "arbitrary")
    )
    compiler_params = None
    if _cp_cls is not None:
        try:
            compiler_params = _cp_cls(
                dimension_semantics=dims,
                vmem_limit_bytes=vmem_limit,
            )
        except TypeError:  # older pallas without these fields
            try:
                compiler_params = _cp_cls(dimension_semantics=dims)
            except TypeError:
                compiler_params = None
    # With the fused-rope roped-K cache, k (and the k rope tables below) are
    # only READ on the qi == 0 cache-fill sweep — but a plain (bh, ki, 0)
    # index map would re-DMA them on EVERY grid step. At production tiles
    # that redundant stream (k + cos_k + sin_k ~ 2.0 MB/step next to v's
    # 0.4 MB) exceeds the step's MXU time — the measured 48%-of-peak ceiling
    # was DMA-bound. Pinning the block index to 0 for qi > 0 makes the index
    # unchanged across consecutive steps, so Pallas elides the copies.
    # pin_k_stream=False restores the round-3 always-stream behavior (kept as
    # a static knob for A/B measurement of this exact effect).
    if rope_cos is not None and pin_k_stream:
        k_stream_idx = lambda bh, qi, ki: (bh, (qi == 0) * ki, 0)  # noqa: E731
    else:
        k_stream_idx = lambda bh, qi, ki: (bh, ki, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((1, block_k, d), k_stream_idx),
        pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    operands = [q3, k3, v3]
    if rope_cos is not None:
        assert rope_cos.shape == (b, s, d), (rope_cos.shape, b, s, d)
        # Tables are per batch; the grid's leading coordinate is b*h, so the
        # batch row is bh // h (per-sample position ids supported). The k
        # tables are only read during the qi == 0 cache-fill sweep — same
        # index-pinning trick as the k stream above.
        q_idx = lambda bh, qi, ki: (bh // h, qi, 0)  # noqa: E731
        if pin_k_stream:
            k_idx = lambda bh, qi, ki: (bh // h, (qi == 0) * ki, 0)  # noqa: E731
        else:
            k_idx = lambda bh, qi, ki: (bh // h, ki, 0)  # noqa: E731
        in_specs += [
            pl.BlockSpec((1, block_q, d), q_idx),
            pl.BlockSpec((1, block_q, d), q_idx),
            pl.BlockSpec((1, block_k, d), k_idx),
            pl.BlockSpec((1, block_k, d), k_idx),
        ]
        operands += [rope_cos, rope_sin, rope_cos, rope_sin]
        scratch_shapes.append(pltpu.VMEM((block_q, d), q.dtype))
        # Roped-K cache for the whole sequence (filled on the qi == 0 sweep).
        scratch_shapes.append(
            pltpu.VMEM((pl.cdiv(s, block_k) * block_k, d), q.dtype)
        )
    if int8_qk:
        scratch_shapes += [
            pltpu.VMEM((block_q, d), jnp.int8),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
        if rope_cos is not None:
            nk_rows = pl.cdiv(s, block_k) * block_k
            scratch_shapes += [
                pltpu.VMEM((nk_rows, d), jnp.int8),
                pltpu.VMEM((nk_rows, 128), jnp.float32),
            ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), v.dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * s * s * d * b * h,
            bytes_accessed=3 * bh * s * d * q.dtype.itemsize + bh * s * d * v.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, s, d)


def _flash_kernel_paired(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    m_scratch, l_scratch, acc_scratch, qpair_scratch, kdiag_scratch,
    vdiag_scratch,
    *,
    scale: float,
    txt_len: int,
    img_len: int,
    concept_len: int,
    block_q: int,
    block_k: int,
    cross: bool,
    self_attention: bool,
    seq_len: int,
):
    """Two d=64 heads per grid step via block-diagonal packing.

    At d=64 every MXU dot half-idles: QK^T's contraction dim (64) fills half
    the 128-deep systolic array and AV's output width (64) half the result
    lanes — measured 58.4 TFLOP/s at the video shape vs 94-105 at d=128
    (ARCHITECTURE.md). Packing a HEAD PAIR restores the d=128 ratio with
    zero wasted math:

      scores: [q1|q2] (bq x 128)  @  [[k1|0],[0|k2]]^T (128 x 2bk)
              = [q1 k1^T | q2 k2^T]           (full 128 contraction)
      AV:     p (bq x 2bk)  @  [[v1|0],[0|v2]] (2bk x 128)
              = [o1 | o2]                      (full 128 output lanes)

    The zero blocks ride array cells that an unpaired d=64 dot would leave
    idle anyway. Online softmax runs per half-tile (separate m/l per head,
    broadcast into lane halves 0-63 / 64-127 so alpha/l align elementwise
    with the packed accumulator). Same segment masking as _flash_kernel with
    k positions = k_start + (lane % block_k). Fused-rope only (the d=64
    video path always passes tables); block-diagonal roped-K and V caches
    fill on the qi == 0 sweep like the base kernel's roped-K cache.
    """
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    d = 64

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        # rope + fold the scale once per q tile, both heads side by side
        q1 = q_ref[0, 0].astype(jnp.float32)
        q2 = q_ref[0, 1].astype(jnp.float32)
        cosq = cosq_ref[0]
        sinq = sinq_ref[0]
        q1r = (q1 * cosq + _pair_swap(q1) * sinq) * scale
        q2r = (q2 * cosq + _pair_swap(q2) * sinq) * scale
        qpair_scratch[...] = jnp.concatenate(
            [q1r, q2r], axis=1).astype(qpair_scratch.dtype)

    @pl.when(qi == 0)
    def _fill_caches():
        k1 = _rot(k_ref[0, 0], cosk_ref[0], sink_ref[0])
        k2 = _rot(k_ref[0, 1], cosk_ref[0], sink_ref[0])
        zero = jnp.zeros((block_k, d), k1.dtype)
        base = 2 * ki * block_k
        kdiag_scratch[pl.ds(base, block_k), :] = jnp.concatenate(
            [k1, zero], axis=1)
        kdiag_scratch[pl.ds(base + block_k, block_k), :] = jnp.concatenate(
            [zero, k2], axis=1)
        v1 = v_ref[0, 0]
        v2 = v_ref[0, 1]
        if seq_len % block_k:
            # zero rows past the sequence so masked-out p (0) never meets a
            # garbage v row (0 * NaN poisons the accumulator)
            rows = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, v1.shape, 0)
            v1 = jnp.where(rows < seq_len, v1, 0)
            v2 = jnp.where(rows < seq_len, v2, 0)
        zv = jnp.zeros((block_k, d), v1.dtype)
        vdiag_scratch[pl.ds(base, block_k), :] = jnp.concatenate(
            [v1, zv], axis=1)
        vdiag_scratch[pl.ds(base + block_k, block_k), :] = jnp.concatenate(
            [zv, v2], axis=1)

    joint_end = txt_len + img_len
    concept_end = joint_end + concept_len
    q_start = qi * block_q
    k_start = ki * block_k

    # Block-level reachability on scalar ranges (positions are shared by the
    # two heads, so the predicates are identical to the unpaired kernel's).
    q_is_joint = q_start < joint_end
    q_has_concept = (q_start + block_q > joint_end) & (q_start < concept_end)
    k_is_joint = k_start < joint_end
    k_is_img = (k_start + block_k > txt_len) & (k_start < joint_end)
    k_has_concept = (k_start + block_k > joint_end) & (k_start < concept_end)
    joint_reach = q_is_joint & k_is_joint
    concept_reach = q_has_concept & (
        (k_is_img if cross else False) | (k_has_concept if self_attention else False)
    )
    block_reachable = joint_reach | concept_reach
    interior = (q_start + block_q <= joint_end) & (k_start + block_k <= joint_end)

    def _halves(x, width):
        return x[:, :width], x[:, width:]

    def _online_softmax_update(s, allowed):
        if allowed is not None:
            s = jnp.where(allowed, s, NEG_INF)
        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        s1, s2 = _halves(s, block_k)
        m1 = jnp.max(s1, axis=-1, keepdims=True)
        m2 = jnp.max(s2, axis=-1, keepdims=True)
        m_cur = jnp.concatenate(
            [jnp.broadcast_to(m1, (block_q, d)),
             jnp.broadcast_to(m2, (block_q, d))], axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        m_wide = jnp.concatenate(
            [jnp.broadcast_to(m_new[:, :1], (block_q, block_k)),
             jnp.broadcast_to(m_new[:, d : d + 1], (block_q, block_k))],
            axis=1)
        p = jnp.exp2(s - m_wide)
        if allowed is not None:
            p = jnp.where(allowed, p, 0.0)
        alpha = jnp.exp2(m_prev - m_new)
        p1, p2 = _halves(p, block_k)
        l_cur = jnp.concatenate(
            [jnp.broadcast_to(jnp.sum(p1, axis=-1, keepdims=True), (block_q, d)),
             jnp.broadcast_to(jnp.sum(p2, axis=-1, keepdims=True), (block_q, d))],
            axis=1)
        m_scratch[...] = m_new
        l_scratch[...] = l_prev * alpha + l_cur
        vdiag = vdiag_scratch[pl.ds(2 * ki * block_k, 2 * block_k), :]
        acc_scratch[...] = acc_scratch[...] * alpha + jax.lax.dot_general(
            p.astype(vdiag.dtype), vdiag, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _scores():
        kdiag = kdiag_scratch[pl.ds(2 * ki * block_k, 2 * block_k), :]
        return jax.lax.dot_general(
            qpair_scratch[...], kdiag, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, 2*bk] = [head1 | head2], scale pre-folded into q

    @pl.when(block_reachable & interior)
    def _compute_unmasked():
        _online_softmax_update(_scores(), None)

    @pl.when(block_reachable & jnp.logical_not(interior))
    def _compute_masked():
        q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * block_k), 1)
        # both lane halves carry the same key positions
        k_idx = k_start + lane % block_k
        q_joint = q_idx < joint_end
        q_concept = jnp.logical_and(q_idx >= joint_end, q_idx < concept_end)
        k_joint = k_idx < joint_end
        k_img = jnp.logical_and(k_idx >= txt_len, k_idx < joint_end)
        k_concept = jnp.logical_and(k_idx >= joint_end, k_idx < concept_end)
        allowed = jnp.logical_and(q_joint, k_joint)
        concept_keys = jnp.zeros_like(k_joint)
        if cross:
            concept_keys = jnp.logical_or(concept_keys, k_img)
        if self_attention:
            concept_keys = jnp.logical_or(concept_keys, k_concept)
        allowed = jnp.logical_or(
            allowed, jnp.logical_and(q_concept, concept_keys))
        _online_softmax_update(_scores(), allowed)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scratch[...]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = (acc_scratch[...] / safe_l).astype(o_ref.dtype)
        o_ref[0, 0] = out[:, :d]
        o_ref[0, 1] = out[:, d:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "txt_len", "img_len", "concept_len", "cross", "self_attention",
        "block_q", "block_k", "interpret",
    ),
)
def fused_concept_flash_attention_paired(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    txt_len: int,
    img_len: int,
    concept_len: int,
    cross: bool = True,
    self_attention: bool = True,
    block_q: int = 512,
    block_k: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """Head-pair-packed fused attention for d=64 (see _flash_kernel_paired).

    Same contract as fused_concept_flash_attention restricted to: head_dim
    64, an even head count, and fused rope (tables required). Returns
    [B, H, S, D] with padded rows zero."""
    b, h, s, d = q.shape
    assert d == 64 and h % 2 == 0, (h, d)
    assert rope_cos is not None and rope_cos.shape == (b, s, d)
    pairs = (b * h) // 2
    q4 = q.reshape(pairs, 2, s, d)
    k4 = k.reshape(pairs, 2, s, d)
    v4 = v.reshape(pairs, 2, s, d)

    grid = (pairs, pl.cdiv(s, block_q), pl.cdiv(s, block_k))
    kernel = functools.partial(
        _flash_kernel_paired,
        scale=LOG2E / (d**0.5),
        txt_len=txt_len,
        img_len=img_len,
        concept_len=concept_len,
        block_q=block_q,
        block_k=block_k,
        cross=cross,
        self_attention=self_attention,
        seq_len=s,
    )
    nk_rows = 2 * pl.cdiv(s, block_k) * block_k
    scratch_bytes = (
        6 * block_q * 2 * block_k * 4          # f32 score/prob temporaries
        + 2 * nk_rows * 128 * q.dtype.itemsize  # kdiag + vdiag caches
        + block_q * 128 * q.dtype.itemsize      # qpair
        + 3 * block_q * 128 * 4                 # m/l/acc
    )
    vmem_limit = min(
        128 * 1024 * 1024,
        max(32 * 1024 * 1024, int(1.5 * scratch_bytes)),
    )
    _cp_cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams", None
    )
    dims = ("parallel", "arbitrary", "arbitrary")  # qi==0 fills the caches
    compiler_params = None
    if _cp_cls is not None:
        try:
            compiler_params = _cp_cls(
                dimension_semantics=dims, vmem_limit_bytes=vmem_limit)
        except TypeError:
            try:
                compiler_params = _cp_cls(dimension_semantics=dims)
            except TypeError:
                compiler_params = None
    # k/v (+ k tables) are read only on the qi == 0 cache-fill sweep — pin
    # their block index for qi > 0 so Pallas elides the re-DMA (same trick,
    # and same rationale, as the base kernel's pinned K stream).
    kv_idx = lambda pr, qi, ki: (pr, 0, (qi == 0) * ki, 0)  # noqa: E731
    batch_of = lambda pr: (2 * pr) // h  # noqa: E731 — flat bh row -> batch
    in_specs = [
        pl.BlockSpec((1, 2, block_q, d), lambda pr, qi, ki: (pr, 0, qi, 0)),
        pl.BlockSpec((1, 2, block_k, d), kv_idx),
        pl.BlockSpec((1, 2, block_k, d), kv_idx),
        # per-batch rope tables (positions shared by both heads of a pair)
        pl.BlockSpec((1, block_q, d),
                     lambda pr, qi, ki: (batch_of(pr), qi, 0)),
        pl.BlockSpec((1, block_q, d),
                     lambda pr, qi, ki: (batch_of(pr), qi, 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda pr, qi, ki: (batch_of(pr), (qi == 0) * ki, 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda pr, qi, ki: (batch_of(pr), (qi == 0) * ki, 0)),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),   # m (halves = heads)
        pltpu.VMEM((block_q, 128), jnp.float32),   # l
        pltpu.VMEM((block_q, 128), jnp.float32),   # acc [o1 | o2]
        pltpu.VMEM((block_q, 128), q.dtype),       # roped+scaled q pair
        pltpu.VMEM((nk_rows, 128), q.dtype),       # block-diag roped K
        pltpu.VMEM((nk_rows, 128), q.dtype),       # block-diag V
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, block_q, d),
                               lambda pr, qi, ki: (pr, 0, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((pairs, 2, s, d), v.dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * s * s * d * b * h,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(q4, k4, v4, rope_cos, rope_sin, rope_cos, rope_sin)
    return out.reshape(b, h, s, d)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Measured-best tile sizes per total sequence length (v5e, b4 x 24 heads,
# d=128, fused rope): exact-divisor tiles eliminate the masked-tail pad waste
# (512/1024 on S=4352 padded to 4608x5120 = ~24% wasted MXU work).
_BEST_TILES = {
    # Full-row K tiles (bk = S, one k-step per q tile) measure 8-11% faster
    # in the isolated kernel microbench (93-96 TFLOP/s: K/V streams once, no
    # cross-step online-softmax rescale) but are SLOWER in the full model —
    # the ~60 MB scoped VMEM starves the surrounding graph (bench with both
    # shapes full-row: 0.532 img/s vs 0.580, heatmap overhead 0% -> 11%).
    4352: (544, 2176),  # flux singles (256 txt + 4096 img); re-confirmed by
    #                     the round-4 sweep under the pinned-K-stream kernel
    #                     (83.5 TFLOP/s, next-best 512x2176 at 79.1)
    4608: (576, 1536),  # flux doubles (+256 concept pad): round-5 in-model
    #                     interleaved A/B (3 rounds each, no-pin kernel):
    #                     576 tiles 0.585 img/s vs 768 tiles 0.574 — the
    #                     round-4 768x1536 pick was an isolated-kernel
    #                     optimum under the (since reverted) pinned K stream

    # cogvideox fused length (226 txt + 17550 video + 256-padded concepts),
    # b1 x 48 heads x d=64: autotuned on v5e — 58.7 TFLOP/s vs 50.3 at the
    # generic-divisor (368, 1024) fallback (round-4 sweep, 11 candidates).
    18032: (768, 1536),
}

# Runtime overlay written by kernels/autotune.py (user-tuned on the CURRENT
# device kind); takes precedence over the v5e-measured table above.
_TUNED_TILES: dict = {}
_tile_cache_loaded = False

# Head-pair-packed kernel (d=64): OFF by default. The round-5 on-chip
# elimination probe (examples/probe_paired.py, S=18032 h48 b1, 8 tile
# candidates) measured the paired kernel's best EXACTLY TYING the unpaired
# kernel (59.2 vs 59.2 TFLOP/s) — proof the d=64 rate is NOT MXU-fill-bound:
# packing two heads restores full 128-deep contractions and 128-lane outputs
# yet moves nothing. The binding resource is per-score VPU softmax work
# (~59 TFLOP/s at d=64 is the same scores/sec as the ~100 TFLOP/s
# VPU-serialization ceiling measured at d=128, scaled by d; paired packing
# leaves exp/max/rescale volume per score unchanged). int8-QK re-raced at
# d=64 the same session: 55.9 TFLOP/s, negative again. The kernel stays as
# the measured elimination apparatus + an escape hatch (it also halves K/V
# streaming DMA volume, which could matter at much longer S).
_PAIR_HEADS = False

# Measured-best (block_q, per-head block_k) for the paired kernel; the score
# tile is [block_q, 2*block_k] so lane width matches the unpaired table's at
# half the per-head block_k.
_BEST_TILES_PAIRED = {
    18032: (768, 768),  # round-5 probe winner: 59.2 TFLOP/s (512x768: 56.6,
    #                     512x1024: 58.1, 640x768: 56.4, others <56)
}


def _auto_tiles_paired(s: int) -> Tuple[int, int]:
    if s in _BEST_TILES_PAIRED:
        return _BEST_TILES_PAIRED[s]
    bq, bk = _auto_tiles(s)
    return bq, max(128, bk // 2)


def _auto_tiles(s: int) -> Tuple[int, int]:
    """Pick (block_q, block_k) for sequence length s: user-autotuned overlay
    first (kernels/autotune.py, per-device-kind cache), then the measured
    _BEST_TILES table, else the largest exact divisors within VMEM-safe
    bounds, else the generic 512/1024 (masked tails handle non-divisible
    lengths). Degenerate exact divisors (e.g. s = 16 * prime -> bq = 16, a
    16-row MXU tile) are worse than masked tails, so anything below the
    256/512 floor falls back."""
    global _tile_cache_loaded
    if not _tile_cache_loaded:
        _tile_cache_loaded = True  # one attempt; absence is the common case
        try:
            from conceptattention_tpu.kernels import autotune

            autotune.load_tile_cache()
        except Exception:
            pass
    if s in _TUNED_TILES:
        return _TUNED_TILES[s]
    if s in _BEST_TILES:
        return _BEST_TILES[s]
    bq = max(
        (x for x in range(16, 545, 16) if s % x == 0), default=512
    )
    bk = max(
        (x for x in range(128, 1537, 128) if s % x == 0 and x * bq <= 1_200_000),
        default=1024,
    )
    if bq < 256 or bk < 512:
        return 512, 1024
    return bq, bk


def expand_rope_tables(segments, total_len: int):
    """Build the kernel's expanded [B, total_len, D] float32 rotation tables
    from per-segment (cos, sin) pairs of shape [B, 1, N, D/2] (as built by
    ops.rope.embed_nd). Pad rows get the identity rotation.

    Tables are PER BATCH and the kernel indexes them by the grid's batch
    coordinate, so per-sample position ids (crops, mixed-resolution batches)
    are handled correctly by construction — no batch-invariance assumption."""
    cos_parts, sin_parts = [], []
    n_done = 0
    b = segments[0][0].shape[0]
    for c, s in segments:
        c0 = c[:, 0].astype(jnp.float32)  # [B, N, D/2]
        s0 = s[:, 0].astype(jnp.float32)
        cos_parts.append(jnp.repeat(c0, 2, axis=-1))
        sin_parts.append(
            jnp.stack([-s0, s0], axis=-1).reshape(b, s0.shape[1], -1)
        )
        n_done += c0.shape[1]
    d = cos_parts[0].shape[-1]
    if n_done < total_len:
        pad = total_len - n_done
        cos_parts.append(jnp.ones((b, pad, d), jnp.float32))
        sin_parts.append(jnp.zeros((b, pad, d), jnp.float32))
    return jnp.concatenate(cos_parts, axis=1), jnp.concatenate(sin_parts, axis=1)


def pallas_joint_concept_attention(
    txt_qkv: Tuple[jax.Array, jax.Array, jax.Array],
    img_qkv: Tuple[jax.Array, jax.Array, jax.Array],
    concept_qkv,
    pe: Tuple[jax.Array, jax.Array],
    concept_pe,
    cross: bool = True,
    self_attention: bool = True,
    block_q: int = None,
    block_k: int = None,
    interpret: bool = False,
    int8_qk: bool = False,
):
    """Drop-in fused replacement for ops.attention.joint_concept_attention's
    attention core. Returns (txt_attn, img_attn, concept_attn, extras) with
    merged-head [B, L, H*D] outputs."""
    from conceptattention_tpu.ops.attention import merge_heads

    txt_q, txt_k, txt_v = txt_qkv
    img_q, img_k, img_v = img_qkv
    b, h, t, d = txt_q.shape
    p = img_q.shape[2]

    cos, sin = pe  # RoPE happens inside the kernel; q/k stay unroped here

    if concept_qkv is None:
        seqs_q = [txt_q, img_q]
        seqs_k = [txt_k, img_k]
        seqs_v = [txt_v, img_v]
        c_real = 0
        segments = [(cos, sin)]
    else:
        con_q, con_k, con_v = concept_qkv
        c_real = con_q.shape[2]
        ccos, csin = concept_pe
        # concepts padded only to a small lane-friendly multiple; the kernel
        # handles non-divisible total lengths with masked tail tiles.
        c_pad = _round_up(c_real, 256)

        def pad_c(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c_real), (0, 0)))

        seqs_q = [txt_q, img_q, pad_c(con_q)]
        seqs_k = [txt_k, img_k, pad_c(con_k)]
        seqs_v = [txt_v, img_v, pad_c(con_v)]
        segments = [(cos, sin), ((ccos[:, :, :c_real], csin[:, :, :c_real]))]

    q = jnp.concatenate(seqs_q, axis=2)
    k = jnp.concatenate(seqs_k, axis=2)
    v = jnp.concatenate(seqs_v, axis=2)
    rope_cos, rope_sin = expand_rope_tables(segments, q.shape[2])
    if (d == 64 and h % 2 == 0 and not int8_qk and _PAIR_HEADS
            and block_q is None and block_k is None):
        # d=64 MXU dots half-idle the systolic array; the head-pair-packed
        # kernel restores the d=128 ratio (see _flash_kernel_paired).
        pbq, pbk = _auto_tiles_paired(q.shape[2])
        out = fused_concept_flash_attention_paired(
            q, k, v, rope_cos, rope_sin,
            txt_len=t, img_len=p, concept_len=c_real,
            cross=cross, self_attention=self_attention,
            block_q=pbq, block_k=pbk, interpret=interpret,
        )
    else:
        if block_q is None or block_k is None:
            auto_q, auto_k = _auto_tiles(q.shape[2])
            block_q = block_q or auto_q
            block_k = block_k or auto_k
        out = fused_concept_flash_attention(
            q, k, v,
            txt_len=t, img_len=p, concept_len=c_real,
            cross=cross, self_attention=self_attention,
            block_q=block_q, block_k=block_k, interpret=interpret,
            rope_cos=rope_cos, rope_sin=rope_sin, int8_qk=int8_qk,
            pin_k_stream=_PIN_K_STREAM,
        )

    txt_attn = merge_heads(out[:, :, :t])
    img_attn = merge_heads(out[:, :, t : t + p])
    if concept_qkv is None:
        return txt_attn, img_attn, None, {}
    if not cross and not self_attention:
        # "Neither" ablation: the concept stream passes its values through
        # (reference modified_double_stream_block.py:157-159).
        concept_out_h = concept_qkv[2]
    else:
        concept_out_h = out[:, :, t + p : t + p + c_real]
    extras = {
        "concept_q": concept_qkv[0],
        "concept_k": concept_qkv[1],
        "img_q": img_q,
        "concept_v": concept_qkv[2],
        "img_v": img_v,
        # Head-form outputs for saliency taps (see ops/attention.py: keeps
        # the residual carry row-major through the scan).
        "concept_out_h": concept_out_h,
        "img_out_h": out[:, :, t : t + p],
    }
    return txt_attn, img_attn, merge_heads(concept_out_h), extras
