"""Attention ops: XLA-path SDPA and the joint (txt|concept)+img attention.

Behavior parity with the reference's ModifiedDoubleStreamBlock
(`concept_attention/modified_double_stream_block.py:106-168` in
manuragkhullar/ConceptAttention): a txt+img joint attention over the
`[txt; img]` sequence plus a concept pass in which concept queries attend over
`[concept; img]` keys (its own softmax denominator over C+P keys — *not*
shared with the txt+img pass). Image tokens never attend to concepts, so
generation is unmodified by the concept stream.

TPU-first design choices vs. the reference:
  - RoPE is applied once per segment (txt / img / concept); the image segment's
    rotated q/k are shared between the two passes instead of being recomputed
    (the reference ropes the 4096-token image segment twice per block).
  - Softmax runs in float32 regardless of the compute dtype; the PV matmul
    runs in the value dtype on the MXU.
  - A Pallas fused kernel (kernels/flash_saliency.py) implements the same
    contract blockwise for the hot path; this module is the XLA reference
    implementation and the fallback.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConceptAttentionSpec:
    """Static configuration for the concept pass (reference
    `joint_attention_kwargs`: concept_cross_attention / concept_self_attention /
    keep_head_dim at modified_double_stream_block.py:126-171)."""

    cross_attention: bool = True
    self_attention: bool = True
    # Which similarity tap points to emit as per-layer saliency maps.
    taps: Tuple[str, ...] = ("output", "cross_attention")
    # Emit full per-layer vector sets (parity/debug; large) instead of maps.
    return_raw_vectors: bool = False
    # Attention backend: "xla" (two SDPA calls), "pallas" (fused dual-pass
    # flash kernel, kernels/flash_saliency.py), "pallas_interpret" (kernel in
    # interpreter mode, for CPU tests), "ring" (context-parallel exact
    # attention: fused sequence sharded over `seq_axis`, K/V rotating around
    # the ring — parallel/ring_attention.ring_concept_attention), or
    # "ring_rdma" / "ring_rdma_interpret" (same ring contract with the hop
    # fused into a Pallas kernel via inter-chip remote DMA —
    # kernels/ring_rdma.py; the _interpret variant runs the TPU interpret
    # machine's RDMA emulation for CPU tests).
    backend: str = "xla"
    # Flash-kernel tile sizes (pallas backends only). None = auto-select
    # exact-divisor tiles per sequence length (kernels/flash_saliency.py:
    # _auto_tiles; masked-tail pad waste at 512/1024 cost ~20% on S=4352).
    block_q: int = None
    block_k: int = None
    # Pallas backends only: compute attention scores as int8 x int8 -> int32
    # on the MXU (per-row symmetric quantization of the roped q/k; the roped
    # K row is quantized once per (b, h) in the kernel's fill-time cache).
    # Accuracy: max |Δ| ~1e-2 on unit-variance inputs (tested); opt-in.
    int8_qk: bool = False
    # Storage dtype for the per-step saliency stash the sampler scan stacks
    # ([S, L, B, C, P] per tap). None keeps the f32 the similarity taps
    # compute in; "bf16" halves the resident bytes and the per-step stash
    # write bandwidth (the flux-dev 50-step config carries 124 MB f32;
    # measured overhead above BASELINE's <5% gate in the r05 capture).
    # Similarity is COMPUTED in f32 either way (preferred_element_type);
    # only the stacked copy is rounded, and heatmap post-processing upcasts
    # before softmax/normalization. Quality gated in tests/test_pipeline.py.
    stash_dtype: Optional[str] = None
    # Ring backend only: the jax.sharding.Mesh to shard over and its
    # sequence axis name. batch_axis/head_axis optionally compose the ring
    # with dp (batch) and tp (heads) in one mesh — dp x sp x tp.
    mesh: Optional[object] = None
    seq_axis: str = "seq"
    batch_axis: Optional[str] = None
    head_axis: Optional[str] = None


def default_backend() -> str:
    """'pallas' on TPU-like backends (incl. the axon plugin), else 'xla'."""
    try:
        name = jax.default_backend().lower()
    except Exception:
        return "xla"
    return "pallas" if ("tpu" in name or "axon" in name) else "xla"


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, D] -> [B, L, H*D]."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def split_qkv(qkv: jax.Array, num_heads: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[B, L, 3*H*D] fused projection -> three [B, H, L, D].

    The fused output dim is laid out (k, h, d) to match the reference's
    `rearrange(qkv, "B L (K H D) -> K B H L D")` so torch checkpoints import
    without re-permutation.
    """
    b, l, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    x = qkv.reshape(b, l, 3, num_heads, d)
    x = x.transpose(2, 0, 3, 1, 4)  # [3, B, H, L, D]
    return x[0], x[1], x[2]


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Scaled dot-product attention over [B, H, L, D] with fp32 softmax."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def joint_concept_attention(
    txt_qkv: Tuple[jax.Array, jax.Array, jax.Array],
    img_qkv: Tuple[jax.Array, jax.Array, jax.Array],
    concept_qkv: Optional[Tuple[jax.Array, jax.Array, jax.Array]],
    pe: Tuple[jax.Array, jax.Array],
    concept_pe: Optional[Tuple[jax.Array, jax.Array]],
    spec: ConceptAttentionSpec = ConceptAttentionSpec(),
):
    """Joint txt+img attention plus the optional concept pass.

    Args:
      txt_qkv/img_qkv/concept_qkv: per-segment (q, k, v), each [B, H, L, D],
        already QK-normalized but *not* yet roped.
      pe: (cos, sin) tables for the [txt; img] sequence.
      concept_pe: (cos, sin) tables for the [concept; img] sequence.

    Returns:
      (txt_attn, img_attn, concept_attn, extras) where the first three are
      merged-head [B, L, H*D] outputs (concept_attn is None when no concepts)
      and extras carries pre-rope q/v tensors for saliency taps:
      {"concept_q", "img_q", "concept_v", "img_v"} each [B, H, L, D].
    """
    from conceptattention_tpu.ops.rope import apply_rope

    if spec.int8_qk and spec.backend not in ("pallas", "pallas_interpret"):
        # Only the flash kernel implements int8 x int8 scores; anything else
        # would silently run bf16 while the caller believes it validated the
        # int8 path — fail loudly at trace time instead.
        raise ValueError(
            f"ConceptAttentionSpec(int8_qk=True) requires a Pallas attention "
            f"backend ('pallas' / 'pallas_interpret'), got {spec.backend!r}"
        )
    if spec.backend in ("pallas", "pallas_interpret"):
        from conceptattention_tpu.kernels.flash_saliency import (
            pallas_joint_concept_attention,
        )

        return pallas_joint_concept_attention(
            txt_qkv, img_qkv, concept_qkv, pe, concept_pe,
            cross=spec.cross_attention,
            self_attention=spec.self_attention,
            block_q=spec.block_q,
            block_k=spec.block_k,
            interpret=(spec.backend == "pallas_interpret"),
            int8_qk=spec.int8_qk,
        )
    if spec.backend in ("ring", "ring_rdma", "ring_rdma_interpret"):
        return _ring_joint_concept_attention(
            txt_qkv, img_qkv, concept_qkv, pe, concept_pe, spec
        )

    txt_q, txt_k, txt_v = txt_qkv
    img_q, img_k, img_v = img_qkv
    t = txt_q.shape[2]

    cos, sin = pe
    txt_pe = (cos[:, :, :t], sin[:, :, :t])
    img_pe = (cos[:, :, t:], sin[:, :, t:])

    txt_q_r, txt_k_r = apply_rope(txt_q, txt_k, txt_pe)
    img_q_r, img_k_r = apply_rope(img_q, img_k, img_pe)

    q = jnp.concatenate([txt_q_r, img_q_r], axis=2)
    k = jnp.concatenate([txt_k_r, img_k_r], axis=2)
    v = jnp.concatenate([txt_v, img_v], axis=2)
    attn = sdpa(q, k, v)
    txt_attn = merge_heads(attn[:, :, :t])
    img_attn = merge_heads(attn[:, :, t:])

    if concept_qkv is None:
        return txt_attn, img_attn, None, {}

    con_q, con_k, con_v = concept_qkv
    c = con_q.shape[2]
    ccos, csin = concept_pe
    con_pe = (ccos[:, :, :c], csin[:, :, :c])
    # The image-segment tables in concept_pe are identical to pe's image
    # segment (both come from img_ids), so the roped img q/k are reused.
    con_q_r, con_k_r = apply_rope(con_q, con_k, con_pe)

    if spec.cross_attention and spec.self_attention:
        cq = jnp.concatenate([con_q_r, img_q_r], axis=2)
        ck = jnp.concatenate([con_k_r, img_k_r], axis=2)
        cv = jnp.concatenate([con_v, img_v], axis=2)
        concept_attn = sdpa(cq, ck, cv)[:, :, :c]
    elif spec.cross_attention:
        concept_attn = sdpa(con_q_r, img_k_r, img_v)
    elif spec.self_attention:
        concept_attn = sdpa(con_q_r, con_k_r, con_v)
    else:
        concept_attn = con_v

    extras = {
        "concept_q": con_q,
        "concept_k": con_k,
        "img_q": img_q,
        "concept_v": con_v,
        "img_v": img_v,
        # Head-form outputs for the saliency taps: computing the similarity
        # from [B, H, L, D] (sum over h and d == merged dot product) keeps
        # XLA from propagating a transposed layout preference onto the
        # residual-stream scan carry (measured 6.9 ms/layer of elementwise
        # work in {1,2,0} layout vs 1.8 ms row-major on v5e).
        "concept_out_h": concept_attn,
        "img_out_h": attn[:, :, t:],
    }
    concept_attn = merge_heads(concept_attn)
    return txt_attn, img_attn, concept_attn, extras


def _ring_joint_concept_attention(txt_qkv, img_qkv, concept_qkv, pe, concept_pe, spec):
    """Context-parallel backend: the fused [txt | img | concept | pad]
    sequence is sharded over `spec.seq_axis` of `spec.mesh` and attention is
    computed distributed — each device holds only its query shard while K/V
    shards rotate around the ring (parallel/ring_attention). Same contract as
    the pallas backend; RoPE is applied per segment before fusing."""
    from conceptattention_tpu.ops.rope import apply_rope

    if spec.mesh is None:
        raise ValueError(f"spec.backend={spec.backend!r} requires spec.mesh")
    if spec.backend == "ring":
        from conceptattention_tpu.parallel.ring_attention import (
            make_ring_concept_attention,
        )
    else:  # ring_rdma / ring_rdma_interpret: in-kernel remote-DMA hops
        from conceptattention_tpu.kernels.ring_rdma import (
            make_ring_concept_attention_rdma,
        )

        make_ring_concept_attention = functools.partial(
            make_ring_concept_attention_rdma,
            interpret=(spec.backend == "ring_rdma_interpret"),
        )
    n_seq = spec.mesh.shape[spec.seq_axis]

    txt_q, txt_k, txt_v = txt_qkv
    img_q, img_k, img_v = img_qkv
    t = txt_q.shape[2]
    p = img_q.shape[2]

    cos, sin = pe
    txt_pe = (cos[:, :, :t], sin[:, :, :t])
    img_pe = (cos[:, :, t:], sin[:, :, t:])
    txt_q_r, txt_k_r = apply_rope(txt_q, txt_k, txt_pe)
    img_q_r, img_k_r = apply_rope(img_q, img_k, img_pe)

    seqs_q = [txt_q_r, img_q_r]
    seqs_k = [txt_k_r, img_k_r]
    seqs_v = [txt_v, img_v]
    c_real = 0
    if concept_qkv is not None:
        con_q, con_k, con_v = concept_qkv
        c_real = con_q.shape[2]
        ccos, csin = concept_pe
        con_pe = (ccos[:, :, :c_real], csin[:, :, :c_real])
        con_q_r, con_k_r = apply_rope(con_q, con_k, con_pe)
        seqs_q.append(con_q_r)
        seqs_k.append(con_k_r)
        seqs_v.append(con_v)

    q = jnp.concatenate(seqs_q, axis=2)
    k = jnp.concatenate(seqs_k, axis=2)
    v = jnp.concatenate(seqs_v, axis=2)
    s = q.shape[2]
    s_pad = -(-s // n_seq) * n_seq
    if s_pad != s:
        padding = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, padding), jnp.pad(k, padding), jnp.pad(v, padding)

    fn = make_ring_concept_attention(
        spec.mesh, spec.seq_axis, txt_len=t, img_len=p, concept_len=c_real,
        cross=spec.cross_attention, self_attention=spec.self_attention,
        batch_axis=spec.batch_axis, head_axis=spec.head_axis,
    )
    out = fn(q, k, v)

    txt_attn = merge_heads(out[:, :, :t])
    img_out_h = out[:, :, t : t + p]
    img_attn = merge_heads(img_out_h)
    if concept_qkv is None:
        return txt_attn, img_attn, None, {}
    if not spec.cross_attention and not spec.self_attention:
        concept_out_h = concept_qkv[2]  # "neither" ablation: value passthrough
    else:
        concept_out_h = out[:, :, t + p : t + p + c_real]
    extras = {
        "concept_q": concept_qkv[0],
        "concept_k": concept_qkv[1],
        "img_q": img_q,
        "concept_v": concept_qkv[2],
        "img_v": img_v,
        "concept_out_h": concept_out_h,
        "img_out_h": img_out_h,
    }
    return txt_attn, img_attn, merge_heads(concept_out_h), extras


def similarity_map(
    concept_vectors: jax.Array, image_vectors: jax.Array
) -> jax.Array:
    """Raw concept-x-patch similarity in a shared vector space.

    Args: concept_vectors [B, C, D], image_vectors [B, P, D] (heads merged).
    Returns: [B, C, P] float32 — the reference's
    `einops.einsum(..., "... patches dim, ... concepts dim -> ... concepts patches")`
    (concept_attention_pipeline.py:57-61).
    """
    return jnp.einsum(
        "bcd,bpd->bcp", concept_vectors, image_vectors,
        preferred_element_type=jnp.float32,
    )


def similarity_map_heads(
    concept_vectors: jax.Array, image_vectors: jax.Array
) -> jax.Array:
    """similarity_map on HEAD-FORM [B, H, L, D] tensors: summing the per-head
    dot products over heads equals the merged-head [B, L, H*D] dot product
    exactly, but reads the attention outputs in their natural layout (so the
    merged residual-stream tensors keep a row-major layout through the scan).
    """
    return jnp.einsum(
        "bhcd,bhpd->bcp", concept_vectors, image_vectors,
        preferred_element_type=jnp.float32,
    )
