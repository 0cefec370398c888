"""Concept heatmap post-processing.

Parity target: `compute_heatmaps_from_vectors`
(`concept_attention/concept_attention_pipeline.py:29-91` in
manuragkhullar/ConceptAttention): concept-x-patch dot products are normalized
*across concepts* per patch (softmax / entmax15 / sparsemax), then selected
timesteps and layers are averaged and the patch axis reshaped to the 2D grid.

TPU-first difference: the forward pass already reduces per-layer activations
to raw similarity maps `[T, L, B, C, P]` (sufficient statistics — the concept
normalization commutes with nothing upstream of it), so the heavy
`[T, L, B, P, 3072]` vector stash the reference hauls to host never exists.
`compute_heatmaps_from_vectors` is kept for parity/debug paths that do carry
full vectors.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from conceptattention_tpu.ops.sparse import entmax15, sparsemax


def normalize_concepts_linear(x: jax.Array, axis: int) -> jax.Array:
    """Shift-to-nonnegative then L1-normalize along `axis`
    (reference utils.py:35-44)."""
    x_min = jnp.min(x, axis=axis, keepdims=True)
    shifted = x - x_min
    total = jnp.sum(shifted, axis=axis, keepdims=True)
    total = jnp.where(total == 0, jnp.ones_like(total), total)
    return shifted / total


def apply_attention_norm(
    maps: jax.Array, attention_norm: str, axis: int = -2
) -> jax.Array:
    """Normalize similarity maps across the concept axis."""
    if attention_norm == "softmax":
        return jax.nn.softmax(maps, axis=axis)
    if attention_norm == "entmax15":
        return entmax15(maps, axis=axis)
    if attention_norm == "sparsemax":
        return sparsemax(maps, axis=axis)
    if attention_norm == "none":
        return maps
    raise ValueError(f"Unknown attention_norm={attention_norm!r}")


def reduce_maps(
    maps: jax.Array,
    layer_indices: Sequence[int],
    timesteps: Optional[Sequence[int]] = None,
    softmax: bool = True,
    attention_norm: str = "sparsemax",
    spatial_shape: Optional[tuple] = None,
) -> jax.Array:
    """[T, L, B, C, P] raw similarity maps -> [B, C, h, w] heatmaps.

    Matches the reference's ordering exactly: normalize over concepts first
    (per time/layer/patch), then select timesteps+layers, then mean.
    `softmax=True` overrides attention_norm (backward-compat flag parity,
    concept_attention_pipeline.py:64-65).
    """
    norm = "softmax" if (softmax or attention_norm == "softmax") else attention_norm
    # A bf16 stash (ConceptAttentionSpec.stash_dtype) rounds only storage;
    # all normalization/averaging runs in f32 regardless.
    maps = apply_attention_norm(maps.astype(jnp.float32), norm, axis=-2)
    # Validate statically: JAX gather clamps out-of-range indices silently,
    # which would average duplicated steps instead of erroring (e.g. user
    # timesteps=[0..3] after init_image shortened the schedule).
    if timesteps is not None:
        bad = [int(t) for t in timesteps if not 0 <= int(t) < maps.shape[0]]
        if bad:
            raise ValueError(
                f"timesteps {bad} out of range for {maps.shape[0]} sampled steps"
            )
        maps = maps[jnp.asarray(timesteps)]
    bad = [int(l) for l in layer_indices if not 0 <= int(l) < maps.shape[1]]
    if bad:
        raise ValueError(f"layer_indices {bad} out of range for {maps.shape[1]} layers")
    maps = maps[:, jnp.asarray(layer_indices)]
    maps = jnp.mean(maps, axis=(0, 1))  # [B, C, P]
    b, c, p = maps.shape
    if spatial_shape is None:
        side = int(round(p**0.5))
        spatial_shape = (side, side)
    h, w = spatial_shape
    assert h * w == p, (h, w, p)
    return maps.reshape(b, c, h, w)


def compute_heatmaps_from_vectors(
    image_vectors: jax.Array,
    concept_vectors: jax.Array,
    layer_indices: Sequence[int],
    timesteps: Optional[Sequence[int]] = None,
    softmax: bool = True,
    normalize_concepts: bool = False,
    attention_norm: str = "sparsemax",
    spatial_shape: Optional[tuple] = None,
) -> jax.Array:
    """Parity-path heatmaps from full vector stashes.

    image_vectors: [T, L, B, P, D] or [T, L, B, H, P, D];
    concept_vectors: same but with C tokens. Returns [B, C, h, w].
    """
    if image_vectors.ndim == 6:
        t, l, b, h, p, d = image_vectors.shape
        image_vectors = image_vectors.transpose(0, 1, 2, 4, 3, 5).reshape(t, l, b, p, h * d)
        t, l, b, h, c, d = concept_vectors.shape
        concept_vectors = concept_vectors.transpose(0, 1, 2, 4, 3, 5).reshape(t, l, b, c, h * d)
    if normalize_concepts:
        concept_vectors = normalize_concepts_linear(concept_vectors, axis=-2)
    maps = jnp.einsum(
        "tlbpd,tlbcd->tlbcp", image_vectors, concept_vectors,
        preferred_element_type=jnp.float32,
    )
    return reduce_maps(
        maps, layer_indices, timesteps, softmax, attention_norm, spatial_shape
    )


def heatmaps_to_pil(heatmaps, cmap: str = "plasma") -> List:
    """[C, h, w] float heatmaps -> list of PIL images via a matplotlib
    colormap with global min/max normalization (reference
    concept_attention_pipeline.py:174-196)."""
    import numpy as np
    import PIL.Image
    from matplotlib import pyplot as plt

    arr = np.asarray(heatmaps, dtype=np.float32)
    lo, hi = arr.min(), arr.max()
    scale = (hi - lo) if hi > lo else 1.0
    out = []
    colormap = plt.get_cmap(cmap)
    for hm in arr:
        colored = colormap((hm - lo) / scale)
        out.append(PIL.Image.fromarray((colored[:, :, :3] * 255).astype(np.uint8)))
    return out
