"""Concept-basis extraction for real images.

Parity target: `generate_concept_basis_and_image_representation`
(`concept_attention/segmentation.py:156-340`) and
`generate_concept_basis_and_image_queries`
(`concept_attention/concept_encoding.py:7-66`) in the reference
(manuragkhullar/ConceptAttention): run the DiT once on a noised real image and
return raw concept / image vectors from a chosen representation space
(`output`, `cross_attention`, `value`), optionally layer-selected,
linearly-normalized over concepts, and flattened into a basis.

Unlike the reference (which reads stale cached attributes off block objects —
flagged broken in SURVEY.md §7), this taps the forward pass's raw-vector mode.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.ops.attention import ConceptAttentionSpec, merge_heads
from conceptattention_tpu.ops.packing import make_img_ids, pack_latents
from conceptattention_tpu.ops.schedule import get_schedule
from conceptattention_tpu.pipeline.heatmaps import normalize_concepts_linear
from conceptattention_tpu.sampling.rectified_flow import forward_noise, get_noise

_TAP_KEYS = {
    "output": ("output_space_image_vectors", "output_space_concept_vectors"),
    "cross_attention": (
        "cross_attention_image_vectors", "cross_attention_concept_vectors",
    ),
}


def generate_concept_basis_and_image_representation(
    pipeline,
    image,
    caption: str,
    concepts: List[str],
    noise_timestep: int = 2,
    layers: Optional[Sequence[int]] = None,
    normalize_concepts: bool = True,
    num_steps: int = 4,
    seed: int = 63,
    target_space: str = "output",
    height: int = 1024,
    width: int = 1024,
    num_samples: int = 1,
    reduce_dims: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (image_vectors, concept_vectors).

    reduce_dims=True flattens to ([patches, layers*samples*dim],
    [concepts, layers*samples*dim]) like the reference's basis layout.
    """
    assert target_space in _TAP_KEYS, target_space
    z = pipeline._encode_pixels(image, height, width, seed)
    b, _, lh, lw = z.shape
    schedule = get_schedule(
        num_steps, (lh // 2) * (lw // 2), shift=(not pipeline.is_schnell)
    )
    t = schedule[noise_timestep]

    txt, txt_ids, vec = pipeline._prepare_text(caption, 1)
    c_emb, c_ids, c_vec = pipeline._prepare_concepts(concepts, 1)

    img_key, con_key = _TAP_KEYS[target_space]
    # All noise samples in ONE batched forward (same per-sample keys the
    # sequential loop used); the batch axis IS the sample axis downstream.
    n = num_samples
    noised = jnp.concatenate(
        [
            forward_noise(
                z,
                get_noise(
                    jax.random.PRNGKey(seed + i), 1, height, width,
                    pipeline.dtype,
                    channels=pipeline.spec.ae_params.z_channels,
                    vae_factor=pipeline.vae_factor,
                ),
                t,
            )
            for i in range(n)
        ],
        axis=0,
    )
    bc = lambda a: jnp.broadcast_to(a, (n, *a.shape[1:]))  # noqa: E731
    # Reuse the pipeline's jitted encode forward (spec is static, so the
    # raw-vector variant gets its own cached executable — an eager
    # flux_forward here cost op-by-op dispatch every call).
    from conceptattention_tpu.pipeline.concept_pipeline import _encode_forward

    raw = _encode_forward(
        pipeline.params, pipeline.cfg,
        pack_latents(noised), make_img_ids(lh // 2, lw // 2, n),
        bc(txt), bc(txt_ids), bc(vec), bc(c_emb), bc(c_ids), bc(c_vec),
        jnp.full((n,), t, dtype=jnp.float32),
        ConceptAttentionSpec(return_raw_vectors=True),
    )
    iv, cv = raw[img_key], raw[con_key]
    if iv.ndim == 5:  # [L, N_s, H, P, D] query vectors -> merge heads
        iv = jax.vmap(merge_heads)(iv)
        cv = jax.vmap(merge_heads)(cv)

    image_vectors = iv.astype(jnp.float32)  # [L, N_s, P, D]
    concept_vectors = cv.astype(jnp.float32)

    if layers is not None:
        n_layers = image_vectors.shape[0]
        bad = [int(l) for l in layers if not (0 <= int(l) < n_layers)]
        if bad:  # JAX gathers clamp silently
            raise ValueError(f"layers {bad} out of range for {n_layers} layers")
        image_vectors = image_vectors[jnp.asarray(list(layers))]
        concept_vectors = concept_vectors[jnp.asarray(list(layers))]
    if normalize_concepts:
        concept_vectors = normalize_concepts_linear(concept_vectors, axis=-2)
    if reduce_dims:
        l, s, p, d = image_vectors.shape
        image_vectors = image_vectors.transpose(2, 0, 1, 3).reshape(p, l * s * d)
        c = concept_vectors.shape[2]
        concept_vectors = concept_vectors.transpose(2, 0, 1, 3).reshape(c, l * s * d)
    return np.asarray(image_vectors), np.asarray(concept_vectors)
