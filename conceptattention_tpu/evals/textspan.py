"""CLIP TextSpan-style segmentation baseline.

Capability parity with `CLIPTextSpanSegmentationModel`
(`binary_segmentation_baselines/clip_text_span_baseline.py:13-93` plus the
vendored ~5.3k-LoC `clip_text_span/` open_clip fork with its PRS forward
hooks, in manuragkhullar/ConceptAttention): decompose the final-layer
attention's contribution to the CLS representation across image tokens
(and heads), project each token's contribution into the shared image-text
embedding space, and score it against per-concept text embeddings.

TPU-first: no hook machinery — the decomposition is computed in closed form
from the ViT's last-layer attention probabilities and value/projection
weights:

    CLS_out = sum_h sum_t A_h[cls, t] * (v_h[t] @ W_O[h])
    contribution[t] = sum_h A_h[cls, t] * (v_h[t] @ W_O[h]) @ W_proj
    saliency_c[t]   = contribution[t] . text_embedding(c)

Text embeddings come from any `TextEncoders` provider (a CLIP text tower with
checkpoints in production; the deterministic stub otherwise — this
environment has no weight egress).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.evals.baselines import _preprocess
from conceptattention_tpu.evals.segmentation import SegmentationModel
from conceptattention_tpu.models.vit import ViTConfig, _linear, _ln

# The 80 prompt templates the reference averages per concept
# (clip_text_span's ImageNet template set); a representative subset.
PROMPT_TEMPLATES = (
    "a photo of a {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a sculpture of a {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of the {}.",
    "a rendering of a {}.",
    "a cropped photo of the {}.",
    "a photo of a large {}.",
    "a photo of a small {}.",
)


def head_token_decomposition(
    params, cfg: ViTConfig, images: jax.Array
) -> jax.Array:
    """[B, tokens, D] per-token contributions to the CLS representation via
    the last attention layer (heads summed after per-head value+proj)."""
    from conceptattention_tpu.models.vit import vit_block

    b = images.shape[0]
    ps = cfg.patch_size
    g = images.shape[-1] // ps
    x = images.reshape(b, cfg.in_channels, g, ps, g, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, cfg.in_channels * ps * ps)
    x = _linear(x, params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:, : x.shape[1]]

    def step(x, layer_params):
        x, _ = vit_block(layer_params, x, cfg.num_heads)
        return x, None

    # run all but the last block
    n_layers = jax.tree.leaves(params["blocks"])[0].shape[0]
    head = jax.tree.map(lambda p: p[: n_layers - 1], params["blocks"])
    last = jax.tree.map(lambda p: p[n_layers - 1], params["blocks"])
    x, _ = jax.lax.scan(step, x, head)

    # last layer, decomposed
    p_attn = last["attn"]
    h_in = _ln(x, last["norm1"])
    bq, n, d = h_in.shape
    hd = d // cfg.num_heads
    qkv = _linear(h_in, p_attn["qkv"]).reshape(bq, n, 3, cfg.num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / (hd**0.5), axis=-1)
    # per-head value-projection: W_O split along its input (head) axis
    w_proj = p_attn["proj"]["w"].reshape(cfg.num_heads, hd, d)
    # contribution of token t via head h to the CLS residual:
    #   A_h[cls, t] * (v_h[t] @ W_O[h])
    vproj = jnp.einsum("bhtd,hde->bhte", v, w_proj)
    contrib = jnp.einsum("bht,bhte->bte", probs[:, :, 0, :], vproj)
    return contrib  # [B, tokens(incl cls), D]


class CLIPTextSpanSegmentationModel(SegmentationModel):
    """Saliency from text-projected head/token attention decomposition."""

    def __init__(self, params, cfg: ViTConfig, text_encoders, embed_proj=None):
        """embed_proj: optional [D, embed_dim] image->shared-space projection
        (identity when the text provider embeds at hidden size)."""
        self.params = params
        self.cfg = cfg
        self.text_encoders = text_encoders
        self.embed_proj = embed_proj

    def _text_embedding(self, concept: str) -> np.ndarray:
        embs = [
            np.asarray(self.text_encoders.encode_clip([t.format(concept)])[0])
            for t in PROMPT_TEMPLATES
        ]
        e = np.mean(embs, axis=0)
        return e / (np.linalg.norm(e) + 1e-8)

    def segment_individual_image(self, image, concepts: List[str], caption: str, **kw):
        x = _preprocess(image, self.cfg.image_size)
        contrib = head_token_decomposition(self.params, self.cfg, x)[0, 1:]  # drop CLS
        if self.embed_proj is not None:
            contrib = contrib @ self.embed_proj
        contrib = np.asarray(contrib, np.float32)
        g = self.cfg.grid
        maps = []
        for concept in concepts:
            e = self._text_embedding(concept)[: contrib.shape[-1]]
            maps.append((contrib @ e).reshape(g, g))
        return np.stack(maps), None
