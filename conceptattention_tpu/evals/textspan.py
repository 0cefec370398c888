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
from conceptattention_tpu.utils.images import as_float01_chw

# OpenAI's published 80 ImageNet prompt templates (public data from the CLIP
# repo), the full set the reference averages per concept
# (clip_text_span/utils/openai_templates.py, used at
# clip_text_span_baseline.py:48).
PROMPT_TEMPLATES = (
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a sculpture of a {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of the {}.",
    "a rendering of a {}.",
    "graffiti of a {}.",
    "a bad photo of the {}.",
    "a cropped photo of the {}.",
    "a tattoo of a {}.",
    "the embroidered {}.",
    "a photo of a hard to see {}.",
    "a bright photo of a {}.",
    "a photo of a clean {}.",
    "a photo of a dirty {}.",
    "a dark photo of the {}.",
    "a drawing of a {}.",
    "a photo of my {}.",
    "the plastic {}.",
    "a photo of the cool {}.",
    "a close-up photo of a {}.",
    "a black and white photo of the {}.",
    "a painting of the {}.",
    "a painting of a {}.",
    "a pixelated photo of the {}.",
    "a sculpture of the {}.",
    "a bright photo of the {}.",
    "a cropped photo of a {}.",
    "a plastic {}.",
    "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.",
    "a blurry photo of the {}.",
    "a photo of the {}.",
    "a good photo of the {}.",
    "a rendering of the {}.",
    "a {} in a video game.",
    "a photo of one {}.",
    "a doodle of a {}.",
    "a close-up photo of the {}.",
    "a photo of a {}.",
    "the origami {}.",
    "the {} in a video game.",
    "a sketch of a {}.",
    "a doodle of the {}.",
    "a origami {}.",
    "a low resolution photo of a {}.",
    "the toy {}.",
    "a rendition of the {}.",
    "a photo of the clean {}.",
    "a photo of a large {}.",
    "a rendition of a {}.",
    "a photo of a nice {}.",
    "a photo of a weird {}.",
    "a blurry photo of a {}.",
    "a cartoon {}.",
    "art of a {}.",
    "a sketch of the {}.",
    "a embroidered {}.",
    "a pixelated photo of a {}.",
    "itap of the {}.",
    "a jpeg corrupted photo of the {}.",
    "a good photo of a {}.",
    "a plushie {}.",
    "a photo of the nice {}.",
    "a photo of the small {}.",
    "a photo of the weird {}.",
    "the cartoon {}.",
    "art of the {}.",
    "a drawing of the {}.",
    "a photo of the large {}.",
    "a black and white photo of a {}.",
    "the plushie {}.",
    "a dark photo of a {}.",
    "itap of a {}.",
    "graffiti of the {}.",
    "a toy {}.",
    "itap of my {}.",
    "a photo of a cool {}.",
    "a photo of a small {}.",
    "a tattoo of the {}.",
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
        if not hasattr(self, "_text_cache"):
            self._text_cache = {}
        if concept in self._text_cache:
            return self._text_cache[concept]
        # One batched encode for all 80 templates (80 sequential single-prompt
        # dispatches cost ~30-90 ms each on the TPU plugin).
        embs = np.asarray(
            self.text_encoders.encode_clip(
                [t.format(concept) for t in PROMPT_TEMPLATES]
            ),
            np.float32,
        )
        # Reference protocol (clip_text_span_baseline.py:44-56): normalize
        # each template embedding, mean, renormalize.
        embs = embs / (np.linalg.norm(embs, axis=-1, keepdims=True) + 1e-8)
        e = np.mean(embs, axis=0)
        e = e / (np.linalg.norm(e) + 1e-8)
        self._text_cache[concept] = e
        return e

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


class OpenCLIPTextSpanSegmentationModel(SegmentationModel):
    """The reference TextSpan baseline on the open_clip-compatible tower:
    full PRS decomposition (all layers/heads, LN-linearized, projected —
    models/clip_vit.prs_decomposition) scored against 80-template-averaged
    concept text embeddings (clip_text_span_baseline.py:39-93).

    `params` = {"visual": ..., "text": ...} as produced by
    `clip_vit.convert_open_clip_visual/_text` (ViT-H/14 checkpoints) or
    `clip_vit.init_open_clip_params`. `tokenize(texts) -> [B, context] int32`
    defaults to a deterministic hash tokenizer when no BPE vocab is supplied
    (no weight/vocab egress in this environment).
    """

    def __init__(self, params, vis_cfg, txt_cfg, tokenize=None):
        from conceptattention_tpu.models import clip_vit

        self.params = params
        self.vis_cfg = vis_cfg
        self.txt_cfg = txt_cfg
        self.tokenize = tokenize or _hash_tokenize(txt_cfg)
        self._prs = jax.jit(
            lambda imgs: clip_vit.prs_decomposition(params["visual"], vis_cfg, imgs)
        )
        self._encode_text = jax.jit(
            lambda ids: clip_vit.text_encode(params["text"], txt_cfg, ids)
        )

    def _concept_vectors(self, concepts: List[str]) -> np.ndarray:
        """[embed_dim, C]: per-template-normalized mean, renormalized
        (reference clip_text_span_baseline.py:44-56). Cached per concept —
        the eval loop reuses the same vocabulary for every image."""
        if not hasattr(self, "_concept_cache"):
            self._concept_cache = {}
        cols = []
        for concept in concepts:
            if concept not in self._concept_cache:
                ids = self.tokenize([t.format(concept) for t in PROMPT_TEMPLATES])
                emb = np.asarray(self._encode_text(jnp.asarray(ids)), np.float32)
                emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
                e = emb.mean(axis=0)
                self._concept_cache[concept] = e / (np.linalg.norm(e) + 1e-8)
            cols.append(self._concept_cache[concept])
        return np.stack(cols, axis=1)

    def segment_individual_image(self, image, concepts: List[str], caption: str, **kw):
        # The reference's TextSpan transform is Resize + ToTensor ONLY — no
        # mean/std normalization (clip_text_span_baseline.py:32-35 builds its
        # own image_transform and discards open_clip's preprocess), so raw
        # [0, 1] pixels go into encode_image. Match that exactly; the
        # ImageNet-normalized `_preprocess` stays for the Chefer/DINO zoo,
        # whose reference wrappers do normalize.
        arr = as_float01_chw(image)
        x = jax.image.resize(
            jnp.asarray(arr)[None],
            (1, 3, self.vis_cfg.image_size, self.vis_cfg.image_size),
            method="bilinear",
        )
        _, collapsed = self._prs(x)
        patches = np.asarray(collapsed, np.float32)[0, 1:]  # drop CLS
        heat = patches @ self._concept_vectors(concepts)  # [P, C]
        g = self.vis_cfg.grid
        return heat.T.reshape(len(concepts), g, g), None


def _hash_tokenize(txt_cfg):
    """Deterministic fallback tokenizer: stable word-hash ids with BOS/EOS at
    the top of the vocab (open_clip convention: EOT = argmax id). Swap in a
    real BPE `tokenize` for checkpoint use."""
    import zlib

    def tokenize(texts: Sequence[str]) -> np.ndarray:
        bos, eos = txt_cfg.vocab_size - 2, txt_cfg.vocab_size - 1
        out = np.zeros((len(texts), txt_cfg.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [bos] + [
                zlib.crc32(w.encode()) % (txt_cfg.vocab_size - 2)
                for w in t.lower().split()
            ][: txt_cfg.context_length - 2] + [eos]
            out[i, : len(ids)] = ids
        return out

    return tokenize
