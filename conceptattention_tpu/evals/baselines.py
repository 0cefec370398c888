"""ViT-explainability baseline zoo for the segmentation evaluation.

Capability parity with the reference's baselines
(manuragkhullar/ConceptAttention, `binary_segmentation_baselines/`):
  - DINO last-layer CLS attention (dino.py:9-69) — concept-agnostic;
  - Chefer variants (chefer_clip_vit_baselines.py:72-271 /
    ViT_explanation_generator.py:20-106): attention rollout, last-layer
    attention, GradCAM on last-layer attention, and transformer attribution
    (gradient-weighted relevance rollout).

Where the reference instruments torch modules with hooks and a hand-written
LRP autograd stack (~5.9k LoC vendored), the JAX versions are closed-form:
`vit_forward(..., return_attn=True)` returns all attention maps, and
`jax.grad` of the class logit w.r.t. those maps replaces every hook.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.evals.segmentation import SegmentationModel
from conceptattention_tpu.models.vit import ViTConfig, vit_forward
from conceptattention_tpu.utils.images import as_float01_chw


def _preprocess(image, size: int) -> jnp.ndarray:
    # Dtype-branching scaler (utils/images.py): a dark uint8 image (max <= 1)
    # is still byte-valued — the old `arr.max() > 1.5` range heuristic
    # mis-scaled it for the whole ViT baseline zoo + TextSpan path.
    arr = as_float01_chw(image)
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
    arr = (arr - mean) / std
    x = jnp.asarray(arr)[None]
    return jax.image.resize(x, (1, 3, size, size), method="bilinear")


def attention_rollout(attns: jax.Array, start_layer: int = 0) -> jax.Array:
    """Abnar & Zuidema rollout: cumulative (A_head_mean + I)/row-norm product.

    attns: [depth, B, H, N, N] -> [B, N, N].
    """
    a = jnp.mean(attns, axis=2)  # head mean [depth, B, N, N]
    n = a.shape[-1]
    eye = jnp.eye(n)[None]
    a = a + eye
    a = a / jnp.sum(a, axis=-1, keepdims=True)

    def matmul_step(carry, layer):
        return layer @ carry, None

    depth = a.shape[0]
    init = a[start_layer]
    rolled, _ = jax.lax.scan(matmul_step, init, a[start_layer + 1 :])
    return rolled


class ViTAttentionSegmentationModel(SegmentationModel):
    """Concept-agnostic ViT saliency baselines.

    method: 'dino_attention' (last-layer CLS attention, head mean),
            'rollout' (raw attention rollout, generate_rollout's normalized
            variant),
            'gradcam' (grad-GAP-weighted last-layer attention),
            'transformer_attribution' (Chefer grad-weighted relevance rollout
            via TRUE epsilon-LRP relevance, evals/lrp.py),
            'last_layer_lrp' (epsilon-LRP relevance of the last attention),
            'lrp' / 'full_lrp' (full epsilon-LRP propagation to the input
            pixels with the zB first-layer rule — parity-tested against the
            reference engine in tests/test_lrp_parity.py).
    """

    def __init__(self, params, cfg: ViTConfig, method: str = "dino_attention"):
        assert method in (
            "dino_attention", "rollout", "gradcam", "transformer_attribution",
            "last_layer_lrp", "lrp", "full_lrp",
        )
        self.params = params
        self.cfg = cfg
        self.method = method

    def _saliency(self, x: jnp.ndarray) -> np.ndarray:
        cfg = self.cfg
        logits, attns = vit_forward(self.params, cfg, x, return_attn=True)

        if self.method == "dino_attention":
            cls_attn = attns[-1, :, :, 0, 1:]  # [B, H, N]
            sal = jnp.mean(cls_attn, axis=1)
        elif self.method == "rollout":
            rolled = attention_rollout(attns)
            sal = rolled[:, 0, 1:]
        elif self.method in ("lrp", "full_lrp"):
            from conceptattention_tpu.evals.lrp import vit_relprop

            # TRUE epsilon-LRP to the input pixels (zB first-layer rule),
            # pooled to patch granularity for the segmentation protocol.
            rel = vit_relprop(self.params, cfg, x, method="full")  # [B, H, W]
            ps = cfg.patch_size
            sal = jax.nn.relu(
                rel.reshape(x.shape[0], cfg.grid, ps, cfg.grid, ps)
                .sum(axis=(2, 4))
                .reshape(x.shape[0], -1)
            )
        elif self.method in ("transformer_attribution", "last_layer_lrp"):
            from conceptattention_tpu.evals.lrp import vit_relprop

            m = ("transformer_attribution" if self.method == "transformer_attribution"
                 else "last_layer")
            sal = vit_relprop(self.params, cfg, x, method=m)
        else:  # gradcam
            target = jnp.argmax(logits, axis=-1)
            # dlogit/dA for the last layer via an additive zero perturbation
            # on the attention probabilities — replaces the reference's
            # backward hooks (ViT_explanation_generator.py:50-73).
            b = x.shape[0]
            n = cfg.num_patches + 1
            zeros = jnp.zeros((cfg.depth, b, cfg.num_heads, n, n), x.dtype)

            def score_fn(deltas):
                lg, at = vit_forward(
                    self.params, cfg, x, return_attn=True, attn_deltas=deltas
                )
                return jnp.take_along_axis(lg, target[:, None], axis=-1).sum(), at

            grads, attns = jax.grad(score_fn, has_aux=True)(zeros)
            # CAM-style head weights: GAP the gradient over the CLS query
            # row's PATCH entries only (reference generate_cam_attn:
            # grad[0, :, 0, 1:].mean(dim=[1, 2])) — not the full [N, N] map.
            weights = jnp.mean(grads[-1][:, :, 0, 1:], axis=-1)[..., None, None]
            cam_last = jax.nn.relu(jnp.mean(weights * attns[-1], axis=1))
            sal = cam_last[:, 0, 1:]

        g = self.cfg.grid
        return np.asarray(sal.reshape(-1, g, g), dtype=np.float32)

    def segment_individual_image(self, image, concepts: List[str], caption: str, **kw):
        x = _preprocess(image, self.cfg.image_size)
        sal = self._saliency(x)[0]
        # Concept-agnostic: replicate per concept (reference dino.py:45-61).
        coeff = np.stack([sal] * len(concepts))
        return coeff, None
