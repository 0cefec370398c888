"""Positive/negative perturbation evaluation for ViT explanations.

Capability parity with the reference's
`chefer_vit_explainability/pertubation_eval_from_hdf5.py:25-133`
(manuragkhullar/ConceptAttention): given per-pixel relevance maps, mask the
top-k fraction of pixels (the most-relevant first for the POSITIVE test, the
least-relevant first for the NEGATIVE test) at
steps [0.1 .. 0.9], re-classify, and record accuracy / target-probability
drop per step. A faithful explanation shows a steep accuracy fall in the
positive test and a shallow one in the negative test (AUC summarizes).

TPU-first: the whole (steps x batch) sweep is one vmapped, jit-compiled
classification batch — no HDF5 staging; relevance comes straight from the
in-process Chefer methods (evals/baselines.py, evals/lrp.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

PERTURBATION_STEPS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


@dataclasses.dataclass
class PerturbationResult:
    steps: Sequence[float]
    accuracy: np.ndarray          # [num_steps] mean top-1 accuracy after masking
    target_prob_drop: np.ndarray  # [num_steps] mean P(target) drop vs unmasked
    auc: float                    # trapezoidal area under accuracy(step)
    # reference pertubation_eval_from_hdf5.py:100-117 also records, per step:
    logit_diff: np.ndarray = None      # mean(max-logit - unmasked max-logit)
    dissimilarity: np.ndarray = None   # mean log(P(target)/P(second-best))

    def as_dict(self) -> Dict[str, object]:
        out = {
            "steps": list(self.steps),
            "accuracy": self.accuracy.tolist(),
            "target_prob_drop": self.target_prob_drop.tolist(),
            "auc": float(self.auc),
        }
        # optional per-step extras: present iff the sweep recorded them (the
        # dataclass signature allows constructing without)
        if self.logit_diff is not None:
            out["logit_diff"] = self.logit_diff.tolist()
        if self.dissimilarity is not None:
            out["dissimilarity"] = self.dissimilarity.tolist()
        return out


def _pixel_ranks(relevance: jax.Array) -> jax.Array:
    """[B, N] descending relevance ranks (0 = most relevant). Computed ONCE
    per sweep — the ranking is fraction-invariant, so the two argsorts must
    not run per step."""
    order = jnp.argsort(relevance, axis=-1)[:, ::-1]  # descending
    return jnp.argsort(order, axis=-1)  # rank of each pixel


def _mask_top_pixels(images: jax.Array, ranks: jax.Array, k: jax.Array,
                     fill=None):
    """Replace the k highest-relevance pixels of each image with `fill`.

    images [B, C, H, W]; ranks [B, H*W] from `_pixel_ranks` (pixel
    resolution, as the reference upsamples token maps before ranking,
    pertubation_eval:86-96); k scalar int (count of pixels to remove);
    fill: per-channel [C] replacement value. The reference zeroes the
    UNNORMALIZED pixels then normalizes (pertubation_eval:90-96) — on
    already-normalized inputs that is fill = -mean/std, NOT zero.
    """
    b, c, h, w = images.shape
    keep = (ranks >= k).reshape(b, 1, h, w)
    if fill is None:
        return images * keep
    fill = jnp.asarray(fill, images.dtype).reshape(1, c, 1, 1)
    return jnp.where(keep, images, fill)


def run_perturbation_eval(
    classify: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    labels: jax.Array,
    relevance: jax.Array,
    negative: bool = False,
    steps: Sequence[float] = PERTURBATION_STEPS,
    fill=None,
) -> PerturbationResult:
    """Run the perturbation sweep.

    Args:
      classify: jittable [B, C, H, W] -> logits [B, num_classes].
      images: [B, C, H, W] preprocessed inputs.
      labels: [B] int class labels.
      relevance: [B, H, W] or [B, H*W] per-pixel relevance (upsample token
        maps first; see `upsample_token_relevance`).
      negative: mask the LEAST relevant pixels first (reference's negative
        test, triggered by --neg).
      fill: per-channel [C] replacement for masked pixels. The reference
        zeroes pixels BEFORE normalization; pass (-mean/std) to reproduce
        that on normalized inputs (the experiment driver does).
    """
    b, _, h, w = images.shape
    rel = jnp.reshape(relevance, (b, h * w)).astype(jnp.float32)
    if negative:
        rel = -rel

    base_logits = classify(images)
    base_probs = jax.nn.softmax(base_logits, axis=-1)
    base_p_target = jnp.take_along_axis(base_probs, labels[:, None], 1)[:, 0]

    n = h * w
    ranks = _pixel_ranks(rel)  # fraction-invariant: rank once, mask per step
    s = len(steps)
    # One [steps * B] classification batch: amortizes per-dispatch overhead
    # (tens of ms on the TPU plugin) across the whole sweep.
    masked = jnp.concatenate(
        [_mask_top_pixels(images, ranks, jnp.asarray(int(n * f)), fill)
         for f in steps],
        axis=0,
    )
    logits = classify(masked).reshape(s, b, -1)
    probs = jax.nn.softmax(logits, axis=-1)
    p_target = jnp.take_along_axis(
        probs, jnp.broadcast_to(labels[None, :, None], (s, b, 1)), 2
    )[..., 0]
    accs = jnp.mean((jnp.argmax(logits, -1) == labels[None, :]).astype(jnp.float32), axis=1)
    drops = jnp.mean(base_p_target[None, :] - p_target, axis=1)
    # Reference extras (pertubation_eval:100-117): max-logit drift and
    # log(P(target)/P(second-best)) dissimilarity.
    base_max_logit = jnp.max(base_logits, axis=-1)
    logit_diff = jnp.mean(jnp.max(logits, -1) - base_max_logit[None, :], axis=1)
    second = jax.lax.top_k(probs, 2)[0][..., 1]  # second-highest, as reference
    dissim = jnp.mean(jnp.log((p_target + 1e-12) / (second + 1e-12)), axis=1)
    accuracy = np.asarray(jax.device_get(accs), np.float64)
    drop = np.asarray(jax.device_get(drops), np.float64)
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy < 2.0
    auc = float(trapezoid(accuracy, np.asarray(steps)))
    return PerturbationResult(
        steps, accuracy, drop, auc,
        logit_diff=np.asarray(jax.device_get(logit_diff), np.float64),
        dissimilarity=np.asarray(jax.device_get(dissim), np.float64),
    )


def upsample_token_relevance(token_rel: jax.Array, image_size: int) -> jax.Array:
    """[B, g, g] token-level relevance -> [B, H, W] pixel relevance via
    nearest-neighbor (the reference reshapes token maps through
    interpolation before ranking)."""
    b = token_rel.shape[0]
    return jax.image.resize(
        token_rel.astype(jnp.float32), (b, image_size, image_size), "nearest"
    )


CHEFER_METHODS = (
    "rollout",
    "last_layer_attn",
    "gradcam",
    "transformer_attribution",
    "last_layer_lrp",
    "lrp",
    "full_lrp",
)


def compute_vit_relevance(
    params,
    cfg,
    x: jax.Array,
    method: str,
    index=None,
) -> jax.Array:
    """Per-patch (or per-pixel for full LRP) relevance for one of the 7
    Chefer explanation variants (reference
    chefer_clip_vit_baselines.py:72-271 / ViT_explanation_generator.py:20-106),
    class-conditioned on `index` ([B] int labels; None = predicted class).

    Returns [B, grid, grid] for token methods, [B, H, W] for 'full_lrp'.
    """
    from conceptattention_tpu.evals.baselines import attention_rollout
    from conceptattention_tpu.models.vit import vit_forward

    if method == "rollout":
        _, attns = vit_forward(params, cfg, x, return_attn=True)
        sal = attention_rollout(attns)[:, 0, 1:]
    elif method == "last_layer_attn":
        _, attns = vit_forward(params, cfg, x, return_attn=True)
        sal = jnp.mean(attns[-1, :, :, 0, 1:], axis=1)
    elif method == "gradcam":
        logits, _ = vit_forward(params, cfg, x, return_attn=True)
        if index is None:
            index = jnp.argmax(logits, axis=-1)
        b = x.shape[0]
        n = cfg.num_patches + 1
        zeros = jnp.zeros((cfg.depth, b, cfg.num_heads, n, n), x.dtype)

        def score_fn(deltas):
            lg, at = vit_forward(
                params, cfg, x, return_attn=True, attn_deltas=deltas
            )
            return jnp.take_along_axis(lg, index[:, None], axis=-1).sum(), at

        grads, attns = jax.grad(score_fn, has_aux=True)(zeros)
        weights = jnp.mean(grads[-1][:, :, 0, 1:], axis=-1)[..., None, None]
        sal = jax.nn.relu(jnp.mean(weights * attns[-1], axis=1))[:, 0, 1:]
    elif method in ("transformer_attribution", "last_layer_lrp", "lrp", "full_lrp"):
        from conceptattention_tpu.evals.lrp import vit_relprop

        m = {
            "transformer_attribution": "transformer_attribution",
            "last_layer_lrp": "last_layer",
            "lrp": "full",
            "full_lrp": "full",
        }[method]
        rel = vit_relprop(params, cfg, x, index=index, method=m)
        if m == "full":
            return jax.nn.relu(rel)  # already [B, H, W] pixel relevance
        sal = rel
    else:
        raise ValueError(f"unknown method {method!r}; one of {CHEFER_METHODS}")
    g = cfg.grid
    return sal.reshape(-1, g, g)
