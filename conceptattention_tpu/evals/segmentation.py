"""Zero-shot segmentation interface + Flux tap-point segmentation models.

Parity targets in the reference (manuragkhullar/ConceptAttention):
  - `SegmentationAbstractClass.__call__` (`concept_attention/segmentation.py:19-83`):
    per-image coefficients -> optional gaussian blur -> mean-value threshold ->
    binary mask, with target-concept selection;
  - the raw-space baselines (`binary_segmentation_baselines/raw_output_space.py`,
    `raw_cross_attention.py`, `raw_value_space.py`): encode a real image,
    forward-noise to a schedule timestep, one DiT forward stopping after the
    double blocks, per-layer similarity maps averaged over samples+layers
    (softmax over concepts optional, default off for segmentation).

Design: the reference implements each tap point as a separate ~300-line
baseline class reading stale cached attributes off monkey-patched blocks
(SURVEY.md §2e); here all three spaces are the *same* model with a different
`tap` ∈ {output, cross_attention, value} — the saliency taps emitted by the
fused forward pass.
"""

from __future__ import annotations

import abc
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.ops.attention import ConceptAttentionSpec, default_backend
from conceptattention_tpu.ops.schedule import get_schedule
from conceptattention_tpu.pipeline.heatmaps import apply_attention_norm


def gaussian_blur_3x3(x: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """3x3 separable gaussian blur over the trailing two axes (the reference
    applies torchvision's kernel_size=3, sigma=1.0 blur)."""
    coords = np.arange(3, dtype=np.float64) - 1.0
    k = np.exp(-(coords**2) / (2 * sigma**2))
    k /= k.sum()
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = np.pad(x, pad, mode="reflect")
    # horizontal then vertical
    out = (
        k[0] * xp[..., 1:-1, :-2] + k[1] * xp[..., 1:-1, 1:-1] + k[2] * xp[..., 1:-1, 2:]
    )
    outp = np.pad(out, pad[:-1] + [(0, 0)], mode="reflect")
    out = (
        k[0] * outp[..., :-2, :] + k[1] * outp[..., 1:-1, :] + k[2] * outp[..., 2:, :]
    )
    return out


class SegmentationModel(abc.ABC):
    """Maps (image, concepts, caption) -> per-concept coefficient maps, then
    thresholds them into binary masks."""

    @abc.abstractmethod
    def segment_individual_image(
        self, image, concepts: List[str], caption: str, **kwargs
    ) -> Tuple[np.ndarray, Optional[object]]:
        """-> (coefficients [C, h, w], reconstructed_image | None)"""

    def __call__(
        self,
        images,
        target_concepts: Optional[List[str]],
        concepts: List[str],
        captions: List[str],
        mean_value_threshold: bool = True,
        apply_blur: bool = False,
        **kwargs,
    ):
        if not isinstance(images, list):
            images = [images]
        all_masks, all_coefficients, reconstructed = [], [], []
        for index, image in enumerate(images):
            coefficients, recon = self.segment_individual_image(
                image, concepts, captions[index], **kwargs
            )
            mask, coeff = self._postprocess_coefficients(
                coefficients,
                None if target_concepts is None else target_concepts[index],
                concepts, mean_value_threshold, apply_blur,
            )
            all_masks.append(mask)
            all_coefficients.append(coeff)
            reconstructed.append(recon)
        return all_masks, all_coefficients, reconstructed

    @staticmethod
    def _postprocess_coefficients(
        coefficients, target_concept, concepts,
        mean_value_threshold: bool, apply_blur: bool,
    ):
        """Shared mask/threshold tail of the protocol (reference
        segmentation.py:33-83) — one copy for the per-image and batched
        paths so they can never diverge."""
        coefficients = np.asarray(coefficients, dtype=np.float32)
        if apply_blur:
            # native C++ kernel when built; numpy (gaussian_blur_3x3)
            # otherwise — identical output (tests/test_native.py)
            from conceptattention_tpu.native import gaussian_blur3

            coefficients = gaussian_blur3(coefficients).astype(np.float32)
        if target_concept is None:
            mean_values = coefficients.mean(axis=(1, 2), keepdims=True)
            return coefficients > mean_values, coefficients
        idx = concepts.index(target_concept)
        coeff = coefficients[idx]
        threshold = coeff.mean() if mean_value_threshold else 0.0
        return coeff > threshold, coeff


class FluxTapSegmentationModel(SegmentationModel):
    """Real-image concept segmentation from any saliency tap point.

    tap='output'          == the ConceptAttention method (RawOutputSpace);
    tap='cross_attention' == raw q-space cross attention baseline;
    tap='value'           == raw value-space baseline.
    """

    def __init__(
        self,
        pipeline,  # ConceptAttentionFluxPipeline
        tap: str = "output",
        num_steps: int = 4,
        noise_timestep: int = 2,
        num_samples: int = 1,
        layer_indices: Optional[Sequence[int]] = None,
        softmax: bool = False,
        seed: int = 4,
        width: int = 1024,
        height: int = 1024,
        concept_cross_attention: bool = True,
        concept_self_attention: bool = True,
        vae_sample: bool = True,
    ):
        """concept_cross_attention / concept_self_attention reproduce the
        reference's joint_attention_kwargs ablations (run_cross_self_
        ablation.sh; modified_double_stream_block.py:126-159): which key set
        the concept queries attend over. `vae_sample=False` encodes with the
        posterior mean (deterministic eval / parity runs)."""
        assert tap in ("output", "cross_attention", "value")
        self.pipe = pipeline
        self.tap = tap
        self.num_steps = num_steps
        self.noise_timestep = noise_timestep
        self.num_samples = num_samples
        self.layer_indices = (
            list(layer_indices)
            if layer_indices is not None
            else list(range(pipeline.cfg.depth))
        )
        bad = [i for i in self.layer_indices
               if not (0 <= int(i) < pipeline.cfg.depth)]
        if bad:  # JAX gathers clamp silently
            raise ValueError(
                f"layer_indices {bad} out of range for depth "
                f"{pipeline.cfg.depth}"
            )
        self.softmax = softmax
        self.seed = seed
        self.width = width
        self.height = height
        self.concept_cross_attention = concept_cross_attention
        self.concept_self_attention = concept_self_attention
        self.vae_sample = vae_sample

    def segment_individual_image(self, image, concepts, caption, **kwargs):
        from conceptattention_tpu.pipeline.concept_pipeline import (
            batched_noise_saliency,
        )

        pipe = self.pipe
        z = pipe._encode_pixels(image, self.height, self.width, self.seed,
                                sample=self.vae_sample)
        b, _, lh, lw = z.shape
        schedule = get_schedule(
            self.num_steps, (lh // 2) * (lw // 2), shift=(not pipe.is_schnell)
        )
        t = schedule[self.noise_timestep]

        txt, txt_ids, _ = pipe._prepare_text(caption, 1, need_clip=False)
        c_emb, c_ids, c_vec = pipe._prepare_concepts(concepts, 1)

        # Shared with concept_pipeline.encode_image: one batched forward over
        # all noise samples, per-sample keys, samples leading in the output.
        # y is the zeroed concept CLIP vector on the encode path (reference
        # raw_output_space.py:195, y=inp["concept_vec"]), not clip(caption).
        saliency = batched_noise_saliency(
            pipe, z, t, self.num_samples, self.height, self.width, self.seed,
            txt, txt_ids, c_vec, c_emb, c_ids, c_vec,
            ConceptAttentionSpec(
                taps=(self.tap,), backend=default_backend(),
                cross_attention=self.concept_cross_attention,
                self_attention=self.concept_self_attention,
            ),
        )
        stacked = saliency[self.tap]  # [N, L, 1, C, P]
        if self.softmax:
            stacked = apply_attention_norm(stacked, "softmax", axis=-2)
        sel = stacked[:, jnp.asarray(self.layer_indices)]
        coeff = jnp.mean(sel, axis=(0, 1))[0]  # [C, P]
        coeff = coeff.reshape(len(concepts), lh // 2, lw // 2)
        return np.asarray(coeff, dtype=np.float32), None

    def segment_batch(
        self,
        images,
        target_concepts,
        concepts_list,
        captions,
        mean_value_threshold: bool = True,
        apply_blur: bool = False,
    ):
        """B images in ONE batched VAE encode + stopped forward.

        Output-identical to B sequential `__call__` invocations
        (tests/test_seg_batch.py): the VAE reparameterization draw and the
        per-sample diffusion-noise draws are shared across the batch exactly
        as the per-image path draws them (same model-level seed). Per-image
        concept lists (`concepts_list[b]`) may differ but must share a
        length — the eval harness groups images accordingly. Returns
        (masks, coefficients, reconstructed=None list) like `__call__`.

        This is the harness throughput lever the encode rung measures:
        batching the stopped forward drops the per-image marginal cost ~2.9×
        (`bench.py --encode`, n1 vs n4)."""
        from conceptattention_tpu.pipeline.concept_pipeline import (
            batched_images_saliency,
        )

        B = len(images)
        assert len(concepts_list) == B and len(captions) == B
        C = len(concepts_list[0])
        assert all(len(c) == C for c in concepts_list), (
            "per-image concept lists must share a length in one batch"
        )
        pipe = self.pipe
        zs = pipe._encode_pixels_batch(
            images, self.height, self.width, self.seed, sample=self.vae_sample
        )
        _, _, lh, lw = zs.shape
        schedule = get_schedule(
            self.num_steps, (lh // 2) * (lw // 2), shift=(not pipe.is_schnell)
        )
        t = schedule[self.noise_timestep]

        # One batched T5 forward over the captions (rows are per-sequence
        # independent under max_length padding, so they equal the per-image
        # encodes); concepts embed per image and stack.
        txts = pipe.text_encoders.encode_t5(list(captions)).astype(pipe.dtype)
        txt_ids = jnp.zeros((B, txts.shape[1], 3), dtype=jnp.float32)
        per_image = [pipe._prepare_concepts(c, 1) for c in concepts_list]
        c_embs = jnp.concatenate([e for e, _, _ in per_image], axis=0)
        c_ids = jnp.concatenate([i for _, i, _ in per_image], axis=0)
        c_vecs = jnp.concatenate([v for _, _, v in per_image], axis=0)

        saliency = batched_images_saliency(
            pipe, zs, t, self.num_samples, self.height, self.width, self.seed,
            txts, txt_ids, c_vecs, c_embs, c_ids, c_vecs,
            ConceptAttentionSpec(
                taps=(self.tap,), backend=default_backend(),
                cross_attention=self.concept_cross_attention,
                self_attention=self.concept_self_attention,
            ),
        )
        stacked = saliency[self.tap]  # [B, N, L, C, P]
        if self.softmax:
            stacked = apply_attention_norm(stacked, "softmax", axis=-2)
        sel = stacked[:, :, jnp.asarray(self.layer_indices)]
        coeff = jnp.mean(sel, axis=(1, 2))  # [B, C, P]
        coeff = np.asarray(
            coeff.reshape(B, C, lh // 2, lw // 2), dtype=np.float32
        )
        masks, coefficients = [], []
        for b in range(B):
            mask, cf = self._postprocess_coefficients(
                coeff[b],
                None if target_concepts is None else target_concepts[b],
                concepts_list[b], mean_value_threshold, apply_blur,
            )
            masks.append(mask)
            coefficients.append(cf)
        return masks, coefficients, [None] * B

    def per_layer_coefficients(self, image, concepts, caption) -> np.ndarray:
        """[depth, C, h, w] coefficient maps, one per double-stream layer,
        from ONE forward (the per-layer sweep harness consumes these a layer
        at a time — re-running the full DiT per layer would cost depth x)."""
        from conceptattention_tpu.pipeline.concept_pipeline import (
            batched_noise_saliency,
        )

        pipe = self.pipe
        z = pipe._encode_pixels(image, self.height, self.width, self.seed,
                                sample=self.vae_sample)
        _, _, lh, lw = z.shape
        schedule = get_schedule(
            self.num_steps, (lh // 2) * (lw // 2), shift=(not pipe.is_schnell)
        )
        t = schedule[self.noise_timestep]
        txt, txt_ids, _ = pipe._prepare_text(caption, 1, need_clip=False)
        c_emb, c_ids, c_vec = pipe._prepare_concepts(concepts, 1)
        saliency = batched_noise_saliency(
            pipe, z, t, self.num_samples, self.height, self.width, self.seed,
            txt, txt_ids, c_vec, c_emb, c_ids, c_vec,
            ConceptAttentionSpec(
                taps=(self.tap,), backend=default_backend(),
                cross_attention=self.concept_cross_attention,
                self_attention=self.concept_self_attention,
            ),
        )
        stacked = saliency[self.tap]  # [N, L, 1, C, P]
        if self.softmax:
            stacked = apply_attention_norm(stacked, "softmax", axis=-2)
        coeff = jnp.mean(stacked, axis=(0, 2))  # [L, C, P]
        coeff = coeff.reshape(-1, len(concepts), lh // 2, lw // 2)
        return np.asarray(coeff, dtype=np.float32)


def RawOutputSpaceSegmentationModel(pipeline, **kw):
    """The ConceptAttention method itself as a segmentation baseline
    (reference raw_output_space.py:13-262)."""
    return FluxTapSegmentationModel(pipeline, tap="output", **kw)


def RawCrossAttentionSegmentationModel(pipeline, **kw):
    """Raw q-space cross-attention baseline (reference raw_cross_attention.py)."""
    return FluxTapSegmentationModel(pipeline, tap="cross_attention", **kw)


def RawValueSpaceSegmentationModel(pipeline, **kw):
    """Raw value-space baseline (reference raw_value_space.py; its cached-
    vector API is stale upstream — here it is just the 'value' tap)."""
    return FluxTapSegmentationModel(pipeline, tap="value", **kw)


def _norm_word(w: str) -> str:
    return "".join(ch for ch in w.lower() if ch.isalnum())


def _same_word(a: str, b: str) -> bool:
    """Case/punctuation-insensitive, plural-tolerant word equality."""
    return a == b or a == b + "s" or b == a + "s" or a == b + "es" or b == a + "es"


def match_concept_word_indices(concept: str, words: Sequence[str]) -> List[int]:
    """Indices of `words` a DAAM concept heatmap should aggregate.

    Real daam aligns on the subword tokens of each prompt word; the unit here
    is whole words, so matching is token-exact rather than substring ("cat"
    must NOT match "category" — the old substring heuristic did). Multi-word
    concepts match consecutive word n-grams and return every constituent
    word's index.
    """
    cw = [_norm_word(w) for w in concept.split() if _norm_word(w)]
    ws = [_norm_word(w) for w in words]
    if not cw:
        return []
    idx: set = set()
    n = len(cw)
    for i in range(len(ws) - n + 1):
        if all(_same_word(ws[i + j], cw[j]) for j in range(n)):
            idx.update(range(i, i + n))
    return sorted(idx)


class DAAMFluxSegmentationModel(FluxTapSegmentationModel):
    """DAAM-style baseline: the caption's own words act as the concept set and
    per-word cross-attention maps give the saliency (reference
    binary_segmentation_baselines/daam_flux.py:12-95)."""

    def __init__(self, pipeline, **kw):
        kw.setdefault("softmax", True)
        super().__init__(pipeline, tap="cross_attention", **kw)

    def segment_individual_image(self, image, concepts, caption, **kwargs):
        words = [w for w in caption.replace(",", " ").split() if w]
        coeff_words, recon = super().segment_individual_image(
            image, words, caption, **kwargs
        )
        # Reduce word maps onto the requested concepts: a concept's map is the
        # max over matching caption words (DAAM word-matching rule).
        maps = []
        for concept in concepts:
            hits = [coeff_words[i] for i in match_concept_word_indices(concept, words)]
            maps.append(
                np.maximum.reduce(hits) if hits else np.mean(coeff_words, axis=0)
            )
        return np.stack(maps), recon


class DAAMStableDiffusionSegmentationModel(SegmentationModel):
    """DAAM over an SD-style latent-diffusion UNet: encode the image, noise
    to a late timestep, one UNet forward, aggregate per-word cross-attention
    heatmaps across layers/heads (reference daam_sd2.py:21-158 /
    daam_sdxl.py:10-190, which drive the external `daam.trace` hooks; here the
    UNet returns its cross-attention maps directly)."""

    def __init__(
        self,
        unet_params,
        unet_cfg,
        text_encoders,
        vae_params=None,
        ae_cfg=None,
        latent_size: int = 32,
        timestep_idx: int = 49,  # reference daam_sd2.py:136: timesteps[49] of 50
        num_inference_steps: int = 50,
        seed: int = 0,
    ):
        self.params = unet_params
        self.cfg = unet_cfg
        self.text_encoders = text_encoders
        self.vae_params = vae_params
        self.ae_cfg = ae_cfg
        self.latent_size = latent_size
        self.timestep_idx = timestep_idx
        self.num_inference_steps = num_inference_steps
        self.seed = seed

    def _encode_latents(self, image) -> jnp.ndarray:
        """Image -> SD latents (reference daam_sd2.py:30-48: VAE encode x
        scaling_factor). Falls back to channel-stacked pseudo-latents when no
        VAE weights are provided (random-weight test configs)."""
        from conceptattention_tpu.utils.images import as_float01_chw

        arr = as_float01_chw(image)
        if self.vae_params is not None:
            from conceptattention_tpu.models.flux.autoencoder import encode

            f = 2 ** (len(self.ae_cfg.ch_mult) - 1)
            x = jax.image.resize(
                jnp.asarray(arr)[None],
                (1, 3, self.latent_size * f, self.latent_size * f), "bilinear",
            )
            # diffusers preprocess normalizes to [-1, 1]; mode (posterior
            # mean) rather than a sampled latent for determinism.
            return encode(self.vae_params, self.ae_cfg, x * 2 - 1)
        x = jax.image.resize(
            jnp.asarray(arr)[None], (1, 3, self.latent_size, self.latent_size), "bilinear"
        )
        return jnp.concatenate([x, jnp.mean(x, axis=1, keepdims=True)], axis=1) * 2 - 1

    def segment_individual_image(self, image, concepts: List[str], caption: str, **kw):
        from conceptattention_tpu.sampling.ddim import add_noise, make_ddim_schedule

        words = [w for w in caption.replace(",", " ").split() if w] or list(concepts)
        # token t <-> word t: per-word embeddings from the text provider
        ctx = jnp.stack(
            [self.text_encoders.encode_t5([w])[0, 0] for w in words]
        )[None][..., : self.cfg.context_dim]
        if ctx.shape[-1] < self.cfg.context_dim:
            ctx = jnp.pad(ctx, ((0, 0), (0, 0), (0, self.cfg.context_dim - ctx.shape[-1])))

        z = self._encode_latents(image)
        # Scheduler-faithful forward noising at timesteps[idx]
        # (reference daam_sd2.py:44-46, 64-66).
        sched = make_ddim_schedule(self.num_inference_steps)
        if not 0 <= self.timestep_idx < self.num_inference_steps:
            raise ValueError(
                f"timestep_idx {self.timestep_idx} out of range for "
                f"{self.num_inference_steps} inference steps"
            )
        t = sched.timesteps[self.timestep_idx]
        noise = jax.random.normal(jax.random.PRNGKey(self.seed), z.shape)
        z_t = add_noise(sched, z, noise, t)

        _, maps = self._unet_call(
            z_t.astype(jnp.float32), jnp.asarray([t], jnp.float32),
            ctx.astype(jnp.float32), caption,
        )
        # Aggregate per-word: mean over heads, upsample each level to the
        # finest map resolution, mean over layers (DAAM's aggregation).
        finest = max(int(m.shape[2]) for m in maps)
        side = int(round(finest**0.5))
        per_word = np.zeros((len(words), side, side), np.float32)
        for m in maps:
            mm = np.asarray(jnp.mean(m, axis=1))[0]  # [hw, T]
            s = int(round(mm.shape[0] ** 0.5))
            grid = mm.reshape(s, s, -1)
            reps = side // s
            grid = np.repeat(np.repeat(grid, reps, axis=0), reps, axis=1)
            per_word += grid.transpose(2, 0, 1) / len(maps)

        coeff = []
        for concept in concepts:
            hits = [per_word[i] for i in match_concept_word_indices(concept, words)]
            coeff.append(np.maximum.reduce(hits) if hits else per_word.mean(axis=0))
        return np.stack(coeff), None

    def _unet_call(self, z_t, t_vec, ctx, caption):
        from conceptattention_tpu.models.sd_unet import unet_forward

        return unet_forward(self.params, self.cfg, z_t, t_vec, ctx)


class DAAMStableDiffusionXLSegmentationModel(DAAMStableDiffusionSegmentationModel):
    """DAAM over the SDXL UNet (reference daam_sdxl.py:10-190): identical
    encode->noise->one-forward->word-heatmap flow, plus SDXL's text_time
    added conditions — pooled text embeddings and the six micro-conditioning
    time-ids (orig_h, orig_w, crop_top, crop_left, target_h, target_w), which
    the reference builds via `pipeline._get_add_time_ids((512, 512), (0, 0),
    (512, 512))` (daam_sdxl.py:55-63, 107-113).

    Use with `SDXL_BASE_CONFIG` + `convert_sd_unet_state_dict` over an
    sd_xl_base checkpoint; the context must be [B, T, 2048] (dual-encoder)
    and pooled [B, 1280] in production — any width works for test configs.
    """

    def __init__(self, *args, height: int = 512, width: int = 512, **kw):
        super().__init__(*args, **kw)
        self.height = height
        self.width = width

    def _unet_call(self, z_t, t_vec, ctx, caption):
        from conceptattention_tpu.models.sd_unet import unet_forward

        pooled = np.asarray(self.text_encoders.encode_clip([caption]))
        want = self.cfg.pooled_text_dim
        if pooled.shape[-1] > want:
            pooled = pooled[..., :want]
        elif pooled.shape[-1] < want:
            pooled = np.pad(pooled, ((0, 0), (0, want - pooled.shape[-1])))
        time_ids = jnp.asarray(
            [[self.height, self.width, 0, 0, self.height, self.width]],
            jnp.float32,
        )
        return unet_forward(
            self.params, self.cfg, z_t, t_vec, ctx,
            text_embeds=jnp.asarray(pooled, jnp.float32), time_ids=time_ids,
        )


class FluxMultiClassSegmentationModel(FluxTapSegmentationModel):
    """Multi-class argmax segmentation over bg+target concepts (parity with
    experiments/pascal_voc_segmentation/multi_class_segmentation.py:7-79)."""

    def segment_multi_class(self, image, concepts: List[str], caption: str):
        coeff, _ = self.segment_individual_image(image, concepts, caption)
        return np.argmax(coeff, axis=0), coeff
