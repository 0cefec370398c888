"""Mask-level segmentation-protocol parity vs the reference at /root/reference.

Closes the round-3 gap (VERDICT.md missing #3): block/DiT/heatmap parity was
proven, but BASELINE target 3 is *mIoU/pixel-acc match*, which runs through
the rest of the chain — real-image encode -> forward-noise ->
one stopped DiT forward -> layer/sample reduction (reference
`binary_segmentation_baselines/raw_output_space.py:121-262`) ->
`SegmentationAbstractClass.__call__` blur + mean-threshold
(`concept_attention/segmentation.py:19-83`) -> rescale -> 224^2 nearest
upsample -> pixAcc/mIoU/mAP (`experiments/imagenet_segmentation/
run_experiment.py:186-235`, metric defs `concept_attention/utils.py:48-108`).
This file drives BOTH implementations end-to-end on the same synthetic
image with the SAME converted weights and asserts binary-mask equality and
identical metrics.

What runs as real imported reference code: encode_image, add_noise_to_image,
get_schedule/prepare, embed_concepts, ModifiedFluxDiT.forward,
SegmentationAbstractClass.__call__, and the three metric functions. One
repair is unavoidable: the reference's RawOutputSpaceSegmentationModel
unpacks THREE values from ModifiedFluxDiT (`pred, _, concept_heatmaps =
self.generator.model(...)`, raw_output_space.py:188-204) but the DiT returns
TWO (`modified_flux_dit.py:153,163`) — the class crashes as shipped. The
subclass below reproduces its body verbatim-in-spirit with the 2-tuple
unpack and the heatmap einsum the 3rd value was meant to carry
(concept/image output-space vectors contracted over the merged head dim,
exactly `concept_attention_pipeline.py:307-316`).

Randomness is pinned so exact mask equality is decidable:
  - latent noise: both sides draw torch Philox fp32 (the reference's
    get_noise forced from bf16 to fp32 — a CUDA precision choice, not
    protocol; our side monkeypatched to `get_noise_torch_parity`);
  - VAE posterior: mean only (reference `ae.reg.sample=False`; our
    `vae_sample=False`) — the reference's unseeded torch draw cannot be
    replicated cross-framework;
  - text: the reference t5/clip are wrapped around our deterministic
    StubTextEncoders so both sides embed identically.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conceptattention_tpu.config import (
    AutoEncoderConfig,
    FluxConfig,
    ModelSpec,
    configs,
)

# 1024^2 pixels -> 128^2 z16 latents -> 64x64 tokens: the ONLY geometry the
# reference path runs (encode_image interpolates to 1024^2 and
# raw_output_space.py hard-codes the 64x64 rearrange).
SEG_CFG = FluxConfig(
    in_channels=64, vec_in_dim=32, context_in_dim=64, hidden_size=128,
    mlp_ratio=4.0, num_heads=2, depth=2, depth_single_blocks=2,
    axes_dim=(16, 24, 24), theta=10_000, qkv_bias=True, guidance_embed=False,
)
SEG_AE = AutoEncoderConfig(
    resolution=256, in_channels=3, ch=32, out_ch=3, ch_mult=(1, 1, 1, 1),
    num_res_blocks=1, z_channels=16,
)
MODEL_NAME = "flux-tiny-schnell-segparity"  # "schnell" => shift=False schedule
CONCEPTS = ["cat", "background", "sky"]
CAPTION = "a cat"
NUM_SAMPLES = 2
NUM_STEPS = 4
NOISE_TIMESTEP = 2
SEED = 4
LAYERS = [0, 1]


@pytest.fixture(scope="module")
def ref():
    from tests._ref_compat import install_reference

    install_reference()
    try:
        from concept_attention import segmentation as ref_seg
        from concept_attention import utils as ref_utils
        from concept_attention.flux.src.flux import sampling as ref_sampling
        from concept_attention.flux.src.flux.modules.autoencoder import (
            AutoEncoder,
            AutoEncoderParams,
        )
        from concept_attention.modified_flux_dit import FluxParams, ModifiedFluxDiT
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return types.SimpleNamespace(
        seg=ref_seg, utils=ref_utils, sampling=ref_sampling,
        AutoEncoder=AutoEncoder, AutoEncoderParams=AutoEncoderParams,
        FluxParams=FluxParams, DiT=ModifiedFluxDiT,
    )


@pytest.fixture(scope="module")
def ref_models(ref):
    torch.manual_seed(7)
    dit = ref.DiT(ref.FluxParams(
        in_channels=SEG_CFG.in_channels,
        vec_in_dim=SEG_CFG.vec_in_dim,
        context_in_dim=SEG_CFG.context_in_dim,
        hidden_size=SEG_CFG.hidden_size,
        mlp_ratio=SEG_CFG.mlp_ratio,
        num_heads=SEG_CFG.num_heads,
        depth=SEG_CFG.depth,
        depth_single_blocks=SEG_CFG.depth_single_blocks,
        axes_dim=list(SEG_CFG.axes_dim),
        theta=SEG_CFG.theta,
        qkv_bias=SEG_CFG.qkv_bias,
        guidance_embed=SEG_CFG.guidance_embed,
    )).float().eval()
    ae = ref.AutoEncoder(ref.AutoEncoderParams(
        resolution=SEG_AE.resolution, in_channels=SEG_AE.in_channels,
        ch=SEG_AE.ch, out_ch=SEG_AE.out_ch, ch_mult=list(SEG_AE.ch_mult),
        num_res_blocks=SEG_AE.num_res_blocks, z_channels=SEG_AE.z_channels,
        scale_factor=SEG_AE.scale_factor, shift_factor=SEG_AE.shift_factor,
    )).float().eval()
    ae.reg.sample = False  # posterior mean (see module docstring)
    return dit, ae


@pytest.fixture(scope="module")
def pipe(ref_models):
    """Our pipeline with the SAME weights, registered under a temp config."""
    from conceptattention_tpu import ConceptAttentionFluxPipeline
    from conceptattention_tpu.weights.convert import (
        convert_autoencoder_state_dict,
        convert_flux_state_dict,
    )

    dit, ae = ref_models
    configs[MODEL_NAME] = ModelSpec(
        name=MODEL_NAME, params=SEG_CFG, ae_params=SEG_AE, t5_max_length=8,
        ckpt_env_var="FLUX_SEGPARITY_NONE", ae_env_var="AE_SEGPARITY_NONE",
    )
    try:
        params = convert_flux_state_dict(
            {k: v.numpy() for k, v in dit.state_dict().items()},
            SEG_CFG, dtype=jnp.float32,
        )
        ae_params = convert_autoencoder_state_dict(
            {k: v.numpy() for k, v in ae.state_dict().items()},
            SEG_AE, jnp.float32,
        )
        yield ConceptAttentionFluxPipeline(
            MODEL_NAME, dtype=jnp.float32, params=params, ae_params=ae_params,
        )
    finally:
        configs.pop(MODEL_NAME, None)


class _TorchTextStub:
    """Reference-side t5/clip facade over our deterministic StubTextEncoders,
    so both frameworks embed the same text to the same vectors."""

    def __init__(self, encode_fn):
        self._encode = encode_fn

    def __call__(self, prompt):
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        return torch.from_numpy(np.asarray(self._encode(prompts), np.float32))


def _make_ref_segmodel(ref, ref_models, pipe):
    """The reference RawOutputSpaceSegmentationModel path with its 2-vs-3
    unpack repaired (see module docstring); every callee is imported
    reference code."""
    import einops

    dit, ae = ref_models
    generator = types.SimpleNamespace(
        model=dit, ae=ae,
        t5=_TorchTextStub(pipe.text_encoders.encode_t5),
        clip=_TorchTextStub(pipe.text_encoders.encode_clip),
        device=torch.device("cpu"), offload=False,
    )

    class RepairedRawOutputSpaceSegmentationModel(ref.seg.SegmentationAbstractClass):
        def __init__(self):
            self.generator = generator
            self.is_schnell = True

        @torch.no_grad()
        def segment_individual_image(
            self, image, concepts, caption, device="cpu", offload=False,
            num_samples=1, num_steps=4, noise_timestep=2, seed=4,
            width=1024, height=1024, layers=None, softmax=False, **kwargs,
        ):
            # raw_output_space.py:146-151
            encoded_image_without_noise = ref.seg.encode_image(
                image, self.generator.ae, offload=offload, device=device,
            )
            all_concept_heatmaps = []
            for i in range(num_samples):
                # raw_output_space.py:154-165
                encoded_image, timesteps = ref.seg.add_noise_to_image(
                    encoded_image_without_noise,
                    num_steps=num_steps, noise_timestep=noise_timestep,
                    seed=seed + i, width=width, height=height, device=device,
                    is_schnell=self.is_schnell,
                )
                # raw_output_space.py:170-181
                inp = ref.sampling.prepare(
                    t5=self.generator.t5, clip=self.generator.clip,
                    img=encoded_image, prompt=caption,
                )
                c_emb, c_ids, c_vec = ref.utils.embed_concepts(
                    self.generator.clip, self.generator.t5, concepts,
                )
                # raw_output_space.py:187-204, with the broken
                # `pred, _, concept_heatmaps =` 3-unpack repaired to the
                # DiT's real 2-tuple return (modified_flux_dit.py:153).
                guidance_vec = torch.zeros(
                    encoded_image.shape[0], dtype=encoded_image.dtype)
                t_vec = torch.full(
                    (encoded_image.shape[0],), timesteps[0],
                    dtype=encoded_image.dtype)
                _pred, cad = self.generator.model(
                    img=inp["img"], img_ids=inp["img_ids"],
                    txt=inp["txt"], txt_ids=inp["txt_ids"],
                    concepts=c_emb, concept_ids=c_ids, concept_vec=c_vec,
                    y=c_vec, timesteps=t_vec, guidance=guidance_vec,
                    stop_after_multimodal_attentions=True,
                    joint_attention_kwargs=kwargs.get("joint_attention_kwargs"),
                )
                # The 3rd output the broken unpack expected: output-space
                # concept/image vectors contracted over the merged head dim
                # (concept_attention_pipeline.py:307-316) -> [L, B, C, P].
                heat = torch.einsum(
                    "lbcd,lbpd->lbcp",
                    cad["output_space_concept_vectors"],
                    cad["output_space_image_vectors"],
                )
                all_concept_heatmaps.append(heat)
            # raw_output_space.py:206, 246-262
            all_concept_heatmaps = torch.stack(all_concept_heatmaps, dim=0)
            if softmax:
                all_concept_heatmaps = torch.nn.functional.softmax(
                    all_concept_heatmaps, dim=-2)
            concept_heatmaps = all_concept_heatmaps[:, layers]
            concept_heatmaps = einops.reduce(
                concept_heatmaps,
                "samples layers batch concepts patches -> batch concepts patches",
                reduction="mean",
            ).to(torch.float32)
            concept_heatmaps = einops.rearrange(
                concept_heatmaps, "batch concepts (h w) -> batch concepts h w",
                h=64, w=64,
            )
            return concept_heatmaps, None

    return RepairedRawOutputSpaceSegmentationModel()


@pytest.fixture(scope="module")
def masks_and_coeffs(ref, ref_models, pipe):
    """Both protocols end-to-end on the same image; module-scoped because
    the two forwards dominate the file's runtime."""
    from conceptattention_tpu.evals.segmentation import FluxTapSegmentationModel
    from conceptattention_tpu.pipeline import concept_pipeline
    from conceptattention_tpu.sampling.rectified_flow import (
        get_noise_torch_parity,
    )

    rng = np.random.default_rng(5)
    image01 = rng.random((1024, 1024, 3), dtype=np.float32)

    # Pin the latent noise to ONE fp32 torch-Philox stream on both sides.
    ref_get_noise = ref.seg.get_noise
    orig_get_noise = concept_pipeline.get_noise
    ref.seg.get_noise = lambda *a, **k: ref_get_noise(
        *a, **{**k, "dtype": torch.float32})
    concept_pipeline.get_noise = lambda key, n, h, w, dtype, **k: (
        get_noise_torch_parity(
            int(jax.random.key_data(key)[-1]), n, h, w, jnp.float32, **k))
    try:
        ref_model = _make_ref_segmodel(ref, ref_models, pipe)
        ref_masks, ref_coeffs, _ = ref_model(
            torch.from_numpy(image01.transpose(2, 0, 1)),
            target_concepts=[CONCEPTS[0]], concepts=CONCEPTS,
            captions=[CAPTION], mean_value_threshold=True, apply_blur=True,
            num_samples=NUM_SAMPLES, num_steps=NUM_STEPS,
            noise_timestep=NOISE_TIMESTEP, seed=SEED, layers=LAYERS,
        )

        ours = FluxTapSegmentationModel(
            pipe, tap="output", num_steps=NUM_STEPS,
            noise_timestep=NOISE_TIMESTEP, num_samples=NUM_SAMPLES,
            layer_indices=LAYERS, seed=SEED, width=1024, height=1024,
            vae_sample=False,
        )
        our_masks, our_coeffs, _ = ours(
            image01, target_concepts=[CONCEPTS[0]], concepts=CONCEPTS,
            captions=[CAPTION], mean_value_threshold=True, apply_blur=True,
        )
    finally:
        ref.seg.get_noise = ref_get_noise
        concept_pipeline.get_noise = orig_get_noise

    return (np.asarray(ref_masks[0]), np.asarray(ref_coeffs[0], np.float32),
            np.asarray(our_masks[0]), np.asarray(our_coeffs[0], np.float32))


def test_segmentation_protocol_parity(masks_and_coeffs):
    """Binary masks identical; soft coefficients agree to fp32 cross-
    framework tolerance (BASELINE target 3, up to real weights)."""
    ref_mask, ref_coeff, our_mask, our_coeff = masks_and_coeffs
    assert ref_mask.shape == our_mask.shape == (64, 64)
    assert ref_mask.dtype == bool and our_mask.dtype == bool
    scale = np.abs(ref_coeff).max()
    np.testing.assert_allclose(our_coeff, ref_coeff, atol=2e-4 * scale,
                               rtol=1e-3)
    disagreement = np.mean(ref_mask != our_mask)
    assert disagreement == 0.0, (
        f"{disagreement:.2%} of mask pixels differ "
        f"(coeff maxdiff {np.abs(ref_coeff - our_coeff).max():.3e})"
    )


def test_metrics_protocol_parity(ref, masks_and_coeffs):
    """The harness post-processing + metrics chain: rescale-to-max ->
    224^2 nearest upsample -> (1-m, m) stacking -> pixAcc / mIoU / mAP,
    reference code (run_experiment.py:186-235, utils.py:48-108) vs our
    harness functions (evals/metrics.py, utils/plotting.upsample_nearest),
    each side consuming its OWN mask/coeff."""
    from conceptattention_tpu.evals.metrics import (
        batch_intersection_union,
        batch_pix_accuracy,
        get_ap_scores,
    )
    from conceptattention_tpu.utils.plotting import upsample_nearest

    ref_mask, ref_coeff, our_mask, our_coeff = masks_and_coeffs
    rng = np.random.default_rng(11)
    label224 = (rng.random((224, 224)) > 0.6)

    # ---- reference chain (torch, run_experiment.py:176-235) ----
    coeff = torch.from_numpy(ref_coeff)
    coeff = (coeff - coeff.min()) / (coeff.max() - coeff.min())
    coeff224 = torch.nn.functional.interpolate(
        coeff[None, None], size=(224, 224), mode="nearest").squeeze()
    mask224 = torch.nn.functional.interpolate(
        torch.from_numpy(ref_mask.astype(np.float32))[None, None],
        size=(224, 224), mode="nearest").squeeze()
    tgt = torch.from_numpy(label224.astype(np.float32))
    pred_pair = torch.stack((1 - mask224, mask224))
    tgt_pair = torch.stack((1 - tgt, tgt))
    r_correct, r_labeled = ref.utils.batch_pix_accuracy(pred_pair, tgt_pair)
    r_inter, r_union = ref.utils.batch_intersection_union(
        pred_pair, tgt_pair, nclass=2)
    r_ap = np.nan_to_num(ref.utils.get_ap_scores(
        torch.stack((1 - coeff224, coeff224)).unsqueeze(0), tgt.unsqueeze(0)))
    r_pixacc = float(r_correct) / (np.spacing(1, dtype=np.float64) + float(r_labeled))
    r_miou = (np.float64(1.0) * np.asarray(r_inter)
              / (np.spacing(1, dtype=np.float64) + np.asarray(r_union))).mean()
    r_map = float(np.mean(r_ap))

    # ---- our chain (experiments/imagenet_segmentation/run_experiment.py:
    # 142-168). The STACKED {bg=1-m, fg=m} pair is required: for pixAcc it
    # only doubles both counts (same ratio as plain class maps), but for IoU
    # it is a DIFFERENT statistic — both histogram bins become
    # (TP+TN)/(2N-TP-TN) — and reference-mIoU equality holds only in pair
    # form (this test failed on plain maps by 3e-3 mIoU before the harness
    # was switched). ----
    lab = label224.astype(np.int64)
    coeff_n = ((our_coeff - our_coeff.min())
               / (our_coeff.max() - our_coeff.min()))
    coeff224_o = upsample_nearest(coeff_n.astype(np.float64), 224, 224)
    pred = (upsample_nearest(our_mask.astype(np.float64), 224, 224)
            > 0.5).astype(np.int64)
    pred_pair = np.stack([1 - pred, pred])
    lab_pair = np.stack([1 - lab, lab])
    o_correct, o_labeled = batch_pix_accuracy(pred_pair, lab_pair)
    o_inter, o_union = batch_intersection_union(pred_pair, lab_pair, nclass=2)
    soft = np.stack([1.0 - coeff224_o, coeff224_o])[None]
    o_ap = np.nan_to_num(get_ap_scores(soft, lab[None]))
    o_pixacc = float(o_correct) / (np.spacing(1, dtype=np.float64) + float(o_labeled))
    o_miou = (np.float64(1.0) * np.asarray(o_inter)
              / (np.spacing(1, dtype=np.float64) + np.asarray(o_union))).mean()
    o_map = float(np.mean(o_ap))

    assert abs(o_pixacc - r_pixacc) < 1e-12, (o_pixacc, r_pixacc)
    assert abs(o_miou - r_miou) < 1e-12, (o_miou, r_miou)
    # mAP consumes the soft maps, which differ at fp32 tolerance.
    assert abs(o_map - r_map) < 1e-3, (o_map, r_map)
