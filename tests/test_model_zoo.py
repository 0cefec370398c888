"""The 13-baseline model factory (reference run_experiment.py:81-120)."""

import numpy as np
import pytest

from conceptattention_tpu.evals.model_zoo import MODEL_CHOICES, build_segmentation_model
from conceptattention_tpu.models.clip_vit import OpenCLIPTextConfig, OpenCLIPVisionConfig
from conceptattention_tpu.models.sd_unet import UNetConfig
from conceptattention_tpu.models.vit import ViTConfig

TINY_VIT = ViTConfig(image_size=32, patch_size=8, hidden_size=32, depth=2,
                     num_heads=2, num_classes=5)
TINY_UNET = UNetConfig(
    block_out_channels=(16, 32), layers_per_block=1, attention_heads=(2, 2),
    cross_attention_levels=(True, False), context_dim=8, num_groups=4,
)
TINY_XL_UNET = UNetConfig(
    block_out_channels=(16, 32), layers_per_block=1, attention_heads=(2, 2),
    cross_attention_levels=(False, True), context_dim=8, num_groups=4,
    transformer_layers_per_block=(1, 2), addition_embed_type="text_time",
    addition_time_embed_dim=4, projection_class_embeddings_input_dim=8 + 24,
)
TINY_CLIP_VIS = OpenCLIPVisionConfig(image_size=28, patch_size=14, width=32,
                                     depth=2, num_heads=2, embed_dim=16)
TINY_CLIP_TXT = OpenCLIPTextConfig(context_length=16, vocab_size=64, width=32,
                                   depth=2, num_heads=2, embed_dim=16)


def test_choices_cover_reference_switch():
    # flux taps(3) + DAAMFlux + Chefer(7) + DINO + DAAM SD2/SDXL + TextSpan
    assert len(MODEL_CHOICES) == 15


def test_unknown_name_rejected():
    with pytest.raises(ValueError, match="unknown model"):
        build_segmentation_model("NotAModel")


def test_flux_models_need_pipeline():
    with pytest.raises(ValueError, match="pipeline"):
        build_segmentation_model("RawOutputSpace")


def test_missing_checkpoint_message(monkeypatch):
    monkeypatch.delenv("CHEFER_VITB16", raising=False)
    with pytest.raises(FileNotFoundError, match="CHEFER_VITB16"):
        build_segmentation_model("CheferRollout", vit_cfg=TINY_VIT)


@pytest.mark.parametrize("name", [
    "DINO", "CheferRollout", "CheferLastLayerAttention",
    "CheferAttentionGradCAM", "CheferTransformerAttribution",
    "CheferLastLayerLRP", "CheferLRP", "CheferFullLRP",
])
def test_vit_baselines_segment(name):
    model = build_segmentation_model(name, random_weights=True, vit_cfg=TINY_VIT)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    masks, coeffs, _ = model([image], target_concepts=["cat"],
                             concepts=["cat", "sky"], captions=["a cat"])
    assert masks[0].dtype == bool
    assert np.isfinite(np.asarray(coeffs[0])).all()


@pytest.mark.parametrize("name,cfg", [
    ("DAAMSD2", TINY_UNET), ("DAAMSDXL", TINY_XL_UNET),
])
def test_daam_sd_baselines_segment(name, cfg):
    model = build_segmentation_model(
        name, random_weights=True, unet_cfg=cfg, latent_size=8
    )
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    masks, coeffs, _ = model([image], target_concepts=["cat"],
                             concepts=["cat", "sky"], captions=["a cat"])
    assert np.isfinite(np.asarray(coeffs[0])).all()


def test_textspan_baseline_segments():
    model = build_segmentation_model(
        "TextSpan", random_weights=True, vit_cfg=TINY_CLIP_VIS,
        clip_txt_cfg=TINY_CLIP_TXT,
    )
    rng = np.random.default_rng(2)
    image = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
    masks, coeffs, _ = model([image], target_concepts=["cat"],
                             concepts=["cat", "sky"], captions=["a cat"])
    assert np.isfinite(np.asarray(coeffs[0])).all()


def test_flux_tap_via_factory():
    import jax.numpy as jnp

    import conceptattention_tpu as cat

    pipe = cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)
    model = build_segmentation_model(
        "RawCrossAttention", pipeline=pipe, num_steps=2, noise_timestep=1,
        width=64, height=64, layer_indices=[0, 1],
    )
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    coeff, _ = model.segment_individual_image(image, ["cat", "sky"], "a cat")
    assert coeff.shape[0] == 2 and np.isfinite(coeff).all()
