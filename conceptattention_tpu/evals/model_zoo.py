"""Factory for every segmentation baseline — the reference's 13-choice model
switch (`experiments/imagenet_segmentation/run_experiment.py:81-120` in
manuragkhullar/ConceptAttention) as one function.

Model names mirror the reference's `--segmentation_model` choices:
  RawOutputSpace / RawCrossAttention / RawValueSpace  (flux taps)
  DAAMFlux
  CheferLRP / CheferRollout / CheferLastLayerAttention /
  CheferAttentionGradCAM / CheferTransformerAttribution /
  CheferFullLRP / CheferLastLayerLRP
  DINO
  DAAMSD2 / DAAMSDXL
  TextSpan

Weights come from env-var checkpoint paths (this environment has no hub
egress — same pattern as the reference's FLUX_DEV/FLUX_SCHNELL/AE overrides,
flux/src/flux/util.py:28-93):
  CHEFER_VITB16 — ViT-B/16 ImageNet classifier state dict (Chefer methods)
  DINO_VITB16   — DINO ViT-B/16 state dict
  SD2_UNET      — stable-diffusion-2-base UNet state dict
  SDXL_UNET     — sd_xl_base UNet state dict
  OPENCLIP_VITH14 — open_clip ViT-H/14 state dict (TextSpan)
With `random_weights=True`, seeded random params are used instead — ONLY for
harness smoke tests; metrics are then meaningless.
"""

from __future__ import annotations

import os
from typing import Any

MODEL_CHOICES = (
    "RawOutputSpace", "RawCrossAttention", "RawValueSpace", "DAAMFlux",
    "CheferLRP", "CheferRollout", "CheferLastLayerAttention",
    "CheferAttentionGradCAM", "CheferTransformerAttribution",
    "CheferFullLRP", "CheferLastLayerLRP",
    "DINO", "DAAMSD2", "DAAMSDXL", "TextSpan",
)

# Chefer harness name -> evals/baselines.py method key. "CheferLRP" is the
# orig_lrp full-propagation engine in the reference
# (chefer_clip_vit_baselines.py:100-102), i.e. pixel-level 'lrp' here.
_CHEFER_METHODS = {
    "CheferLRP": "lrp",
    "CheferRollout": "rollout",
    "CheferLastLayerAttention": "dino_attention",
    "CheferAttentionGradCAM": "gradcam",
    "CheferTransformerAttribution": "transformer_attribution",
    "CheferFullLRP": "full_lrp",
    "CheferLastLayerLRP": "last_layer_lrp",
}


def _load_or_init_vit(env_var: str, cfg, random_weights: bool, seed: int = 0):
    import jax

    from conceptattention_tpu.models.vit import init_vit_params

    path = os.environ.get(env_var, "")
    if path:
        from conceptattention_tpu.weights.convert import (
            convert_vit_state_dict,
            load_safetensors,
        )

        return convert_vit_state_dict(load_safetensors(path), cfg)
    if not random_weights:
        raise FileNotFoundError(
            f"set ${env_var} to a ViT checkpoint (or pass random_weights=True "
            "for a smoke run with meaningless metrics)"
        )
    return init_vit_params(jax.random.PRNGKey(seed), cfg)


def tiny_configs(name: str) -> dict:
    """Per-family tiny configs for smoke runs (`tiny=True`): every baseline
    family gets a seconds-scale CPU model so harness/figure drivers can be
    exercised end-to-end without checkpoints. Metrics are meaningless."""
    from conceptattention_tpu.models.clip_vit import (
        OpenCLIPTextConfig,
        OpenCLIPVisionConfig,
    )
    from conceptattention_tpu.models.sd_unet import UNetConfig
    from conceptattention_tpu.models.vit import ViTConfig

    if name in _CHEFER_METHODS or name == "DINO":
        return {"vit_cfg": ViTConfig(image_size=32, patch_size=8,
                                     hidden_size=32, depth=2, num_heads=2,
                                     num_classes=5)}
    if name == "DAAMSD2":
        return {"unet_cfg": UNetConfig(
            block_out_channels=(16, 32), layers_per_block=1,
            attention_heads=(2, 2), cross_attention_levels=(True, False),
            context_dim=8, num_groups=4)}
    if name == "DAAMSDXL":
        return {"unet_cfg": UNetConfig(
            block_out_channels=(16, 32), layers_per_block=1,
            attention_heads=(2, 2), cross_attention_levels=(False, True),
            context_dim=8, num_groups=4, transformer_layers_per_block=(1, 2),
            addition_embed_type="text_time", addition_time_embed_dim=4,
            projection_class_embeddings_input_dim=8 + 24)}
    if name == "TextSpan":
        return {"vit_cfg": OpenCLIPVisionConfig(image_size=28, patch_size=14,
                                                width=32, depth=2,
                                                num_heads=2, embed_dim=16),
                "clip_txt_cfg": OpenCLIPTextConfig(context_length=16,
                                                   vocab_size=64, width=32,
                                                   depth=2, num_heads=2,
                                                   embed_dim=16)}
    return {}  # flux taps: tiny-ness comes from the pipeline's model_name


def build_segmentation_model(
    name: str,
    pipeline=None,  # ConceptAttentionFluxPipeline, for the flux-tap models
    random_weights: bool = False,
    tiny: bool = False,
    vit_cfg=None,
    unet_cfg=None,
    clip_txt_cfg=None,
    text_encoders=None,
    **tap_kwargs: Any,
):
    """name -> a SegmentationModel. `tap_kwargs` (num_steps, noise_timestep,
    layer_indices, width, ...) apply to the flux-tap models. `tiny=True`
    fills any cfg left as None from `tiny_configs` (smoke mode)."""
    if name not in MODEL_CHOICES:
        raise ValueError(f"unknown model {name!r}; choose from {MODEL_CHOICES}")
    if tiny:
        for key, cfg in tiny_configs(name).items():
            if {"vit_cfg": vit_cfg, "unet_cfg": unet_cfg,
                    "clip_txt_cfg": clip_txt_cfg}[key] is None:
                if key == "vit_cfg":
                    vit_cfg = cfg
                elif key == "unet_cfg":
                    unet_cfg = cfg
                else:
                    clip_txt_cfg = cfg

    if name in ("RawOutputSpace", "RawCrossAttention", "RawValueSpace", "DAAMFlux"):
        from conceptattention_tpu.evals.segmentation import (
            DAAMFluxSegmentationModel,
            FluxTapSegmentationModel,
        )

        if pipeline is None:
            raise ValueError(f"{name} needs the flux `pipeline`")
        if name == "DAAMFlux":
            return DAAMFluxSegmentationModel(pipeline, **tap_kwargs)
        tap = {
            "RawOutputSpace": "output",
            "RawCrossAttention": "cross_attention",
            "RawValueSpace": "value",
        }[name]
        return FluxTapSegmentationModel(pipeline, tap=tap, **tap_kwargs)

    if name in _CHEFER_METHODS or name == "DINO":
        from conceptattention_tpu.evals.baselines import (
            ViTAttentionSegmentationModel,
        )
        from conceptattention_tpu.models.vit import ViTConfig

        cfg = vit_cfg or ViTConfig()
        env = "DINO_VITB16" if name == "DINO" else "CHEFER_VITB16"
        method = "dino_attention" if name == "DINO" else _CHEFER_METHODS[name]
        params = _load_or_init_vit(env, cfg, random_weights)
        return ViTAttentionSegmentationModel(params, cfg, method=method)

    if name in ("DAAMSD2", "DAAMSDXL"):
        import jax

        from conceptattention_tpu.evals.segmentation import (
            DAAMStableDiffusionSegmentationModel,
            DAAMStableDiffusionXLSegmentationModel,
        )
        from conceptattention_tpu.models.sd_unet import (
            SDXL_BASE_CONFIG,
            UNetConfig,
            init_unet_params,
        )
        from conceptattention_tpu.models.text.encoders import StubTextEncoders

        cfg = unet_cfg or (SDXL_BASE_CONFIG if name == "DAAMSDXL" else UNetConfig())
        env = "SDXL_UNET" if name == "DAAMSDXL" else "SD2_UNET"
        path = os.environ.get(env, "")
        if path:
            from conceptattention_tpu.weights.convert import (
                convert_sd_unet_state_dict,
                load_safetensors,
            )

            params = convert_sd_unet_state_dict(load_safetensors(path), cfg)
        elif random_weights:
            params = init_unet_params(jax.random.PRNGKey(0), cfg)
        else:
            raise FileNotFoundError(
                f"set ${env} to a UNet checkpoint (or random_weights=True)"
            )
        enc = text_encoders or StubTextEncoders(
            t5_dim=cfg.context_dim,
            clip_dim=(cfg.pooled_text_dim if name == "DAAMSDXL" else 768),
        )
        cls = (
            DAAMStableDiffusionXLSegmentationModel
            if name == "DAAMSDXL"
            else DAAMStableDiffusionSegmentationModel
        )
        return cls(params, cfg, enc, **tap_kwargs)

    # TextSpan
    import jax

    from conceptattention_tpu.evals.textspan import OpenCLIPTextSpanSegmentationModel
    from conceptattention_tpu.models.clip_vit import (
        OpenCLIPTextConfig,
        OpenCLIPVisionConfig,
        convert_open_clip_text,
        convert_open_clip_visual,
        init_open_clip_params,
    )

    vis_cfg = (vit_cfg if isinstance(vit_cfg, OpenCLIPVisionConfig) else None) \
        or OpenCLIPVisionConfig()
    txt_cfg = clip_txt_cfg or OpenCLIPTextConfig()
    path = os.environ.get("OPENCLIP_VITH14", "")
    if path:
        from conceptattention_tpu.weights.convert import load_safetensors

        sd = load_safetensors(path)
        params = {
            "visual": convert_open_clip_visual(sd, vis_cfg),
            "text": convert_open_clip_text(sd, txt_cfg),
        }
    elif random_weights:
        params = init_open_clip_params(jax.random.PRNGKey(0), vis_cfg, txt_cfg)
    else:
        raise FileNotFoundError(
            "set $OPENCLIP_VITH14 to an open_clip ViT-H/14 checkpoint "
            "(or random_weights=True)"
        )
    return OpenCLIPTextSpanSegmentationModel(params, vis_cfg, txt_cfg)
