"""TextSpan parity vs the ACTUAL reference implementation.

Builds a tiny CLIP through the reference's vendored open_clip fork
(`clip_text_span/utils/model.py` CLIP + `prs_hook.py` PRSLogger — the real
hook machinery the paper's baseline uses), converts its state dict with
`clip_vit.convert_open_clip_*`, and asserts our closed-form PRS decomposition
(`models/clip_vit.prs_decomposition`) reproduces the hook outputs:

  - encode_image representation (fp32, <=1e-4),
  - the (layer, head)-summed projected attention decomposition that
    `CLIPTextSpanSegmentationModel.segment_individual_image` consumes
    (clip_text_span_baseline.py:78-82),
  - encode_text embeddings,
  - the final concept heatmaps.
"""

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests._ref_compat import install_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref_clip():
    install_reference()
    from concept_attention.binary_segmentation_baselines.clip_text_span.utils.model import (
        CLIP,
        CLIPTextCfg,
        CLIPVisionCfg,
    )

    torch.manual_seed(0)
    vision_cfg = CLIPVisionCfg(layers=2, width=32, head_width=8, patch_size=8,
                               image_size=16, mlp_ratio=2.0)
    text_cfg = CLIPTextCfg(context_length=12, vocab_size=64, width=16, heads=2,
                           layers=2)
    model = CLIP(embed_dim=24, vision_cfg=vision_cfg, text_cfg=text_cfg,
                 quick_gelu=False)
    # Reference bug workaround: the vendored MultiheadAttention
    # (clip_text_span/utils/transformer.py:254-298) allocates in_proj_weight /
    # in_proj_bias / bias_k / bias_v with torch.empty and NEVER initializes
    # them (no _reset_parameters; TextTransformer.init_parameters:924-936
    # covers only the TEXT tower's in_proj_weight — the vision tower's stays
    # heap garbage). Benign in a fresh process (zero pages) but goes 1e19/NaN
    # under full-suite heap reuse, which made these tests order-dependent
    # twice. Real checkpoints overwrite all of these, so deterministic init
    # here matches the load-from-checkpoint contract.
    with torch.no_grad():
        torch.manual_seed(42)
        for mod in model.modules():
            for name in ("in_proj_weight", "in_proj_bias", "bias_k", "bias_v"):
                p = getattr(mod, name, None)
                if isinstance(p, torch.nn.Parameter):
                    p.normal_(std=0.02)
            # The vendored LayerNorm (transformer.py:16-64) is a plain
            # nn.Module with torch.empty weight/bias and no reset — init
            # near the (1, 0) affine identity so conversion is still
            # exercised nontrivially.
            if hasattr(mod, "normalized_shape") and isinstance(
                getattr(mod, "weight", None), torch.nn.Parameter
            ):
                mod.weight.normal_(mean=1.0, std=0.02)
                mod.bias.normal_(std=0.02)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(ref_clip):
    from conceptattention_tpu.models.clip_vit import (
        OpenCLIPTextConfig,
        OpenCLIPVisionConfig,
        convert_open_clip_text,
        convert_open_clip_visual,
    )

    vis_cfg = OpenCLIPVisionConfig(
        image_size=16, patch_size=8, width=32, depth=2, num_heads=4,
        mlp_ratio=2.0, embed_dim=24,
    )
    txt_cfg = OpenCLIPTextConfig(
        context_length=12, vocab_size=64, width=16, depth=2, num_heads=2,
        mlp_ratio=4.0, embed_dim=24,
    )
    sd = ref_clip.state_dict()
    params = {
        "visual": convert_open_clip_visual(sd, vis_cfg),
        "text": convert_open_clip_text(sd, txt_cfg),
    }
    return params, vis_cfg, txt_cfg


_PRS_CACHE = {}


def _ref_prs(ref_clip, images: torch.Tensor):
    from concept_attention.binary_segmentation_baselines.clip_text_span.prs_hook import (
        hook_prs_logger,
    )

    # Register the logger hooks ONCE per model: repeated hook_prs_logger calls
    # stack duplicate hooks, and a finalized stale logger (whose .mlps became
    # a tensor) then breaks on append.
    if id(ref_clip) not in _PRS_CACHE:
        _PRS_CACHE[id(ref_clip)] = hook_prs_logger(ref_clip, device="cpu")
    prs = _PRS_CACHE[id(ref_clip)]
    prs.reinit()
    with torch.no_grad():
        rep = ref_clip.encode_image(images, attn_method="head", normalize=False)
    attentions, _ = prs.finalize(rep)  # [b, l, n, h, d]
    collapsed = attentions.sum(axis=(1, 3))  # [b, n, d]
    return rep, collapsed


class TestPRSDecomposition:
    def test_representation_and_collapsed_maps(self, ref_clip, jax_params):
        from conceptattention_tpu.models.clip_vit import prs_decomposition

        params, vis_cfg, _ = jax_params
        torch.manual_seed(1)
        images = torch.randn(2, 3, 16, 16)
        ref_rep, ref_collapsed = _ref_prs(ref_clip, images)

        rep, collapsed = prs_decomposition(
            params["visual"], vis_cfg, jnp.asarray(images.numpy())
        )
        np.testing.assert_allclose(
            np.asarray(rep), ref_rep.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(collapsed), ref_collapsed.numpy(), atol=1e-4, rtol=1e-4
        )

    def test_encode_image_matches_prs_representation(self, jax_params):
        """The plain (no-decomposition) forward must produce the identical
        representation the PRS path computes."""
        from conceptattention_tpu.models.clip_vit import (
            encode_image, prs_decomposition,
        )

        params, vis_cfg, _ = jax_params
        torch.manual_seed(5)
        images = jnp.asarray(torch.randn(2, 3, 16, 16).numpy())
        want, _ = prs_decomposition(params["visual"], vis_cfg, images)
        got = encode_image(params["visual"], vis_cfg, images)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_text_encode(self, ref_clip, jax_params):
        from conceptattention_tpu.models.clip_vit import text_encode

        params, _, txt_cfg = jax_params
        torch.manual_seed(3)
        ids = torch.randint(1, 60, (3, 12))
        ids[:, -1] = 63  # EOT = highest id (argmax pooling)
        with torch.no_grad():
            ref = ref_clip.encode_text(ids, normalize=False)
        got = text_encode(params["text"], txt_cfg, jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4, rtol=1e-4)

    def test_segmentation_heatmaps_match_reference_pipeline(self, ref_clip, jax_params):
        """End-to-end: our OpenCLIPTextSpanSegmentationModel heatmap equals the
        reference baseline's `attentions[:, :, 1:].sum((1, 3)) @ concept_vectors`
        with identical (hash-tokenized) text embeddings."""
        from conceptattention_tpu.evals.textspan import (
            OpenCLIPTextSpanSegmentationModel,
            PROMPT_TEMPLATES,
        )

        params, vis_cfg, txt_cfg = jax_params
        model = OpenCLIPTextSpanSegmentationModel(params, vis_cfg, txt_cfg)

        torch.manual_seed(2)
        image = torch.rand(3, 16, 16)
        concepts = ["cat", "sky"]

        # Reference-side heatmap with the same tokenizer + text tower math.
        _, collapsed = _ref_prs(ref_clip, image[None])
        cols = []
        for concept in concepts:
            ids = model.tokenize([t.format(concept) for t in PROMPT_TEMPLATES])
            with torch.no_grad():
                emb = ref_clip.encode_text(torch.from_numpy(ids).long())
            emb = torch.nn.functional.normalize(emb, dim=-1).mean(dim=0)
            cols.append((emb / emb.norm()).numpy())
        concept_vectors = np.stack(cols, axis=1)
        want = (collapsed[0, 1:].numpy() @ concept_vectors).T.reshape(2, 2, 2)

        got, _ = model.segment_individual_image(
            image.numpy(), concepts, caption="unused"
        )
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_template_count_matches_reference(self):
        install_reference()
        from concept_attention.binary_segmentation_baselines.clip_text_span.utils.openai_templates import (
            OPENAI_IMAGENET_TEMPLATES,
        )

        from conceptattention_tpu.evals.textspan import PROMPT_TEMPLATES

        assert len(PROMPT_TEMPLATES) == len(OPENAI_IMAGENET_TEMPLATES) == 80
        ours = {t.format("X") for t in PROMPT_TEMPLATES}
        theirs = {t("X") for t in OPENAI_IMAGENET_TEMPLATES}
        assert ours == theirs
