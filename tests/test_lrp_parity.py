"""ε-LRP parity vs the ACTUAL reference relevance engine.

Imports the reference's own `ViT_LRP.VisionTransformer` +
`ViT_explanation_generator.LRP` (the hand-written relevance-rule stack,
chefer_vit_explainability/modules/layers_ours.py) at tiny config, exports
its state dict through `convert_vit_state_dict`, and asserts our JAX
`vit_relprop` (evals/lrp.py) reproduces every generate_LRP method.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conceptattention_tpu.evals.lrp import vit_relprop
from conceptattention_tpu.models.vit import ViTConfig, vit_forward
from conceptattention_tpu.weights.convert import convert_vit_state_dict

CFG = ViTConfig(
    image_size=32, patch_size=8, in_channels=3, hidden_size=16,
    depth=3, num_heads=2, mlp_ratio=4.0, num_classes=10,
    final_norm_eps=1e-5,  # chefer ViT_LRP.py:267 leaves the torch default
)


@pytest.fixture(scope="module")
def ref_lrp():
    from tests._ref_compat import install_reference

    install_reference()
    try:
        from concept_attention.binary_segmentation_baselines.chefer_vit_explainability.ViT_explanation_generator import (
            LRP,
        )
        from concept_attention.binary_segmentation_baselines.chefer_vit_explainability.ViT_LRP import (
            VisionTransformer,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference LRP not importable: {e}")
    torch.manual_seed(13)
    model = VisionTransformer(
        img_size=CFG.image_size, patch_size=CFG.patch_size,
        num_classes=CFG.num_classes, embed_dim=CFG.hidden_size,
        depth=CFG.depth, num_heads=CFG.num_heads,
        mlp_ratio=CFG.mlp_ratio, qkv_bias=True,
    ).float().eval()
    # Random (non-zero) weights everywhere so relevance actually flows.
    with torch.no_grad():
        for p in model.parameters():
            if p.std() < 1e-6:
                p.add_(torch.randn_like(p) * 0.05)
    return model, LRP(model)


@pytest.fixture(scope="module")
def jax_params(ref_lrp):
    model, _ = ref_lrp
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_vit_state_dict(sd, CFG, dtype=jnp.float32)


@pytest.fixture(scope="module")
def image():
    torch.manual_seed(21)
    return torch.randn(1, 3, CFG.image_size, CFG.image_size)


def test_forward_logits_match(ref_lrp, jax_params, image):
    model, _ = ref_lrp
    # The reference forward registers gradient hooks -> needs grad enabled.
    want = model(image.clone().requires_grad_(True)).detach().numpy()
    got, _ = vit_forward(jax_params, CFG, jnp.asarray(image.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "method",
    ["transformer_attribution", "rollout", "full", "last_layer",
     "last_layer_attn", "second_layer"],
)
def test_generate_lrp_parity(ref_lrp, jax_params, image, method):
    """Every generate_LRP method matches the reference relevance engine
    (ViT_LRP.py:324-400, ViT_explanation_generator.py:20-43)."""
    _, lrp = ref_lrp
    index = 3
    want = lrp.generate_LRP(image.clone(), index=index, method=method)
    got = vit_relprop(
        jax_params, CFG, jnp.asarray(image.numpy()),
        index=jnp.asarray([index]), method=method,
    )
    want = want.detach().numpy()
    got = np.asarray(got)
    if method == "transformer_attribution":
        # reference returns [1, N] from batch 0
        got = got[:1]
    got = got.reshape(want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=2e-4, err_msg=method)


def test_lrp_conservation_direction(jax_params, image):
    """Transformer-attribution relevance is non-negative and non-trivial."""
    sal = vit_relprop(
        jax_params, CFG, jnp.asarray(image.numpy()),
        method="transformer_attribution",
    )
    sal = np.asarray(sal)
    assert (sal >= 0).all()
    assert sal.max() > 0


def test_batched_lrp_equals_per_image(jax_params, image):
    """Relevance propagation must not couple images through batch-global
    rescale factors (the residual-add rule normalizes per sample)."""
    img0 = jnp.asarray(image.numpy())
    img1 = img0[:, :, ::-1, :]  # a distinct second image
    batch = jnp.concatenate([img0, img1], axis=0)
    idx = jnp.zeros((2,), jnp.int32)
    got = np.asarray(
        vit_relprop(jax_params, CFG, batch, index=idx, method="full")
    )
    want0 = np.asarray(
        vit_relprop(jax_params, CFG, img0, index=idx[:1], method="full")
    )
    want1 = np.asarray(
        vit_relprop(jax_params, CFG, img1, index=idx[:1], method="full")
    )
    np.testing.assert_allclose(got[0], want0[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got[1], want1[0], rtol=1e-4, atol=1e-6)
