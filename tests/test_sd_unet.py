"""SD-style UNet + DAAM-SD baseline tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.models.sd_unet import UNetConfig, init_unet_params, unet_forward

TINY = UNetConfig(model_channels=16, ch_mult=(1, 2), num_heads=2, context_dim=32, num_groups=4)


@pytest.fixture(scope="module")
def unet():
    return init_unet_params(jax.random.PRNGKey(0), TINY)


class TestUNet:
    def test_forward_shapes_and_maps(self, unet):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, TINY.context_dim))
        out, maps = unet_forward(unet, TINY, z, jnp.asarray([0.5]), ctx)
        assert out.shape == (1, 4, 16, 16)
        # transformer blocks: down level 1, mid, up level 1 -> 3 traced maps
        assert len(maps) == 3
        for m in maps:
            assert m.shape[0] == 1 and m.shape[1] == TINY.num_heads
            assert m.shape[-1] == 5  # context tokens
            np.testing.assert_allclose(np.asarray(m.sum(-1)), 1.0, rtol=1e-4)

    def test_context_changes_output(self, unet):
        z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16))
        c1 = jax.random.normal(jax.random.PRNGKey(4), (1, 5, TINY.context_dim))
        c2 = jax.random.normal(jax.random.PRNGKey(5), (1, 5, TINY.context_dim))
        o1, _ = unet_forward(unet, TINY, z, jnp.asarray([0.5]), c1)
        o2, _ = unet_forward(unet, TINY, z, jnp.asarray([0.5]), c2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestDAAMSD:
    def test_daam_sd_segmentation(self, unet):
        from conceptattention_tpu.evals.segmentation import (
            DAAMStableDiffusionSegmentationModel,
        )
        from conceptattention_tpu.models.text.encoders import StubTextEncoders

        enc = StubTextEncoders(t5_dim=TINY.context_dim)
        model = DAAMStableDiffusionSegmentationModel(
            unet, TINY, enc, latent_size=16
        )
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        masks, coeffs, _ = model(
            [image], target_concepts=["cat"], concepts=["cat", "sky"],
            captions=["a cat under the sky"],
        )
        assert masks[0].dtype == bool
        assert np.isfinite(coeffs[0]).all()
