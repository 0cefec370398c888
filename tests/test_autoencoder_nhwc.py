"""NHWC fast-path decoder must match the canonical NCHW decoder exactly.

The NHWC variant exists purely for TPU layout efficiency (channel-last convs
avoid XLA relayouts at 1024^2); it reads the same NCHW/OIHW checkpoint params,
so agreement here proves the transposed wiring, not just shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.config import AutoEncoderConfig
from conceptattention_tpu.models.flux import autoencoder as vae


@pytest.fixture(scope="module")
def tiny():
    cfg = AutoEncoderConfig(
        resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4
    )
    params = vae.init_autoencoder_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


class TestNHWCDecoder:
    def test_decode_matches_nchw(self, tiny):
        cfg, params = tiny
        z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_channels, 4, 4))
        ref = vae.decode(params, cfg, z)
        got = vae.decode_nhwc(params, cfg, z)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_decoder_apply_matches_nchw(self, tiny):
        cfg, params = tiny
        z = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.z_channels, 3, 5))
        ref = vae.decoder_apply(params["decoder"], cfg, z)
        got = vae.decoder_apply_nhwc(params["decoder"], cfg, z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


class TestNHWCEncoder:
    def test_encode_matches_nchw(self, tiny):
        cfg, params = tiny
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, cfg.resolution, cfg.resolution))
        key = jax.random.PRNGKey(4)
        ref = vae.encode(params, cfg, x, key=key)
        got = vae.encode_nhwc(params, cfg, x, key=key)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_encode_deterministic_mean(self, tiny):
        cfg, params = tiny
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, cfg.resolution, cfg.resolution))
        ref = vae.encode(params, cfg, x)  # mean path, no sampling key
        got = vae.encode_nhwc(params, cfg, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
