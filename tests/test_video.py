"""Video DiT + DDIM scheduler + video concept pipeline tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.models.video.dit import (
    VideoDiTConfig,
    init_video_dit_params,
    make_video_ids,
    video_dit_forward,
)
from conceptattention_tpu.pipeline.video_pipeline import VideoConceptAttentionPipeline
from conceptattention_tpu.sampling.ddim import add_noise, ddim_step, make_ddim_schedule

TINY = VideoDiTConfig(
    in_channels=8, text_dim=32, hidden_size=64, num_heads=2, depth=2,
    axes_dim=(8, 12, 12), theta=10_000,
)
B, T, C = 1, 4, 2
F, H, W = 2, 4, 4
FP = F * H * W


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    params = init_video_dit_params(keys[0], TINY, jnp.float32)
    video = jax.random.normal(keys[1], (B, FP, TINY.in_channels))
    text = jax.random.normal(keys[2], (B, T, TINY.text_dim))
    concepts = jax.random.normal(keys[3], (B, C, TINY.text_dim))
    ids = make_video_ids(F, H, W, batch_size=B)
    return params, video, text, concepts, ids


class TestVideoDiT:
    def test_forward_shapes(self, setup):
        params, video, text, concepts, ids = setup
        pred, saliency = video_dit_forward(
            params, TINY, video, ids, text, jnp.asarray([0.5]), concepts=concepts
        )
        assert pred.shape == (B, FP, TINY.in_channels)
        assert saliency["output"].shape == (TINY.depth, B, C, FP)

    def test_concepts_do_not_change_video(self, setup):
        params, video, text, concepts, ids = setup
        pred_with, _ = video_dit_forward(
            params, TINY, video, ids, text, jnp.asarray([0.5]), concepts=concepts
        )
        pred_without, sal = video_dit_forward(
            params, TINY, video, ids, text, jnp.asarray([0.5])
        )
        np.testing.assert_allclose(
            np.asarray(pred_with), np.asarray(pred_without), rtol=1e-5, atol=1e-6
        )
        assert sal == {}

    def test_video_ids_layout(self):
        ids = np.asarray(make_video_ids(2, 2, 3))
        assert ids.shape == (1, 12, 3)
        np.testing.assert_array_equal(ids[0, :6, 0], 0)  # frame 0
        np.testing.assert_array_equal(ids[0, 6:, 0], 1)  # frame 1
        np.testing.assert_array_equal(ids[0, :3, 2], [0, 1, 2])  # x coords


class TestDDIM:
    def test_schedule_timesteps(self):
        s = make_ddim_schedule(10)
        ts = np.asarray(s.timesteps)
        assert len(ts) == 10
        assert ts[0] == 900 and ts[-1] == 0
        assert (np.diff(ts) < 0).all()

    def test_noise_roundtrip_epsilon(self):
        """For epsilon prediction with the TRUE noise, DDIM recovers x0 at
        the final step."""
        s = make_ddim_schedule(1, prediction_type="epsilon")
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
        t = s.timesteps[0]
        x_t = add_noise(s, x0, eps, t)
        x_prev = ddim_step(s, eps, t, t - 1000, x_t)
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), rtol=1e-4, atol=1e-5)

    def test_v_prediction_roundtrip(self):
        """v = sqrt(a)*eps - sqrt(1-a)*x0; final step recovers x0."""
        s = make_ddim_schedule(1, prediction_type="v_prediction")
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 8))
        eps = jax.random.normal(jax.random.PRNGKey(3), (1, 8))
        t = s.timesteps[0]
        a = s.alphas_cumprod[t]
        x_t = add_noise(s, x0, eps, t)
        v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
        x_prev = ddim_step(s, v, t, t - 1000, x_t)
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), rtol=1e-4, atol=1e-5)


class TestVideoPipeline:
    def test_generate_video_heatmaps(self):
        pipe = VideoConceptAttentionPipeline(cfg=TINY, dtype=jnp.float32)
        out = pipe.generate_video(
            prompt="a dog running",
            concepts=["dog", "grass"],
            num_frames=F, height_tokens=H, width_tokens=W,
            num_inference_steps=3,
            layer_indices=[0, 1],
            seed=1,
        )
        assert out.concept_heatmaps.shape == (2, F, H, W)
        assert np.isfinite(out.concept_heatmaps).all()
        assert out.video_latents.shape == (1, F, H, W, TINY.in_channels)


class TestDPM:
    def test_dpm_epsilon_roundtrip_one_step(self):
        from conceptattention_tpu.sampling.dpm import dpm_init, dpm_step, make_dpm_schedule
        from conceptattention_tpu.sampling.ddim import add_noise

        s = make_dpm_schedule(1, prediction_type="epsilon")
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
        t = s.timesteps[0]
        x_t = add_noise(s, x0, eps, t)
        state = dpm_init(x_t)
        state = dpm_step(s, state, eps, t, t - 1000)
        # at the final boundary alpha->1, sigma->~0: recovers x0
        np.testing.assert_allclose(np.asarray(state.sample), np.asarray(x0), rtol=1e-2, atol=1e-2)

    def test_video_pipeline_dpm(self):
        pipe = VideoConceptAttentionPipeline(cfg=TINY, dtype=jnp.float32)
        out = pipe.generate_video(
            prompt="a dog", concepts=["dog"],
            num_frames=F, height_tokens=H, width_tokens=W,
            num_inference_steps=4, scheduler="dpm", seed=2,
        )
        assert np.isfinite(out.concept_heatmaps).all()
