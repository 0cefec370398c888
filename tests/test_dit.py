"""Flux DiT forward tests: shapes, concept-stream invariance, early exit,
saliency collection, sampler integration, and heatmap-reduction parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.dit import flux_forward
from conceptattention_tpu.models.flux.params import init_flux_params, param_count
from conceptattention_tpu.ops.attention import ConceptAttentionSpec
from conceptattention_tpu.ops.packing import make_img_ids
from conceptattention_tpu.pipeline.heatmaps import compute_heatmaps_from_vectors, reduce_maps
from conceptattention_tpu.sampling.rectified_flow import denoise

SPEC = configs["flux-tiny"]
CFG = SPEC.params
B, T, C = 1, 4, 3
GRID = (4, 4)
P = GRID[0] * GRID[1]


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    params = init_flux_params(keys[0], CFG, jnp.float32)
    img = jax.random.normal(keys[1], (B, P, CFG.in_channels))
    txt = jax.random.normal(keys[2], (B, T, CFG.context_in_dim))
    y = jax.random.normal(keys[3], (B, CFG.vec_in_dim))
    concepts = jax.random.normal(keys[4], (B, C, CFG.context_in_dim))
    img_ids = make_img_ids(*GRID, batch_size=B)
    txt_ids = jnp.zeros((B, T, 3))
    concept_ids = jnp.zeros((B, C, 3))
    concept_vec = jnp.zeros((B, CFG.vec_in_dim))
    timesteps = jnp.asarray([0.5])
    return dict(
        params=params, img=img, txt=txt, y=y, concepts=concepts,
        img_ids=img_ids, txt_ids=txt_ids, concept_ids=concept_ids,
        concept_vec=concept_vec, timesteps=timesteps,
    )


class TestFluxForward:
    def test_vanilla_shapes(self, inputs):
        pred, saliency = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
        )
        assert pred.shape == (B, P, CFG.in_channels)
        assert saliency == {}

    def test_concepts_do_not_change_generation(self, inputs):
        pred_vanilla, _ = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
        )
        pred_concept, saliency = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"],
        )
        np.testing.assert_allclose(
            np.asarray(pred_vanilla), np.asarray(pred_concept), rtol=1e-5, atol=1e-6
        )
        assert saliency["output"].shape == (CFG.depth, B, C, P)
        assert saliency["cross_attention"].shape == (CFG.depth, B, C, P)

    def test_early_exit(self, inputs):
        pred, saliency = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"],
            stop_after_multimodal_attentions=True,
        )
        assert pred is None
        assert saliency["output"].shape == (CFG.depth, B, C, P)

    def test_raw_vector_mode_matches_map_mode(self, inputs):
        spec_raw = ConceptAttentionSpec(return_raw_vectors=True)
        _, raw = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"], spec=spec_raw,
        )
        _, maps = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"],
        )
        want = np.einsum(
            "lbcd,lbpd->lbcp",
            np.asarray(raw["output_space_concept_vectors"]),
            np.asarray(raw["output_space_image_vectors"]),
        )
        np.testing.assert_allclose(np.asarray(maps["output"]), want, rtol=1e-4, atol=1e-5)

    def test_guidance_embed_model_requires_guidance(self, inputs):
        cfg_dev = configs["flux-tiny"].params.__class__(
            **{**CFG.__dict__, "guidance_embed": True}
        )
        params = init_flux_params(jax.random.PRNGKey(1), cfg_dev, jnp.float32)
        with pytest.raises(ValueError):
            flux_forward(
                params, cfg_dev,
                img=inputs["img"], img_ids=inputs["img_ids"],
                txt=inputs["txt"], txt_ids=inputs["txt_ids"],
                timesteps=inputs["timesteps"], y=inputs["y"],
            )
        pred, _ = flux_forward(
            params, cfg_dev,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"], y=inputs["y"],
            guidance=jnp.asarray([4.0]),
        )
        assert pred.shape == (B, P, CFG.in_channels)


class TestDenoise:
    def test_euler_loop_collects_saliency(self, inputs):
        steps = 3
        ts = jnp.linspace(1.0, 0.0, steps + 1)
        img, saliency = denoise(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"], vec=inputs["y"],
            timesteps=ts,
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"],
        )
        assert img.shape == (B, P, CFG.in_channels)
        assert saliency["output"].shape == (steps, CFG.depth, B, C, P)
        assert np.isfinite(np.asarray(img)).all()

    def test_euler_step_math(self, inputs):
        # One step: x1 = x0 + (t1 - t0) * v(x0)
        ts = jnp.asarray([1.0, 0.5])
        img, _ = denoise(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"], vec=inputs["y"],
            timesteps=ts,
        )
        pred, _ = flux_forward(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"],
            timesteps=jnp.asarray([1.0]), y=inputs["y"],
        )
        want = np.asarray(inputs["img"]) + (0.5 - 1.0) * np.asarray(pred)
        np.testing.assert_allclose(np.asarray(img), want, rtol=1e-4, atol=1e-5)


class TestHeatmapReduction:
    def test_reduce_maps_matches_vector_path(self, inputs):
        """The in-scan map reduction must equal running
        compute_heatmaps_from_vectors on the full vector stash."""
        steps = 2
        ts = jnp.linspace(1.0, 0.0, steps + 1)
        _, maps = denoise(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"], vec=inputs["y"],
            timesteps=ts,
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"],
        )
        _, raw = denoise(
            inputs["params"], CFG,
            img=inputs["img"], img_ids=inputs["img_ids"],
            txt=inputs["txt"], txt_ids=inputs["txt_ids"], vec=inputs["y"],
            timesteps=ts,
            concepts=inputs["concepts"], concept_ids=inputs["concept_ids"],
            concept_vec=inputs["concept_vec"],
            spec=ConceptAttentionSpec(return_raw_vectors=True),
        )
        for norm in ("softmax", "sparsemax", "entmax15"):
            got = reduce_maps(
                maps["output"], layer_indices=[0, 1], timesteps=[0, 1],
                softmax=False, attention_norm=norm, spatial_shape=GRID,
            )
            want = compute_heatmaps_from_vectors(
                raw["output_space_image_vectors"],
                raw["output_space_concept_vectors"],
                layer_indices=[0, 1], timesteps=[0, 1],
                softmax=False, attention_norm=norm, spatial_shape=GRID,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
                err_msg=f"norm={norm}",
            )

    def test_param_count_full_size(self):
        """The flux-schnell config must land near the published ~11.9B params
        — counted from eval_shape (abstract shapes only, nothing
        materializes)."""
        full = configs["flux-schnell"].params
        shapes = jax.eval_shape(
            lambda k: init_flux_params(k, full, jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert 11.0e9 < n < 12.5e9, f"{n / 1e9:.2f}B params"
        # and the tiny test config stays tiny
        tiny_params = init_flux_params(jax.random.PRNGKey(0), CFG, jnp.float32)
        assert param_count(tiny_params) < 10e6


class TestControlNetResiduals:
    """Ecosystem-compat ControlNet hooks (reference diffusers wrapper
    flux_dit_with_concept_attention.py:224-268): per-double-block img
    residuals with interval or Xlabs-repeat mapping, per-single-block
    residuals on the image slice."""

    def _setup(self, depth=4):
        from conceptattention_tpu.config import FluxConfig
        from conceptattention_tpu.models.flux.params import init_flux_params
        from conceptattention_tpu.ops.packing import make_img_ids

        cfg = FluxConfig(
            in_channels=4, vec_in_dim=8, context_in_dim=8, hidden_size=32,
            mlp_ratio=2.0, num_heads=2, depth=depth, depth_single_blocks=2,
            axes_dim=(4, 6, 6), qkv_bias=True, guidance_embed=False,
        )
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        b, p_tok, t_tok = 1, 16, 4
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        kwargs = dict(
            img=jax.random.normal(keys[0], (b, p_tok, cfg.in_channels)),
            img_ids=make_img_ids(4, 4, b),
            txt=jax.random.normal(keys[1], (b, t_tok, cfg.context_in_dim)),
            txt_ids=jnp.zeros((b, t_tok, 3)),
            timesteps=jnp.asarray([0.5]),
            y=jax.random.normal(keys[2], (b, cfg.vec_in_dim)),
        )
        return cfg, params, kwargs, (b, p_tok)

    def test_per_layer_mapping(self):
        from conceptattention_tpu.models.flux.dit import _controlnet_per_layer

        samples = jnp.arange(2.0)[:, None, None, None] * jnp.ones((2, 1, 1, 1))
        # interval: ceil(4/2)=2 -> [0,0,1,1]; repeat (Xlabs): i%2 -> [0,1,0,1]
        interval = _controlnet_per_layer(samples, 4, False)
        repeat = _controlnet_per_layer(samples, 4, True)
        np.testing.assert_array_equal(interval[:, 0, 0, 0], [0, 0, 1, 1])
        np.testing.assert_array_equal(repeat[:, 0, 0, 0], [0, 1, 0, 1])
        assert _controlnet_per_layer(None, 4, False) is None

    def test_zero_residuals_are_identity(self):
        from conceptattention_tpu.models.flux.dit import flux_forward

        cfg, params, kwargs, (b, p) = self._setup()
        base, _ = flux_forward(params, cfg, **kwargs)
        zeros = jnp.zeros((2, b, p, cfg.hidden_size))
        same, _ = flux_forward(
            params, cfg, **kwargs,
            controlnet_block_samples=zeros,
            controlnet_single_block_samples=zeros,
        )
        np.testing.assert_allclose(np.asarray(base), np.asarray(same),
                                   rtol=1e-6, atol=1e-6)

    def test_residuals_change_output(self):
        from conceptattention_tpu.models.flux.dit import flux_forward

        cfg, params, kwargs, (b, p) = self._setup()
        base, _ = flux_forward(params, cfg, **kwargs)
        cn = 0.1 * jax.random.normal(jax.random.PRNGKey(9),
                                     (2, b, p, cfg.hidden_size))
        out_d, _ = flux_forward(params, cfg, **kwargs,
                                controlnet_block_samples=cn)
        out_s, _ = flux_forward(params, cfg, **kwargs,
                                controlnet_single_block_samples=cn)
        assert not np.allclose(np.asarray(base), np.asarray(out_d))
        assert not np.allclose(np.asarray(base), np.asarray(out_s))
        # repeat mapping differs from interval mapping (different layer order)
        out_r, _ = flux_forward(params, cfg, **kwargs,
                                controlnet_block_samples=cn,
                                controlnet_blocks_repeat=True)
        assert not np.allclose(np.asarray(out_d), np.asarray(out_r))
