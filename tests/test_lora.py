"""LoRA adapters: state-dict conversion (BFL/kohya/diffusers namings),
merging (bf16 + int8), pipeline integration, training, export round-trip.

Not a reference component (manuragkhullar/ConceptAttention is inference-only,
monolithic checkpoints) — framework capability for the flux ecosystem.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conceptattention_tpu.config import configs
from conceptattention_tpu.models.flux.params import init_flux_params
from conceptattention_tpu.weights.lora import (
    convert_lora_state_dict,
    merge_lora,
    merge_loras,
)

CFG = configs["flux-tiny"].params  # hidden 128, heads 4, depth 2/2, mlp 512
D = CFG.hidden_size
M = CFG.mlp_hidden_dim
R = 4


def _f(key, *shape):
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(key), shape), np.float32
    )


def _delta(a, b, alpha=None):
    """Expected [in, out] delta from A [r, in], B [out, r]."""
    r = a.shape[0]
    scale = (alpha if alpha is not None else r) / r
    return (a.T @ b.T) * scale


class TestConvertMerge:
    def test_bfl_naming_all_targets(self):
        sd = {}
        expected = {}  # (stack, leaf, layer) -> delta [in, out]
        specs = [
            ("double_blocks.{i}.img_attn.qkv", "double", "img_qkv", D, 3 * D),
            ("double_blocks.{i}.img_attn.proj", "double", "img_proj", D, D),
            ("double_blocks.{i}.img_mlp.0", "double", "img_mlp_in", D, M),
            ("double_blocks.{i}.txt_mlp.2", "double", "txt_mlp_out", M, D),
            ("double_blocks.{i}.txt_mod.lin", "double", "txt_mod", D, 6 * D),
        ]
        k = 0
        for i in range(CFG.depth):
            for tmpl, stack, leaf, d_in, d_out in specs:
                a = _f(k, R, d_in); b = _f(k + 1, d_out, R); k += 2
                base = tmpl.format(i=i)
                sd[f"{base}.lora_A.weight"] = a
                sd[f"{base}.lora_B.weight"] = b
                sd[f"{base}.alpha"] = np.float32(8.0)
                expected[(stack, leaf, i)] = _delta(a, b, 8.0)

        lora = convert_lora_state_dict(sd, CFG)
        params = init_flux_params(jax.random.PRNGKey(0), CFG, jnp.float32)
        merged = merge_lora(params, lora, strength=1.0)

        for (stack, leaf, i), delta in expected.items():
            w0 = np.asarray(params[stack][leaf]["w"][i], np.float32)
            w1 = np.asarray(merged[stack][leaf]["w"][i], np.float32)
            got = (w1 - w0).reshape(delta.shape)
            np.testing.assert_allclose(got, delta, rtol=0, atol=1e-5)

        # untouched leaves stay byte-identical (same array by reference)
        assert merged["double"]["img_proj"]["w"] is not params["double"]["img_proj"]["w"]
        assert merged["double"]["img_qnorm"] is params["double"]["img_qnorm"]
        assert merged["single"] is params["single"]

    def test_single_block_fused_linear_splits(self):
        """linear1 splits on the OUTPUT axis (qkv | mlp_in), linear2 on the
        INPUT axis (proj | mlp_out) — mirroring weights/convert.py:107-123."""
        sd = {}
        a1 = _f(0, R, D); b1 = _f(1, 3 * D + M, R)
        a2 = _f(2, R, D + M); b2 = _f(3, D, R)
        for i in range(CFG.depth_single_blocks):
            sd[f"single_blocks.{i}.linear1.lora_A.weight"] = a1
            sd[f"single_blocks.{i}.linear1.lora_B.weight"] = b1
            sd[f"single_blocks.{i}.linear2.lora_A.weight"] = a2
            sd[f"single_blocks.{i}.linear2.lora_B.weight"] = b2
        lora = convert_lora_state_dict(sd, CFG)
        params = init_flux_params(jax.random.PRNGKey(1), CFG, jnp.float32)
        merged = merge_lora(params, lora)

        d1 = _delta(a1, b1)  # [D, 3D + M]
        d2 = _delta(a2, b2)  # [D + M, D]
        i = 0
        got_qkv = (
            np.asarray(merged["single"]["qkv"]["w"][i], np.float32)
            - np.asarray(params["single"]["qkv"]["w"][i], np.float32)
        ).reshape(D, 3 * D)
        np.testing.assert_allclose(got_qkv, d1[:, : 3 * D], atol=1e-5)
        got_mlp_in = np.asarray(merged["single"]["mlp_in"]["w"][i]) - np.asarray(
            params["single"]["mlp_in"]["w"][i]
        )
        np.testing.assert_allclose(got_mlp_in, d1[:, 3 * D :], atol=1e-5)
        got_proj = np.asarray(merged["single"]["proj"]["w"][i]) - np.asarray(
            params["single"]["proj"]["w"][i]
        )
        np.testing.assert_allclose(got_proj, d2[:D], atol=1e-5)
        got_mlp_out = np.asarray(merged["single"]["mlp_out"]["w"][i]) - np.asarray(
            params["single"]["mlp_out"]["w"][i]
        )
        np.testing.assert_allclose(got_mlp_out, d2[D:], atol=1e-5)

    def test_kohya_naming_matches_bfl(self):
        a = _f(0, R, D); b = _f(1, D, R)
        bfl = {
            "double_blocks.1.img_attn.proj.lora_A.weight": a,
            "double_blocks.1.img_attn.proj.lora_B.weight": b,
            "double_blocks.1.img_attn.proj.alpha": np.float32(2.0),
        }
        kohya = {
            "lora_unet_double_blocks_1_img_attn_proj.lora_down.weight": a,
            "lora_unet_double_blocks_1_img_attn_proj.lora_up.weight": b,
            "lora_unet_double_blocks_1_img_attn_proj.alpha": np.float32(2.0),
        }
        la, lb = convert_lora_state_dict(bfl, CFG), convert_lora_state_dict(kohya, CFG)
        for leaf in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(la["double"]["img_proj"][leaf]),
                np.asarray(lb["double"]["img_proj"][leaf]),
            )

    def test_diffusers_qkv_thirds_and_proj_out_split(self):
        """Separate to_q/to_k/to_v land in the fused qkv as a block-diagonal
        factor; single-block proj_out splits rows like linear2."""
        aq = _f(0, R, D); bq = _f(1, D, R)
        av = _f(2, R, D); bv = _f(3, D, R)
        ap = _f(4, R, D + M); bp = _f(5, D, R)
        sd = {
            "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": aq,
            "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": bq,
            "transformer.transformer_blocks.0.attn.to_v.lora_A.weight": av,
            "transformer.transformer_blocks.0.attn.to_v.lora_B.weight": bv,
            "single_transformer_blocks.1.proj_out.lora_A.weight": ap,
            "single_transformer_blocks.1.proj_out.lora_B.weight": bp,
            # text-encoder adapters in a combined file are skipped
            "text_encoder.layers.0.fc1.lora_A.weight": _f(6, R, 8),
            "text_encoder.layers.0.fc1.lora_B.weight": _f(7, 8, R),
        }
        lora = convert_lora_state_dict(sd, CFG)
        params = init_flux_params(jax.random.PRNGKey(2), CFG, jnp.float32)
        merged = merge_lora(params, lora)

        got = (
            np.asarray(merged["double"]["img_qkv"]["w"][0], np.float32)
            - np.asarray(params["double"]["img_qkv"]["w"][0], np.float32)
        ).reshape(D, 3 * D)
        np.testing.assert_allclose(got[:, :D], _delta(aq, bq), atol=1e-5)
        np.testing.assert_allclose(got[:, D : 2 * D], np.zeros((D, D)), atol=1e-7)
        np.testing.assert_allclose(got[:, 2 * D :], _delta(av, bv), atol=1e-5)
        # layer 1 untouched by the qkv adapter
        np.testing.assert_array_equal(
            np.asarray(merged["double"]["img_qkv"]["w"][1]),
            np.asarray(params["double"]["img_qkv"]["w"][1]),
        )
        dp = _delta(ap, bp)
        got_proj = np.asarray(merged["single"]["proj"]["w"][1]) - np.asarray(
            params["single"]["proj"]["w"][1]
        )
        np.testing.assert_allclose(got_proj, dp[:D], atol=1e-5)
        got_mlp_out = np.asarray(merged["single"]["mlp_out"]["w"][1]) - np.asarray(
            params["single"]["mlp_out"]["w"][1]
        )
        np.testing.assert_allclose(got_mlp_out, dp[D:], atol=1e-5)

    def test_strict_raises_on_unknown_module(self):
        sd = {
            "double_blocks.0.bogus.lora_A.weight": _f(0, R, D),
            "double_blocks.0.bogus.lora_B.weight": _f(1, D, R),
        }
        with pytest.raises(ValueError):
            convert_lora_state_dict(sd, CFG)
        assert convert_lora_state_dict(sd, CFG, strict=False) == {
            "double": {}, "single": {}
        }

    def test_int8_merge_tracks_bf16_merge(self):
        from conceptattention_tpu.ops.quant import quantize_flux_params

        sd = {
            "double_blocks.0.img_mlp.0.lora_A.weight": _f(0, R, D) * 0.05,
            "double_blocks.0.img_mlp.0.lora_B.weight": _f(1, M, R) * 0.05,
        }
        lora = convert_lora_state_dict(sd, CFG)
        params = init_flux_params(jax.random.PRNGKey(3), CFG, jnp.float32)
        qparams = quantize_flux_params(params, min_size=0, act_quant=True)

        merged_f = merge_lora(params, lora)
        merged_q = merge_lora(qparams, lora)
        wq = merged_q["double"]["img_mlp_in"]["w"]
        assert set(wq.keys()) == {"qa", "scale"}
        deq = np.asarray(wq["qa"], np.float32) * np.asarray(wq["scale"], np.float32)
        ref = np.asarray(merged_f["double"]["img_mlp_in"]["w"], np.float32)
        # int8 per-channel quantization error bound: scale/2 per element
        tol = np.abs(ref).max() / 127.0
        assert np.max(np.abs(deq - ref)) <= tol


class TestForwardAndPipeline:
    def test_forward_changes_and_strength_zero_identity(self):
        from conceptattention_tpu.models.flux.dit import flux_forward
        from conceptattention_tpu.ops.packing import make_img_ids

        sd = {
            "double_blocks.0.img_attn.qkv.lora_A.weight": _f(0, R, D),
            "double_blocks.0.img_attn.qkv.lora_B.weight": _f(1, 3 * D, R),
        }
        lora = convert_lora_state_dict(sd, CFG)
        params = init_flux_params(jax.random.PRNGKey(4), CFG, jnp.float32)

        b, p, t = 1, 16, 4
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        args = dict(
            img=jax.random.normal(ks[0], (b, p, CFG.in_channels)),
            img_ids=make_img_ids(4, 4, b),
            txt=jax.random.normal(ks[1], (b, t, CFG.context_in_dim)),
            txt_ids=jnp.zeros((b, t, 3)),
            timesteps=jnp.full((b,), 0.5),
            y=jax.random.normal(ks[2], (b, CFG.vec_in_dim)),
        )
        base, _ = flux_forward(params, CFG, **args)
        merged0 = merge_lora(params, lora, strength=0.0)
        out0, _ = flux_forward(merged0, CFG, **args)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)
        merged1 = merge_lora(params, lora, strength=1.0)
        out1, _ = flux_forward(merged1, CFG, **args)
        assert np.max(np.abs(np.asarray(out1) - np.asarray(base))) > 1e-3

    def test_pipeline_lora_argument(self):
        from conceptattention_tpu.pipeline.concept_pipeline import (
            ConceptAttentionFluxPipeline,
        )

        sd = {
            "double_blocks.0.img_attn.proj.lora_A.weight": _f(0, R, D),
            "double_blocks.0.img_attn.proj.lora_B.weight": _f(1, D, R),
        }
        lora = convert_lora_state_dict(sd, CFG)
        plain = ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)
        adapted = ConceptAttentionFluxPipeline(
            "flux-tiny", dtype=jnp.float32, lora=lora, lora_strength=0.5
        )
        d = np.asarray(
            adapted.params["double"]["img_proj"]["w"], np.float32
        ) - np.asarray(plain.params["double"]["img_proj"]["w"], np.float32)
        expected = 0.5 * _delta(np.asarray(sd[
            "double_blocks.0.img_attn.proj.lora_A.weight"
        ]), np.asarray(sd["double_blocks.0.img_attn.proj.lora_B.weight"]))
        np.testing.assert_allclose(d[0], expected, atol=2e-3)  # bf16-free tiny
        np.testing.assert_allclose(d[1], 0.0, atol=1e-7)


class TestTraining:
    def test_lora_train_step_decreases_loss_base_frozen(self):
        import optax

        from conceptattention_tpu.ops.packing import make_img_ids
        from conceptattention_tpu.training.lora import (
            init_lora_params,
            lora_flow_matching_loss,
            make_lora_train_step,
        )

        params = init_flux_params(jax.random.PRNGKey(6), CFG, jnp.float32)
        lora = init_lora_params(jax.random.PRNGKey(7), params, rank=R)
        assert set(lora["double"]) == {
            "img_qkv", "img_proj", "img_mlp_in", "img_mlp_out",
            "txt_qkv", "txt_proj", "txt_mlp_in", "txt_mlp_out",
        }
        assert set(lora["single"]) == {"qkv", "proj", "mlp_in", "mlp_out"}

        b, p, t = 2, 16, 4
        ks = jax.random.split(jax.random.PRNGKey(8), 4)
        batch = {
            "img": jax.random.normal(ks[0], (b, p, CFG.in_channels)),
            "img_ids": make_img_ids(4, 4, b),
            "txt": jax.random.normal(ks[1], (b, t, CFG.context_in_dim)),
            "txt_ids": jnp.zeros((b, t, 3)),
            "y": jax.random.normal(ks[2], (b, CFG.vec_in_dim)),
        }
        key = jax.random.PRNGKey(9)

        # b = 0 -> the adapter is a no-op: loss equals the base loss exactly
        from conceptattention_tpu.training.train_step import flow_matching_loss

        l_base = float(flow_matching_loss(params, CFG, batch, key))
        l_lora = float(lora_flow_matching_loss(lora, params, CFG, batch, key))
        assert abs(l_base - l_lora) < 1e-5

        tx = optax.adam(1e-3)
        step = make_lora_train_step(CFG, tx, donate=False)
        opt_state = tx.init(lora)
        losses = []
        for i in range(8):
            lora, opt_state, loss = step(
                lora, opt_state, params, batch, key  # fixed batch+key: must fit
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # adapters actually moved (b no longer zero)
        assert float(jnp.abs(lora["double"]["img_qkv"]["b"]).max()) > 0

    @pytest.mark.parametrize("mode", ["w8", "w8a8", "w4"])
    def test_quantized_base_gradients_match_fp(self, mode):
        """Adapter gradients on a quantized base must track the fp-base
        gradients (regression: merging with requantize-in-kind zeroed
        ~7/8 of the tangent at the int cast and bent the rest — lora_loss
        now merges with requantize=False)."""
        from conceptattention_tpu.ops.packing import make_img_ids
        from conceptattention_tpu.ops.quant import quantize_flux_params
        from conceptattention_tpu.training.lora import (
            init_lora_params,
            lora_flow_matching_loss,
        )

        params = init_flux_params(jax.random.PRNGKey(6), CFG, jnp.float32)
        qparams = quantize_flux_params(params, min_size=0, mode=mode, group_size=8)
        lora = init_lora_params(jax.random.PRNGKey(7), params, rank=R)
        # move off the b=0 saddle so gradients are generic
        lora = jax.tree.map(lambda x: x + 0.02 if x.ndim == 3 else x, lora)

        b, p, t = 1, 16, 4
        ks = jax.random.split(jax.random.PRNGKey(8), 4)
        batch = {
            "img": jax.random.normal(ks[0], (b, p, CFG.in_channels)),
            "img_ids": make_img_ids(4, 4, b),
            "txt": jax.random.normal(ks[1], (b, t, CFG.context_in_dim)),
            "txt_ids": jnp.zeros((b, t, 3)),
            "y": jax.random.normal(ks[2], (b, CFG.vec_in_dim)),
        }
        key = jax.random.PRNGKey(9)
        gfn = jax.grad(lora_flow_matching_loss)
        g_fp = gfn(lora, params, CFG, batch, key)
        g_q = gfn(lora, qparams, CFG, batch, key)

        a = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(g_fp)])
        b_ = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree.leaves(g_q)])
        # dense gradient (no zeroed tangent) ...
        assert (np.abs(b_) > 0).mean() > 0.9, "quantized-base grad is sparse"
        # ... pointing the same way as the fp-base gradient
        cos = (a @ b_) / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-12)
        assert cos > 0.95, f"grad cosine vs fp base: {cos:.3f}"


class TestExportRoundTrip:
    def test_export_import_merge_equal(self):
        import optax

        from conceptattention_tpu.training.lora import (
            export_lora_state_dict,
            init_lora_params,
        )

        params = init_flux_params(jax.random.PRNGKey(10), CFG, jnp.float32)
        lora = init_lora_params(jax.random.PRNGKey(11), params, rank=R)
        # give b nonzero values so the round trip is non-trivial
        lora = jax.tree.map(
            lambda x: x + 0.01 * jax.random.normal(
                jax.random.PRNGKey(12), x.shape
            ),
            lora,
        )
        sd = export_lora_state_dict(lora)
        back = convert_lora_state_dict(sd, CFG)
        m1 = merge_lora(params, lora)
        m2 = merge_lora(params, back)
        for stack in ("double", "single"):
            for leaf in lora[stack]:
                np.testing.assert_allclose(
                    np.asarray(m1[stack][leaf]["w"], np.float32),
                    np.asarray(m2[stack][leaf]["w"], np.float32),
                    atol=1e-5,
                    err_msg=f"{stack}.{leaf}",
                )

    def test_video_cogvideox_lora(self):
        """diffusers-named CogVideoX adapters merge into the video DiT param
        stack (to_q/k/v -> fused [D, 3D] qkv thirds, dotted norm1.lin leaf)."""
        from conceptattention_tpu.models.video.dit import (
            CogVideoXConfig,
            init_video_dit_params,
        )
        from conceptattention_tpu.weights.lora import (
            convert_cogvideox_lora_state_dict,
        )

        cfg = CogVideoXConfig(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, time_embed_dim=8, text_embed_dim=16, num_layers=2,
            sample_width=8, sample_height=8, sample_frames=9, patch_size=2,
            max_text_seq_length=6,
        )
        d = cfg.num_attention_heads * cfg.attention_head_dim  # 32
        aq = _f(0, R, d); bq = _f(1, d, R)
        ak = _f(2, R, d); bk = _f(3, d, R)
        sd = {
            "transformer.transformer_blocks.1.attn1.to_q.lora_A.weight": aq,
            "transformer.transformer_blocks.1.attn1.to_q.lora_B.weight": bq,
            "transformer.transformer_blocks.1.attn1.to_k.lora_A.weight": ak,
            "transformer.transformer_blocks.1.attn1.to_k.lora_B.weight": bk,
        }
        lora = convert_cogvideox_lora_state_dict(sd, cfg)
        params = init_video_dit_params(jax.random.PRNGKey(14), cfg, jnp.float32)
        merged = merge_lora(params, lora)

        got = np.asarray(merged["blocks"]["qkv"]["w"][1], np.float32) - np.asarray(
            params["blocks"]["qkv"]["w"][1], np.float32
        )
        np.testing.assert_allclose(got[:, :d], _delta(aq, bq), atol=1e-5)
        np.testing.assert_allclose(got[:, d : 2 * d], _delta(ak, bk), atol=1e-5)
        np.testing.assert_allclose(got[:, 2 * d :], 0.0, atol=1e-7)
        # layer 0 untouched; other leaves untouched by reference
        np.testing.assert_array_equal(
            np.asarray(merged["blocks"]["qkv"]["w"][0]),
            np.asarray(params["blocks"]["qkv"]["w"][0]),
        )
        assert merged["blocks"]["proj"] is params["blocks"]["proj"]

        # dotted nested leaf (norm1.lin) merges through the path walker
        # (CogVideoX AdaLN: linear maps temb [time_embed_dim] -> gate chunks)
        n_in = params["blocks"]["norm1"]["lin"]["w"].shape[1]
        n_out = params["blocks"]["norm1"]["lin"]["w"].shape[-1]
        an = _f(4, R, n_in)
        bn = _f(5, n_out, R)
        sd2 = {
            "transformer_blocks.0.norm1.linear.lora_A.weight": an,
            "transformer_blocks.0.norm1.linear.lora_B.weight": bn,
        }
        lora2 = convert_cogvideox_lora_state_dict(sd2, cfg)
        merged2 = merge_lora(params, lora2)
        got2 = np.asarray(
            merged2["blocks"]["norm1"]["lin"]["w"][0], np.float32
        ) - np.asarray(params["blocks"]["norm1"]["lin"]["w"][0], np.float32)
        np.testing.assert_allclose(got2, _delta(an, bn), atol=1e-5)
        assert merged2["blocks"]["norm1"]["ln"] is params["blocks"]["norm1"]["ln"]

    def test_video_pipeline_lora_argument(self):
        from conceptattention_tpu.models.video.dit import CogVideoXConfig
        from conceptattention_tpu.pipeline.video_pipeline import (
            VideoConceptAttentionPipeline,
        )
        from conceptattention_tpu.weights.lora import (
            convert_cogvideox_lora_state_dict,
        )

        cfg = CogVideoXConfig(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, time_embed_dim=8, text_embed_dim=16, num_layers=2,
            sample_width=8, sample_height=8, sample_frames=9, patch_size=2,
            max_text_seq_length=6,
        )
        d = 32
        sd = {
            "transformer_blocks.0.attn1.to_out.0.lora_A.weight": _f(0, R, d),
            "transformer_blocks.0.attn1.to_out.0.lora_B.weight": _f(1, d, R),
        }
        lora = convert_cogvideox_lora_state_dict(sd, cfg)
        plain = VideoConceptAttentionPipeline(cfg, dtype=jnp.float32, init_seed=3)
        adapted = VideoConceptAttentionPipeline(
            cfg, dtype=jnp.float32, init_seed=3, lora=lora, lora_strength=0.5
        )
        diff = np.asarray(
            adapted.params["blocks"]["proj"]["w"][0], np.float32
        ) - np.asarray(plain.params["blocks"]["proj"]["w"][0], np.float32)
        np.testing.assert_allclose(
            diff,
            0.5 * _delta(np.asarray(sd[
                "transformer_blocks.0.attn1.to_out.0.lora_A.weight"
            ]), np.asarray(sd[
                "transformer_blocks.0.attn1.to_out.0.lora_B.weight"
            ])),
            atol=1e-5,
        )

    def test_merge_loras_stacks_additively(self):
        sd1 = {
            "double_blocks.0.img_attn.proj.lora_A.weight": _f(0, R, D),
            "double_blocks.0.img_attn.proj.lora_B.weight": _f(1, D, R),
        }
        sd2 = {
            "double_blocks.0.img_attn.proj.lora_A.weight": _f(2, R, D),
            "double_blocks.0.img_attn.proj.lora_B.weight": _f(3, D, R),
        }
        l1 = convert_lora_state_dict(sd1, CFG)
        l2 = convert_lora_state_dict(sd2, CFG)
        params = init_flux_params(jax.random.PRNGKey(13), CFG, jnp.float32)
        both = merge_loras(params, [l1, l2], [0.3, 0.7])
        manual = merge_lora(merge_lora(params, l1, 0.3), l2, 0.7)
        np.testing.assert_allclose(
            np.asarray(both["double"]["img_proj"]["w"]),
            np.asarray(manual["double"]["img_proj"]["w"]),
            atol=1e-6,
        )
