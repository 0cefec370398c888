"""CogVideoX video DiT parity + scheduler + video pipeline tests.

The reference's video model (`experiments/video_model/cogvideox/
modified_dit.py`, `modified_attention_layer.py`) subclasses diffusers'
CogVideoXTransformer3DModel; diffusers is NOT installed in this image (and
cannot be fetched), so the reference class itself is unimportable. Parity is
therefore tested against `_TorchCogVideoXOracle` below — a from-scratch torch
replication of the diffusers math (CogVideoXPatchEmbed, get_timestep_embedding,
CogVideoXLayerNormZero, per-head LayerNorm qk-norm, 3D rope on the video
segment, AdaLayerNorm(chunk_dim=1) output head) with the reference's concept
modifications — exported through `convert_cogvideox_state_dict` using the
published diffusers state-dict key layout.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F_t
from torch import nn

from conceptattention_tpu.models.video.dit import (
    CogVideoXConfig,
    init_video_dit_params,
    make_video_ids,
    video_dit_forward,
)
from conceptattention_tpu.pipeline.video_pipeline import VideoConceptAttentionPipeline
from conceptattention_tpu.sampling.ddim import add_noise, ddim_step, make_ddim_schedule
from conceptattention_tpu.weights.convert import convert_cogvideox_state_dict

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,  # rope axes (4, 6, 6) must all be even
    in_channels=4,
    out_channels=4,
    time_embed_dim=8,
    text_embed_dim=16,
    num_layers=2,
    sample_width=8,
    sample_height=8,
    sample_frames=9,  # -> 3 latent frames
    patch_size=2,
    max_text_seq_length=6,
)
B, T_LEN, C_TOK = 2, 6, 3
F_LAT, H_LAT, W_LAT = 3, 8, 8
P_TOKENS = F_LAT * (H_LAT // 2) * (W_LAT // 2)


# ------------------------------------------------------------- oracle ----
def _timestep_embedding_t(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([args.sin(), args.cos()], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip_sin_to_cos


def _rope_tables_t(cfg, f, h, w):
    """get_3d_rotary_pos_embed: per-axis 1D rope freqs, concat (t, h, w),
    cos/sin repeat_interleave(2)."""
    dims = (cfg.attention_head_dim // 4,) + (3 * cfg.attention_head_dim // 8,) * 2
    grids = (torch.arange(f).float(), torch.arange(h).float(), torch.arange(w).float())
    parts_cos, parts_sin = [], []
    fg, hg, wg = torch.meshgrid(*grids, indexing="ij")
    coords = (fg.reshape(-1), hg.reshape(-1), wg.reshape(-1))
    for dim, pos in zip(dims, coords):
        freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
        angles = pos[:, None] * freqs[None]
        parts_cos.append(angles.cos().repeat_interleave(2, dim=-1))
        parts_sin.append(angles.sin().repeat_interleave(2, dim=-1))
    return torch.cat(parts_cos, -1), torch.cat(parts_sin, -1)  # [L, D]


def _apply_rope_t(x, cos, sin):
    """diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1):
    interleaved pairs. x [B, H, L, D]; cos/sin [L, D]."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = torch.stack([-x2, x1], dim=-1).reshape(x.shape)
    return x.float() * cos + rotated.float() * sin


def _sincos_1d_t(dim, pos):
    omega = 1.0 / (10000.0 ** (torch.arange(dim // 2).float() / (dim / 2.0)))
    out = pos.reshape(-1)[:, None] * omega[None]
    return torch.cat([out.sin(), out.cos()], dim=-1)


def _pos_embedding_t(cfg):
    d = cfg.hidden_size
    p = cfg.patch_size
    h, w = cfg.sample_height // p, cfg.sample_width // p
    f = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
    d_s, d_t = d // 4 * 3, d // 4
    gh = torch.arange(h).float() / cfg.spatial_interpolation_scale
    gw = torch.arange(w).float() / cfg.spatial_interpolation_scale
    gt = torch.arange(f).float() / cfg.temporal_interpolation_scale
    wg, hg = torch.meshgrid(gw, gh, indexing="xy")
    # diffusers puts f(grid[0]) = f(w-mesh) first (its "emb_h" is computed on
    # the W mesh because grid = meshgrid(grid_w, grid_h)).
    spatial = torch.cat([_sincos_1d_t(d_s // 2, wg), _sincos_1d_t(d_s // 2, hg)], -1)
    temporal = _sincos_1d_t(d_t, gt)
    joint = torch.cat(
        [temporal[:, None].expand(f, h * w, d_t), spatial[None].expand(f, h * w, d_s)],
        dim=-1,
    ).reshape(1, f * h * w, d)
    return torch.cat([torch.zeros(1, cfg.max_text_seq_length, d), joint], dim=1)


class _Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, te, hd = cfg.hidden_size, cfg.time_embed_dim, cfg.attention_head_dim
        self.heads = cfg.num_attention_heads
        self.norm1_norm = nn.LayerNorm(d, eps=cfg.norm_eps)
        self.norm1_lin = nn.Linear(te, 6 * d)
        self.to_q = nn.Linear(d, d)
        self.to_k = nn.Linear(d, d)
        self.to_v = nn.Linear(d, d)
        self.norm_q = nn.LayerNorm(hd, eps=1e-6)
        self.norm_k = nn.LayerNorm(hd, eps=1e-6)
        self.to_out = nn.Linear(d, d)
        self.norm2_norm = nn.LayerNorm(d, eps=cfg.norm_eps)
        self.norm2_lin = nn.Linear(te, 6 * d)
        self.ff1 = nn.Linear(d, 4 * d)
        self.ff2 = nn.Linear(4 * d, d)

    def _norm_zero(self, norm, lin, temb, hidden, other):
        sh, sc, g, osh, osc, og = lin(F_t.silu(temb)).chunk(6, dim=1)
        nh = norm(hidden) * (1 + sc)[:, None] + sh[:, None]
        no = norm(other) * (1 + osc)[:, None] + osh[:, None]
        return nh, no, g[:, None], og[:, None]

    def _heads(self, x):
        b, l, d = x.shape
        return x.view(b, l, self.heads, -1).transpose(1, 2)

    def _ff(self, x):
        return self.ff2(F_t.gelu(self.ff1(x), approximate="tanh"))

    def forward(self, video, text, concepts, temb, rope):
        t_len = text.shape[1]
        n_vid, n_txt, v_g, t_g = self._norm_zero(
            self.norm1_norm, self.norm1_lin, temb, video, text
        )
        _, n_con, _, c_g = self._norm_zero(
            self.norm1_norm, self.norm1_lin, temb, video, concepts
        )

        joint = torch.cat([n_txt, n_vid], dim=1)
        q = self.norm_q(self._heads(self.to_q(joint)))
        k = self.norm_k(self._heads(self.to_k(joint)))
        v = self._heads(self.to_v(joint))
        cq = self.norm_q(self._heads(self.to_q(n_con)))
        ck = self.norm_k(self._heads(self.to_k(n_con)))
        cv = self._heads(self.to_v(n_con))

        if rope is not None:
            cos, sin = rope
            q = torch.cat([q[:, :, :t_len], _apply_rope_t(q[:, :, t_len:], cos, sin)], 2)
            k = torch.cat([k[:, :, :t_len], _apply_rope_t(k[:, :, t_len:], cos, sin)], 2)

        attn = F_t.scaled_dot_product_attention(q, k, v)
        img_q, img_k, img_v = q[:, :, t_len:], k[:, :, t_len:], v[:, :, t_len:]
        cattn = F_t.scaled_dot_product_attention(
            torch.cat([cq, img_q], 2), torch.cat([ck, img_k], 2),
            torch.cat([cv, img_v], 2),
        )[:, :, : concepts.shape[1]]

        # cross maps: ROPED image q x un-roped concept k, mean over heads
        # (modified_attention_layer.py:108-122).
        cross = torch.einsum("bhpd,bhcd->bhcp", img_q, ck).mean(dim=1)

        def merge(x):
            return x.transpose(1, 2).reshape(x.shape[0], x.shape[2], -1)

        out = merge(attn)
        c_out = merge(cattn)
        # output maps: merged-head outputs dot product (:125-131).
        omap = torch.einsum("bcd,bpd->bcp", c_out, out[:, t_len:])

        video = video + v_g * self.to_out(out)[:, t_len:]
        text = text + t_g * self.to_out(out)[:, :t_len]
        concepts = concepts + c_g * self.to_out(c_out)

        _, n_con, _, c_gf = self._norm_zero(
            self.norm2_norm, self.norm2_lin, temb, video, concepts
        )
        concepts = concepts + c_gf * self._ff(n_con)

        n_vid, n_txt, v_gf, t_gf = self._norm_zero(
            self.norm2_norm, self.norm2_lin, temb, video, text
        )
        ff = self._ff(torch.cat([n_txt, n_vid], dim=1))
        video = video + v_gf * ff[:, t_len:]
        text = text + t_gf * ff[:, :t_len]
        return video, text, concepts, omap, cross


class _TorchCogVideoXOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d, te = cfg.hidden_size, cfg.time_embed_dim
        self.patch_proj = nn.Conv2d(
            cfg.in_channels, d, cfg.patch_size, cfg.patch_size
        )
        self.text_proj = nn.Linear(cfg.text_embed_dim, d)
        self.time_lin1 = nn.Linear(d, te)
        self.time_lin2 = nn.Linear(te, te)
        self.blocks = nn.ModuleList([_Block(cfg) for _ in range(cfg.num_layers)])
        self.norm_final = nn.LayerNorm(d, eps=cfg.norm_eps)
        self.norm_out_norm = nn.LayerNorm(d, eps=cfg.norm_eps)
        self.norm_out_lin = nn.Linear(te, 2 * d)
        self.proj_out = nn.Linear(
            d, cfg.patch_size * cfg.patch_size * cfg.out_channels
        )

    def diffusers_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.patch_proj.weight,
            "patch_embed.proj.bias": self.patch_proj.bias,
            "patch_embed.text_proj.weight": self.text_proj.weight,
            "patch_embed.text_proj.bias": self.text_proj.bias,
            "time_embedding.linear_1.weight": self.time_lin1.weight,
            "time_embedding.linear_1.bias": self.time_lin1.bias,
            "time_embedding.linear_2.weight": self.time_lin2.weight,
            "time_embedding.linear_2.bias": self.time_lin2.bias,
            "norm_final.weight": self.norm_final.weight,
            "norm_final.bias": self.norm_final.bias,
            "norm_out.norm.weight": self.norm_out_norm.weight,
            "norm_out.norm.bias": self.norm_out_norm.bias,
            "norm_out.linear.weight": self.norm_out_lin.weight,
            "norm_out.linear.bias": self.norm_out_lin.bias,
            "proj_out.weight": self.proj_out.weight,
            "proj_out.bias": self.proj_out.bias,
        }
        for i, blk in enumerate(self.blocks):
            base = f"transformer_blocks.{i}"
            sd.update({
                f"{base}.norm1.norm.weight": blk.norm1_norm.weight,
                f"{base}.norm1.norm.bias": blk.norm1_norm.bias,
                f"{base}.norm1.linear.weight": blk.norm1_lin.weight,
                f"{base}.norm1.linear.bias": blk.norm1_lin.bias,
                f"{base}.norm2.norm.weight": blk.norm2_norm.weight,
                f"{base}.norm2.norm.bias": blk.norm2_norm.bias,
                f"{base}.norm2.linear.weight": blk.norm2_lin.weight,
                f"{base}.norm2.linear.bias": blk.norm2_lin.bias,
                f"{base}.attn1.to_q.weight": blk.to_q.weight,
                f"{base}.attn1.to_q.bias": blk.to_q.bias,
                f"{base}.attn1.to_k.weight": blk.to_k.weight,
                f"{base}.attn1.to_k.bias": blk.to_k.bias,
                f"{base}.attn1.to_v.weight": blk.to_v.weight,
                f"{base}.attn1.to_v.bias": blk.to_v.bias,
                f"{base}.attn1.norm_q.weight": blk.norm_q.weight,
                f"{base}.attn1.norm_q.bias": blk.norm_q.bias,
                f"{base}.attn1.norm_k.weight": blk.norm_k.weight,
                f"{base}.attn1.norm_k.bias": blk.norm_k.bias,
                f"{base}.attn1.to_out.0.weight": blk.to_out.weight,
                f"{base}.attn1.to_out.0.bias": blk.to_out.bias,
                f"{base}.ff.net.0.proj.weight": blk.ff1.weight,
                f"{base}.ff.net.0.proj.bias": blk.ff1.bias,
                f"{base}.ff.net.2.weight": blk.ff2.weight,
                f"{base}.ff.net.2.bias": blk.ff2.bias,
            })
        return {k: v.detach() for k, v in sd.items()}

    @torch.no_grad()
    def forward(self, video, text, concepts, timestep):
        cfg = self.cfg
        b, f, c, h, w = video.shape
        p = cfg.patch_size
        temb = self.time_lin2(F_t.silu(self.time_lin1(
            _timestep_embedding_t(timestep, cfg.hidden_size)
        )))
        tokens = self.patch_proj(video.reshape(b * f, c, h, w))
        tokens = tokens.flatten(2).transpose(1, 2).reshape(b, -1, cfg.hidden_size)
        text = self.text_proj(text)
        concepts = self.text_proj(concepts)

        if cfg.use_rotary_positional_embeddings:
            rope = _rope_tables_t(cfg, f, h // p, w // p)
        else:
            rope = None
            pos = _pos_embedding_t(cfg)
            tokens = tokens + pos[:, cfg.max_text_seq_length : cfg.max_text_seq_length + tokens.shape[1]]
            text = text + pos[:, : text.shape[1]]
            concepts = concepts + pos[:, : concepts.shape[1]]

        omaps, cmaps = [], []
        for blk in self.blocks:
            tokens, text, concepts, om, cm = blk(tokens, text, concepts, temb, rope)
            omaps.append(om)
            cmaps.append(cm)

        tokens = self.norm_final(tokens)
        sh, sc = self.norm_out_lin(F_t.silu(temb)).chunk(2, dim=1)
        tokens = self.norm_out_norm(tokens) * (1 + sc)[:, None] + sh[:, None]
        tokens = self.proj_out(tokens)
        out = tokens.reshape(b, f, h // p, w // p, -1, p, p)
        out = out.permute(0, 1, 4, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)
        return out, torch.stack(omaps), torch.stack(cmaps)  # maps [L, B, C, P]


# ------------------------------------------------------------- fixtures ----
@pytest.fixture(scope="module", params=[True, False], ids=["rotary-5b", "sincos-2b"])
def oracle_pair(request):
    cfg = CogVideoXConfig(use_rotary_positional_embeddings=request.param, **TINY)
    torch.manual_seed(5)
    oracle = _TorchCogVideoXOracle(cfg).float().eval()
    params = convert_cogvideox_state_dict(
        oracle.diffusers_state_dict(), cfg, dtype=jnp.float32
    )
    return cfg, oracle, params


@pytest.fixture(scope="module")
def vid_inputs():
    torch.manual_seed(9)
    return dict(
        video=torch.randn(B, F_LAT, TINY["in_channels"], H_LAT, W_LAT),
        text=torch.randn(B, T_LEN, TINY["text_embed_dim"]),
        concepts=torch.randn(B, C_TOK, TINY["text_embed_dim"]),
        timestep=torch.tensor([999.0, 500.0][:B]),
    )


def _j(x):
    return jnp.asarray(x.numpy(), jnp.float32)


# ----------------------------------------------------------------- tests ----
class TestCogVideoXParity:
    def test_pos_embed_puts_w_axis_first(self):
        """diffusers' get_2d_sincos_pos_embed_from_grid feeds grid[0] — the W
        mesh — into the FIRST spatial half (its 'emb_h' name is misleading);
        the published CogVideoX-2B weights depend on that layout. On a
        non-square grid, tokens differing only in w must differ in the first
        half and be identical in the second half."""
        from conceptattention_tpu.models.video.dit import (
            CogVideoXConfig, cogvideox_pos_embedding,
        )

        cfg = CogVideoXConfig(
            num_layers=1, num_attention_heads=2, attention_head_dim=8,
            time_embed_dim=8, text_embed_dim=8,
            sample_height=12, sample_width=8, sample_frames=9,
            patch_size=2, max_text_seq_length=3, use_rotary_positional_embeddings=False,
        )
        pos = np.asarray(cogvideox_pos_embedding(cfg))[0]
        t0 = cfg.max_text_seq_length  # first video token: (f=0, h=0, w=0)
        d = cfg.hidden_size
        d_t = d // 4
        d_half = (d - d_t) // 2
        w_tokens = cfg.sample_width // cfg.patch_size
        same_h_next_w = pos[t0 + 1]
        next_h_same_w = pos[t0 + w_tokens]
        base = pos[t0]
        first = slice(d_t, d_t + d_half)
        second = slice(d_t + d_half, d)
        # w varies -> first half changes, second half identical
        assert np.abs(same_h_next_w[first] - base[first]).max() > 1e-3
        np.testing.assert_array_equal(same_h_next_w[second], base[second])
        # h varies -> second half changes, first half identical
        np.testing.assert_array_equal(next_h_same_w[first], base[first])
        assert np.abs(next_h_same_w[second] - base[second]).max() > 1e-3

    def test_forward_and_maps(self, oracle_pair, vid_inputs):
        cfg, oracle, params = oracle_pair
        r_pred, r_omaps, r_cmaps = oracle(**vid_inputs)
        j_pred, sal = video_dit_forward(
            params, cfg, _j(vid_inputs["video"]), _j(vid_inputs["text"]),
            _j(vid_inputs["timestep"]), concepts=_j(vid_inputs["concepts"]),
        )
        np.testing.assert_allclose(
            np.asarray(j_pred), r_pred.numpy(), atol=5e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sal["output"]), r_omaps.numpy(), atol=5e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sal["cross_attention"]), r_cmaps.numpy(), atol=5e-5, rtol=1e-4
        )

    def test_concepts_do_not_change_video(self, oracle_pair, vid_inputs):
        cfg, _, params = oracle_pair
        pred_with, _ = video_dit_forward(
            params, cfg, _j(vid_inputs["video"]), _j(vid_inputs["text"]),
            _j(vid_inputs["timestep"]), concepts=_j(vid_inputs["concepts"]),
        )
        pred_without, sal = video_dit_forward(
            params, cfg, _j(vid_inputs["video"]), _j(vid_inputs["text"]),
            _j(vid_inputs["timestep"]),
        )
        np.testing.assert_allclose(
            np.asarray(pred_with), np.asarray(pred_without), rtol=1e-5, atol=1e-6
        )
        assert sal == {}


def test_video_ids_layout():
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


class TestQuantizedVideoDiT:
    @pytest.mark.parametrize("mode", ["w8", "w8a8", "w4"])
    def test_quantized_forward_close_to_fp(self, mode):
        from conceptattention_tpu.models.video.dit import (
            init_video_dit_params,
            video_dit_forward,
        )
        from conceptattention_tpu.ops.quant import quantize_video_dit_params

        cfg = CogVideoXConfig(use_rotary_positional_embeddings=True, **TINY)
        params = init_video_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        # group 8 keeps the tiny config at a production-like group-count
        # ratio for w4 (the default 128 would collapse it to one group per
        # out-channel, the w4 worst case full-size models never hit).
        qparams = quantize_video_dit_params(params, min_size=1, mode=mode, group_size=8)
        qk = {"w8": "q", "w8a8": "qa", "w4": "q4p"}[mode]
        assert qparams["blocks"]["qkv"]["w"][qk].dtype == jnp.int8

        video = jax.random.normal(jax.random.PRNGKey(1), (B, F_LAT, TINY["in_channels"], H_LAT, W_LAT))
        text = jax.random.normal(jax.random.PRNGKey(2), (B, T_LEN, TINY["text_embed_dim"]))
        concepts = jax.random.normal(jax.random.PRNGKey(3), (B, C_TOK, TINY["text_embed_dim"]))
        ts = jnp.asarray([500.0, 200.0])

        pred_fp, sal_fp = video_dit_forward(params, cfg, video, text, ts, concepts=concepts)
        pred_q, sal_q = video_dit_forward(qparams, cfg, video, text, ts, concepts=concepts)
        # int8 is lossy: bounded relative error, not bit equality
        rel = float(
            jnp.linalg.norm(pred_q - pred_fp) / (jnp.linalg.norm(pred_fp) + 1e-9)
        )
        assert rel < 0.12, rel
        assert np.isfinite(np.asarray(sal_q["output"])).all()


class TestVideoPipeline:
    def test_generate_video_heatmaps(self):
        cfg = CogVideoXConfig(use_rotary_positional_embeddings=True, **TINY)
        pipe = VideoConceptAttentionPipeline(cfg=cfg, dtype=jnp.float32)
        out = pipe.generate_video(
            prompt="a dog running",
            concepts=["dog", "grass"],
            num_frames=F_LAT, height=H_LAT, width=W_LAT,
            num_inference_steps=3,
            layer_indices=[0, 1],
            return_cross_attention=True,
            seed=1,
        )
        assert out.concept_heatmaps.shape == (2, F_LAT, H_LAT // 2, W_LAT // 2)
        assert np.isfinite(out.concept_heatmaps).all()
        # in-model softmax over padded slots: maps are proper sub-distributions
        assert (out.concept_heatmaps >= 0).all()
        assert out.concept_heatmaps.sum(axis=0).max() <= 1.0 + 1e-5
        assert out.cross_attention_maps.shape == (2, F_LAT, H_LAT // 2, W_LAT // 2)
        assert out.video_latents.shape == (1, F_LAT, TINY["in_channels"], H_LAT, W_LAT)

    def test_generate_video_decodes_pixels(self):
        from conceptattention_tpu.models.video.vae import CogVideoXVAEConfig

        cfg = CogVideoXConfig(use_rotary_positional_embeddings=True, **TINY)
        vae_cfg = CogVideoXVAEConfig(
            block_out_channels=(8, 16, 16),
            latent_channels=TINY["in_channels"],
            layers_per_block=1,
            norm_num_groups=4,
        )
        pipe = VideoConceptAttentionPipeline(
            cfg=cfg, dtype=jnp.float32, vae_cfg=vae_cfg
        )
        out = pipe.generate_video(
            prompt="a dog", concepts=["dog"],
            num_frames=F_LAT, height=H_LAT, width=W_LAT,
            num_inference_steps=1, seed=3, decode=True,
        )
        # 3 latent frames -> 1 + 2*4 = 9 pixel frames; 2^(n_blocks-1) spatial
        s = 2 ** (len(vae_cfg.block_out_channels) - 1)
        assert out.video_frames.shape == (1 + (F_LAT - 1) * 4, H_LAT * s, W_LAT * s, 3)
        assert out.video_frames.dtype == np.uint8


class TestDPM:
    def test_dpm_epsilon_roundtrip_one_step(self):
        from conceptattention_tpu.sampling.dpm import dpm_init, dpm_step, make_dpm_schedule

        s = make_dpm_schedule(1, prediction_type="epsilon")
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
        eps = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
        t = s.timesteps[0]
        x_t = add_noise(s, x0, eps, t)
        state = dpm_init(x_t)
        state = dpm_step(s, state, eps, t, t - 1000)
        # at the final boundary alpha->1, sigma->~0: recovers x0
        np.testing.assert_allclose(np.asarray(state.sample), np.asarray(x0), rtol=1e-2, atol=1e-2)

    def test_dpm_final_step_ignores_history(self):
        """Lower-order-final: at the t<0 boundary the clamped sigma makes the
        2M coefficient explode, so the final update must be first order —
        independent of prev_x0 (no extrapolation of inter-step noise)."""
        from conceptattention_tpu.sampling.dpm import DPMState, dpm_step, make_dpm_schedule

        s = make_dpm_schedule(4, prediction_type="epsilon")
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (1, 8))
        eps = jax.random.normal(jax.random.PRNGKey(4), (1, 8))
        t = s.timesteps[-1]

        def final(prev_x0):
            state = DPMState(
                sample=x, prev_x0=prev_x0,
                prev_lambda=jnp.asarray(1.5, jnp.float32),
                step_index=jnp.asarray(3, jnp.int32),
            )
            return np.asarray(dpm_step(s, state, eps, t, t - 250).sample)

        out_a = final(jnp.zeros((1, 8), jnp.float32))
        out_b = final(100.0 * jnp.ones((1, 8), jnp.float32))
        np.testing.assert_array_equal(out_a, out_b)

    def test_video_pipeline_dpm(self):
        cfg = CogVideoXConfig(use_rotary_positional_embeddings=True, **TINY)
        pipe = VideoConceptAttentionPipeline(cfg=cfg, dtype=jnp.float32)
        out = pipe.generate_video(
            prompt="a dog", concepts=["dog"],
            num_frames=F_LAT, height=H_LAT, width=W_LAT,
            num_inference_steps=4, scheduler="dpm", seed=2,
        )
        assert np.isfinite(out.concept_heatmaps).all()
