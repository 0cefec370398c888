"""CogVideoX 3D VAE: parity against a torch oracle of the diffusers layout.

diffusers is not installed in this image, so — as with the SD2 UNet — the
oracle is a from-scratch torch replication of `AutoencoderKLCogVideoX`
(causal convs padding time with the repeated first frame, first-frame-special
temporal pooling/upsampling, decoder SpatialNorm3D conditioned on the latent),
exported through `convert_cogvideox_vae_state_dict` using the published
diffusers state-dict key layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from conceptattention_tpu.models.video import vae as vvae
from conceptattention_tpu.weights.convert import convert_cogvideox_vae_state_dict

TINY = vvae.CogVideoXVAEConfig(
    block_out_channels=(8, 16, 16),
    latent_channels=4,
    layers_per_block=1,
    temporal_compression_ratio=4,
    norm_num_groups=4,
    scaling_factor=1.15258426,
)
B, T, H, W = 1, 9, 16, 16  # T = 1 + 4k (CogVideoX frame contract)


# ------------------------------------------------------------- oracle ----
class _CausalConv3d(nn.Module):
    def __init__(self, cin, cout, k=3):
        super().__init__()
        k3 = (k, k, k) if isinstance(k, int) else k
        self.conv = nn.Conv3d(cin, cout, k3, stride=1, padding=0)
        self.kt, self.ph, self.pw = k3[0], k3[1] // 2, k3[2] // 2

    def forward(self, x):
        if self.kt > 1:
            x = torch.cat([x[:, :, :1].repeat(1, 1, self.kt - 1, 1, 1), x], dim=2)
        x = F.pad(x, (self.pw, self.pw, self.ph, self.ph))
        return self.conv(x)


class _SpatialNorm3D(nn.Module):
    def __init__(self, f_ch, z_ch, groups):
        super().__init__()
        self.norm_layer = nn.GroupNorm(groups, f_ch, eps=1e-6)
        self.conv_y = _CausalConv3d(z_ch, f_ch, 1)
        self.conv_b = _CausalConv3d(z_ch, f_ch, 1)

    def forward(self, f, zq):
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            zf = F.interpolate(zq[:, :, :1], size=(1, f.shape[3], f.shape[4]))
            zr = F.interpolate(zq[:, :, 1:], size=(f.shape[2] - 1, f.shape[3], f.shape[4]))
            zq = torch.cat([zf, zr], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[2:])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class _Resnet(nn.Module):
    def __init__(self, cin, cout, groups, z_ch=None):
        super().__init__()
        if z_ch is None:
            self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
            self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        else:
            self.norm1 = _SpatialNorm3D(cin, z_ch, groups)
            self.norm2 = _SpatialNorm3D(cout, z_ch, groups)
        self.conv1 = _CausalConv3d(cin, cout)
        self.conv2 = _CausalConv3d(cout, cout)
        if cin != cout:
            self.conv_shortcut = nn.Conv3d(cin, cout, 1)

    def forward(self, x, zq=None):
        n1 = self.norm1(x, zq) if zq is not None else self.norm1(x)
        h = self.conv1(F.silu(n1))
        n2 = self.norm2(h, zq) if zq is not None else self.norm2(h)
        h = self.conv2(F.silu(n2))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _Down(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x, compress_time):
        if compress_time:
            if x.shape[2] > 1 and x.shape[2] % 2 == 1:
                xf, xr = x[:, :, :1], x[:, :, 1:]
                b, c, t, h, w = xr.shape
                xr = xr.reshape(b, c, t // 2, 2, h, w).mean(3)
                x = torch.cat([xf, xr], dim=2)
            else:
                b, c, t, h, w = x.shape
                x = x.reshape(b, c, t // 2, 2, h, w).mean(3)
        x = F.pad(x, (0, 1, 0, 1))
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class _Up(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=1, padding=1)

    def forward(self, x, compress_time):
        if compress_time and x.shape[2] > 1 and x.shape[2] % 2 == 1:
            xf, xr = x[:, :, :1], x[:, :, 1:]
            xf = F.interpolate(xf.squeeze(2), scale_factor=2)[:, :, None]
            xr = F.interpolate(xr, scale_factor=2)
            x = torch.cat([xf, xr], dim=2)
        elif compress_time and x.shape[2] > 1:
            x = F.interpolate(x, scale_factor=2)
        else:
            b, c, t, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = F.interpolate(x, scale_factor=2)
            x = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)


class _DownBlock(nn.Module):
    def __init__(self, cin, cout, layers, groups, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(cin if j == 0 else cout, cout, groups) for j in range(layers)]
        )
        if add_down:
            self.downsamplers = nn.ModuleList([_Down(cout)])


class _UpBlock(nn.Module):
    def __init__(self, cin, cout, layers, groups, z_ch, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(cin if j == 0 else cout, cout, groups, z_ch) for j in range(layers)]
        )
        if add_up:
            self.upsamplers = nn.ModuleList([_Up(cout)])


class _Mid(nn.Module):
    def __init__(self, c, groups, z_ch=None):
        super().__init__()
        self.resnets = nn.ModuleList([_Resnet(c, c, groups, z_ch) for _ in range(2)])


class _Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        boc, g = cfg.block_out_channels, cfg.norm_num_groups
        self.level = cfg.temporal_compress_level
        self.conv_in = _CausalConv3d(cfg.in_channels, boc[0])
        self.down_blocks = nn.ModuleList()
        c_prev = boc[0]
        for i, c_out in enumerate(boc):
            self.down_blocks.append(
                _DownBlock(c_prev, c_out, cfg.layers_per_block, g, i < len(boc) - 1)
            )
            c_prev = c_out
        self.mid_block = _Mid(boc[-1], g)
        self.norm_out = nn.GroupNorm(g, boc[-1], eps=1e-6)
        self.conv_out = _CausalConv3d(boc[-1], 2 * cfg.latent_channels)

    def forward(self, x):
        h = self.conv_in(x)
        for i, blk in enumerate(self.down_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h, compress_time=i < self.level)
        for r in self.mid_block.resnets:
            h = r(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class _Decoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        rboc = cfg.block_out_channels[::-1]
        g, z = cfg.norm_num_groups, cfg.latent_channels
        self.level = cfg.temporal_compress_level
        self.conv_in = _CausalConv3d(z, rboc[0])
        self.mid_block = _Mid(rboc[0], g, z)
        self.up_blocks = nn.ModuleList()
        c_prev = rboc[0]
        for i, c_out in enumerate(rboc):
            self.up_blocks.append(
                _UpBlock(c_prev, c_out, cfg.layers_per_block + 1, g, z, i < len(rboc) - 1)
            )
            c_prev = c_out
        self.norm_out = _SpatialNorm3D(rboc[-1], z, g)
        self.conv_out = _CausalConv3d(rboc[-1], cfg.out_channels)

    def forward(self, zq):
        h = self.conv_in(zq)
        for r in self.mid_block.resnets:
            h = r(h, zq)
        for i, blk in enumerate(self.up_blocks):
            for r in blk.resnets:
                h = r(h, zq)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h, compress_time=i < self.level)
        return self.conv_out(F.silu(self.norm_out(h, zq)))


class _Oracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = _Encoder(cfg)
        self.decoder = _Decoder(cfg)


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = _Oracle(TINY).eval()
    params = convert_cogvideox_vae_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, TINY
    )
    return oracle, params


class TestCogVideoXVAEParity:
    def test_encoder_matches_oracle(self, oracle_and_params):
        oracle, params = oracle_and_params
        torch.manual_seed(1)
        x = torch.randn(B, 3, T, H, W)
        with torch.no_grad():
            want = oracle.encoder(x).numpy()
        got = vvae.encoder_apply(params["encoder"], TINY, jnp.asarray(x.numpy()))
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)

    def test_decoder_matches_oracle(self, oracle_and_params):
        oracle, params = oracle_and_params
        torch.manual_seed(2)
        t_lat = 1 + (T - 1) // TINY.temporal_compression_ratio
        down = 2 ** (len(TINY.block_out_channels) - 1)
        z = torch.randn(B, TINY.latent_channels, t_lat, H // down, W // down)
        with torch.no_grad():
            want = oracle.decoder(z).numpy()
        got = vvae.decoder_apply(params["decoder"], TINY, jnp.asarray(z.numpy()))
        assert got.shape == (B, 3, T, H, W)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)

    def test_converter_consumes_every_key(self, oracle_and_params, monkeypatch):
        oracle, _ = oracle_and_params
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        import conceptattention_tpu.weights.convert as wc

        # Capture the converter's internal tracking view so we can assert
        # that NO checkpoint key was silently dropped.
        captured = {}

        class TrackingSD(wc._SD):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                captured["s"] = self

        monkeypatch.setattr(wc, "_SD", TrackingSD)
        got = wc.convert_cogvideox_vae_state_dict(sd, TINY)
        assert captured["s"].unused() == [], captured["s"].unused()
        mine = vvae.init_video_vae_params(jax.random.PRNGKey(0), TINY)
        assert jax.tree.structure(mine) == jax.tree.structure(got)


class TestRoundtrip:
    def test_encode_decode_shapes_and_scaling(self, oracle_and_params):
        _, params = oracle_and_params
        x = jax.random.normal(jax.random.PRNGKey(3), (B, 3, T, H, W))
        z = vvae.encode(params, TINY, x)
        t_lat = 1 + (T - 1) // TINY.temporal_compression_ratio
        down = 2 ** (len(TINY.block_out_channels) - 1)
        assert z.shape == (B, TINY.latent_channels, t_lat, H // down, W // down)
        y = vvae.decode(params, TINY, z)
        assert y.shape == (B, 3, T, H, W)
        assert np.isfinite(np.asarray(y)).all()

    def test_encode_sampling_differs_from_mean(self, oracle_and_params):
        _, params = oracle_and_params
        x = jax.random.normal(jax.random.PRNGKey(4), (B, 3, T, H, W))
        z_mean = vvae.encode(params, TINY, x)
        z_samp = vvae.encode(params, TINY, x, key=jax.random.PRNGKey(5))
        assert not np.allclose(np.asarray(z_mean), np.asarray(z_samp))
