"""CogVideoX 3D causal VAE, checkpoint-compatible with diffusers.

The reference decodes its video latents with diffusers'
`AutoencoderKLCogVideoX` (`experiments/video_model/cogvideox/pipeline.py`
consumes 13 latent frames for 49 pixel frames). This is a from-scratch
functional-JAX implementation of that architecture — causal 3D convolutions
(temporal padding replicates the first frame, so no frame ever sees the
future), GroupNorm/silu resnets, the decoder's latent-conditioned
SpatialNorm3D, first-frame-special temporal pooling/upsampling — laid out so
the published diffusers state-dict imports directly through
`weights/convert.py::convert_cogvideox_vae_state_dict` (NCDHW activations,
OIDHW kernels, no transposition).

Structure (diffusers `autoencoder_kl_cogvideox.py` layout):
  encoder: conv_in -> 4 down blocks (3 resnets each; downsampler after all
           but the last; temporal compression on the first
           log2(temporal_compression_ratio) blocks) -> mid (2 resnets)
           -> GroupNorm -> silu -> conv_out (2 * latent channels)
  decoder: conv_in -> mid (2 resnets, SpatialNorm3D) -> 4 up blocks
           (4 resnets each; upsampler after all but the last; temporal
           2x on the first log2(ratio) blocks) -> SpatialNorm3D -> silu
           -> conv_out
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    latent_channels: int = 16
    layers_per_block: int = 3
    temporal_compression_ratio: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 1.15258426

    @property
    def temporal_compress_level(self) -> int:
        return int(math.log2(self.temporal_compression_ratio))


# ------------------------------------------------------------- primitives --


def _silu(x):
    return x * jax.nn.sigmoid(x)


def causal_conv3d(x, p):
    """CogVideoXCausalConv3d: temporal front-pad with the first frame
    repeated (kernel_t - 1) times, zero 'same' padding in space, stride 1."""
    kt, kh, kw = p["w"].shape[2:]
    if kt > 1:
        x = jnp.concatenate([jnp.repeat(x[:, :, :1], kt - 1, axis=2), x], axis=2)
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1, 1),
        padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return y + p["b"][None, :, None, None, None]


def plain_conv3d_1x1(x, p):
    """CogVideoXSafeConv3d with kernel 1 (resnet shortcut): a pointwise mix."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1, 1), padding=[(0, 0)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return y + p["b"][None, :, None, None, None]


def _conv2d_per_frame(x, p, stride=1, padding=((1, 1), (1, 1))):
    """Apply a Conv2d [O, I, kh, kw] to every frame of [B, C, T, H, W]."""
    b, c, t, h, w = x.shape
    xf = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = jax.lax.conv_general_dilated(
        xf, p["w"], window_strides=(stride, stride), padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = y + p["b"][None, :, None, None]
    _, co, ho, wo = y.shape
    return y.reshape(b, t, co, ho, wo).transpose(0, 2, 1, 3, 4)


def group_norm3d(x, p, num_groups=32, eps=1e-6):
    """nn.GroupNorm on 5D input: statistics over (C/g, T, H, W)."""
    b, c = x.shape[:2]
    if c % num_groups != 0:  # tiny test configs
        num_groups = math.gcd(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, *x.shape[2:])
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4, 5), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape).astype(x.dtype)
    return xf * p["scale"][None, :, None, None, None] + p["bias"][None, :, None, None, None]


def _nearest3d(x, shape):
    """F.interpolate(mode='nearest') for the exact-ratio sizes used here."""
    return jax.image.resize(x, x.shape[:2] + tuple(shape), method="nearest")


def spatial_norm3d(f, zq, p, num_groups=32):
    """CogVideoXSpatialNorm3D: GroupNorm(f) modulated by 1x1 convs of the
    latent zq, nearest-resized to f's grid (first frame split when odd T so
    the temporal ratio stays exact)."""
    if f.shape[2] > 1 and f.shape[2] % 2 == 1:
        zf = _nearest3d(zq[:, :, :1], (1, f.shape[3], f.shape[4]))
        zr = _nearest3d(zq[:, :, 1:], (f.shape[2] - 1, f.shape[3], f.shape[4]))
        zq = jnp.concatenate([zf, zr], axis=2)
    else:
        zq = _nearest3d(zq, f.shape[2:])
    normed = group_norm3d(f, p["norm"], num_groups)
    return normed * plain_conv3d_1x1(zq, p["conv_y"]) + plain_conv3d_1x1(zq, p["conv_b"])


def _resnet3d(x, p, zq=None, num_groups=32):
    """CogVideoXResnetBlock3D (eval mode, no temb in the VAE)."""
    def norm(h, np_):
        if zq is None:
            return group_norm3d(h, np_, num_groups)
        return spatial_norm3d(h, zq, np_, num_groups)

    h = causal_conv3d(_silu(norm(x, p["norm1"])), p["conv1"])
    h = causal_conv3d(_silu(norm(h, p["norm2"])), p["conv2"])
    if "conv_shortcut" in p:
        x = plain_conv3d_1x1(x, p["conv_shortcut"])
    return x + h


def _downsample3d(x, p, compress_time: bool):
    """CogVideoXDownsample3D: optional first-frame-special temporal avg-pool,
    then a right/bottom-padded stride-2 spatial Conv2d per frame."""
    if compress_time:
        if x.shape[2] % 2 == 1 and x.shape[2] > 1:
            first, rest = x[:, :, :1], x[:, :, 1:]
            b, c, t, h, w = rest.shape
            rest = rest.reshape(b, c, t // 2, 2, h, w).mean(axis=3)
            x = jnp.concatenate([first, rest], axis=2)
        else:
            b, c, t, h, w = x.shape
            x = x.reshape(b, c, t // 2, 2, h, w).mean(axis=3)
    return _conv2d_per_frame(x, p, stride=2, padding=((0, 1), (0, 1)))


def _upsample3d(x, p, compress_time: bool):
    """CogVideoXUpsample3D: nearest 2x (spatial, plus temporal on all but a
    leading odd first frame), then a 3x3 Conv2d per frame."""
    if compress_time:
        if x.shape[2] > 1 and x.shape[2] % 2 == 1:
            first, rest = x[:, :, :1], x[:, :, 1:]
            first = jnp.repeat(jnp.repeat(first, 2, axis=3), 2, axis=4)
            rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=2), 2, axis=3), 2, axis=4)
            x = jnp.concatenate([first, rest], axis=2)
        elif x.shape[2] > 1:
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3), 2, axis=4)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
    else:
        x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
    return _conv2d_per_frame(x, p, stride=1, padding=((1, 1), (1, 1)))


# ------------------------------------------------------------ encode/decode --


def encoder_apply(p: Params, cfg: CogVideoXVAEConfig, x: jax.Array) -> jax.Array:
    g = cfg.norm_num_groups
    h = causal_conv3d(x, p["conv_in"])
    for i, block in enumerate(p["down"]):
        for r in block["resnets"]:
            h = _resnet3d(h, r, num_groups=g)
        if "downsample" in block:
            h = _downsample3d(h, block["downsample"],
                              compress_time=i < cfg.temporal_compress_level)
    for r in p["mid"]:
        h = _resnet3d(h, r, num_groups=g)
    h = _silu(group_norm3d(h, p["norm_out"], g))
    return causal_conv3d(h, p["conv_out"])  # [B, 2*latent, T', H/8, W/8]


def decoder_apply(p: Params, cfg: CogVideoXVAEConfig, z: jax.Array) -> jax.Array:
    g = cfg.norm_num_groups
    h = causal_conv3d(z, p["conv_in"])
    for r in p["mid"]:
        h = _resnet3d(h, r, zq=z, num_groups=g)
    for i, block in enumerate(p["up"]):
        for r in block["resnets"]:
            h = _resnet3d(h, r, zq=z, num_groups=g)
        if "upsample" in block:
            h = _upsample3d(h, block["upsample"],
                            compress_time=i < cfg.temporal_compress_level)
    h = _silu(spatial_norm3d(h, z, p["norm_out"], g))
    return causal_conv3d(h, p["conv_out"])


def encode(p: Params, cfg: CogVideoXVAEConfig, x: jax.Array,
           key: Optional[jax.Array] = None) -> jax.Array:
    """[B, 3, F, H, W] pixels -> scaled latents (posterior mean, or a sample
    when `key` is given), F = 1 + 4k -> 1 + k latent frames."""
    h = encoder_apply(p["encoder"], cfg, x)
    mean, logvar = jnp.split(h, 2, axis=1)
    if key is not None:
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * jax.random.normal(
            key, mean.shape, mean.dtype
        )
    return mean * cfg.scaling_factor


def decode(p: Params, cfg: CogVideoXVAEConfig, z: jax.Array) -> jax.Array:
    """Scaled latents -> [B, 3, F, H, W] pixels."""
    return decoder_apply(p["decoder"], cfg, z / cfg.scaling_factor)


# --------------------------------------------------------------------- init --


def init_video_vae_params(
    key: jax.Array,
    cfg: CogVideoXVAEConfig = CogVideoXVAEConfig(),
    dtype=jnp.float32,
) -> Params:
    keys = iter(jax.random.split(key, 256))

    def conv3(cin, cout, k=(3, 3, 3)):
        fan = cin * k[0] * k[1] * k[2]
        return {
            "w": (jax.random.normal(next(keys), (cout, cin, *k), jnp.float32)
                  / fan**0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def conv2(cin, cout, k=3):
        fan = cin * k * k
        return {
            "w": (jax.random.normal(next(keys), (cout, cin, k, k), jnp.float32)
                  / fan**0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def sn(c, zc):
        return {"norm": gn(c), "conv_y": conv3(zc, c, (1, 1, 1)),
                "conv_b": conv3(zc, c, (1, 1, 1))}

    def resnet(cin, cout, spatial: bool):
        zc = cfg.latent_channels
        p = {
            "norm1": sn(cin, zc) if spatial else gn(cin),
            "conv1": conv3(cin, cout),
            "norm2": sn(cout, zc) if spatial else gn(cout),
            "conv2": conv3(cout, cout),
        }
        if cin != cout:
            p["conv_shortcut"] = conv3(cin, cout, (1, 1, 1))
        return p

    boc = cfg.block_out_channels
    # Encoder
    down, c_prev = [], boc[0]
    for i, c_out in enumerate(boc):
        block: Dict[str, Any] = {
            "resnets": [resnet(c_prev if j == 0 else c_out, c_out, False)
                        for j in range(cfg.layers_per_block)]
        }
        if i < len(boc) - 1:
            block["downsample"] = conv2(c_out, c_out)
        down.append(block)
        c_prev = c_out
    enc = {
        "conv_in": conv3(cfg.in_channels, boc[0]),
        "down": down,
        "mid": [resnet(boc[-1], boc[-1], False) for _ in range(2)],
        "norm_out": gn(boc[-1]),
        "conv_out": conv3(boc[-1], 2 * cfg.latent_channels),
    }

    # Decoder (reversed channels, one extra resnet per block, spatial norms)
    rboc = boc[::-1]
    up, c_prev = [], rboc[0]
    for i, c_out in enumerate(rboc):
        block = {
            "resnets": [resnet(c_prev if j == 0 else c_out, c_out, True)
                        for j in range(cfg.layers_per_block + 1)]
        }
        if i < len(rboc) - 1:
            block["upsample"] = conv2(c_out, c_out)
        up.append(block)
        c_prev = c_out
    dec = {
        "conv_in": conv3(cfg.latent_channels, rboc[0]),
        "mid": [resnet(rboc[0], rboc[0], True) for _ in range(2)],
        "up": up,
        "norm_out": sn(rboc[-1], cfg.latent_channels),
        "conv_out": conv3(rboc[-1], cfg.out_channels),
    }
    return {"encoder": enc, "decoder": dec}
