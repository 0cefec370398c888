"""Causal 3D video VAE (CogVideoX-style: 8x spatial, 4x temporal compression).

Capability parity with the video path's latent codec in the reference
(manuragkhullar/ConceptAttention uses diffusers' AutoencoderKLCogVideoX —
`experiments/video_model/cogvideox/pipeline.py:278-288` consumes 13 latent
frames for 81 pixel frames). This is a from-scratch functional JAX
implementation with the same interface contract: causal temporal convolutions
(first frame never sees the future), GroupNorm+swish resnet blocks, diagonal-
Gaussian latents.

Layout: NCDHW activations, OIDHW kernels; XLA maps conv3d onto the MXU via
implicit GEMM.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def causal_conv3d(x, p, stride=(1, 1, 1)):
    """3D conv, causally padded in time (pad past only), SAME in space."""
    kt, kh, kw = p["w"].shape[2:]
    pad_t = (kt - 1, 0)
    pad_h = ((kh - 1) // 2, kh // 2)
    pad_w = ((kw - 1) // 2, kw // 2)
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=[pad_t, pad_h, pad_w],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return y + p["b"][None, :, None, None, None]


def group_norm3d(x, p, num_groups=32, eps=1e-6):
    """Per-frame group norm: statistics over (C/g, H, W) but NOT time, so the
    codec stays strictly causal (a global-time GroupNorm would leak future
    frames into past latents)."""
    b, c = x.shape[:2]
    if c % num_groups != 0:
        num_groups = math.gcd(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, *x.shape[2:])
    mean = jnp.mean(xf, axis=(2, 4, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 4, 5), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape).astype(x.dtype)
    return xf * p["scale"][None, :, None, None, None] + p["bias"][None, :, None, None, None]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def resnet3d(x, p):
    h = causal_conv3d(_swish(group_norm3d(x, p["norm1"])), p["conv1"])
    h = causal_conv3d(_swish(group_norm3d(h, p["norm2"])), p["conv2"])
    if "shortcut" in p:
        x = causal_conv3d(x, p["shortcut"])
    return x + h


def encode(p: Dict[str, Any], x: jax.Array, key: Optional[jax.Array] = None,
           scale_factor: float = 1.0) -> jax.Array:
    """[B, 3, F, H, W] -> [B, z, 1+(F-1)/4, H/8, W/8] latents."""
    h = causal_conv3d(x, p["conv_in"])
    for level in p["down"]:
        h = resnet3d(h, level["block"])
        if "downsample" in level:
            h = causal_conv3d(h, level["downsample"], stride=level["stride"])
    h = resnet3d(h, p["mid"])
    h = causal_conv3d(_swish(group_norm3d(h, p["norm_out"])), p["conv_out"])
    mean, logvar = jnp.split(h, 2, axis=1)
    if key is not None:
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
    return mean * scale_factor


def decode(p: Dict[str, Any], z: jax.Array, scale_factor: float = 1.0) -> jax.Array:
    """Latents -> [B, 3, F, H, W] pixels."""
    h = causal_conv3d(z / scale_factor, p["conv_in"])
    h = resnet3d(h, p["mid"])
    for level in p["up"]:
        h = resnet3d(h, level["block"])
        if "upsample" in level:
            t, s = level["tfactor"], 2
            h = jnp.repeat(h, s, axis=3)
            h = jnp.repeat(h, s, axis=4)
            if t > 1:
                h = jnp.repeat(h, t, axis=2)
            h = causal_conv3d(h, level["upsample"])
    return causal_conv3d(_swish(group_norm3d(h, p["norm_out"])), p["conv_out"])


def init_video_vae_params(
    key: jax.Array,
    ch: int = 32,
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
    z_channels: int = 16,
    in_channels: int = 3,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """3 spatial downsamples (8x); temporal stride 2 on the middle two levels
    (4x), matching CogVideoX's 13-latent-frames-for-81 contract
    (1 + 80/4 ... approximated causally as ceil)."""
    keys = iter(jax.random.split(key, 64))

    def conv(cin, cout, k=(3, 3, 3)):
        fan = cin * k[0] * k[1] * k[2]
        return {
            "w": (jax.random.normal(next(keys), (cout, cin, *k), jnp.float32) / fan**0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def resnet(cin, cout):
        p = {"norm1": gn(cin), "conv1": conv(cin, cout),
             "norm2": gn(cout), "conv2": conv(cout, cout)}
        if cin != cout:
            p["shortcut"] = conv(cin, cout, k=(1, 1, 1))
        return p

    # Encoder
    down = []
    c_prev = ch
    for i, mult in enumerate(ch_mult):
        c_out = ch * mult
        level: Dict[str, Any] = {"block": resnet(c_prev, c_out)}
        if i < len(ch_mult) - 1:
            t_stride = 2 if i in (1, 2) else 1  # 4x temporal overall
            level["downsample"] = conv(c_out, c_out)
            level["stride"] = (t_stride, 2, 2)
        down.append(level)
        c_prev = c_out

    enc = {
        "conv_in": conv(in_channels, ch),
        "down": down,
        "mid": resnet(c_prev, c_prev),
        "norm_out": gn(c_prev),
        "conv_out": conv(c_prev, 2 * z_channels),
    }

    # Decoder (mirror)
    up = []
    c_dec = c_prev
    for i in reversed(range(len(ch_mult))):
        c_out = ch * ch_mult[i]
        level = {"block": resnet(c_dec, c_out)}
        if i > 0:
            t_factor = 2 if i in (2, 3) else 1
            level["upsample"] = conv(c_out, c_out)
            level["tfactor"] = t_factor
        up.append(level)
        c_dec = c_out

    dec = {
        "conv_in": conv(z_channels, c_prev),
        "mid": resnet(c_prev, c_prev),
        "up": up,
        "norm_out": gn(c_dec),
        "conv_out": conv(c_dec, in_channels),
    }
    return {"encoder": enc, "decoder": dec}
