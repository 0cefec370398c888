"""Stable-Diffusion-style UNet with traced cross-attention, in functional JAX.

Capability parity target: the DAAM-SD2 / DAAM-SDXL baselines
(`binary_segmentation_baselines/daam_sd2.py:21-158`, `daam_sdxl.py:10-190` in
manuragkhullar/ConceptAttention), which hook the diffusers SD UNet's
cross-attention with the external `daam.trace` context manager and aggregate
per-word attention heatmaps.

This is a from-scratch latent-diffusion UNet (resnet + spatial-transformer
blocks, down/mid/up with skip connections, sinusoidal time embedding) whose
forward RETURNS the cross-attention probability maps — tracing is a return
value, not a hook. Checkpoint import from diffusers-format state dicts is a
follow-up; the architecture, the DAAM aggregation, and the eval wiring are
complete and tested at a reduced width.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.ops.embeddings import timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    model_channels: int = 64
    out_channels: int = 4
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_heads: int = 4
    context_dim: int = 1024  # SD2 text width
    num_groups: int = 8


def _conv(x, p, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _gn(x, p, groups):
    import math

    b, c, h, w = x.shape
    g = math.gcd(groups, c)
    xf = x.astype(jnp.float32).reshape(b, g, c // g, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, c, h, w).astype(x.dtype)
    return xf * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _resblock(p, x, temb, groups):
    h = _conv(_silu(_gn(x, p["norm1"], groups)), p["conv1"])
    h = h + (_silu(temb) @ p["temb"]["w"] + p["temb"]["b"])[:, :, None, None]
    h = _conv(_silu(_gn(h, p["norm2"], groups)), p["conv2"])
    if "shortcut" in p:
        x = _conv(x, p["shortcut"], padding=0)
    return x + h


def _cross_attention(p, x_seq, context, num_heads):
    """x_seq [B, N, C] queries over context [B, T, C_ctx]; returns
    (out, probs [B, H, N, T])."""
    b, n, c = x_seq.shape
    hd = c // num_heads
    q = (x_seq @ p["q"]["w"]).reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = (context @ p["k"]["w"]).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    v = (context @ p["v"]["w"]).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / (hd**0.5), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return out @ p["proj"]["w"] + p["proj"]["b"], probs


def _transformer_block(p, x, context, num_heads, groups):
    """Spatial transformer: self-attn, cross-attn (traced), ff."""
    b, c, h, w = x.shape
    seq = _gn(x, p["norm"], groups).reshape(b, c, h * w).transpose(0, 2, 1)
    sa, _ = _cross_attention(p["self_attn"], seq, seq, num_heads)
    seq = seq + sa
    ca, probs = _cross_attention(p["cross_attn"], seq, context, num_heads)
    seq = seq + ca
    ff = jax.nn.gelu(seq @ p["ff_in"]["w"] + p["ff_in"]["b"], approximate=True)
    seq = seq + (ff @ p["ff_out"]["w"] + p["ff_out"]["b"])
    return x + seq.transpose(0, 2, 1).reshape(b, c, h, w), probs


def unet_forward(
    params: Dict[str, Any],
    cfg: UNetConfig,
    latents: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
) -> Tuple[jax.Array, List[jax.Array]]:
    """latents [B, 4, H, W], context [B, T, ctx] -> (eps-pred, cross-attn maps
    per transformer block, each [B, heads, hw, T] at that level's resolution)."""
    temb = timestep_embedding(timesteps, cfg.model_channels * 4)
    temb = _silu(temb @ params["temb1"]["w"] + params["temb1"]["b"])
    temb = temb @ params["temb2"]["w"] + params["temb2"]["b"]

    maps: List[jax.Array] = []
    h = _conv(latents, params["conv_in"])
    skips = []
    for lp in params["down"]:
        h = _resblock(lp["res"], h, temb, cfg.num_groups)
        if "attn" in lp:
            h, probs = _transformer_block(lp["attn"], h, context, cfg.num_heads, cfg.num_groups)
            maps.append(probs)
        skips.append(h)  # one skip per level, pre-downsample resolution
        if "downsample" in lp:
            h = _conv(h, lp["downsample"], stride=2)

    h = _resblock(params["mid"]["res1"], h, temb, cfg.num_groups)
    h, probs = _transformer_block(params["mid"]["attn"], h, context, cfg.num_heads, cfg.num_groups)
    maps.append(probs)
    h = _resblock(params["mid"]["res2"], h, temb, cfg.num_groups)

    for lp in params["up"]:
        if "upsample" in lp:  # return to this level's skip resolution first
            h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
            h = _conv(h, lp["upsample"])
        h = jnp.concatenate([h, skips.pop()], axis=1)
        h = _resblock(lp["res"], h, temb, cfg.num_groups)
        if "attn" in lp:
            h, probs = _transformer_block(lp["attn"], h, context, cfg.num_heads, cfg.num_groups)
            maps.append(probs)

    h = _conv(_silu(_gn(h, params["norm_out"], cfg.num_groups)), params["conv_out"])
    return h, maps


def init_unet_params(key: jax.Array, cfg: UNetConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))

    def conv(cin, cout, k=3):
        fan = cin * k * k
        return {
            "w": (jax.random.normal(next(keys), (cout, cin, k, k), jnp.float32) / fan**0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def lin(cin, cout):
        return {
            "w": (jax.random.normal(next(keys), (cin, cout), jnp.float32) / cin**0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    tdim = cfg.model_channels * 4

    def res(cin, cout):
        p = {
            "norm1": gn(cin), "conv1": conv(cin, cout),
            "temb": lin(tdim, cout),
            "norm2": gn(cout), "conv2": conv(cout, cout),
        }
        if cin != cout:
            p["shortcut"] = conv(cin, cout, k=1)
        return p

    def attn(c):
        return {
            "norm": gn(c),
            "self_attn": {"q": lin(c, c), "k": lin(c, c), "v": lin(c, c), "proj": lin(c, c)},
            "cross_attn": {
                "q": lin(c, c), "k": lin(cfg.context_dim, c),
                "v": lin(cfg.context_dim, c), "proj": lin(c, c),
            },
            "ff_in": lin(c, 4 * c),
            "ff_out": lin(4 * c, c),
        }

    ch = cfg.model_channels
    down = []
    c_prev = ch
    for i, mult in enumerate(cfg.ch_mult):
        c_out = ch * mult
        level: Dict[str, Any] = {"res": res(c_prev, c_out)}
        if i > 0:  # attention at the deeper levels, like SD
            level["attn"] = attn(c_out)
        if i < len(cfg.ch_mult) - 1:
            level["downsample"] = conv(c_out, c_out)
        down.append(level)
        c_prev = c_out

    mid = {"res1": res(c_prev, c_prev), "attn": attn(c_prev), "res2": res(c_prev, c_prev)}

    # Up path: one skip per level (pre-downsample resolution); upsample FIRST
    # on every level except the deepest, then concat the level's skip.
    up = []
    n_levels = len(cfg.ch_mult)
    for i in reversed(range(n_levels)):
        c_skip = ch * cfg.ch_mult[i]
        level = {}
        if i < n_levels - 1:
            level["upsample"] = conv(c_prev, c_prev)
        level["res"] = res(c_prev + c_skip, c_skip)
        if i > 0:
            level["attn"] = attn(c_skip)
        up.append(level)
        c_prev = c_skip

    return {
        "temb1": lin(tdim, tdim),
        "temb2": lin(tdim, tdim),
        "conv_in": conv(cfg.in_channels, ch),
        "down": down,
        "mid": mid,
        "up": up,
        "norm_out": gn(c_prev),
        "conv_out": conv(c_prev, cfg.out_channels),
    }
