"""Flux VAE (encoder/decoder CNN) in functional JAX.

Parity target: `flux/src/flux/modules/autoencoder.py:8-312` in the reference
(manuragkhullar/ConceptAttention): resnet CNN with a single-head attention
block at the bottleneck, GroupNorm(32, eps=1e-6), swish activations,
asymmetric-padded stride-2 downsampling, nearest-neighbor upsampling,
DiagonalGaussian latent sampling, scale 0.3611 / shift 0.1159.

Layout: NCHW activations with OIHW conv kernels so torch checkpoints import
without transposition; XLA re-layouts internally for the TPU convolution
units. Decode runs in float32 like the reference's decode path
(image_generator.py:188-190).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.config import AutoEncoderConfig

Params = Dict[str, Any]


def conv2d(x, p, stride=1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def group_norm(x, p, num_groups=32, eps=1e-6):
    b, c, h, w = x.shape
    if c % num_groups != 0:  # tiny test configs have < 32 channels
        import math

        num_groups = math.gcd(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, h, w).astype(x.dtype)
    return xf * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def swish(x):
    return x * jax.nn.sigmoid(x)


def attn_block(x, p):
    """Single-head self-attention over the h*w grid (reference :25-52)."""
    b, c, h, w = x.shape
    h_ = group_norm(x, p["norm"])
    q = conv2d(h_, p["q"], padding=0).reshape(b, c, h * w).transpose(0, 2, 1)
    k = conv2d(h_, p["k"], padding=0).reshape(b, c, h * w).transpose(0, 2, 1)
    v = conv2d(h_, p["v"], padding=0).reshape(b, c, h * w).transpose(0, 2, 1)
    scale = 1.0 / (c**0.5)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", weights, v).transpose(0, 2, 1).reshape(b, c, h, w)
    return x + conv2d(out, p["proj_out"], padding=0)


def resnet_block(x, p):
    h = conv2d(swish(group_norm(x, p["norm1"])), p["conv1"])
    h = conv2d(swish(group_norm(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"], padding=0)
    return x + h


def downsample(x, p):
    # Asymmetric (0,1),(0,1) pad then stride-2 3x3 conv (reference :85-95).
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return conv2d(x, p["conv"], stride=2, padding=0)


def upsample(x, p):
    b, c, h, w = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return conv2d(x, p["conv"])


def encoder_apply(p: Params, cfg: AutoEncoderConfig, x: jax.Array) -> jax.Array:
    h = conv2d(x, p["conv_in"])
    for i_level in range(len(cfg.ch_mult)):
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(h, p["down"][i_level]["block"][i_block])
        if i_level != len(cfg.ch_mult) - 1:
            h = downsample(h, p["down"][i_level]["downsample"])
    h = resnet_block(h, p["mid_block_1"])
    h = attn_block(h, p["mid_attn_1"])
    h = resnet_block(h, p["mid_block_2"])
    h = swish(group_norm(h, p["norm_out"]))
    return conv2d(h, p["conv_out"])  # [B, 2*z, H/8, W/8]


def decoder_apply(p: Params, cfg: AutoEncoderConfig, z: jax.Array) -> jax.Array:
    h = conv2d(z, p["conv_in"])
    h = resnet_block(h, p["mid_block_1"])
    h = attn_block(h, p["mid_attn_1"])
    h = resnet_block(h, p["mid_block_2"])
    for i_level in reversed(range(len(cfg.ch_mult))):
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(h, p["up"][i_level]["block"][i_block])
        if i_level != 0:
            h = upsample(h, p["up"][i_level]["upsample"])
    h = swish(group_norm(h, p["norm_out"]))
    return conv2d(h, p["conv_out"])


def diagonal_gaussian(z: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
    mean, logvar = jnp.split(z, 2, axis=1)
    if key is None:
        return mean
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def encode(p: Params, cfg: AutoEncoderConfig, x: jax.Array, key=None) -> jax.Array:
    z = diagonal_gaussian(encoder_apply(p["encoder"], cfg, x), key)
    return cfg.scale_factor * (z - cfg.shift_factor)


def decode(p: Params, cfg: AutoEncoderConfig, z: jax.Array) -> jax.Array:
    z = z / cfg.scale_factor + cfg.shift_factor
    return decoder_apply(p["decoder"], cfg, z)


# ----------------------------------------------------------------------------
# NHWC fast path. The checkpoint layout stays NCHW/OIHW (torch import without
# transposition); these variants transpose at the boundaries and keep the
# whole decoder in the TPU's native channel-last layout — XLA otherwise
# inserts per-conv relayouts that dominate 1024^2 decode time.
# ----------------------------------------------------------------------------


def _conv2d_nhwc(x, p, stride=1, padding=1):
    if stride == 1 and padding == 1 and p["w"].shape[2:] == (3, 3):
        # 3x3 SAME convs (the decoder's hot op) route through the Pallas
        # shifted-GEMM kernel on TPU backends: XLA's conv lowering measures
        # 38-50 TFLOP/s at these shapes where the kernel's clean GEMM taps
        # run ~2x faster (kernels/conv3x3.py).
        from conceptattention_tpu.kernels.conv3x3 import (
            conv3x3_same,
            use_conv3x3_kernel,
        )

        if use_conv3x3_kernel(x.shape, x.shape[-1], p["w"].shape[0], x.dtype):
            return conv3x3_same(x, p["w"].transpose(2, 3, 1, 0), p["b"])
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    w = p["w"].transpose(2, 3, 1, 0)  # OIHW -> HWIO (cheap; hoisted by XLA)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _group_norm_nhwc(x, p, num_groups=32, eps=1e-6):
    b, h, w, c = x.shape
    if c % num_groups != 0:
        import math

        num_groups = math.gcd(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c).astype(x.dtype)
    return xf * p["scale"] + p["bias"]


def _attn_block_nhwc(x, p):
    b, h, w, c = x.shape
    h_ = _group_norm_nhwc(x, p["norm"])
    q = _conv2d_nhwc(h_, p["q"], padding=0).reshape(b, h * w, c)
    k = _conv2d_nhwc(h_, p["k"], padding=0).reshape(b, h * w, c)
    v = _conv2d_nhwc(h_, p["v"], padding=0).reshape(b, h * w, c)
    s = h * w
    from conceptattention_tpu.kernels.conv3x3 import use_conv3x3_kernel

    # NOTE the f32 flash mid-attention DOES compile on-chip (isolated repro);
    # only the conv3x3 kernel is dtype-gated.
    if s >= 4096 and s % 512 == 0 and use_conv3x3_kernel(x.shape, c, c):
        # 1024^2 decode puts 16k tokens through this single-head attention;
        # the einsum path materializes a [16384, 16384] f32 logits matrix
        # (~1 GB, measured 16.4 ms/img of the 151 ms decode). The flash
        # kernel streams it blockwise (same gate as the conv routing: a
        # TPU-like backend).
        from conceptattention_tpu.kernels.flash_saliency import (
            _auto_tiles,
            fused_concept_flash_attention,
        )

        bq, bk = _auto_tiles(s)
        out = fused_concept_flash_attention(
            q[:, None], k[:, None], v[:, None],
            txt_len=s, img_len=0, concept_len=0,
            block_q=min(bq, s), block_k=min(bk, s),
        )[:, 0].reshape(b, h, w, c)
    else:
        scale = 1.0 / (c**0.5)
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, h, w, c)
    return x + _conv2d_nhwc(out, p["proj_out"], padding=0)


def _resnet_block_nhwc(x, p):
    h = _conv2d_nhwc(swish(_group_norm_nhwc(x, p["norm1"])), p["conv1"])
    h = _conv2d_nhwc(swish(_group_norm_nhwc(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = _conv2d_nhwc(x, p["nin_shortcut"], padding=0)
    return x + h


def _upsample_nhwc(x, p):
    # jnp.repeat measures 5.3 ms per 512->1024 hop on chip; broadcast_to +
    # reshape was tried and is NOT faster (5.6 ms) — the interleaving
    # relayout is the cost either way, so keep the simple form.
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv2d_nhwc(x, p["conv"])


def decoder_apply_nhwc(p: Params, cfg: AutoEncoderConfig, z: jax.Array) -> jax.Array:
    """decoder_apply with NHWC-internal layout; z/output remain NCHW."""
    h = z.transpose(0, 2, 3, 1)
    h = _conv2d_nhwc(h, p["conv_in"])
    h = _resnet_block_nhwc(h, p["mid_block_1"])
    h = _attn_block_nhwc(h, p["mid_attn_1"])
    h = _resnet_block_nhwc(h, p["mid_block_2"])
    for i_level in reversed(range(len(cfg.ch_mult))):
        for i_block in range(cfg.num_res_blocks + 1):
            h = _resnet_block_nhwc(h, p["up"][i_level]["block"][i_block])
        if i_level != 0:
            h = _upsample_nhwc(h, p["up"][i_level]["upsample"])
    h = swish(_group_norm_nhwc(h, p["norm_out"]))
    h = _conv2d_nhwc(h, p["conv_out"])
    return h.transpose(0, 3, 1, 2)


def decode_nhwc(p: Params, cfg: AutoEncoderConfig, z: jax.Array) -> jax.Array:
    """`decode` on the NHWC fast path (same math, same NCHW interface)."""
    z = z / cfg.scale_factor + cfg.shift_factor
    return decoder_apply_nhwc(p["decoder"], cfg, z)


def _downsample_nhwc(x, p):
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv2d_nhwc(x, p["conv"], stride=2, padding=0)


def encoder_apply_nhwc(p: Params, cfg: AutoEncoderConfig, x: jax.Array) -> jax.Array:
    """encoder_apply with NHWC-internal layout; x/output remain NCHW."""
    h = x.transpose(0, 2, 3, 1)
    h = _conv2d_nhwc(h, p["conv_in"])
    for i_level in range(len(cfg.ch_mult)):
        for i_block in range(cfg.num_res_blocks):
            h = _resnet_block_nhwc(h, p["down"][i_level]["block"][i_block])
        if i_level != len(cfg.ch_mult) - 1:
            h = _downsample_nhwc(h, p["down"][i_level]["downsample"])
    h = _resnet_block_nhwc(h, p["mid_block_1"])
    h = _attn_block_nhwc(h, p["mid_attn_1"])
    h = _resnet_block_nhwc(h, p["mid_block_2"])
    h = swish(_group_norm_nhwc(h, p["norm_out"]))
    h = _conv2d_nhwc(h, p["conv_out"])
    return h.transpose(0, 3, 1, 2)


def encode_nhwc(p: Params, cfg: AutoEncoderConfig, x: jax.Array, key=None) -> jax.Array:
    """`encode` in NHWC-internal layout (same math, same NCHW interface).

    NOT the default: measured ~3x SLOWER than the NCHW `encode` on TPU at
    1024^2 — the encoder's cost concentrates in the 3-channel input conv,
    where channel-last tiling starves the MXU; the decoder is the opposite
    case (all high-channel layers) and defaults to NHWC.
    """
    z = diagonal_gaussian(encoder_apply_nhwc(p["encoder"], cfg, x), key)
    return cfg.scale_factor * (z - cfg.shift_factor)


# ----------------------------------------------------------------------------
# Random init (production weights come from checkpoints via weights/convert).
# ----------------------------------------------------------------------------


def _conv(key, c_in, c_out, k, dtype):
    fan_in = c_in * k * k
    w = jax.random.normal(key, (c_out, c_in, k, k), jnp.float32) / (fan_in**0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def _gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _resnet(key, c_in, c_out, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn(c_in, dtype),
        "conv1": _conv(k1, c_in, c_out, 3, dtype),
        "norm2": _gn(c_out, dtype),
        "conv2": _conv(k2, c_out, c_out, 3, dtype),
    }
    if c_in != c_out:
        p["nin_shortcut"] = _conv(k3, c_in, c_out, 1, dtype)
    return p


def _attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn(c, dtype),
        "q": _conv(ks[0], c, c, 1, dtype),
        "k": _conv(ks[1], c, c, 1, dtype),
        "v": _conv(ks[2], c, c, 1, dtype),
        "proj_out": _conv(ks[3], c, c, 1, dtype),
    }


def init_autoencoder_params(
    key: jax.Array, cfg: AutoEncoderConfig, dtype=jnp.float32
) -> Params:
    n_levels = len(cfg.ch_mult)
    keys = iter(jax.random.split(key, 256))
    in_ch_mult = (1,) + tuple(cfg.ch_mult)

    # Encoder
    enc: Params = {"conv_in": _conv(next(keys), cfg.in_channels, cfg.ch, 3, dtype)}
    down = []
    block_in = cfg.ch
    for i_level in range(n_levels):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        level: Params = {"block": blocks}
        if i_level != n_levels - 1:
            level["downsample"] = {"conv": _conv(next(keys), block_in, block_in, 3, dtype)}
        down.append(level)
    enc["down"] = down
    enc["mid_block_1"] = _resnet(next(keys), block_in, block_in, dtype)
    enc["mid_attn_1"] = _attn(next(keys), block_in, dtype)
    enc["mid_block_2"] = _resnet(next(keys), block_in, block_in, dtype)
    enc["norm_out"] = _gn(block_in, dtype)
    enc["conv_out"] = _conv(next(keys), block_in, 2 * cfg.z_channels, 3, dtype)

    # Decoder
    block_in = cfg.ch * cfg.ch_mult[-1]
    dec: Params = {"conv_in": _conv(next(keys), cfg.z_channels, block_in, 3, dtype)}
    dec["mid_block_1"] = _resnet(next(keys), block_in, block_in, dtype)
    dec["mid_attn_1"] = _attn(next(keys), block_in, dtype)
    dec["mid_block_2"] = _resnet(next(keys), block_in, block_in, dtype)
    up = [None] * n_levels
    for i_level in reversed(range(n_levels)):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        level = {"block": blocks}
        if i_level != 0:
            level["upsample"] = {"conv": _conv(next(keys), block_in, block_in, 3, dtype)}
        up[i_level] = level
    dec["up"] = up
    dec["norm_out"] = _gn(block_in, dtype)
    dec["conv_out"] = _conv(next(keys), block_in, cfg.out_ch, 3, dtype)

    return {"encoder": enc, "decoder": dec}
