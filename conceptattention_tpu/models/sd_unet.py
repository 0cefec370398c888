"""Stable-Diffusion 2 / SDXL UNet (diffusers `UNet2DConditionModel` subset)
with traced cross-attention, in functional JAX.

Checkpoint-level parity target: the DAAM-SD2 / DAAM-SDXL baselines
(`binary_segmentation_baselines/daam_sd2.py:21-158`, `daam_sdxl.py:10-190` in
manuragkhullar/ConceptAttention) run the real `stable-diffusion-2-base` /
`stable-diffusion-xl-base-1.0` pipelines and hook their UNets'
cross-attentions with `daam.trace`. This module reproduces both UNet layouts
exactly (so either checkpoint loads through
`weights/convert.py::convert_sd_unet_state_dict`):

  - `CrossAttnDownBlock2D`/`DownBlock2D` stack with `layers_per_block`
    resnets, one skip saved after EVERY resnet and after every downsampler
    (diffusers pops one skip per up-block resnet — 3 per level);
  - `Transformer2DModel` with `use_linear_projection=True`: GroupNorm
    (eps 1e-6) -> linear proj_in -> `transformer_layers_per_block[level]` x
    BasicTransformerBlock (LN -> self-attn -> LN -> cross-attn -> LN ->
    GEGLU ff) -> linear proj_out, residual. SD2: 1 block everywhere; SDXL:
    (1, 2, 10) per level with the deepest transformer repeated at mid;
  - attention: bias-free to_q/to_k/to_v, to_out.0 with bias, head counts per
    level (SD2-base: 5/10/20/20 heads of 64; SDXL: 5/10/20);
  - resnets: GroupNorm(32, eps 1e-5) -> silu -> conv3x3, time_emb_proj added
    after conv1, 1x1 conv_shortcut on channel change;
  - `Timesteps(320, flip_sin_to_cos) -> TimestepEmbedding(1280)`; SDXL adds
    `addition_embed_type="text_time"`: pooled text [B, 1280] concat with six
    256-dim sinusoidal time-id embeddings -> add_embedding MLP (2816 -> 1280)
    added onto the timestep embedding;
  - mid: resnet -> transformer -> resnet; up blocks upsample (nearest 2x +
    conv) at the END of each non-final level. SDXL is 3 levels
    (320/640/1280) with NO attention at level 0 (DownBlock2D first, the
    mirror image of SD2's attention-free deepest level).

Tracing is a return value, not a hook: the forward returns every
cross-attention probability map (what `daam.trace` collects via monkey-patched
processors) — one map per BasicTransformerBlock.

The reference's own classes cannot run here (diffusers + daam are not
installed); parity is tested against from-scratch torch oracles of the
diffusers math in tests/test_sd_unet.py (SD2 and SDXL layouts), through the
converter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD2-base values as defaults (model_index: unet/config.json)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # heads per level (diffusers' legacy `attention_head_dim` for SD2 —
    # 64-dim heads: 320/5, 640/10, 1280/20).
    attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    # which levels carry cross-attention transformers (SD2: all but deepest
    # down / first up == DownBlock2D at level 3; SDXL: all but level 0).
    cross_attention_levels: Tuple[bool, ...] = (True, True, True, False)
    context_dim: int = 1024  # OpenCLIP-H penultimate width; SDXL: 2048 (dual)
    num_groups: int = 32
    norm_eps: float = 1e-5
    # BasicTransformerBlocks per Transformer2DModel, per level. `None` means
    # one everywhere (SD1/SD2). SDXL-base: (1, 2, 10); the mid block uses the
    # last entry (diffusers: transformer_layers_per_block[-1]).
    transformer_layers_per_block: Optional[Tuple[int, ...]] = None
    # "text_time" (SDXL): aug_emb = MLP(concat(pooled_text, sin(time_ids))).
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    # input width of add_embedding.linear_1 (SDXL-base: 1280 pooled + 6x256
    # time-id sinusoids = 2816).
    projection_class_embeddings_input_dim: int = 0

    def tlayers(self, level: int) -> int:
        if self.transformer_layers_per_block is None:
            return 1
        return self.transformer_layers_per_block[level]

    @property
    def pooled_text_dim(self) -> int:
        """Width of the pooled-text slice of the text_time addition embed."""
        return (
            self.projection_class_embeddings_input_dim
            - 6 * self.addition_time_embed_dim
        )


# stabilityai/stable-diffusion-xl-base-1.0 unet/config.json (reference
# daam_sdxl.py:14-20 loads this checkpoint): 3 levels, transformer depths
# (1, 2, 10), dual-encoder 2048-d context, text_time addition embeddings
# (pooled 1280 + 6 time-ids x 256 = 2816).
SDXL_BASE_CONFIG = UNetConfig(
    block_out_channels=(320, 640, 1280),
    layers_per_block=2,
    attention_heads=(5, 10, 20),
    cross_attention_levels=(False, True, True),
    context_dim=2048,
    transformer_layers_per_block=(1, 2, 10),
    addition_embed_type="text_time",
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=2816,
)


def _conv(x, p, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _gn(x, p, groups, eps=1e-5):
    import math

    b, c, h, w = x.shape
    g = math.gcd(groups, c)
    xf = x.astype(jnp.float32).reshape(b, g, c // g, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, h, w).astype(x.dtype)
    return xf * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def _ln(x, p, eps=1e-5):
    mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _timesteps_embedding(t: jax.Array, dim: int) -> jax.Array:
    """diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(10_000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _resblock(p, x, temb, groups, eps):
    h = _conv(_silu(_gn(x, p["norm1"], groups, eps)), p["conv1"])
    h = h + (_silu(temb) @ p["time_emb"]["w"] + p["time_emb"]["b"])[:, :, None, None]
    h = _conv(_silu(_gn(h, p["norm2"], groups, eps)), p["conv2"])
    if "shortcut" in p:
        x = _conv(x, p["shortcut"], padding=0)
    return x + h


def _attention(p, x_seq, context, num_heads):
    """diffusers Attention: bias-free q/k/v, to_out with bias.
    Returns (out, probs [B, H, N, T])."""
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


def _geglu_ff(p, x):
    """GEGLU: net.0.proj -> split -> x * gelu(gate) -> net.2."""
    h = x @ p["ff_in"]["w"] + p["ff_in"]["b"]
    val, gate = jnp.split(h, 2, axis=-1)
    return (val * jax.nn.gelu(gate)) @ p["ff_out"]["w"] + p["ff_out"]["b"]


def _transformer_block(p, x, context, num_heads, groups):
    """Transformer2DModel(use_linear_projection=True) with N
    BasicTransformerBlocks (p["blocks"]); returns (x, [cross-attn probs] —
    one per inner block, what daam hooks collect per cross-attn module)."""
    b, c, h, w = x.shape
    residual = x
    seq = _gn(x, p["norm"], groups, eps=1e-6).reshape(b, c, h * w).transpose(0, 2, 1)
    seq = seq @ p["proj_in"]["w"] + p["proj_in"]["b"]
    all_probs = []
    for bp in p["blocks"]:
        normed = _ln(seq, bp["norm1"])
        sa, _ = _attention(bp["attn1"], normed, normed, num_heads)
        seq = seq + sa
        ca, probs = _attention(bp["attn2"], _ln(seq, bp["norm2"]), context, num_heads)
        seq = seq + ca
        seq = seq + _geglu_ff(bp, _ln(seq, bp["norm3"]))
        all_probs.append(probs)
    seq = seq @ p["proj_out"]["w"] + p["proj_out"]["b"]
    return residual + seq.transpose(0, 2, 1).reshape(b, c, h, w), all_probs


def unet_forward(
    params: Dict[str, Any],
    cfg: UNetConfig,
    latents: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    text_embeds: Optional[jax.Array] = None,
    time_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, List[jax.Array]]:
    """latents [B, 4, H, W], context [B, T, ctx] -> (eps-pred, cross-attn
    probability maps per BasicTransformerBlock, each [B, heads, hw, T] at
    that level's resolution — what daam.trace hooks collect).

    SDXL (cfg.addition_embed_type == "text_time") additionally requires the
    diffusers `added_cond_kwargs`: `text_embeds` [B, pooled] and `time_ids`
    [B, 6] (reference daam_sdxl.py:55-70 builds them via _get_add_time_ids).
    """
    groups, eps = cfg.num_groups, cfg.norm_eps
    temb = _timesteps_embedding(timesteps, cfg.block_out_channels[0])
    temb = _silu(temb @ params["time1"]["w"] + params["time1"]["b"])
    temb = temb @ params["time2"]["w"] + params["time2"]["b"]
    if cfg.addition_embed_type == "text_time":
        if text_embeds is None or time_ids is None:
            raise ValueError(
                "text_time UNet (SDXL) needs text_embeds [B, pooled] and "
                "time_ids [B, 6] added conditions"
            )
        b = time_ids.shape[0]
        # add_time_proj: per-id sinusoid, flattened [B, 6*addition_dim]
        # (diffusers UNet2DConditionModel.get_aug_embed text_time branch).
        tid = _timesteps_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(b, -1)
        add = jnp.concatenate(
            [text_embeds.astype(tid.dtype), tid], axis=-1
        )
        aug = _silu(add @ params["add1"]["w"] + params["add1"]["b"])
        temb = temb + (aug @ params["add2"]["w"] + params["add2"]["b"])

    maps: List[jax.Array] = []
    h = _conv(latents, params["conv_in"])
    skips = [h]
    n_levels = len(cfg.block_out_channels)
    for i, block in enumerate(params["down"]):
        heads = cfg.attention_heads[i]
        for j in range(cfg.layers_per_block):
            h = _resblock(block["resnets"][j], h, temb, groups, eps)
            if cfg.cross_attention_levels[i]:
                h, probs = _transformer_block(
                    block["attentions"][j], h, context, heads, groups
                )
                maps.extend(probs)
            skips.append(h)
        if i < n_levels - 1:
            h = _conv(h, block["downsample"], stride=2)
            skips.append(h)

    h = _resblock(params["mid"]["res1"], h, temb, groups, eps)
    h, probs = _transformer_block(
        params["mid"]["attn"], h, context, cfg.attention_heads[-1], groups
    )
    maps.extend(probs)
    h = _resblock(params["mid"]["res2"], h, temb, groups, eps)

    for k, block in enumerate(params["up"]):
        i = n_levels - 1 - k  # level index
        heads = cfg.attention_heads[i]
        for j in range(cfg.layers_per_block + 1):
            h = jnp.concatenate([h, skips.pop()], axis=1)
            h = _resblock(block["resnets"][j], h, temb, groups, eps)
            if cfg.cross_attention_levels[i]:
                h, probs = _transformer_block(
                    block["attentions"][j], h, context, heads, groups
                )
                maps.extend(probs)
        if k < n_levels - 1:
            h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
            h = _conv(h, block["upsample"])

    h = _conv(_silu(_gn(h, params["norm_out"], groups, eps)), params["conv_out"])
    return h, maps


def init_unet_params(key: jax.Array, cfg: UNetConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4096))

    def conv(cin, cout, k=3):
        fan = cin * k * k
        return {
            "w": (jax.random.normal(next(keys), (cout, cin, k, k), jnp.float32) / fan**0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    def lin(cin, cout, bias=True):
        p = {"w": (jax.random.normal(next(keys), (cin, cout), jnp.float32) / cin**0.5).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def ln(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    tdim = cfg.block_out_channels[0] * 4

    def res(cin, cout):
        p = {
            "norm1": gn(cin), "conv1": conv(cin, cout),
            "time_emb": lin(tdim, cout),
            "norm2": gn(cout), "conv2": conv(cout, cout),
        }
        if cin != cout:
            p["shortcut"] = conv(cin, cout, k=1)
        return p

    def basic_block(c):
        return {
            "norm1": ln(c),
            "attn1": {"q": lin(c, c, False), "k": lin(c, c, False),
                      "v": lin(c, c, False), "proj": lin(c, c)},
            "norm2": ln(c),
            "attn2": {"q": lin(c, c, False), "k": lin(cfg.context_dim, c, False),
                      "v": lin(cfg.context_dim, c, False), "proj": lin(c, c)},
            "norm3": ln(c),
            "ff_in": lin(c, 8 * c),
            "ff_out": lin(4 * c, c),
        }

    def attn(c, n_blocks=1):
        return {
            "norm": gn(c),
            "proj_in": lin(c, c),
            "blocks": [basic_block(c) for _ in range(n_blocks)],
            "proj_out": lin(c, c),
        }

    chans = cfg.block_out_channels
    n_levels = len(chans)
    down = []
    c_prev = chans[0]
    for i in range(n_levels):
        c_out = chans[i]
        block: Dict[str, Any] = {
            "resnets": [res(c_prev if j == 0 else c_out, c_out)
                        for j in range(cfg.layers_per_block)],
        }
        if cfg.cross_attention_levels[i]:
            block["attentions"] = [
                attn(c_out, cfg.tlayers(i)) for _ in range(cfg.layers_per_block)
            ]
        if i < n_levels - 1:
            block["downsample"] = conv(c_out, c_out)
        down.append(block)
        c_prev = c_out

    # mid transformer depth = last level's (diffusers: [-1])
    mid = {"res1": res(c_prev, c_prev),
           "attn": attn(c_prev, cfg.tlayers(n_levels - 1)),
           "res2": res(c_prev, c_prev)}

    # Up path: diffusers pops one skip per resnet. Skip channels at level i,
    # walking backward: the skips stack holds [conv_in] + per-level
    # [resnet x layers] + [downsample] entries.
    skip_chans = [chans[0]]
    for i in range(n_levels):
        skip_chans += [chans[i]] * cfg.layers_per_block
        if i < n_levels - 1:
            skip_chans.append(chans[i])
    up = []
    for k in range(n_levels):
        i = n_levels - 1 - k
        c_out = chans[i]
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            c_skip = skip_chans.pop()
            block["resnets"].append(res(c_prev + c_skip, c_out))
            c_prev = c_out
        if cfg.cross_attention_levels[i]:
            block["attentions"] = [
                attn(c_out, cfg.tlayers(i)) for _ in range(cfg.layers_per_block + 1)
            ]
        if k < n_levels - 1:
            block["upsample"] = conv(c_out, c_out)
        up.append(block)

    out = {
        "time1": lin(chans[0], tdim),
        "time2": lin(tdim, tdim),
        "conv_in": conv(cfg.in_channels, chans[0]),
        "down": down,
        "mid": mid,
        "up": up,
        "norm_out": gn(c_prev),
        "conv_out": conv(c_prev, cfg.out_channels),
    }
    if cfg.addition_embed_type == "text_time":
        out["add1"] = lin(cfg.projection_class_embeddings_input_dim, tdim)
        out["add2"] = lin(tdim, tdim)
    return out
