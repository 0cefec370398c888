"""Torch/safetensors checkpoint -> JAX param-pytree conversion.

Key-name contract: the official Flux safetensors layout (the module tree the
reference loads at `flux/src/flux/util.py:105-127` — e.g.
`double_blocks.0.img_attn.qkv.weight`, `single_blocks.5.linear1.bias`,
`final_layer.adaLN_modulation.1.weight`) and the corresponding VAE tree
(`encoder.down.0.block.1.norm1.weight`, ...).

Transformations applied:
  - torch Linear weights are [out, in]; ours are [in, out] -> transpose;
  - fused qkv weights [3*H*Dh, D] -> 4D [D, 3, H, Dh] (head-shardable);
  - single-block linear1/linear2 are split into qkv/mlp_in/proj/mlp_out
    leaves at the 3*hidden boundary (identical math, shardable);
  - per-layer tensors are stacked along a leading depth axis for lax.scan;
  - conv weights stay OIHW (our VAE computes in NCHW/OIHW).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.config import AutoEncoderConfig, FluxConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu")
        if x.dtype.__str__() == "torch.bfloat16":
            x = x.float()
        return x.numpy()
    return np.asarray(x)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


class _SD:
    """State-dict view with access tracking (reports unused keys)."""

    def __init__(self, sd: Mapping[str, Any], dtype):
        self.sd = sd
        self.dtype = dtype
        self.used = set()

    def __call__(self, key: str, transpose: bool = False) -> jnp.ndarray:
        self.used.add(key)
        x = _np(self.sd[key]).astype(np.float32)
        if transpose:
            x = x.T
        return jnp.asarray(x, dtype=self.dtype)

    def linear(self, key: str, bias: bool = True) -> Dict[str, jnp.ndarray]:
        p = {"w": self(f"{key}.weight", transpose=True)}
        if bias and f"{key}.bias" in self.sd:
            p["b"] = self(f"{key}.bias")
        return p

    def unused(self):
        return sorted(set(self.sd.keys()) - self.used)


def _qkv_from_fused(w_t: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[D, 3*H*Dh] (already transposed) -> [D, 3, H, Dh]."""
    d, thd = w_t.shape
    head_dim = thd // (3 * num_heads)
    return w_t.reshape(d, 3, num_heads, head_dim)


def _mlp_embedder(sd: _SD, key: str) -> Dict[str, Any]:
    return {"in": sd.linear(f"{key}.in_layer"), "out": sd.linear(f"{key}.out_layer")}


def convert_flux_state_dict(
    sd: Mapping[str, Any], cfg: FluxConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Flux DiT torch state dict -> our param pytree."""
    s = _SD(sd, dtype)
    h = cfg.num_heads
    hd = cfg.head_dim

    def double_layer(i: int) -> Dict[str, Any]:
        p: Dict[str, Any] = {}
        for stream, attn in (("img", "img_attn"), ("txt", "txt_attn")):
            base = f"double_blocks.{i}"
            p[f"{stream}_mod"] = s.linear(f"{base}.{stream}_mod.lin")
            qkv = s.linear(f"{base}.{attn}.qkv")
            p[f"{stream}_qkv"] = {"w": _qkv_from_fused(qkv["w"], h)}
            if "b" in qkv:
                p[f"{stream}_qkv"]["b"] = qkv["b"].reshape(3, h, hd)
            p[f"{stream}_qnorm"] = s(f"{base}.{attn}.norm.query_norm.scale")
            p[f"{stream}_knorm"] = s(f"{base}.{attn}.norm.key_norm.scale")
            p[f"{stream}_proj"] = s.linear(f"{base}.{attn}.proj")
            p[f"{stream}_mlp_in"] = s.linear(f"{base}.{stream}_mlp.0")
            p[f"{stream}_mlp_out"] = s.linear(f"{base}.{stream}_mlp.2")
        return p

    def single_layer(i: int) -> Dict[str, Any]:
        base = f"single_blocks.{i}"
        d = cfg.hidden_size
        l1 = s.linear(f"{base}.linear1")
        l2 = s.linear(f"{base}.linear2")
        return {
            "mod": s.linear(f"{base}.modulation.lin"),
            "qkv": {
                "w": _qkv_from_fused(l1["w"][:, : 3 * d], h),
                "b": l1["b"][: 3 * d].reshape(3, h, hd),
            },
            "mlp_in": {"w": l1["w"][:, 3 * d :], "b": l1["b"][3 * d :]},
            "proj": {"w": l2["w"][:d], "b": l2["b"]},
            "mlp_out": {"w": l2["w"][d:]},
            "qnorm": s(f"{base}.norm.query_norm.scale"),
            "knorm": s(f"{base}.norm.key_norm.scale"),
        }

    params: Dict[str, Any] = {
        "img_in": s.linear("img_in"),
        "txt_in": s.linear("txt_in"),
        "time_in": _mlp_embedder(s, "time_in"),
        "vector_in": _mlp_embedder(s, "vector_in"),
        "final": {
            "adaln": s.linear("final_layer.adaLN_modulation.1"),
            "linear": s.linear("final_layer.linear"),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = _mlp_embedder(s, "guidance_in")

    import jax

    double = [double_layer(i) for i in range(cfg.depth)]
    single = [single_layer(i) for i in range(cfg.depth_single_blocks)]
    params["double"] = jax.tree.map(lambda *xs: jnp.stack(xs), *double)
    params["single"] = jax.tree.map(lambda *xs: jnp.stack(xs), *single)
    return params


def _conv(sd: _SD, key: str) -> Dict[str, jnp.ndarray]:
    return {"w": sd(f"{key}.weight"), "b": sd(f"{key}.bias")}


def _gn(sd: _SD, key: str) -> Dict[str, jnp.ndarray]:
    return {"scale": sd(f"{key}.weight"), "bias": sd(f"{key}.bias")}


def _resnet(sd: _SD, key: str) -> Dict[str, Any]:
    p = {
        "norm1": _gn(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _gn(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.nin_shortcut.weight" in sd.sd:
        p["nin_shortcut"] = _conv(sd, f"{key}.nin_shortcut")
    return p


def _attn(sd: _SD, key: str) -> Dict[str, Any]:
    return {
        "norm": _gn(sd, f"{key}.norm"),
        "q": _conv(sd, f"{key}.q"),
        "k": _conv(sd, f"{key}.k"),
        "v": _conv(sd, f"{key}.v"),
        "proj_out": _conv(sd, f"{key}.proj_out"),
    }


def convert_autoencoder_state_dict(
    sd: Mapping[str, Any], cfg: AutoEncoderConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Flux VAE torch state dict -> our param pytree."""
    s = _SD(sd, dtype)
    n_levels = len(cfg.ch_mult)

    enc: Dict[str, Any] = {"conv_in": _conv(s, "encoder.conv_in")}
    down = []
    for i in range(n_levels):
        level: Dict[str, Any] = {
            "block": [
                _resnet(s, f"encoder.down.{i}.block.{j}")
                for j in range(cfg.num_res_blocks)
            ]
        }
        if i != n_levels - 1:
            level["downsample"] = {"conv": _conv(s, f"encoder.down.{i}.downsample.conv")}
        down.append(level)
    enc["down"] = down
    enc["mid_block_1"] = _resnet(s, "encoder.mid.block_1")
    enc["mid_attn_1"] = _attn(s, "encoder.mid.attn_1")
    enc["mid_block_2"] = _resnet(s, "encoder.mid.block_2")
    enc["norm_out"] = _gn(s, "encoder.norm_out")
    enc["conv_out"] = _conv(s, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(s, "decoder.conv_in")}
    dec["mid_block_1"] = _resnet(s, "decoder.mid.block_1")
    dec["mid_attn_1"] = _attn(s, "decoder.mid.attn_1")
    dec["mid_block_2"] = _resnet(s, "decoder.mid.block_2")
    up = []
    for i in range(n_levels):
        level = {
            "block": [
                _resnet(s, f"decoder.up.{i}.block.{j}")
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if i != 0:
            level["upsample"] = {"conv": _conv(s, f"decoder.up.{i}.upsample.conv")}
        up.append(level)
    dec["up"] = up
    dec["norm_out"] = _gn(s, "decoder.norm_out")
    dec["conv_out"] = _conv(s, "decoder.conv_out")

    return {"encoder": enc, "decoder": dec}


def convert_cogvideox_state_dict(
    sd: Mapping[str, Any], cfg, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """diffusers `CogVideoXTransformer3DModel` state dict -> our param pytree
    (models/video/dit.py). Key layout per the reference's base class
    (experiments/video_model/cogvideox/modified_dit.py:122-196):
    `patch_embed.proj` (2x2 conv), `patch_embed.text_proj`,
    `time_embedding.linear_{1,2}`, `transformer_blocks.{i}.{norm1,norm2}.
    {norm,linear}`, `.attn1.{to_q,to_k,to_v,norm_q,norm_k,to_out.0}`,
    `.ff.net.{0.proj,2}`, `norm_final`, `norm_out.{norm,linear}`, `proj_out`.
    """
    s = _SD(sd, dtype)

    def ln(key):
        return {"w": s(f"{key}.weight"), "b": s(f"{key}.bias")}

    def block(i):
        base = f"transformer_blocks.{i}"
        # Separate q/k/v [D, D] each (transposed) -> fused [D, 3D] laid out
        # (3, H, hd): plain concat along the output axis.
        wq = s(f"{base}.attn1.to_q.weight", transpose=True)
        wk = s(f"{base}.attn1.to_k.weight", transpose=True)
        wv = s(f"{base}.attn1.to_v.weight", transpose=True)
        qkv = {"w": jnp.concatenate([wq, wk, wv], axis=1)}
        if f"{base}.attn1.to_q.bias" in s.sd:
            qkv["b"] = jnp.concatenate(
                [s(f"{base}.attn1.to_{x}.bias") for x in ("q", "k", "v")]
            )
        return {
            "norm1": {"ln": ln(f"{base}.norm1.norm"), "lin": s.linear(f"{base}.norm1.linear")},
            "norm2": {"ln": ln(f"{base}.norm2.norm"), "lin": s.linear(f"{base}.norm2.linear")},
            "qkv": qkv,
            "qnorm": ln(f"{base}.attn1.norm_q"),
            "knorm": ln(f"{base}.attn1.norm_k"),
            "proj": s.linear(f"{base}.attn1.to_out.0"),
            "ff_in": s.linear(f"{base}.ff.net.0.proj"),
            "ff_out": s.linear(f"{base}.ff.net.2"),
        }

    # Conv patch kernel [D, C, p, p] -> matmul weight [C*p*p, D]; the
    # (c, dy, dx) flatten order matches patchify_latents.
    conv_w = _np(sd["patch_embed.proj.weight"]).astype(np.float32)
    d_out = conv_w.shape[0]
    s.used.add("patch_embed.proj.weight")
    patch_proj = {
        "w": jnp.asarray(conv_w.reshape(d_out, -1).T, dtype=dtype),
        "b": s("patch_embed.proj.bias"),
    }

    import jax

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "patch_proj": patch_proj,
        "text_proj": s.linear("patch_embed.text_proj"),
        "time_lin1": s.linear("time_embedding.linear_1"),
        "time_lin2": s.linear("time_embedding.linear_2"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_final": ln("norm_final"),
        "norm_out_ln": ln("norm_out.norm"),
        "norm_out_lin": s.linear("norm_out.linear"),
        "proj_out": s.linear("proj_out"),
    }


def convert_cogvideox_vae_state_dict(
    sd: Mapping[str, Any], cfg, dtype=jnp.float32
) -> Dict[str, Any]:
    """diffusers `AutoencoderKLCogVideoX` state dict -> our param pytree
    (models/video/vae.py). Key layout per the published diffusers model:
    causal convs wrap the kernel as `<name>.conv.weight` (OIDHW, imported
    as-is), 1x1 resnet shortcuts are bare `conv_shortcut.weight`,
    downsamplers/upsamplers are per-frame Conv2d at `<blk>.{down,up}samplers.
    0.conv.weight`, and decoder norms are SpatialNorm3D triplets
    (`norm_layer` + `conv_y.conv` + `conv_b.conv`)."""
    s = _SD(sd, dtype)

    def conv(key):  # CausalConv3d / Conv2d / plain SafeConv3d weights
        inner = f"{key}.conv.weight" if f"{key}.conv.weight" in s.sd else f"{key}.weight"
        base = inner[: -len(".weight")]
        return {"w": s(f"{base}.weight"), "b": s(f"{base}.bias")}

    def gn(key):
        return {"scale": s(f"{key}.weight"), "bias": s(f"{key}.bias")}

    def sn(key):
        return {"norm": gn(f"{key}.norm_layer"), "conv_y": conv(f"{key}.conv_y"),
                "conv_b": conv(f"{key}.conv_b")}

    def resnet(key, spatial: bool):
        p = {
            "norm1": sn(f"{key}.norm1") if spatial else gn(f"{key}.norm1"),
            "conv1": conv(f"{key}.conv1"),
            "norm2": sn(f"{key}.norm2") if spatial else gn(f"{key}.norm2"),
            "conv2": conv(f"{key}.conv2"),
        }
        if f"{key}.conv_shortcut.weight" in s.sd or f"{key}.conv_shortcut.conv.weight" in s.sd:
            p["conv_shortcut"] = conv(f"{key}.conv_shortcut")
        return p

    n_blocks = len(cfg.block_out_channels)
    down = []
    for i in range(n_blocks):
        base = f"encoder.down_blocks.{i}"
        block = {"resnets": [resnet(f"{base}.resnets.{j}", False)
                             for j in range(cfg.layers_per_block)]}
        if f"{base}.downsamplers.0.conv.weight" in s.sd:
            block["downsample"] = conv(f"{base}.downsamplers.0.conv")
        down.append(block)
    enc = {
        "conv_in": conv("encoder.conv_in"),
        "down": down,
        "mid": [resnet(f"encoder.mid_block.resnets.{j}", False) for j in range(2)],
        "norm_out": gn("encoder.norm_out"),
        "conv_out": conv("encoder.conv_out"),
    }

    up = []
    for i in range(n_blocks):
        base = f"decoder.up_blocks.{i}"
        block = {"resnets": [resnet(f"{base}.resnets.{j}", True)
                             for j in range(cfg.layers_per_block + 1)]}
        if f"{base}.upsamplers.0.conv.weight" in s.sd:
            block["upsample"] = conv(f"{base}.upsamplers.0.conv")
        up.append(block)
    dec = {
        "conv_in": conv("decoder.conv_in"),
        "mid": [resnet(f"decoder.mid_block.resnets.{j}", True) for j in range(2)],
        "up": up,
        "norm_out": sn("decoder.norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }
    return {"encoder": enc, "decoder": dec}


def convert_vit_state_dict(sd: Mapping[str, Any], cfg, dtype=jnp.float32) -> Dict[str, Any]:
    """timm/chefer/DINO ViT state dict -> our param pytree (models/vit.py).
    Key layout per the reference's vendored ViTs
    (chefer_vit_explainability/ViT_LRP.py:245-303, dino_src ViTs share it):
    `patch_embed.proj` (conv), `cls_token`, `pos_embed`,
    `blocks.{i}.{norm1,norm2}`, `.attn.{qkv,proj}`, `.mlp.{fc1,fc2}`,
    `norm`, `head`."""
    s = _SD(sd, dtype)

    def ln(key):
        return {"scale": s(f"{key}.weight"), "bias": s(f"{key}.bias")}

    def block(i):
        base = f"blocks.{i}"
        return {
            "norm1": ln(f"{base}.norm1"),
            "attn": {
                "qkv": s.linear(f"{base}.attn.qkv"),
                "proj": s.linear(f"{base}.attn.proj"),
            },
            "norm2": ln(f"{base}.norm2"),
            "mlp_in": s.linear(f"{base}.mlp.fc1"),
            "mlp_out": s.linear(f"{base}.mlp.fc2"),
        }

    conv_w = _np(sd["patch_embed.proj.weight"]).astype(np.float32)
    s.used.add("patch_embed.proj.weight")

    import jax

    blocks = [block(i) for i in range(cfg.depth)]
    return {
        "patch_embed": {
            "w": jnp.asarray(conv_w.reshape(conv_w.shape[0], -1).T, dtype=dtype),
            "b": s("patch_embed.proj.bias"),
        },
        "cls_token": s("cls_token"),
        "pos_embed": s("pos_embed"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": ln("norm"),
        "head": s.linear("head"),
    }


def convert_sd_unet_state_dict(sd: Mapping[str, Any], cfg, dtype=jnp.float32) -> Dict[str, Any]:
    """diffusers `UNet2DConditionModel` (SD2 or SDXL layout,
    use_linear_projection) state dict -> our param pytree (models/sd_unet.py).
    Reference runs these models via StableDiffusionPipeline
    (daam_sd2.py:26-27) and DiffusionPipeline sdxl-base (daam_sdxl.py:14-20);
    pass SDXL_BASE_CONFIG to ingest an sd_xl_base checkpoint (multi-block
    transformers + add_embedding)."""
    s = _SD(sd, dtype)

    def conv(key):
        return {"w": s(f"{key}.weight"), "b": s(f"{key}.bias")}

    def gn(key):
        return {"scale": s(f"{key}.weight"), "bias": s(f"{key}.bias")}

    def res(key):
        p = {
            "norm1": gn(f"{key}.norm1"), "conv1": conv(f"{key}.conv1"),
            "time_emb": s.linear(f"{key}.time_emb_proj"),
            "norm2": gn(f"{key}.norm2"), "conv2": conv(f"{key}.conv2"),
        }
        if f"{key}.conv_shortcut.weight" in s.sd:
            p["shortcut"] = conv(f"{key}.conv_shortcut")
        return p

    def attn_inner(key):
        return {
            "q": s.linear(f"{key}.to_q"),
            "k": s.linear(f"{key}.to_k"),
            "v": s.linear(f"{key}.to_v"),
            "proj": s.linear(f"{key}.to_out.0"),
        }

    def basic_block(tb):
        return {
            "norm1": gn(f"{tb}.norm1"),
            "attn1": attn_inner(f"{tb}.attn1"),
            "norm2": gn(f"{tb}.norm2"),
            "attn2": attn_inner(f"{tb}.attn2"),
            "norm3": gn(f"{tb}.norm3"),
            "ff_in": s.linear(f"{tb}.ff.net.0.proj"),
            "ff_out": s.linear(f"{tb}.ff.net.2"),
        }

    def transformer(key, n_blocks=1):
        # SDXL carries transformer_layers_per_block > 1 inner blocks
        # (sd-xl-base: 1/2/10); SD1/SD2 always exactly one.
        return {
            "norm": gn(f"{key}.norm"),
            "proj_in": s.linear(f"{key}.proj_in"),
            "blocks": [
                basic_block(f"{key}.transformer_blocks.{n}")
                for n in range(n_blocks)
            ],
            "proj_out": s.linear(f"{key}.proj_out"),
        }

    n_levels = len(cfg.block_out_channels)
    down = []
    for i in range(n_levels):
        base = f"down_blocks.{i}"
        block: Dict[str, Any] = {
            "resnets": [res(f"{base}.resnets.{j}") for j in range(cfg.layers_per_block)],
        }
        if cfg.cross_attention_levels[i]:
            block["attentions"] = [
                transformer(f"{base}.attentions.{j}", cfg.tlayers(i))
                for j in range(cfg.layers_per_block)
            ]
        if f"{base}.downsamplers.0.conv.weight" in s.sd:
            block["downsample"] = conv(f"{base}.downsamplers.0.conv")
        down.append(block)

    up = []
    for k in range(n_levels):
        i = n_levels - 1 - k
        base = f"up_blocks.{k}"
        block = {
            "resnets": [
                res(f"{base}.resnets.{j}") for j in range(cfg.layers_per_block + 1)
            ],
        }
        if cfg.cross_attention_levels[i]:
            block["attentions"] = [
                transformer(f"{base}.attentions.{j}", cfg.tlayers(i))
                for j in range(cfg.layers_per_block + 1)
            ]
        if f"{base}.upsamplers.0.conv.weight" in s.sd:
            block["upsample"] = conv(f"{base}.upsamplers.0.conv")
        up.append(block)

    out = {
        "time1": s.linear("time_embedding.linear_1"),
        "time2": s.linear("time_embedding.linear_2"),
        "conv_in": conv("conv_in"),
        "down": down,
        "mid": {
            "res1": res("mid_block.resnets.0"),
            "attn": transformer(
                "mid_block.attentions.0", cfg.tlayers(n_levels - 1)
            ),
            "res2": res("mid_block.resnets.1"),
        },
        "up": up,
        "norm_out": gn("conv_norm_out"),
        "conv_out": conv("conv_out"),
    }
    if getattr(cfg, "addition_embed_type", None) == "text_time":
        # SDXL pooled-text + time-ids augmentation MLP (add_embedding).
        out["add1"] = s.linear("add_embedding.linear_1")
        out["add2"] = s.linear("add_embedding.linear_2")
    return out
