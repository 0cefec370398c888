"""LoRA adapters for the Flux DiT: conversion, merging, and low-rank pytrees.

The reference (manuragkhullar/ConceptAttention) is inference-only and loads
monolithic checkpoints (`flux/src/flux/util.py:105-127`); it has no adapter
story. The flux ecosystem this framework serves, however, ships most
community fine-tunes as LoRA deltas, so adapter support is table stakes for a
complete serving/training framework.

Three published naming conventions are ingested by `convert_lora_state_dict`:

  1. BFL module tree + PEFT naming (the layout matching the official flux
     safetensors this repo's converter consumes):
       double_blocks.{i}.img_attn.qkv.lora_A.weight   (A: [r, in])
       double_blocks.{i}.img_attn.qkv.lora_B.weight   (B: [out, r])
       double_blocks.{i}.img_attn.qkv.alpha           (scalar, optional)
  2. kohya sd-scripts naming over the same tree ('.' munged to '_' with a
     `lora_unet_` prefix, `lora_down`/`lora_up` for A/B):
       lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight
  3. diffusers `FluxTransformer2DModel` + PEFT naming (optionally prefixed
     `transformer.`): separate attn.to_q/to_k/to_v (fused into our 4D qkv as
     a block-diagonal low-rank factor), norm1.linear -> img_mod,
     ff.net.{0.proj,2} -> img_mlp_{in,out}, *_context/add_* -> the txt
     stream, and single-block proj_mlp / proj_out (the proj_out input-axis
     split mirrors weights/convert.py's linear2 split).

The converted adapter is a pytree mirroring the params layout
(`models/flux/params.py`): {"double": {...}, "single": {...}} whose leaves
are {"a": [depth, in, R], "b": [depth, R, out]} float32 factors with
alpha/rank already folded into `b`, per-layer zero-padded to a common rank so
the stack scans. `merge_lora` adds strength * a @ b onto the matching weight
leaves — including int8-quantized leaves, which are dequantized, merged, and
requantized per (layer, out-channel).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.weights.convert import _np

# ---------------------------------------------------------------------------
# key normalization


_KOHYA_MODULES = {
    # munged -> dotted (BFL module tree)
    "img_attn_qkv": "img_attn.qkv",
    "img_attn_proj": "img_attn.proj",
    "img_mod_lin": "img_mod.lin",
    "img_mlp_0": "img_mlp.0",
    "img_mlp_2": "img_mlp.2",
    "txt_attn_qkv": "txt_attn.qkv",
    "txt_attn_proj": "txt_attn.proj",
    "txt_mod_lin": "txt_mod.lin",
    "txt_mlp_0": "txt_mlp.0",
    "txt_mlp_2": "txt_mlp.2",
    "linear1": "linear1",
    "linear2": "linear2",
    "modulation_lin": "modulation.lin",
}

_KOHYA_RE = re.compile(
    r"^lora_(?:unet|transformer)_(double_blocks|single_blocks)_(\d+)_(.+)$"
)


def _normalize_key(key: str) -> Optional[Tuple[str, str]]:
    """Map a raw state-dict key to (module_path, part) where part is one of
    'a', 'b', 'alpha'. Returns None for keys that are not LoRA tensors
    (e.g. text-encoder adapters a combined file may carry)."""
    if key.endswith(".lora_A.weight") or key.endswith(".lora_down.weight"):
        part = "a"
        module = key.rsplit(".", 2)[0]
    elif key.endswith(".lora_B.weight") or key.endswith(".lora_up.weight"):
        part = "b"
        module = key.rsplit(".", 2)[0]
    elif key.endswith(".alpha"):
        part = "alpha"
        module = key[: -len(".alpha")]
    else:
        return None
    if module.startswith("transformer."):
        module = module[len("transformer."):]
    m = _KOHYA_RE.match(module)
    if m:
        blocks, idx, rest = m.groups()
        dotted = _KOHYA_MODULES.get(rest)
        if dotted is None:
            return None
        module = f"{blocks}.{idx}.{dotted}"
    return module, part


# ---------------------------------------------------------------------------
# module-path -> (stack, layer index, plan) resolution

# A "plan" describes how one adapter module lands in the param pytree:
# a list of (leaf_name, a_slice, b_slice, qkv_third) entries. Slices are on
# the fused axes mirroring weights/convert.py's single-block linear1/linear2
# splits; qkv_third places a separate to_q/to_k/to_v factor into the fused
# [in, 3, H, hd] leaf.

_DOUBLE_BFL = {
    "img_attn.qkv": [("img_qkv", None, None, None)],
    "img_attn.proj": [("img_proj", None, None, None)],
    "img_mod.lin": [("img_mod", None, None, None)],
    "img_mlp.0": [("img_mlp_in", None, None, None)],
    "img_mlp.2": [("img_mlp_out", None, None, None)],
    "txt_attn.qkv": [("txt_qkv", None, None, None)],
    "txt_attn.proj": [("txt_proj", None, None, None)],
    "txt_mod.lin": [("txt_mod", None, None, None)],
    "txt_mlp.0": [("txt_mlp_in", None, None, None)],
    "txt_mlp.2": [("txt_mlp_out", None, None, None)],
}

_DOUBLE_DIFFUSERS = {
    "norm1.linear": [("img_mod", None, None, None)],
    "norm1_context.linear": [("txt_mod", None, None, None)],
    "attn.to_q": [("img_qkv", None, None, 0)],
    "attn.to_k": [("img_qkv", None, None, 1)],
    "attn.to_v": [("img_qkv", None, None, 2)],
    "attn.add_q_proj": [("txt_qkv", None, None, 0)],
    "attn.add_k_proj": [("txt_qkv", None, None, 1)],
    "attn.add_v_proj": [("txt_qkv", None, None, 2)],
    "attn.to_out.0": [("img_proj", None, None, None)],
    "attn.to_add_out": [("txt_proj", None, None, None)],
    "ff.net.0.proj": [("img_mlp_in", None, None, None)],
    "ff.net.2": [("img_mlp_out", None, None, None)],
    "ff_context.net.0.proj": [("txt_mlp_in", None, None, None)],
    "ff_context.net.2": [("txt_mlp_out", None, None, None)],
}

_SINGLE_DIFFUSERS = {
    "norm.linear": [("mod", None, None, None)],
    "attn.to_q": [("qkv", None, None, 0)],
    "attn.to_k": [("qkv", None, None, 1)],
    "attn.to_v": [("qkv", None, None, 2)],
    "proj_mlp": [("mlp_in", None, None, None)],
    # proj_out input axis is [attn_out | mlp]: split A's rows like
    # convert.py splits linear2 (proj = w[:d], mlp_out = w[d:]).
    "proj_out": [("proj", "in_head", None, None), ("mlp_out", "in_tail", None, None)],
}


def _single_bfl_plan(cfg: FluxConfig, module: str):
    if module == "modulation.lin":
        return [("mod", None, None, None)]
    if module in ("qkv", "mlp_in", "proj", "mlp_out"):
        # leaf-direct names as produced by training.lora.export_lora_state_dict
        # (adapters trained against this repo's already-split single blocks)
        return [(module, None, None, None)]
    if module == "linear1":
        # Output axis is [qkv | mlp_in]: split B's rows at 3*hidden.
        return [("qkv", None, "out_head", None), ("mlp_in", None, "out_tail", None)]
    if module == "linear2":
        return [("proj", "in_head", None, None), ("mlp_out", "in_tail", None, None)]
    return None


def _resolve(cfg: FluxConfig, module: str):
    """module path -> (stack_name, layer_idx, plan) or None."""
    parts = module.split(".")
    if parts[0] == "double_blocks" and len(parts) >= 3:
        rest = ".".join(parts[2:])
        plan = _DOUBLE_BFL.get(rest)
        if plan:
            return "double", int(parts[1]), plan
    elif parts[0] == "single_blocks" and len(parts) >= 3:
        plan = _single_bfl_plan(cfg, ".".join(parts[2:]))
        if plan:
            return "single", int(parts[1]), plan
    elif parts[0] == "transformer_blocks" and len(parts) >= 3:
        plan = _DOUBLE_DIFFUSERS.get(".".join(parts[2:]))
        if plan:
            return "double", int(parts[1]), plan
    elif parts[0] == "single_transformer_blocks" and len(parts) >= 3:
        plan = _SINGLE_DIFFUSERS.get(".".join(parts[2:]))
        if plan:
            return "single", int(parts[1]), plan
    return None


# ---------------------------------------------------------------------------
# conversion


def convert_lora_state_dict(
    sd: Mapping[str, Any], cfg: FluxConfig, strict: bool = True
) -> Dict[str, Any]:
    """Torch/safetensors LoRA state dict -> low-rank adapter pytree.

    Returns {"double": {leaf: {"a", "b"}}, "single": {...}} mirroring the
    param layout, leaves stacked [depth, in, R] / [depth, R, out] float32
    with alpha/rank folded into b. Layers an adapter does not touch get zero
    factors; differing per-layer ranks are zero-padded to the max.

    strict=True raises on LoRA keys that resolve to no known module
    (text-encoder adapters in combined files are always skipped silently).
    """
    d = cfg.hidden_size
    # modules[(stack, layer, leaf)] -> list of factor dicts
    grouped: Dict[str, Dict[str, Any]] = {}
    unmatched: List[str] = []
    for key in sd.keys():
        norm = _normalize_key(key)
        if norm is None:
            continue
        module, part = norm
        if module.split(".")[0].startswith(("te", "text_encoder", "lora_te")):
            continue
        grouped.setdefault(module, {})[part] = sd[key]

    # accum[(stack, leaf)][layer] -> list of (a [in, r], b [r, out], third)
    accum: Dict[Tuple[str, str], Dict[int, List]] = {}
    for module, parts in grouped.items():
        if "a" not in parts or "b" not in parts:
            unmatched.append(module)
            continue
        resolved = _resolve(cfg, module)
        if resolved is None:
            unmatched.append(module)
            continue
        stack, layer, plan = resolved
        a = _np(parts["a"]).astype(np.float32)  # [r, in]
        b = _np(parts["b"]).astype(np.float32)  # [out, r]
        r = a.shape[0]
        alpha = float(_np(parts["alpha"])) if "alpha" in parts else float(r)
        a_t = a.T                       # [in, r]
        b_t = b.T * (alpha / r)         # [r, out]
        for leaf, a_slice, b_slice, third in plan:
            av, bv = a_t, b_t
            if a_slice == "in_head":
                av = a_t[:d]
            elif a_slice == "in_tail":
                av = a_t[d:]
            if b_slice == "out_head":
                bv = b_t[:, : 3 * d]
            elif b_slice == "out_tail":
                bv = b_t[:, 3 * d :]
            accum.setdefault((stack, leaf), {}).setdefault(layer, []).append(
                (av, bv, third)
            )

    if strict and unmatched:
        raise ValueError(
            f"unrecognized LoRA modules (pass strict=False to skip): "
            f"{unmatched[:8]}{'...' if len(unmatched) > 8 else ''}"
        )

    depths = {"double": cfg.depth, "single": cfg.depth_single_blocks}
    return _stack_accum(accum, depths)


def _stack_accum(
    accum: Dict[Tuple[str, str], Dict[int, List]],
    depths: Dict[str, int],
) -> Dict[str, Any]:
    """Stack per-layer (a, b[, third]) factor lists into [depth, in, R] /
    [depth, R, out] arrays: untouched layers get zero factors, differing
    per-layer ranks zero-pad to the max, and separate q/k/v thirds become one
    block-diagonal low-rank factor over the fused output axis (a =
    rank-concat, b places each third's columns in its own out-slice)."""
    out: Dict[str, Any] = {stack: {} for stack in depths}
    for (stack, leaf), layers in accum.items():
        depth = depths[stack]
        per_layer: List[Tuple[np.ndarray, np.ndarray]] = []
        for i in range(depth):
            factors = layers.get(i, [])
            if not factors:
                per_layer.append(None)
                continue
            if any(t is not None for _, _, t in factors):
                a_parts, b_parts = [], []
                for av, bv, third in sorted(factors, key=lambda f: f[2]):
                    d_out = bv.shape[1]  # one third's output width
                    full = np.zeros((bv.shape[0], 3 * d_out), np.float32)
                    full[:, third * d_out : (third + 1) * d_out] = bv
                    a_parts.append(av)
                    b_parts.append(full)
                a_cat = np.concatenate(a_parts, axis=1)
                b_cat = np.concatenate(b_parts, axis=0)
                per_layer.append((a_cat, b_cat))
            else:
                av, bv, _ = factors[0]
                per_layer.append((av, bv))
        shapes = [(a.shape, b.shape) for ab in per_layer if ab for a, b in [ab]]
        in_dim = shapes[0][0][0]
        out_dim = shapes[0][1][1]
        rank = max(s[0][1] for s in shapes)
        a_stack = np.zeros((depth, in_dim, rank), np.float32)
        b_stack = np.zeros((depth, rank, out_dim), np.float32)
        for i, ab in enumerate(per_layer):
            if ab is None:
                continue
            av, bv = ab
            a_stack[i, :, : av.shape[1]] = av
            b_stack[i, : bv.shape[0]] = bv
        out[stack][leaf] = {"a": jnp.asarray(a_stack), "b": jnp.asarray(b_stack)}
    return out


def load_lora(path: str, cfg: FluxConfig, strict: bool = True) -> Dict[str, Any]:
    """Load a LoRA safetensors file into an adapter pytree."""
    from conceptattention_tpu.weights.convert import load_safetensors

    return convert_lora_state_dict(load_safetensors(path), cfg, strict=strict)


# Video (CogVideoX) DiT adapters — diffusers `CogVideoXTransformer3DModel`
# module names onto the param layout of weights/convert.py's
# convert_cogvideox_state_dict (qkv = [D, 3D] with to_q|to_k|to_v
# concatenated along the output axis).
_VIDEO_MODULES = {
    "attn1.to_q": ("qkv", 0),
    "attn1.to_k": ("qkv", 1),
    "attn1.to_v": ("qkv", 2),
    "attn1.to_out.0": ("proj", None),
    "ff.net.0.proj": ("ff_in", None),
    "ff.net.2": ("ff_out", None),
    "norm1.linear": ("norm1.lin", None),
    "norm2.linear": ("norm2.lin", None),
}


def convert_cogvideox_lora_state_dict(
    sd: Mapping[str, Any], cfg, strict: bool = True
) -> Dict[str, Any]:
    """diffusers-named CogVideoX LoRA state dict -> {"blocks": {leaf}} adapter
    pytree mergeable into convert_cogvideox_state_dict params (cfg =
    CogVideoXConfig; depth = cfg.num_layers). Separate to_q/to_k/to_v factors
    become one block-diagonal factor on the fused qkv, matching the
    checkpoint converter's output-axis concat."""
    grouped: Dict[str, Dict[str, Any]] = {}
    unmatched: List[str] = []
    for key in sd.keys():
        norm = _normalize_key(key)
        if norm is None:
            continue
        module, part = norm
        if module.split(".")[0].startswith(("te", "text_encoder", "lora_te")):
            continue
        grouped.setdefault(module, {})[part] = sd[key]

    accum: Dict[Tuple[str, str], Dict[int, List]] = {}
    for module, parts in grouped.items():
        mp = module.split(".")
        target = None
        if mp[0] == "transformer_blocks" and len(mp) >= 3:
            target = _VIDEO_MODULES.get(".".join(mp[2:]))
        if target is None or "a" not in parts or "b" not in parts:
            unmatched.append(module)
            continue
        leaf, third = target
        layer = int(mp[1])
        a = _np(parts["a"]).astype(np.float32)  # [r, in]
        b = _np(parts["b"]).astype(np.float32)  # [out, r]
        r = a.shape[0]
        alpha = float(_np(parts["alpha"])) if "alpha" in parts else float(r)
        accum.setdefault(("blocks", leaf), {}).setdefault(layer, []).append(
            (a.T, b.T * (alpha / r), third)
        )
    if strict and unmatched:
        raise ValueError(
            f"unrecognized CogVideoX LoRA modules (pass strict=False to "
            f"skip): {unmatched[:8]}{'...' if len(unmatched) > 8 else ''}"
        )
    return _stack_accum(accum, {"blocks": cfg.num_layers})


# ---------------------------------------------------------------------------
# merging


def _requantize_like(wq: Dict[str, jax.Array], merged_f32: jax.Array):
    """Requantize a merged weight in the source cell's scheme: per-(layer,
    out-channel) int8 for {q|qa, scale}, group-wise int4 for {q4p, gscale}."""
    if "q4p" in wq:
        from conceptattention_tpu.ops.quant import quantize_array_w4, w4_dims

        ax, _, group = w4_dims(wq)
        return quantize_array_w4(merged_f32, axis=ax, group_size=group)
    qkey = "qa" if "qa" in wq else "q"
    amax = jnp.max(jnp.abs(merged_f32), axis=1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(merged_f32 / scale), -127, 127).astype(jnp.int8)
    return {qkey: q, "scale": scale.astype(wq["scale"].dtype)}


def _merge_leaf(w, factor: Dict[str, jax.Array], strength: float,
                requantize: bool = True):
    a, b = factor["a"], factor["b"]
    delta = jnp.einsum("dik,dko->dio", a, b) * strength  # [depth, in, out]
    if isinstance(w, dict):  # quantized leaf {q|qa, scale} or {q4p, gscale}
        if "q4p" in w:
            from conceptattention_tpu.ops.quant import dequantize_w4

            wf = dequantize_w4(w, jnp.float32)
        else:
            qkey = "qa" if "qa" in w else "q"
            wf = w[qkey].astype(jnp.float32) * w["scale"].astype(jnp.float32)
        if wf.ndim == 5:  # qkv [depth, in, 3, H, hd]
            delta = delta.reshape(wf.shape)
        if not requantize:
            # Training path: round().astype(int) would zero the adapter's
            # gradient (the tangent dies at the int cast — only the one
            # amax element per group would survive, via the scale). Return
            # the dense float merge instead; the forward runs bf16-class
            # matmuls but grads flow exactly through a @ b.
            return wf + delta
        return _requantize_like(w, wf + delta)
    if w.ndim == 5:  # qkv 4D (stacked): [depth, in, 3, H, hd]
        delta = delta.reshape(w.shape)
    return (w.astype(jnp.float32) + delta).astype(w.dtype)


def merge_lora(
    params: Dict[str, Any],
    lora: Dict[str, Any],
    strength: float = 1.0,
    requantize: bool = True,
) -> Dict[str, Any]:
    """Return params with `strength * (a @ b)` added to every weight leaf the
    adapter targets. Works on bf16 and quantized ({q|qa, scale} / {q4p,
    gscale}) stacks; untouched leaves are returned by reference (no copy).

    requantize=False returns dense float weights for targeted quantized
    leaves instead of requantizing in kind — the TRAINING form: gradients
    flow exactly through a @ b (requantization's int cast would zero them).
    Serving merges keep the default (requantize in kind).

    The adapter's top-level keys name parameter stacks ("double"/"single" for
    flux, "blocks" for the video DiT); leaf names may be dotted paths into
    nested dicts (e.g. "norm1.lin")."""
    out = dict(params)
    for stack, factors in lora.items():
        if not factors:
            continue
        if stack not in params:
            raise KeyError(f"LoRA targets unknown stack {stack!r}")
        new_stack = dict(params[stack])
        for leaf, factor in factors.items():
            node = new_stack
            parts = leaf.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"LoRA targets unknown leaf {stack}.{leaf}")
                node[p] = dict(node[p])  # copy-on-write along the path
                node = node[p]
            last = parts[-1]
            if last not in node:
                raise KeyError(f"LoRA targets unknown leaf {stack}.{leaf}")
            node[last] = dict(node[last])
            node[last]["w"] = _merge_leaf(
                node[last]["w"], factor, strength, requantize
            )
        out[stack] = new_stack
    return out


def merge_loras(
    params: Dict[str, Any],
    loras: Sequence[Dict[str, Any]],
    strengths: Optional[Sequence[float]] = None,
) -> Dict[str, Any]:
    """Apply several adapters in sequence (additive, order-independent on
    bf16 weights; int8 leaves requantize after each merge)."""
    strengths = strengths or [1.0] * len(loras)
    for lora, s in zip(loras, strengths):
        params = merge_lora(params, lora, s)
    return params
