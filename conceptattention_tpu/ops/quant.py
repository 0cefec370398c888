"""Weight-only int8 quantization for the DiT parameter stacks.

Not present in the reference (manuragkhullar/ConceptAttention keeps bf16
weights and survives on an 80 GB A100 with CPU offload). On a 16 GB v5e the
full 11.9B-param flux-schnell does not fit in bf16; per-output-channel int8
weights (absmax scales) bring it to ~12 GB and let the TRUE full-depth
architecture run on one chip. Dequantization happens per layer inside the
lax.scan step, so only one layer's bf16 weights are ever materialized — and
int8 HBM reads halve the per-step weight traffic.
"""

from __future__ import annotations

from typing import Any, Dict

import functools

import jax
import jax.numpy as jnp

_QKEYS = frozenset({"q", "scale"})
_QKEYS_A8 = frozenset({"qa", "scale"})


def quantize_activations_per_token(x: jax.Array):
    """Dynamic per-token (last-axis) absmax int8 quantization.

    Returns (x_int8, scale) with scale shaped like x but last dim 1, float32.
    Zero rows quantize to zeros with scale 1.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_array(w: jax.Array, compute_dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Per-output-channel absmax int8: scale over the input (first) axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(compute_dtype)}


def dequantize_array(qd: Dict[str, jax.Array]) -> jax.Array:
    q = qd["q"] if "q" in qd else qd["qa"]
    return q.astype(qd["scale"].dtype) * qd["scale"]


def _is_quantized(node: Any) -> bool:
    return isinstance(node, dict) and set(node.keys()) in (_QKEYS, _QKEYS_A8)


def dequantize_tree(tree: Any) -> Any:
    """Replace {"q", "scale"} nodes with dequantized arrays; identity on
    unquantized trees (trace-time only)."""
    if _is_quantized(tree):
        return dequantize_array(tree)
    if isinstance(tree, dict):
        return {k: dequantize_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(dequantize_tree(v) for v in tree)
    return tree


def quantize_layer_stack(stack: Any, min_size: int = 1 << 20, act_quant: bool = False) -> Any:
    """Quantize large 'w' leaves in a stacked layer pytree.

    Per-layer scales: for a stacked [depth, in, ...out] weight the scale is
    computed per (layer, out-channel) by folding depth into the batch.

    act_quant=True marks the weight for the w8a8 path (key "qa" instead of
    "q"): the consuming matmul dynamically quantizes its activations per
    token and runs an int8 x int8 MXU dot (2x bf16 peak on v5e), folding
    both scales into the output.
    """
    qkey = "qa" if act_quant else "q"

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "w"
                    and hasattr(v, "size")
                    and v.size >= min_size
                    and v.ndim >= 3  # [depth, in, out...]
                ):
                    wf = v.astype(jnp.float32)
                    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
                    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
                    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
                    out[k] = {qkey: q, "scale": scale.astype(v.dtype)}
                else:
                    out[k] = visit(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(visit(v) for v in node)
        return node

    return visit(stack)


@functools.partial(jax.jit, static_argnums=1)
def _randint8_layer(key, shape):
    return jax.random.randint(key, shape, -127, 128, dtype=jnp.int8)


def _random_int8(key: jax.Array, shape) -> jax.Array:
    """Uniform int8 of `shape` with bounded device transients.

    randint over a whole [depth, ...] stack materializes 4-byte random bits
    (48 GB for 12B params) and uint32->int8 bitcasts hit 32x lane-padding;
    host generation is bandwidth-bound through the device tunnel. So: randint
    per LAYER (4x transient on <=75 MB slices) and stack on device."""
    depth = shape[0]
    keys = jax.random.split(key, depth)
    layers = [_randint8_layer(keys[i], tuple(shape[1:])) for i in range(depth)]
    return jnp.stack(layers)


def init_flux_params_quantized(
    key: jax.Array, cfg, dtype=jnp.bfloat16, act_quant: bool = False
) -> Dict[str, Any]:
    """Random *already-quantized* Flux params: int8 weights + scales generated
    directly, so the full 11.9B model never materializes in bf16 (24 GB) on a
    16 GB chip. Weight distribution matches init_flux_params' 1/sqrt(in) std.
    For real checkpoints, convert + quantize on HOST memory and device_put
    only the int8 result (the pipeline's quantize=True load path does this
    under jax.default_device(cpu))."""
    from conceptattention_tpu.models.flux.params import init_flux_params

    tiny_like = cfg.__class__(**{**cfg.__dict__, "depth": 1, "depth_single_blocks": 1})
    # Build the depth-1 skeleton on host: keeping its ~1.3 GB on the chip
    # during generation would push the 12 GB int8 init past a 16 GB HBM.
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            skeleton = init_flux_params(key, tiny_like, dtype)
    except RuntimeError:
        skeleton = init_flux_params(key, tiny_like, dtype)

    def expand(stack, depth):
        def visit(node, path=()):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    if k == "w" and hasattr(v, "ndim") and v.size >= (1 << 16):
                        import zlib

                        shape = (depth,) + v.shape[1:]
                        tag = zlib.crc32("/".join(path + (k,)).encode()) & 0x3FFFFFFF
                        sub = jax.random.fold_in(key, tag)
                        q = _random_int8(sub, shape)
                        fan_in = shape[1]
                        s = (fan_in**-0.5) / 73.3  # std(uniform int8) ~ 73.3
                        scale_shape = (depth, 1) + shape[2:]
                        out[k] = {
                            ("qa" if act_quant else "q"): q,
                            "scale": jnp.full(scale_shape, s, dtype),
                        }
                    elif hasattr(v, "ndim"):
                        # small leaves: broadcast on host, then place on-chip
                        out[k] = (
                            jax.device_put(
                                jnp.broadcast_to(v, (depth,) + v.shape[1:]).copy()
                            )
                            if v.ndim >= 1
                            else v
                        )
                    else:
                        out[k] = visit(v, path + (k,))
                return out
            return node

        return visit(stack)

    params = {
        k: jax.tree.map(jax.device_put, v)  # move host skeleton leaves on-chip
        for k, v in skeleton.items()
        if k not in ("double", "single")
    }
    params["double"] = expand(skeleton["double"], cfg.depth)
    params["single"] = expand(skeleton["single"], cfg.depth_single_blocks)
    return params


def quantize_flux_params(
    params: Dict[str, Any], min_size: int = 1 << 16, act_quant: bool = False
) -> Dict[str, Any]:
    """Quantize the per-layer stacks (the ~99% of parameters); embedders,
    norms, biases, and the final layer stay bf16. act_quant=True selects the
    w8a8 path (int8 activations x int8 weights on the MXU)."""
    out = dict(params)
    out["double"] = quantize_layer_stack(params["double"], min_size, act_quant)
    out["single"] = quantize_layer_stack(params["single"], min_size, act_quant)
    return out


def quantize_video_dit_params(
    params: Dict[str, Any], min_size: int = 1 << 16, act_quant: bool = False
) -> Dict[str, Any]:
    """CogVideoX DiT: quantize the stacked transformer blocks (every matmul
    already routes through the quant-aware `_linear`); patch/text/time
    embedders, norms, and the output head stay bf16. A 5b-class model drops
    ~2x in HBM, enabling single-chip serving next to the video VAE."""
    out = dict(params)
    out["blocks"] = quantize_layer_stack(params["blocks"], min_size, act_quant)
    return out
