"""Weight-only int8 / int4 quantization for the DiT parameter stacks.

Not present in the reference (manuragkhullar/ConceptAttention keeps bf16
weights and survives on an 80 GB A100 with CPU offload). On a 16 GB v5e the
full 11.9B-param flux-schnell does not fit in bf16; per-output-channel int8
weights (absmax scales) bring it to ~12 GB and let the TRUE full-depth
architecture run on one chip. Dequantization happens per layer inside the
lax.scan step, so only one layer's bf16 weights are ever materialized — and
int8 HBM reads halve the per-step weight traffic.

Three cell forms, keyed by dict shape:
  {"q",  "scale"}  — weight-only int8, per-(layer, out-channel) absmax;
                     scales fold into the matmul OUTPUT.
  {"qa", "scale"}  — w8a8: int8 weights + dynamic per-token int8 activations,
                     int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e).
  {"q4p", "gscale"} — weight-only int4, GROUP-WISE absmax scales along the
                     input axis (AWQ/GPTQ-style, default group 128). Two
                     nibbles are packed per int8 byte along the input axis
                     (the "p"), so the full 11.9B flux drops to ~6 GB —
                     headroom for larger serving batches on a 16 GB chip.
                     Group scales cannot fold into the output, so the
                     consuming matmul unpacks + dequantizes the (one) layer's
                     weight in-scan.

Why packed int8 and not jnp.int4: this host's TPU runtime cannot transfer or
reshard S4 arrays — jax's _array_shard_arg falls into infinite device_put
recursion on any eager op or jit argument carrying int4 (the requested tile
layout T(64,128)(8,1) never matches, RecursionError). Nibble-packed int8 has
identical HBM residency (2 values/byte) and unpacks in-graph with two
arithmetic shifts, portable across every backend.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import functools
import math

import jax
import jax.numpy as jnp

_QKEYS = frozenset({"q", "scale"})
_QKEYS_A8 = frozenset({"qa", "scale"})
_QKEYS_W4 = frozenset({"q4p", "gscale"})

W4_GROUP = 128


def resolve_quant_mode(quantize) -> Optional[str]:
    """Normalize a pipeline-level `quantize` argument to a mode string.

    True / "w8" -> "w8" (weight-only int8), "w8a8" -> "w8a8",
    "w4" -> "w4" (group-wise weight-only int4), False/None -> None.
    """
    if not quantize:
        return None
    if quantize is True:
        return "w8"
    if quantize in ("w8", "w8a8", "w4"):
        return quantize
    raise ValueError(f"unknown quantize mode {quantize!r} "
                     "(expected True, 'w8', 'w8a8' or 'w4')")


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


def _w4_group_sizes(size: int, group_size: int) -> tuple:
    """(n_groups, group) for an input axis of `size`: the largest common
    divisor of `size` and `group_size` that is >= 4, else one group spanning
    the whole axis. The >= 4 floor keeps the packed tensor's input axis
    (size/2 bytes) strictly larger than the group count (size/g), so
    w4_group_axis can recover the grouped axis from the shape difference."""
    g = math.gcd(size, group_size)
    if g < 4:
        g = size
    return size // g, g


def quantize_array_w4(
    w: jax.Array, axis: int = 0, group_size: int = W4_GROUP
) -> Dict[str, jax.Array]:
    """Group-wise absmax int4 along `axis` (the matmul input axis), packed
    two nibbles per int8 byte along that axis.

    Returns {"q4p": int8 with the input axis HALVED, "gscale": float32 with
    the input axis replaced by the group count}. Symmetric [-7, 7]
    quantization; byte = low nibble (even index) | high nibble (odd) << 4.
    The input axis must be even (true for every real layer; callers fall
    back to int8 otherwise).
    """
    wf = w.astype(jnp.float32)
    size = wf.shape[axis]
    if size % 2 or size < 4:
        raise ValueError(f"w4 needs an even input axis >= 4, got {size}")
    n_groups, g = _w4_group_sizes(size, group_size)
    shp = wf.shape[:axis] + (n_groups, g) + wf.shape[axis + 1:]
    wg = wf.reshape(shp)
    amax = jnp.max(jnp.abs(wg), axis=axis + 1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(wf.shape)
    return {
        "q4p": pack_int4(q, axis),
        "gscale": jnp.squeeze(scale, axis + 1),
    }


def pack_int4(q: jax.Array, axis: int) -> jax.Array:
    """Pack int8 values in [-7, 7] two-per-byte along `axis` (even size).

    byte = (even & 0xF) | (odd << 4): the odd nibble keeps its sign in the
    byte's high bits, the even nibble is recovered by a sign-extending
    (<< 4) >> 4 round trip."""
    size = q.shape[axis]
    shp = q.shape[:axis] + (size // 2, 2) + q.shape[axis + 1:]
    pairs = q.reshape(shp)
    even = jnp.take(pairs, 0, axis=axis + 1)
    odd = jnp.take(pairs, 1, axis=axis + 1)
    return ((even & 0xF) | (odd << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array, axis: int) -> jax.Array:
    """Inverse of pack_int4: int8 [-7, 7] values, `axis` doubled.

    Arithmetic right shifts on int8 sign-extend, so (x << 4) >> 4 recovers
    the signed low nibble and x >> 4 the signed high nibble — two VPU shift
    ops per layer, no lookup tables."""
    even = (packed << 4) >> 4
    odd = packed >> 4
    st = jnp.stack([even, odd], axis=axis + 1)
    shp = packed.shape[:axis] + (packed.shape[axis] * 2,) + packed.shape[axis + 1:]
    return st.reshape(shp)


def w4_group_axis(q4p: jax.Array, gscale: jax.Array) -> int:
    """The grouped (input) axis of a w4 cell: the unique position where the
    packed tensor's shape (size/2) and the group-scale shape (size/group)
    differ — unique because group >= 4 forces size/group < size/2 while all
    other axes are equal by construction."""
    for i in range(q4p.ndim):
        if q4p.shape[i] != gscale.shape[i]:
            return i
    raise ValueError(
        f"w4 cell has no group axis (q4p {q4p.shape} == gscale {gscale.shape})"
    )


def w4_dims(cell: Dict[str, jax.Array]) -> tuple:
    """(group_axis, input_size, group_size) of a packed w4 cell — the single
    owner of the 2-nibbles-per-byte convention, so consumers (LoRA dims,
    requantize-in-kind) never re-derive the packing factor themselves."""
    ax = w4_group_axis(cell["q4p"], cell["gscale"])
    size = 2 * cell["q4p"].shape[ax]
    return ax, size, size // cell["gscale"].shape[ax]


def dequantize_w4(cell: Dict[str, jax.Array], dtype=None) -> jax.Array:
    """Expand a {"q4p", "gscale"} cell to a dense weight of `dtype`.

    Runs in-scan on one layer's weight at a time (<=75 MB bf16 transient for
    flux); the packed-int4 HBM read is what the mode buys, the transient is
    local.
    """
    qp, s = cell["q4p"], cell["gscale"]
    ax = w4_group_axis(qp, s)
    q = unpack_int4(qp, ax)
    n_groups = s.shape[ax]
    g = q.shape[ax] // n_groups
    shp = q.shape[:ax] + (n_groups, g) + q.shape[ax + 1:]
    w = q.reshape(shp).astype(s.dtype) * jnp.expand_dims(s, ax + 1)
    return w.reshape(q.shape).astype(dtype or s.dtype)


def dequantize_array(qd: Dict[str, jax.Array]) -> jax.Array:
    if "q4p" in qd:
        return dequantize_w4(qd)
    q = qd["q"] if "q" in qd else qd["qa"]
    return q.astype(qd["scale"].dtype) * qd["scale"]


def _is_quantized(node: Any) -> bool:
    return isinstance(node, dict) and set(node.keys()) in (
        _QKEYS, _QKEYS_A8, _QKEYS_W4,
    )


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


def quantize_layer_stack(
    stack: Any,
    min_size: int = 1 << 20,
    act_quant: bool = False,
    mode: Optional[str] = None,
    group_size: int = W4_GROUP,
) -> Any:
    """Quantize large 'w' leaves in a stacked layer pytree.

    mode (overrides act_quant when given):
      "w8"   — per-(layer, out-channel) int8, scale folds into the output.
      "w8a8" — same int8 weights marked for dynamic per-token int8
               activations: int8 x int8 MXU dot (2x bf16 peak on v5e).
      "w4"   — group-wise int4 along the input axis (axis 1 of the
               [depth, in, out...] stack), nibble-packed into int8,
               ~4x HBM vs bf16. Odd input axes (never hit by real layers)
               fall back to int8.
    """
    mode = mode or ("w8a8" if act_quant else "w8")
    qkey = "qa" if mode == "w8a8" else "q"

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
                    if mode == "w4" and v.shape[1] % 2 == 0 and v.shape[1] >= 4:
                        out[k] = quantize_array_w4(v, axis=1, group_size=group_size)
                        continue
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


@functools.partial(jax.jit, static_argnums=1)
def _randint4_layer(key, shape):
    """One layer of nibble-PACKED uniform int4: `shape` is the packed shape
    (input axis already halved); each byte holds two independent [-7, 7]
    nibbles. Packed entirely in-graph — no S4 dtype ever exists (see module
    docstring for the runtime recursion bug that rules jnp.int4 out)."""
    ka, kb = jax.random.split(key)
    even = jax.random.randint(ka, shape, -7, 8, dtype=jnp.int8)
    odd = jax.random.randint(kb, shape, -7, 8, dtype=jnp.int8)
    return ((even & 0xF) | (odd << 4)).astype(jnp.int8)


def _random_int8(key: jax.Array, shape, bits: int = 8) -> jax.Array:
    """Uniform int8 (or packed-int4) of `shape` with bounded device transients.

    randint over a whole [depth, ...] stack materializes 4-byte random bits
    (48 GB for 12B params) and uint32->int8 bitcasts hit 32x lane-padding;
    host generation is bandwidth-bound through the device tunnel. So: randint
    per LAYER (4x transient on <=75 MB slices) and stack on device."""
    depth = shape[0]
    keys = jax.random.split(key, depth)
    layer = _randint4_layer if bits == 4 else _randint8_layer
    layers = [layer(keys[i], tuple(shape[1:])) for i in range(depth)]
    return jnp.stack(layers)


def _make_quantized_expander(key: jax.Array, mode: str, dtype):
    """expand(stack, depth): tile a depth-1 layer-stack skeleton to `depth`,
    replacing every large "w" leaf with directly-generated random int8/int4
    weights + matched-std scales (the full-precision stack never
    materializes). Shared by init_flux_params_quantized and
    init_video_dit_params_quantized."""

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
                        fan_in = shape[1]
                        if mode == "w4" and fan_in % 2 == 0 and fan_in >= 4:
                            packed = (depth, fan_in // 2) + shape[2:]
                            q = _random_int8(sub, packed, bits=4)
                            # std(uniform int in [-7, 7]) = sqrt((15^2-1)/12)
                            s = (fan_in**-0.5) / 4.3205
                            n_groups, _ = _w4_group_sizes(fan_in, W4_GROUP)
                            gscale_shape = (depth, n_groups) + shape[2:]
                            out[k] = {
                                "q4p": q,
                                "gscale": jnp.full(gscale_shape, s, jnp.float32),
                            }
                            continue
                        q = _random_int8(sub, shape)
                        s = (fan_in**-0.5) / 73.3  # std(uniform int8) ~ 73.3
                        scale_shape = (depth, 1) + shape[2:]
                        out[k] = {
                            ("qa" if mode == "w8a8" else "q"): q,
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

    return expand


def init_flux_params_quantized(
    key: jax.Array,
    cfg,
    dtype=jnp.bfloat16,
    act_quant: bool = False,
    mode: Optional[str] = None,
) -> Dict[str, Any]:
    """Random *already-quantized* Flux params: int8/int4 weights + scales
    generated directly, so the full 11.9B model never materializes in bf16
    (24 GB) on a 16 GB chip. Weight distribution matches init_flux_params'
    1/sqrt(in) std. For real checkpoints, convert + quantize on HOST memory
    and device_put only the quantized result (the pipeline's quantize=True
    load path does this under jax.default_device(cpu))."""
    from conceptattention_tpu.models.flux.params import init_flux_params

    mode = mode or ("w8a8" if act_quant else "w8")

    tiny_like = cfg.__class__(**{**cfg.__dict__, "depth": 1, "depth_single_blocks": 1})
    # Build the depth-1 skeleton on host: keeping its ~1.3 GB on the chip
    # during generation would push the 12 GB int8 init past a 16 GB HBM.
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            skeleton = init_flux_params(key, tiny_like, dtype)
    except RuntimeError:
        skeleton = init_flux_params(key, tiny_like, dtype)

    expand = _make_quantized_expander(key, mode, dtype)

    params = {
        k: jax.tree.map(jax.device_put, v)  # move host skeleton leaves on-chip
        for k, v in skeleton.items()
        if k not in ("double", "single")
    }
    params["double"] = expand(skeleton["double"], cfg.depth)
    params["single"] = expand(skeleton["single"], cfg.depth_single_blocks)
    return params


def quantize_flux_params(
    params: Dict[str, Any],
    min_size: int = 1 << 16,
    act_quant: bool = False,
    mode: Optional[str] = None,
    group_size: int = W4_GROUP,
) -> Dict[str, Any]:
    """Quantize the per-layer stacks (the ~99% of parameters); embedders,
    norms, biases, and the final layer stay bf16. mode selects "w8" (weight
    int8), "w8a8" (int8 activations x int8 weights on the MXU) or "w4"
    (group-wise int4 weights, ~6 GB full flux; group_size applies here);
    act_quant=True is the legacy spelling of mode="w8a8"."""
    out = dict(params)
    out["double"] = quantize_layer_stack(
        params["double"], min_size, act_quant, mode, group_size
    )
    out["single"] = quantize_layer_stack(
        params["single"], min_size, act_quant, mode, group_size
    )
    return out


def init_video_dit_params_quantized(
    key: jax.Array,
    cfg,
    dtype=jnp.bfloat16,
    mode: Optional[str] = None,
) -> Dict[str, Any]:
    """Random *already-quantized* CogVideoX DiT params, built like
    init_flux_params_quantized: a depth-1 host skeleton expanded with
    directly-generated int8/int4 stacks, so a 5b-class model (~10 GB bf16)
    never materializes — measured ~25 min of host init+quantize+transfer on
    this 1-core host for the materialize-then-quantize path vs seconds here
    (benchmark/serving-init use; real checkpoints still convert+quantize on
    host memory)."""
    import dataclasses as _dc

    from conceptattention_tpu.models.video.dit import init_video_dit_params

    mode = mode or "w8"
    tiny_like = _dc.replace(cfg, num_layers=1)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            skeleton = init_video_dit_params(key, tiny_like, dtype)
    except RuntimeError:
        skeleton = init_video_dit_params(key, tiny_like, dtype)

    expand = _make_quantized_expander(key, mode, dtype)
    params = {
        k: jax.tree.map(jax.device_put, v)
        for k, v in skeleton.items()
        if k != "blocks"
    }
    params["blocks"] = expand(skeleton["blocks"], cfg.num_layers)
    return params


def quantize_video_dit_params(
    params: Dict[str, Any],
    min_size: int = 1 << 16,
    act_quant: bool = False,
    mode: Optional[str] = None,
    group_size: int = W4_GROUP,
) -> Dict[str, Any]:
    """CogVideoX DiT: quantize the stacked transformer blocks (every matmul
    already routes through the quant-aware `_linear`); patch/text/time
    embedders, norms, and the output head stay bf16. A 5b-class model drops
    ~2x in HBM (int8) or ~4x (w4), enabling single-chip serving next to the
    video VAE."""
    out = dict(params)
    out["blocks"] = quantize_layer_stack(
        params["blocks"], min_size, act_quant, mode, group_size
    )
    return out
