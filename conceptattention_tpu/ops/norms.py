"""Normalization and adaptive-modulation ops.

Parity targets in the reference (manuragkhullar/ConceptAttention):
  - RMSNorm: `flux/src/flux/modules/layers.py:63-72` (float32 accumulation,
    eps=1e-6, learned scale applied after the dtype cast-back).
  - LayerNorm: elementwise_affine=False, eps=1e-6 (`layers.py:51` et al.).
  - Modulation: SiLU -> Linear -> chunk into (shift, scale, gate) x {1,2}
    (`layers.py:113-126`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS norm with float32 accumulation, output in input dtype * scale."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rrms).astype(dtype) * scale


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Affine-free layer norm, float32 accumulation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


class ModulationOut(NamedTuple):
    shift: jax.Array
    scale: jax.Array
    gate: jax.Array


def modulation(
    vec: jax.Array, w, b: jax.Array, double: bool
) -> Tuple[ModulationOut, ModulationOut | None]:
    """AdaLN modulation: silu(vec) @ w + b -> 3 or 6 chunks of [B, 1, D].

    `w` may be an int8 dict {"q"|"qa", "scale"} (per-output-channel scale
    folds into the output) or a group-wise int4 dict {"q4p", "gscale"}
    (dequantized in place). The w8a8 "qa" form still computes in bf16 here —
    the modulation input is a single [B, D] vector, far below MXU-saturating
    size, so int8 activations would cost accuracy for no speedup."""
    h = jax.nn.silu(vec)
    if isinstance(w, dict) and "q4p" in w:
        from conceptattention_tpu.ops.quant import dequantize_w4

        out = h @ dequantize_w4(w, vec.dtype) + b
    elif isinstance(w, dict):
        q = w["q"] if "q" in w else w["qa"]
        out = (h @ q.astype(vec.dtype)) * w["scale"][0] + b
    else:
        out = h @ w + b
    out = out[:, None, :]
    n = 6 if double else 3
    chunks = jnp.split(out, n, axis=-1)
    mod1 = ModulationOut(*chunks[:3])
    mod2 = ModulationOut(*chunks[3:]) if double else None
    return mod1, mod2
