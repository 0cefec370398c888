"""LoRA fine-tuning for the Flux DiT: low-rank adapter init + train step.

The reference is inference-only (SURVEY.md §5); the full-parameter training
path lives in training/train_step.py. LoRA training optimizes only the
low-rank factors (a few tens of MB instead of 24 GB of bf16 weights + adamw
moments), which is the practical fine-tuning mode on a 16 GB chip: the frozen
base can stay int8-quantized while the adapters train in f32.

Functional design: the adapter is its own pytree (same layout
weights/lora.py converts to), the loss merges it into the base inside the
jitted step with `merge_lora(requantize=False)` — the float-merge form, so
gradients flow exactly through a @ b even on a quantized base (requantizing
in kind would kill the tangent at the int cast: only one amax element per
quant group would carry gradient). Targeted leaves therefore run bf16-class
matmuls during training and their dense float merge materializes in-jit;
untargeted leaves keep streaming quantized from HBM. The optimizer state
covers only the adapter. Standard LoRA init: a ~ N(0, 1/in), b = 0 — the
first step is exactly the base model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.training.train_step import flow_matching_loss
from conceptattention_tpu.weights.lora import merge_lora

# Default target set: every big matmul in both block families (the qkv /
# proj / mlp leaves; modulation MLPs excluded by default as is conventional).
DEFAULT_DOUBLE_TARGETS = (
    "img_qkv", "img_proj", "img_mlp_in", "img_mlp_out",
    "txt_qkv", "txt_proj", "txt_mlp_in", "txt_mlp_out",
)
DEFAULT_SINGLE_TARGETS = ("qkv", "proj", "mlp_in", "mlp_out")


def _leaf_dims(w) -> Tuple[int, int, int]:
    """(depth, in, out_flat) of a stacked weight leaf (bf16 or quantized
    dict — q/qa int8 keep the weight's natural shape; the nibble-packed
    q4p's true input size comes from quant.w4_dims)."""
    if isinstance(w, dict) and "q4p" in w:
        from conceptattention_tpu.ops.quant import w4_dims

        arr = w["q4p"]
        depth, d_in = arr.shape[0], w4_dims(w)[1]
    else:
        arr = w.get("qa", w.get("q")) if isinstance(w, dict) else w
        depth, d_in = arr.shape[0], arr.shape[1]
    d_out = 1
    for s in arr.shape[2:]:
        d_out *= s
    return depth, d_in, d_out


def init_lora_params(
    key: jax.Array,
    params: Dict[str, Any],
    rank: int = 16,
    double_targets: Sequence[str] = DEFAULT_DOUBLE_TARGETS,
    single_targets: Sequence[str] = DEFAULT_SINGLE_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Zero-effect adapter pytree over the given targets (b = 0)."""
    lora: Dict[str, Any] = {"double": {}, "single": {}}
    n = 0
    for stack, targets in (("double", double_targets), ("single", single_targets)):
        for leaf in targets:
            if leaf not in params[stack]:
                continue
            depth, d_in, d_out = _leaf_dims(params[stack][leaf]["w"])
            sub = jax.random.fold_in(key, n)
            n += 1
            lora[stack][leaf] = {
                "a": (
                    jax.random.normal(sub, (depth, d_in, rank), jnp.float32)
                    * (d_in**-0.5)
                ).astype(dtype),
                "b": jnp.zeros((depth, rank, d_out), dtype),
            }
    return lora


def lora_flow_matching_loss(
    lora: Dict[str, Any],
    base_params: Dict[str, Any],
    cfg: FluxConfig,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    strength: float = 1.0,
) -> jax.Array:
    """flow_matching_loss on merge_lora(base, lora, requantize=False) —
    differentiable in the adapter only (the base is a frozen constant under
    grad). The float merge keeps the adapter gradient exact on quantized
    bases; requantizing in kind would zero it at the int cast."""
    merged = merge_lora(base_params, lora, strength, requantize=False)
    return flow_matching_loss(merged, cfg, batch, key)


def make_lora_train_step(
    cfg: FluxConfig,
    tx: optax.GradientTransformation,
    strength: float = 1.0,
    donate: bool = True,
):
    """Build a jitted (lora, opt_state, base_params, batch, key) ->
    (lora, opt_state, loss) step. base_params is an operand (not a closure
    capture) so an int8 base streams from HBM without being baked into the
    executable as a constant."""

    def step(lora, opt_state, base_params, batch, key):
        loss, grads = jax.value_and_grad(lora_flow_matching_loss)(
            lora, base_params, cfg, batch, key, strength
        )
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def export_lora_state_dict(
    lora: Dict[str, Any], cfg: Optional[FluxConfig] = None
) -> Dict[str, Any]:
    """Adapter pytree -> BFL-tree PEFT-named numpy state dict
    (`double_blocks.{i}.img_attn.qkv.lora_A.weight`, A [r, in] / B [out, r]),
    loadable back via weights/lora.convert_lora_state_dict. Fused-leaf
    adapters (qkv trained as one factor) export on the fused module name;
    single-block qkv/mlp_in and proj/mlp_out export as separate module names
    understood by the converter's plans."""
    import numpy as np

    names = {
        ("double", "img_qkv"): "img_attn.qkv",
        ("double", "img_proj"): "img_attn.proj",
        ("double", "img_mod"): "img_mod.lin",
        ("double", "img_mlp_in"): "img_mlp.0",
        ("double", "img_mlp_out"): "img_mlp.2",
        ("double", "txt_qkv"): "txt_attn.qkv",
        ("double", "txt_proj"): "txt_attn.proj",
        ("double", "txt_mod"): "txt_mod.lin",
        ("double", "txt_mlp_in"): "txt_mlp.0",
        ("double", "txt_mlp_out"): "txt_mlp.2",
    }
    prefix = {"double": "double_blocks", "single": "single_blocks"}
    sd: Dict[str, Any] = {}
    for stack in ("double", "single"):
        for leaf, factor in (lora.get(stack) or {}).items():
            a = np.asarray(factor["a"], np.float32)  # [depth, in, r]
            b = np.asarray(factor["b"], np.float32)  # [depth, r, out]
            if stack == "double":
                mod = names[(stack, leaf)]
            else:
                # Export single-block leaves under synthetic dotted names the
                # converter does NOT split (they are already per-leaf). Use
                # diffusers-style names for the splittable ones.
                mod = {
                    "mod": "modulation.lin",
                    "qkv": "qkv", "mlp_in": "mlp_in",
                    "proj": "proj", "mlp_out": "mlp_out",
                }[leaf]
            for i in range(a.shape[0]):
                base = f"{prefix[stack]}.{i}.{mod}"
                sd[f"{base}.lora_A.weight"] = a[i].T.copy()  # [r, in]
                sd[f"{base}.lora_B.weight"] = b[i].T.copy()  # [out, r]
                sd[f"{base}.alpha"] = np.float32(a.shape[-1])
    return sd
