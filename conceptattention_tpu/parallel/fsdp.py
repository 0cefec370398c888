"""FSDP (ZeRO-3-style fully-sharded data parallelism) for training.

The reference is inference-only and single-GPU (SURVEY.md §2g census), so
this — like the rest of parallel/ — is a TPU-native framework obligation
rather than a ported component. The design follows the standard GSPMD
treatment (the scaling-book "fsdp" recipe): parameters and optimizer state
are sharded over the *data* mesh axis along a weight dimension orthogonal to
tensor parallelism, activations stay batch-sharded over the same axis, and
XLA inserts the collectives —

  - forward: each `lax.scan` iteration all-gathers ONE layer's weight shards
    just-in-time (peak weight memory = full params / data + one layer),
  - backward: weight gradients are reduce-scattered straight back into the
    sharded layout (the `out_shardings` pin on the updated params forces it),
  - optimizer: adamw moments are created `zeros_like(params)` and inherit the
    sharded placement, so optimizer state is ZeRO-sharded for free.

No hand-written collectives: the entire strategy is a PartitionSpec pytree.
`fsdp_spec` derives it generically for ANY param tree (flux, video DiT, ...)
by picking, per leaf, the largest dimension that the fsdp axis divides and
that an existing tensor-parallel spec does not already shard — so FSDP
composes with the Megatron TP rules from parallel/sharding.py on a
(data, model) mesh, and with `remat=True` in the loss for activation
rematerialization.

Quantized (serving) param trees are not supported here: FSDP is a training
feature and the int8/int4 leaves are frozen at load time (train LoRA adapters
against them instead — training/lora.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conceptattention_tpu.parallel.mesh import AXES


def _leaf_fsdp_spec(shape, base: P, n: int, axis_name: str, min_size: int) -> P:
    """Extend `base` (a possibly-shorter TP spec) with `axis_name` on the
    largest dimension it divides and TP does not already occupy."""
    parts = list(base) + [None] * (len(shape) - len(base))
    if n <= 1:
        return base
    size = 1
    for d in shape:
        size *= d
    if size < min_size:
        return base
    best = None
    for i, (dim, cur) in enumerate(zip(shape, parts)):
        if cur is not None:
            continue
        if dim % n == 0 and dim >= n and (best is None or dim > shape[best]):
            best = i
    if best is None:
        return base
    parts[best] = axis_name
    return P(*parts)


def fsdp_spec(
    params: Dict[str, Any],
    mesh: Mesh,
    base_spec: Optional[Dict[str, Any]] = None,
    axis: str = AXES.data,
    min_size: int = 0,
) -> Dict[str, Any]:
    """PartitionSpec pytree sharding every (divisible) param leaf over `axis`.

    base_spec: an existing spec tree (e.g. parallel.sharding.flux_param_spec)
      whose entries are respected — FSDP picks a dimension TP left unsharded,
      so the result composes both strategies. None means pure FSDP.
    min_size: leaves with fewer elements stay at their base spec (gathering
      tiny tensors every scan step buys nothing; 0 shards everything
      divisible, which is what the tests pin).
    """
    n = mesh.shape[axis]

    def leaf(path_spec, p):
        base = path_spec if isinstance(path_spec, P) else P()
        return _leaf_fsdp_spec(p.shape, base, n, axis, min_size)

    if base_spec is None:
        return jax.tree.map(lambda p: leaf(P(), p), params)
    # base_spec may be missing optional keys (e.g. guidance_in) — walk params
    # and look specs up permissively, defaulting to replicated.
    def walk(p, s):
        if isinstance(p, dict):
            return {
                k: walk(p[k], s.get(k, P()) if isinstance(s, dict) else P())
                for k in p
            }
        return leaf(s if isinstance(s, P) else P(), p)

    return walk(params, base_spec)


def fsdp_sharding(
    params: Dict[str, Any],
    mesh: Mesh,
    base_spec: Optional[Dict[str, Any]] = None,
    axis: str = AXES.data,
    min_size: int = 0,
) -> Dict[str, Any]:
    """NamedSharding pytree for `fsdp_spec` (feed to make_train_step's
    param_sharding / jax.device_put)."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        fsdp_spec(params, mesh, base_spec=base_spec, axis=axis, min_size=min_size),
        is_leaf=lambda x: isinstance(x, P),
    )


def flux_fsdp_sharding(
    params: Dict[str, Any],
    mesh: Mesh,
    cfg=None,
    tensor_parallel: bool = True,
    min_size: int = 0,
) -> Dict[str, Any]:
    """Flux convenience: FSDP over `data` composed (by default) with the
    Megatron TP rules over `model`. Use exactly like
    parallel.sharding.flux_param_sharding."""
    base = None
    if tensor_parallel and mesh.shape.get(AXES.model, 1) > 1:
        from conceptattention_tpu.parallel.sharding import flux_param_spec

        base = flux_param_spec(cfg)
    return fsdp_sharding(params, mesh, base_spec=base, min_size=min_size)


def shard_params_fsdp(
    params: Dict[str, Any],
    mesh: Mesh,
    cfg=None,
    tensor_parallel: bool = True,
    min_size: int = 0,
) -> Dict[str, Any]:
    """Place a float param pytree onto the mesh fully-sharded (ZeRO-3)."""
    from conceptattention_tpu.ops.quant import _is_quantized

    flat, _ = jax.tree_util.tree_flatten_with_path(params, is_leaf=_is_quantized)
    bad = [jax.tree_util.keystr(path) for path, leaf in flat if _is_quantized(leaf)]
    if bad:
        raise ValueError(
            "FSDP shards float training params; quantized leaves found at "
            f"{bad[:3]}... — dequantize or train LoRA adapters instead"
        )
    shardings = flux_fsdp_sharding(
        params, mesh, cfg, tensor_parallel=tensor_parallel, min_size=min_size
    )
    return jax.tree.map(jax.device_put, params, shardings)
