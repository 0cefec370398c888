"""Sharding rules: Megatron-style tensor parallelism for the Flux DiT.

Per-leaf `PartitionSpec`s over the mesh from parallel/mesh.py:

  - fused QKV `[D, 3, H, Dh]`: shard the head axis H on `model`
    (column-parallel);
  - attention out-proj `[H*Dh, D]`: shard the input axis on `model`
    (row-parallel; GSPMD inserts the psum);
  - MLP in `[D, M]`: shard M on `model`; MLP out `[M, D]`: shard M
    (row-parallel);
  - modulation / embedders / norms: replicated (tiny);
  - per-layer stacks carry a leading `depth` axis: specs are shifted by one.

Activations: batch on `data`, sequence optionally on `seq`; everything else
replicated — GSPMD propagates the rest.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conceptattention_tpu.parallel.mesh import AXES


def _double_block_spec() -> Dict[str, Any]:
    tp = AXES.model
    spec = {}
    for stream in ("img", "txt"):
        spec[f"{stream}_mod"] = {"w": P(), "b": P()}
        spec[f"{stream}_qkv"] = {"w": P(None, None, tp, None), "b": P(None, tp, None)}
        spec[f"{stream}_qnorm"] = P()
        spec[f"{stream}_knorm"] = P()
        spec[f"{stream}_proj"] = {"w": P(tp, None), "b": P()}
        spec[f"{stream}_mlp_in"] = {"w": P(None, tp), "b": P(tp)}
        spec[f"{stream}_mlp_out"] = {"w": P(tp, None), "b": P()}
    return spec


def _single_block_spec() -> Dict[str, Any]:
    tp = AXES.model
    return {
        "mod": {"w": P(), "b": P()},
        "qkv": {"w": P(None, None, tp, None), "b": P(None, tp, None)},
        "mlp_in": {"w": P(None, tp), "b": P(tp)},
        "proj": {"w": P(tp, None), "b": P()},
        "mlp_out": {"w": P(tp, None)},
        "qnorm": P(),
        "knorm": P(),
    }


def _prepend_layer_axis(spec_tree):
    """Stacked per-layer params have a leading depth axis -> shift specs."""
    return jax.tree.map(
        lambda s: P(None, *s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def flux_param_spec(cfg=None) -> Dict[str, Any]:
    """PartitionSpec pytree matching init_flux_params' structure."""
    emb = {"in": {"w": P(), "b": P()}, "out": {"w": P(), "b": P()}}
    spec: Dict[str, Any] = {
        "img_in": {"w": P(), "b": P()},
        "txt_in": {"w": P(), "b": P()},
        "time_in": emb,
        "vector_in": {"in": {"w": P(), "b": P()}, "out": {"w": P(), "b": P()}},
        "final": {
            "adaln": {"w": P(), "b": P()},
            "linear": {"w": P(), "b": P()},
        },
        "double": _prepend_layer_axis(_double_block_spec()),
        "single": _prepend_layer_axis(_single_block_spec()),
    }
    if cfg is not None and cfg.guidance_embed:
        spec["guidance_in"] = {"in": {"w": P(), "b": P()}, "out": {"w": P(), "b": P()}}
    return spec


def flux_param_sharding(mesh: Mesh, cfg=None) -> Dict[str, Any]:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        flux_param_spec(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh, cfg=None) -> Dict[str, Any]:
    """Place a param pytree onto the mesh with the TP sharding rules.

    Quantized leaves ({"q"|"qa", "scale"} / {"q4p", "gscale"} dicts in place
    of a "w" array) inherit the weight's spec for the int tensor (same
    shape). int8 per-channel scales are tiny and replicate; w4 group scales
    share the weight's spec positionally (the group axis stands where the
    input axis did) and fall back to replication when the group count does
    not divide the mesh axis — correctness-neutral under GSPMD, which
    reshards as needed."""
    shardings = flux_param_sharding(mesh, cfg)

    from conceptattention_tpu.ops.quant import _is_quantized

    def place(p, s):
        if _is_quantized(p):
            if "q4p" in p:
                # The weight tensor keeps the loud failure: silently
                # replicating a multi-GB q4p leaf would defeat the capacity
                # mode with no warning (spec/mesh mismatches are config
                # errors). Only the small group scales fall back to
                # replication — their grouped axis (size/group) often misses
                # the mesh divisibility the weight's axis (size/2) meets,
                # and GSPMD reshards them for free.
                try:
                    gs = jax.device_put(p["gscale"], s)
                except ValueError:
                    gs = jax.device_put(p["gscale"], NamedSharding(mesh, P()))
                return {"q4p": jax.device_put(p["q4p"], s), "gscale": gs}
            qk = "q" if "q" in p else "qa"
            return {
                qk: jax.device_put(p[qk], s),
                "scale": jax.device_put(p["scale"], NamedSharding(mesh, P())),
            }
        if isinstance(p, dict):
            # Param keys the spec doesn't know (e.g. guidance_in when called
            # with the cfg=None convenience form) replicate rather than
            # KeyError — tiny MLP embedders are replicated anyway.
            rep = NamedSharding(mesh, P())
            return {
                k: place(p[k], s.get(k, rep) if isinstance(s, dict) else s)
                for k in p
            }
        if isinstance(p, (list, tuple)):
            return type(p)(place(a, b) for a, b in zip(p, s))
        return jax.device_put(p, s)

    return place(params, shardings)


def activation_sharding(mesh: Mesh, seq_sharded: bool = False) -> NamedSharding:
    """[B, L, D] activation sharding: batch on data, optionally seq on seq."""
    return NamedSharding(
        mesh, P(AXES.data, AXES.seq if seq_sharded else None, None)
    )


def double_block_layer_spec() -> Dict[str, Any]:
    """Per-LAYER double-block PartitionSpecs (no depth axis) — the
    `layer_param_spec` input for pp x tp composition
    (parallel/pipeline.pipeline_apply): qkv/mlp_in column-parallel on
    `model`, proj/mlp_out row-parallel, norms/modulation replicated."""
    return _double_block_spec()
