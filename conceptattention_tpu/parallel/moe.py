"""Expert parallelism (ep): mixture-of-experts MLP with all_to_all dispatch.

No model in the reference family (Flux, CogVideoX, SD, ViT/CLIP —
manuragkhullar/ConceptAttention) uses MoE layers, but expert parallelism is a
framework obligation for the TPU build's parallelism surface (dp/tp/sp/pp/ep):
a production DiT variant with MoE MLPs (e.g. a sparse-upcycled Flux) must be
servable over the `expert` mesh axis without new machinery.

Design is the GShard/Switch token-choice scheme, expressed TPU-first:

  - top-k routing with renormalized gate weights and a static per-expert
    capacity (dense one-hot dispatch/combine einsums — everything static
    shape, MXU-friendly; no scatter, no sort, no dynamic shapes);
  - under `shard_map` over the `expert` axis, tokens are sharded with the
    experts: each device computes its local tokens' dispatch tensor, then ONE
    `all_to_all` ships expert-major token blocks to the devices owning those
    experts, local experts run as a vmapped MLP (one [E_local, ·, d] batched
    matmul), and a second `all_to_all` ships results back for the local
    combine;
  - capacity is the drop control: `capacity >= top_k * n_local_tokens`
    guarantees no token drops, in which case the ep result equals the
    single-device dense reference exactly (tested in tests/test_moe.py);
  - the auxiliary load-balancing loss is the Switch formulation
    (E * mean_e[f_e * p_e]) computed from the SAME gating tensors, so
    training over ep meshes needs no extra passes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


from conceptattention_tpu.parallel._compat import shard_map_compat as _shard_map


def init_moe_params(
    key: jax.Array,
    d_model: int,
    d_hidden: int,
    num_experts: int,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Router + per-expert MLP parameters, experts stacked on axis 0."""
    k_r, k_1, k_2 = jax.random.split(key, 3)
    return {
        "router": jax.random.normal(k_r, (d_model, num_experts), dtype) / d_model**0.5,
        "w_in": jax.random.normal(k_1, (num_experts, d_model, d_hidden), dtype)
        / d_model**0.5,
        "w_out": jax.random.normal(k_2, (num_experts, d_hidden, d_model), dtype)
        / d_hidden**0.5,
    }


def _route(
    gates: jax.Array, top_k: int, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dispatch/combine tensors for token-choice top-k routing.

    Args:
      gates: [n, E] softmax router probabilities.
      top_k: experts per token.
      capacity: max tokens per expert (per local shard).

    Returns:
      (dispatch [n, E, C] {0,1}, combine [n, E, C] gate-weighted,
       frac [E] first-choice routing fractions, gate_mean [E] mean router
       probabilities) — aux loss = E * sum(frac * gate_mean), assembled by
       the caller so the expert-parallel path can aggregate frac/gate_mean
       GLOBALLY before the product (mean-of-per-shard aux products is not
       the global Switch loss when routing is shard-unbalanced).
    """
    n, num_experts = gates.shape
    topv, topi = jax.lax.top_k(gates, top_k)  # [n, k]
    topv = topv / jnp.maximum(jnp.sum(topv, -1, keepdims=True), 1e-9)

    onehot = jax.nn.one_hot(topi, num_experts, dtype=gates.dtype)  # [n, k, E]
    # Capacity slots are claimed in (choice-rank, token) order: all first
    # choices, then all second choices — the Switch convention, so a token's
    # primary expert is dropped last.
    flat = jnp.swapaxes(onehot, 0, 1).reshape(top_k * n, num_experts)
    pos = jnp.cumsum(flat, axis=0) - flat  # position within each expert
    keep = (pos < capacity).astype(gates.dtype) * flat
    slot = jnp.sum(pos * flat, axis=-1).astype(jnp.int32)  # [k*n]
    slot_oh = jax.nn.one_hot(slot, capacity, dtype=gates.dtype)  # [k*n, C]

    keep = keep.reshape(top_k, n, num_experts)
    slot_oh = slot_oh.reshape(top_k, n, capacity)
    dispatch = jnp.einsum("kne,knc->nec", keep, slot_oh)
    combine = jnp.einsum("kn,kne,knc->nec", jnp.swapaxes(topv, 0, 1), keep, slot_oh)

    # Switch aux statistics: fraction of tokens routed (first choice), mean gate.
    frac = jnp.mean(onehot[:, 0, :], axis=0)
    gate_mean = jnp.mean(gates, axis=0)
    return dispatch, combine, frac, gate_mean


def _expert_mlp(w_in: jax.Array, w_out: jax.Array, x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x @ w_in, approximate=True) @ w_out


def moe_mlp(
    params: Dict[str, Any],
    x: jax.Array,
    top_k: int = 2,
    capacity: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-device dense reference: [n, d] tokens -> ([n, d], aux_loss)."""
    n = x.shape[0]
    num_experts = params["router"].shape[1]
    if capacity is None:
        capacity = _default_capacity(n, top_k, num_experts)
    gates = jax.nn.softmax((x @ params["router"]).astype(jnp.float32), axis=-1)
    dispatch, combine, frac, gate_mean = _route(gates, top_k, capacity)
    staged = jnp.einsum("nec,nd->ecd", dispatch.astype(x.dtype), x)
    y = jax.vmap(_expert_mlp)(params["w_in"], params["w_out"], staged)
    out = jnp.einsum("nec,ecd->nd", combine.astype(x.dtype), y)
    aux = num_experts * jnp.sum(frac * gate_mean)
    return out, aux


def _default_capacity(n: int, top_k: int, num_experts: int) -> int:
    # capacity_factor 1.25 over the balanced load, floor of 4.
    return max(4, int(1.25 * top_k * n / num_experts))


def moe_mlp_expert_parallel(
    params: Dict[str, Any],
    x: jax.Array,
    mesh,
    axis: str = "expert",
    top_k: int = 2,
    capacity: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Expert-parallel MoE: tokens AND experts sharded over `axis`.

    `x` is [n, d] global tokens (n divisible by the ep group size); expert
    stacks are split over the ep devices; two all_to_alls move routed token
    blocks to/from the owning devices. With `capacity >= top_k * n_local`
    this equals `moe_mlp` exactly (no drops). Returns ([n, d], aux_loss).
    """
    from jax.sharding import PartitionSpec as P

    ep = mesh.shape[axis]
    n = x.shape[0]
    num_experts = params["router"].shape[1]
    if n % ep != 0:
        raise ValueError(f"{n} tokens not divisible by {ep} ep devices")
    if num_experts % ep != 0:
        raise ValueError(f"{num_experts} experts not divisible by ep={ep}")
    cap = _default_capacity(n // ep, top_k, num_experts) if capacity is None else capacity

    def body(router, w_in, w_out, x_loc):
        gates = jax.nn.softmax((x_loc @ router).astype(jnp.float32), axis=-1)
        dispatch, combine, frac, gate_mean = _route(gates, top_k, cap)
        # [E, C, d] expert-major token blocks for THIS device's tokens.
        staged = jnp.einsum("nec,nd->ecd", dispatch.astype(x_loc.dtype), x_loc)
        # Ship each expert block to its owner; receive every device's block
        # for OUR experts, concatenated along capacity: [E/ep, C*ep, d].
        staged = jax.lax.all_to_all(staged, axis, 0, 1, tiled=True)
        y = jax.vmap(_expert_mlp)(w_in, w_out, staged)
        # Route results back to the tokens' home devices: [E, C, d].
        y = jax.lax.all_to_all(y, axis, 1, 0, tiled=True)
        out = jnp.einsum("nec,ecd->nd", combine.astype(x_loc.dtype), y)
        # Global Switch aux: aggregate the per-expert statistics over the ep
        # group FIRST (tokens are evenly sharded, so the pmean of shard means
        # is the global mean), then take the product — pmean of per-shard
        # aux products would diverge from the dense loss under unbalanced
        # routing.
        frac_g = jax.lax.pmean(frac, axis)
        gate_mean_g = jax.lax.pmean(gate_mean, axis)
        aux = num_experts * jnp.sum(frac_g * gate_mean_g)
        return out, aux

    return _shard_map(
        body,
        mesh,
        (P(), P(axis), P(axis), P(axis)),
        (P(axis), P()),
    )(params["router"], params["w_in"], params["w_out"], x)
