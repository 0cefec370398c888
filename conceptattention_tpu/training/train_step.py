"""Rectified-flow (flow-matching) training step for the Flux DiT.

The reference is inference-only (SURVEY.md §5: no training, load-only
checkpoints). A TPU-native framework for this model family needs the training
path to be first-class: the same `flux_forward` runs under `jax.value_and_grad`
with a conditional-flow-matching objective

    x_t = t * eps + (1 - t) * x_data,    v* = eps - x_data,
    L = E_t ||v_theta(x_t, t) - v*||^2

(the probability path matched by the reference's Euler sampler
`sampling.py:96-152`: x_{t-dt} = x_t - dt * v). Gradients are computed with
activation rematerialization over the layer scans, optimizer is optax adamw,
and everything jits over the DP x TP mesh shardings from parallel/sharding.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.models.flux.dit import flux_forward


def flow_matching_loss(
    params: Dict[str, Any],
    cfg: FluxConfig,
    batch: Dict[str, jax.Array],
    key: jax.Array,
) -> jax.Array:
    """Conditional flow-matching MSE on packed latents.

    batch: {img [B,P,C], img_ids, txt, txt_ids, y} (+ guidance optional).
    """
    x = batch["img"].astype(jnp.float32)
    b = x.shape[0]
    t_key, eps_key = jax.random.split(key)
    # Logit-normal timestep sampling (SD3-style) concentrates capacity at
    # mid-noise levels.
    t = jax.nn.sigmoid(jax.random.normal(t_key, (b,)))
    eps = jax.random.normal(eps_key, x.shape, jnp.float32)
    t_b = t[:, None, None]
    x_t = t_b * eps + (1.0 - t_b) * x
    target = eps - x

    pred, _ = flux_forward(
        params, cfg,
        img=x_t.astype(batch["img"].dtype),
        img_ids=batch["img_ids"],
        txt=batch["txt"], txt_ids=batch["txt_ids"],
        timesteps=t, y=batch["y"],
        guidance=batch.get("guidance"),
        remat=True,  # backward recomputes block activations per layer
    )
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


def init_train_state(
    params: Dict[str, Any], learning_rate: float = 1e-4, weight_decay: float = 0.0
) -> Tuple[optax.GradientTransformation, Any]:
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return tx, tx.init(params)


def make_train_step(
    cfg: FluxConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    param_sharding=None,
    batch_sharding=None,
    donate: bool = True,
):
    """Build a jitted (params, opt_state, batch, key) -> (params, opt_state, loss)
    step. When mesh/shardings are given, in/out shardings pin params to the TP
    layout and the batch to DP — GSPMD inserts the collectives."""

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(flow_matching_loss)(params, cfg, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    # opt_state sharding mirrors the params; GSPMD infers it from the params
    # operand, so only params and batch are pinned explicitly.
    return jax.jit(
        step,
        in_shardings=(param_sharding, None, batch_sharding, None),
        out_shardings=(param_sharding, None, None),
        donate_argnums=(0, 1) if donate else (),
    )
