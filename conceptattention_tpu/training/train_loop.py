"""Production training loop around training/train_step.py.

The reference is inference-only (SURVEY.md §5); a complete framework for this
model family needs the loop itself to be first-class:

  - warmup + cosine learning-rate schedule with global-norm gradient clipping
    (the standard large-scale DiT recipe);
  - gradient accumulation via optax.MultiSteps (microbatches beyond what HBM
    fits per step);
  - an EMA parameter shadow (what diffusion models actually ship — sampling
    quality tracks the EMA weights, not the raw ones);
  - durable orbax checkpoints of {params, ema, step} with automatic resume:
    an interrupted run continues from the last saved step rather than
    restarting (the same gap the eval harnesses close with --state_path).

Everything under one jitted step; shardings (DP x TP) come from
parallel/sharding.py exactly as in make_train_step.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from conceptattention_tpu.config import FluxConfig
from conceptattention_tpu.training.train_step import flow_matching_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    total_steps: int = 1000
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    warmup_steps: int = 100
    min_lr_ratio: float = 0.1      # cosine floor as a fraction of peak
    max_grad_norm: float = 1.0
    grad_accum: int = 1            # microbatches per optimizer update
    ema_decay: float = 0.999       # 0 disables the EMA shadow
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 100    # MICRO-steps between saves
    log_every: int = 10


def make_lr_schedule(tc: TrainConfig) -> optax.Schedule:
    """Linear warmup -> cosine decay to min_lr_ratio * peak.

    total_steps / warmup_steps count MICRO-steps; under optax.MultiSteps the
    inner schedule advances once per OPTIMIZER update (every grad_accum
    micro-steps), so the schedule is built in optimizer-update units — with
    grad_accum=4 and total_steps=1000 the cosine spans 250 updates and ends
    at the floor, not 1/4 of the way down.
    """
    k = max(1, tc.grad_accum)
    warmup = max(0, tc.warmup_steps // k)
    total = max(tc.total_steps // k, warmup + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=warmup,
        decay_steps=total,
        end_value=tc.learning_rate * tc.min_lr_ratio,
    )


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(make_lr_schedule(tc), weight_decay=tc.weight_decay),
    )
    if tc.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.grad_accum)
    return tx


def make_loop_step(
    cfg: FluxConfig,
    tc: TrainConfig,
    tx: optax.GradientTransformation,
    loss_fn: Callable = flow_matching_loss,
    mesh=None,
    param_sharding=None,
    batch_sharding=None,
):
    """(params, ema, opt_state, batch, key) -> (params, ema, opt_state, loss),
    jitted; EMA updates only on real optimizer steps (MultiSteps mini-steps
    leave params unchanged, so the no-op decay is harmless and branch-free)."""

    def step(params, ema, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if tc.ema_decay > 0.0:
            d = tc.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
        return params, ema, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    return jax.jit(
        step,
        in_shardings=(param_sharding, param_sharding, None, batch_sharding, None),
        out_shardings=(param_sharding, param_sharding, None, None),
        donate_argnums=(0, 1, 2),
    )


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")


def latest_checkpoint(ckpt_dir: Optional[str]) -> Optional[Tuple[int, str]]:
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    )
    if not steps:
        return None
    return steps[-1], _ckpt_path(ckpt_dir, steps[-1])


def train_loop(
    params: Dict[str, Any],
    cfg: FluxConfig,
    data: Iterator[Dict[str, jax.Array]],
    tc: TrainConfig,
    key: Optional[jax.Array] = None,
    loss_fn: Callable = flow_matching_loss,
    mesh=None,
    param_sharding=None,
    batch_sharding=None,
    log: Callable[[str], None] = print,
) -> Dict[str, Any]:
    """Run `tc.total_steps` micro-steps; returns
    {"params", "ema", "step", "losses"}.

    Resume: when `tc.checkpoint_dir` holds a step_XXXXXXXX checkpoint, params
    and the EMA restore from it and the loop continues at that step (data is
    advanced past the consumed batches so the stream stays aligned).
    """
    from conceptattention_tpu.utils.checkpoint import load_params, save_params

    key = key if key is not None else jax.random.PRNGKey(0)
    # The jitted step donates its params/ema/opt_state buffers (in-place
    # updates matter at 12B params); copy ONCE here so the caller's arrays
    # stay valid, and so params/ema never alias each other.
    params = jax.tree.map(jnp.copy, params)
    # unconditional copy: params and ema are both donated, so they must never
    # alias, even with ema_decay == 0 (where ema just rides along unchanged)
    ema = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    start = 0

    latest = latest_checkpoint(tc.checkpoint_dir)
    if latest is not None:
        start, path = latest
        restored = load_params(
            path, like={"params": params, "ema": ema, "opt_state": opt_state}
        )
        params, ema = restored["params"], restored["ema"]
        # Full optimizer state restores too: adam moments, the MultiSteps
        # accumulator, AND the schedule count — a resumed run continues the
        # warmup/cosine exactly where the interrupted one stopped instead of
        # replaying warmup from LR ~0.
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state),
            jax.tree.leaves(restored["opt_state"]),
        )
        for _ in range(start):  # keep the data stream aligned
            next(data)
        log(f"resumed from {path} at step {start}")

    step_fn = make_loop_step(
        cfg, tc, tx, loss_fn=loss_fn, mesh=mesh,
        param_sharding=param_sharding, batch_sharding=batch_sharding,
    )

    losses = []
    device_losses = []  # fetched lazily: a float() per step would block the
    # next dispatch behind a 30-90 ms host sync on the TPU plugin

    def drain():
        losses.extend(float(x) for x in device_losses)
        device_losses.clear()

    for i in range(start, tc.total_steps):
        batch = next(data)
        # fold_in by step index (not sequential splits): a resumed run uses
        # the SAME per-step keys an uninterrupted run would have used.
        sub = jax.random.fold_in(key, i)
        params, ema, opt_state, loss = step_fn(params, ema, opt_state, batch, sub)
        device_losses.append(loss)
        if (i + 1) % tc.log_every == 0:
            drain()
            log(f"step {i + 1}/{tc.total_steps} loss {losses[-1]:.5f}")
        if tc.checkpoint_dir and (i + 1) % tc.checkpoint_every == 0:
            drain()
            save_params(_ckpt_path(tc.checkpoint_dir, i + 1),
                        {"params": params, "ema": ema, "opt_state": opt_state})
    drain()
    return {"params": params, "ema": ema, "step": tc.total_steps,
            "losses": losses}
