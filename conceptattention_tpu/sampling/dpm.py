"""DPM-Solver++ (2M) multistep scheduler for VP diffusion.

Capability parity with the CogVideoXDPMScheduler option the reference's video
pipeline drives (`experiments/video_model/cogvideox/pipeline.py:350-361` in
manuragkhullar/ConceptAttention). Implemented from the DPM-Solver++ paper
(Lu et al. 2022, Alg. 2M): data-prediction multistep update in
log-SNR (lambda) space. Pure functions with an explicit carried state so the
whole sampling loop runs under one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from conceptattention_tpu.sampling.ddim import DDIMSchedule, make_ddim_schedule


class DPMState(NamedTuple):
    sample: jax.Array
    prev_x0: jax.Array  # previous step's data prediction
    prev_lambda: jax.Array  # scalar
    step_index: jax.Array  # int32


def make_dpm_schedule(num_inference_steps: int, **kwargs) -> DDIMSchedule:
    """Same beta/alpha tables as DDIM; the update rule differs."""
    return make_ddim_schedule(num_inference_steps, **kwargs)


def _coeffs(sched: DDIMSchedule, timestep):
    acp = jnp.where(
        timestep >= 0,
        sched.alphas_cumprod[jnp.maximum(timestep, 0)],
        sched.final_alpha_cumprod,
    )
    alpha = jnp.sqrt(acp)
    sigma = jnp.sqrt(1.0 - acp)
    # clamp: at t<0 (the final boundary) sigma -> 0; keep lambda finite
    sigma = jnp.maximum(sigma, 1e-6)
    lam = jnp.log(alpha / sigma)
    return alpha, sigma, lam


def _to_x0(sched: DDIMSchedule, model_output, sample, alpha, sigma):
    x = sample.astype(jnp.float32)
    out = model_output.astype(jnp.float32)
    if sched.prediction_type == "v_prediction":
        return alpha * x - sigma * out
    if sched.prediction_type == "epsilon":
        return (x - sigma * out) / alpha
    raise ValueError(sched.prediction_type)


def dpm_init(sample: jax.Array) -> DPMState:
    return DPMState(
        sample=sample,
        prev_x0=jnp.zeros_like(sample, dtype=jnp.float32),
        prev_lambda=jnp.asarray(0.0, jnp.float32),
        step_index=jnp.asarray(0, jnp.int32),
    )


def dpm_step(
    sched: DDIMSchedule,
    state: DPMState,
    model_output: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
) -> DPMState:
    """One DPM-Solver++(2M) update (first step falls back to 1st order)."""
    alpha_t, sigma_t, lam_t = _coeffs(sched, timestep)
    alpha_s, sigma_s, lam_s = _coeffs(sched, prev_timestep)
    x0 = _to_x0(sched, model_output, state.sample, alpha_t, sigma_t)

    h = lam_s - lam_t
    is_multistep = state.step_index > 0
    # Lower-order-final (diffusers lower_order_final=True): at the t<0
    # boundary the sigma clamp makes h ~ 10, so the 2M coefficient
    # h/(2*h_prev) would extrapolate the last two x0 predictions by 2-6x,
    # amplifying inter-step model noise straight into the output. The final
    # step must be plain first order (x_next -> x0).
    is_final = prev_timestep < 0
    use_multi = jnp.logical_and(is_multistep, jnp.logical_not(is_final))
    h_prev = lam_t - state.prev_lambda
    r = jnp.where(use_multi, h_prev / jnp.where(h == 0, 1.0, h), 1.0)
    # 2M data combination: D = (1 + 1/(2r)) x0 - 1/(2r) x0_prev
    coef = 1.0 / (2.0 * jnp.maximum(r, 1e-6))
    d = jnp.where(use_multi, (1.0 + coef) * x0 - coef * state.prev_x0, x0)

    x = state.sample.astype(jnp.float32)
    x_next = (sigma_s / sigma_t) * x - alpha_s * jnp.expm1(-h) * d
    return DPMState(
        sample=x_next.astype(state.sample.dtype),
        prev_x0=x0,
        prev_lambda=lam_t,
        step_index=state.step_index + 1,
    )
