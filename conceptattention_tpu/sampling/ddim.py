"""DDIM scheduler for the video-DiT (VP diffusion) path.

Capability parity with the diffusers schedulers the reference's CogVideoX
pipeline drives (`experiments/video_model/cogvideox/pipeline.py:308-376` in
manuragkhullar/ConceptAttention: CogVideoXDDIMScheduler with scaled-linear
betas and v-prediction). Implemented from the DDIM update rule (Song et al.
2021) as a pure-function scheduler whose step runs under jit: all
alpha-cumprod tables are precomputed host-side; the step is indexable by a
traced timestep so the whole CFG denoise loop scans on device.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed tables + selected timestep sequence."""

    timesteps: jnp.ndarray  # [S] int32, descending
    alphas_cumprod: jnp.ndarray  # [num_train_timesteps] float32
    final_alpha_cumprod: float
    prediction_type: str = "v_prediction"


def make_ddim_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "v_prediction",
    set_alpha_to_one: bool = True,
    snr_shift_scale: float = 3.0,
    rescale_betas_zero_snr: bool = True,
) -> DDIMSchedule:
    """Defaults match the published CogVideoX scheduler configs
    (snr_shift_scale=3.0, rescale_betas_zero_snr=True) — real checkpoints
    were trained against the SHIFTED noise levels, so omitting the transform
    queries the model off-distribution. Pass snr_shift_scale=1.0,
    rescale_betas_zero_snr=False for a plain Song-et-al DDIM table."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)

    # SNR shift (diffusers CogVideoXDDIMScheduler.__init__):
    # a_c <- a_c / (s + (1 - s) * a_c).
    if snr_shift_scale != 1.0:
        alphas_cumprod = alphas_cumprod / (
            snr_shift_scale + (1.0 - snr_shift_scale) * alphas_cumprod
        )
    # Zero terminal SNR (Lin et al. 2023, diffusers rescale_zero_terminal_snr):
    # shift/scale sqrt(a_c) so the last step is pure noise.
    if rescale_betas_zero_snr:
        s = np.sqrt(alphas_cumprod)
        s0, sT = s[0], s[-1]
        s = (s - sT) * (s0 / (s0 - sT))
        alphas_cumprod = s**2

    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)

    return DDIMSchedule(
        timesteps=jnp.asarray(timesteps),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=1.0 if set_alpha_to_one else float(alphas_cumprod[0]),
        prediction_type=prediction_type,
    )


def ddim_step(
    sched: DDIMSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
    sample: jax.Array,
    eta: float = 0.0,
    key: jax.Array = None,
) -> jax.Array:
    """One DDIM update. eta=0 (default) is deterministic; eta>0 adds the
    Song-et-al stochastic variance term and requires a PRNG `key`. All array
    inputs may be traced."""
    a_t = sched.alphas_cumprod[timestep]
    a_prev = jnp.where(
        prev_timestep >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
        sched.final_alpha_cumprod,
    )
    sqrt_a_t = jnp.sqrt(a_t)
    sqrt_1ma_t = jnp.sqrt(1.0 - a_t)

    x = sample.astype(jnp.float32)
    out = model_output.astype(jnp.float32)
    if sched.prediction_type == "v_prediction":
        pred_x0 = sqrt_a_t * x - sqrt_1ma_t * out
        pred_eps = sqrt_a_t * out + sqrt_1ma_t * x
    elif sched.prediction_type == "epsilon":
        pred_x0 = (x - sqrt_1ma_t * out) / sqrt_a_t
        pred_eps = out
    else:
        raise ValueError(sched.prediction_type)

    if eta > 0.0:
        if key is None:
            raise ValueError("ddim_step with eta > 0 requires a PRNG key")
        # sigma_t^2 = eta^2 (1-a_prev)/(1-a_t) (1 - a_t/a_prev)
        var = (1.0 - a_prev) / jnp.maximum(1.0 - a_t, 1e-12) * (
            1.0 - a_t / jnp.maximum(a_prev, 1e-12)
        )
        sigma = eta * jnp.sqrt(jnp.maximum(var, 0.0))
        dir_coef = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0))
        noise = jax.random.normal(key, sample.shape, jnp.float32)
        prev = jnp.sqrt(a_prev) * pred_x0 + dir_coef * pred_eps + sigma * noise
        return prev.astype(sample.dtype)
    prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * pred_eps
    return prev.astype(sample.dtype)


def add_noise(
    sched: DDIMSchedule, sample: jax.Array, noise: jax.Array, timestep: jax.Array
) -> jax.Array:
    a_t = sched.alphas_cumprod[timestep]
    return (
        jnp.sqrt(a_t) * sample.astype(jnp.float32)
        + jnp.sqrt(1.0 - a_t) * noise.astype(jnp.float32)
    ).astype(sample.dtype)
