"""Diffusion schedulers: PNDM/PLMS (SD v1.5's default) and DDIM.

Parity target: the scheduler.step calls in the reference's denoise loop
(gill/custom_sd.py:628-651; diffusers PNDMScheduler with
skip_prk_steps=True, beta schedule scaled_linear 0.00085->0.012 over 1000
steps, steps_offset=1, set_alpha_to_one=False).

TPU-first: the PLMS state (4-slot ets ring, counter, cur_sample) is a fixed
-shape pytree and `step` is branch-free jnp (lax.switch over the multistep
order), so the whole 50-step CFG loop compiles into ONE lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"


def alphas_cumprod(cfg: SchedulerConfig) -> jnp.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                             cfg.num_train_timesteps, dtype=jnp.float32) ** 2
    elif cfg.beta_schedule == "linear":
        betas = jnp.linspace(cfg.beta_start, cfg.beta_end,
                             cfg.num_train_timesteps, dtype=jnp.float32)
    else:
        raise NotImplementedError(cfg.beta_schedule)
    return jnp.cumprod(1.0 - betas)


# ---------------------------------------------------------------------------
# PLMS (PNDM with skip_prk_steps)
# ---------------------------------------------------------------------------

class PNDMScheduler:
    """Stateless functional PLMS; state threads through scan."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.acp = alphas_cumprod(cfg)
        self.final_alpha = (jnp.asarray(1.0) if cfg.set_alpha_to_one
                            else self.acp[0])
        self.init_noise_sigma = 1.0

    def timesteps(self, num_inference_steps: int) -> Tuple[jnp.ndarray, int]:
        """Returns (timesteps incl. the repeated warmup step, step_ratio).

        diffusers PNDM plms_timesteps: ts[:-1] + ts[-2:-1] + ts[-1:],
        reversed -> the SECOND entry is repeated once (2nd-order warmup);
        length = num_inference_steps + 1 model evaluations.
        """
        ratio = self.cfg.num_train_timesteps // num_inference_steps
        ts = (jnp.arange(num_inference_steps) * ratio).round().astype(jnp.int32)
        ts = ts + self.cfg.steps_offset
        plms = jnp.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
        return plms, ratio

    def init_state(self, sample_shape, dtype=jnp.float32):
        return {
            "ets": jnp.zeros((4,) + tuple(sample_shape), dtype),
            "n_ets": jnp.zeros((), jnp.int32),
            "counter": jnp.zeros((), jnp.int32),
            "cur_sample": jnp.zeros(sample_shape, dtype),
        }

    def _get_prev_sample(self, sample, t, prev_t, eps):
        acp = self.acp
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)],
                           self.final_alpha)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev ** 0.5 + (a_t * b_t * a_prev) ** 0.5
        f32 = lambda x: x.astype(jnp.float32)
        prev = (sample_coeff * f32(sample)
                - (a_prev - a_t) * f32(eps) / denom)
        return prev.astype(sample.dtype)

    def step(self, state, model_output, timestep, sample, step_ratio: int):
        """One PLMS step. Returns (prev_sample, new_state)."""
        counter = state["counter"]
        ets, n_ets = state["ets"], state["n_ets"]
        is_c1 = counter == 1

        prev_t = jnp.where(is_c1, timestep, timestep - step_ratio)
        t_eff = jnp.where(is_c1, timestep + step_ratio, timestep)

        pushed = jnp.concatenate([model_output[None], ets[:3]], axis=0)
        new_ets = jnp.where(is_c1, ets, pushed)
        new_n = jnp.where(is_c1, n_ets, jnp.minimum(n_ets + 1, 4))

        e0 = new_ets[0].astype(jnp.float32)
        e1 = new_ets[1].astype(jnp.float32)
        e2 = new_ets[2].astype(jnp.float32)
        e3 = new_ets[3].astype(jnp.float32)
        mo = model_output.astype(jnp.float32)

        def order1(_):
            return mo

        def order1p5(_):  # counter == 1: average with the stored et
            return (mo + e0) / 2.0

        def order2(_):
            return (3.0 * e0 - e1) / 2.0

        def order3(_):
            return (23.0 * e0 - 16.0 * e1 + 5.0 * e2) / 12.0

        def order4(_):
            return (55.0 * e0 - 59.0 * e1 + 37.0 * e2 - 9.0 * e3) / 24.0

        # branch index: counter==0 -> 0; counter==1 -> 1; else by history len
        idx = jnp.where(counter == 0, 0,
                        jnp.where(counter == 1, 1,
                                  jnp.clip(new_n, 2, 4)))
        blended = jax.lax.switch(idx, [order1, order1p5, order2, order3,
                                       order4], None)
        blended = blended.astype(model_output.dtype)

        sample_eff = jnp.where(is_c1, state["cur_sample"], sample)
        new_cur = jnp.where(counter == 0, sample, state["cur_sample"])

        prev = self._get_prev_sample(sample_eff, t_eff, prev_t, blended)
        new_state = {"ets": new_ets, "n_ets": new_n, "counter": counter + 1,
                     "cur_sample": new_cur}
        return prev, new_state


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------

class DDIMScheduler:
    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.acp = alphas_cumprod(cfg)
        self.final_alpha = (jnp.asarray(1.0) if cfg.set_alpha_to_one
                            else self.acp[0])
        self.init_noise_sigma = 1.0

    def timesteps(self, num_inference_steps: int) -> Tuple[jnp.ndarray, int]:
        ratio = self.cfg.num_train_timesteps // num_inference_steps
        ts = (jnp.arange(num_inference_steps) * ratio).round().astype(jnp.int32)
        ts = ts + self.cfg.steps_offset
        return ts[::-1], ratio

    def init_state(self, sample_shape, dtype=jnp.float32):
        return {}

    def step(self, state, model_output, timestep, sample, step_ratio: int):
        prev_t = timestep - step_ratio
        a_t = self.acp[timestep]
        a_prev = jnp.where(prev_t >= 0, self.acp[jnp.maximum(prev_t, 0)],
                           self.final_alpha)
        f32 = lambda x: x.astype(jnp.float32)
        s, eps = f32(sample), f32(model_output)
        x0 = (s - (1.0 - a_t) ** 0.5 * eps) / a_t ** 0.5
        prev = a_prev ** 0.5 * x0 + (1.0 - a_prev) ** 0.5 * eps
        return prev.astype(sample.dtype), state


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M)
# ---------------------------------------------------------------------------

class DPMSolverPPScheduler:
    """DPM-Solver++ 2M (diffusers DPMSolverMultistepScheduler with
    algorithm_type='dpmsolver++', solver_order=2, epsilon prediction,
    lower_order_final). Beyond-parity sampler: ~20-25 steps reach 50-step
    PNDM quality, so quality-per-second roughly doubles. State (previous
    x0 prediction + last lambda step + index) is a fixed-shape pytree;
    the whole loop compiles into one lax.scan like PNDM.
    """

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.acp = alphas_cumprod(cfg)
        self.init_noise_sigma = 1.0

    def timesteps(self, num_inference_steps: int) -> Tuple[jnp.ndarray, int]:
        # diffusers: linspace(0, T-1, n+1).round()[::-1][:-1]
        ts = jnp.linspace(0, self.cfg.num_train_timesteps - 1,
                          num_inference_steps + 1).round()[::-1][:-1]
        self._n = num_inference_steps  # static; read at trace time only
        return ts.astype(jnp.int32), 0

    def prev_timesteps(self, ts: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([ts[1:], jnp.zeros((1,), ts.dtype)])

    def init_state(self, sample_shape, dtype=jnp.float32):
        return {
            "m1": jnp.zeros(sample_shape, jnp.float32),  # previous x0 pred
            "h_last": jnp.zeros((), jnp.float32),
            "i": jnp.zeros((), jnp.int32),
        }

    def step(self, state, model_output, timestep, sample, step_ratio: int,
             prev_timestep=None):
        assert prev_timestep is not None, \
            "DPMSolver++ needs prev_timestep (pipeline passes it)"
        acp = self.acp
        f32 = lambda x: x.astype(jnp.float32)

        def coeffs(t):
            a = jnp.sqrt(acp[t])
            s = jnp.sqrt(1.0 - acp[t])
            return a, s, jnp.log(a) - jnp.log(s)

        a_t, s_t, lam_t = coeffs(timestep)
        a_p, s_p, lam_p = coeffs(prev_timestep)
        h = lam_p - lam_t

        x = f32(sample)
        x0 = (x - s_t * f32(model_output)) / a_t  # epsilon -> x0 (dpm++)

        # second-order D with the previous x0; first step (and the final
        # step when n < 15, diffusers lower_order_final) falls back to 1st
        r = state["h_last"] / jnp.where(h == 0, 1.0, h)
        d2 = (1.0 + 1.0 / (2.0 * jnp.where(r == 0, 1.0, r))) * x0 \
            - (1.0 / (2.0 * jnp.where(r == 0, 1.0, r))) * state["m1"]
        use_first = state["i"] == 0
        n = getattr(self, "_n", 1000)
        if n < 15:
            use_first = jnp.logical_or(use_first, state["i"] == n - 1)
        d = jnp.where(use_first, x0, d2)

        prev = (s_p / s_t) * x - a_p * jnp.expm1(-h) * d
        new_state = {"m1": x0, "h_last": h, "i": state["i"] + 1}
        return prev.astype(sample.dtype), new_state
