"""Stable Diffusion v1.5 text-to-image pipeline.

Parity target: the reference's forked diffusers pipeline
(gill/custom_sd.py:51-666) with its three deltas preserved:
  (1) `prompt_embeds` bypasses the text encoder so GILLMapper outputs
      condition the UNet directly (custom_sd.py:265,489,594-604);
  (2) `return_prompts_only` early-exits after prompt encoding — the
      SD-embedding precompute path (custom_sd.py:496,589-591);
  (3) `truncate_side='left'|'right'` tokenizer truncation (custom_sd.py:90).

TPU-first: the whole 50-step classifier-free-guidance denoise runs as ONE
lax.scan inside jit (batched 2x latents, PLMS state threaded through the
carry), and the VAE decode stays on device. No host round-trips per step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gill_tpu.models import clip as clip_mod
from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.models.sd import vae as vae_mod
from gill_tpu.models.sd.scheduler import (DPMSolverPPScheduler, PNDMScheduler,
                                          SchedulerConfig)


@dataclasses.dataclass
class SDPipelineConfig:
    unet: unet_mod.UNetConfig = dataclasses.field(
        default_factory=unet_mod.UNetConfig)
    vae: vae_mod.VAEConfig = dataclasses.field(
        default_factory=vae_mod.VAEConfig)
    text: clip_mod.CLIPTextConfig = dataclasses.field(
        default_factory=clip_mod.CLIPTextConfig)
    scheduler: SchedulerConfig = dataclasses.field(
        default_factory=SchedulerConfig)
    vae_scale: int = 8
    default_size: int = 512  # reference custom_sd.py:482-483 default


def tiny_sd_config() -> SDPipelineConfig:
    return SDPipelineConfig(
        unet=unet_mod.tiny_unet_config(),
        vae=vae_mod.tiny_vae_config(),
        text=clip_mod.CLIPTextConfig(vocab_size=600, hidden_size=24,
                                     intermediate_size=48, num_layers=2,
                                     num_heads=2, max_positions=16,
                                     eos_token_id=513),
        vae_scale=2, default_size=16)


class StableDiffusionPipeline:
    """Functional pipeline: params are explicit, __call__ is jit-friendly."""

    def __init__(self, cfg: SDPipelineConfig, params: dict, tokenizer=None,
                 scheduler: Optional[PNDMScheduler] = None,
                 safety_checker=None, quantize: bool = False,
                 sampler: str = "pndm"):
        """params: {"unet", "vae_decoder", optional "text_encoder",
        optional "vae_encoder"}.

        safety_checker: optional callable(images (B,H,W,3) in [0,1]) ->
        (images, has_nsfw: list[bool]) applied after decode — the hook the
        reference's StableDiffusionSafetyChecker occupies
        (custom_sd.py:653-661). Default None = no filtering.

        quantize: opt-in int8 W8A8 UNet serving mode (ops/quant.py) — the
        UNet's conv/FF weights are quantized once here and matmuls run on
        the int8 MXU. Quality gate before defaulting: ROADMAP.md.
        """
        self.cfg = cfg
        if quantize and params.get("unet") is not None:
            params = dict(params)
            params["unet"] = unet_mod.quantize_params(params["unet"])
        self.quantized = quantize
        self.params = params
        self.tokenizer = tokenizer
        # sampler: "pndm" (reference parity, custom_sd.py's default) or
        # "dpm++" (DPM-Solver++ 2M — ~20-25 steps match 50-step PNDM
        # quality; beyond-parity quality-per-second option)
        if scheduler is None:
            scheduler = (DPMSolverPPScheduler(cfg.scheduler)
                         if sampler == "dpm++" else
                         PNDMScheduler(cfg.scheduler))
        self.scheduler = scheduler
        self.safety_checker = safety_checker
        # latent channel count for shape math
        self.latent_channels = cfg.vae.latent_channels

    # -- prompt encoding ------------------------------------------------------

    def encode_text(self, prompts, truncate_side: str = "right"):
        """Text -> (B, T, D) last hidden states via the CLIP text encoder.
        (reference _encode_prompt, custom_sd.py:594-604)."""
        assert self.tokenizer is not None and "text_encoder" in self.params, \
            "text encoder unavailable; pass prompt_embeds instead"
        enc = self.tokenizer(prompts, max_length=self.cfg.text.max_positions,
                             truncate_side=truncate_side)
        out = clip_mod.text_forward(self.params["text_encoder"], self.cfg.text,
                                    jnp.asarray(enc.input_ids))
        return out["last_hidden"]

    def _uncond_embeds(self, batch: int):
        if self.tokenizer is not None and "text_encoder" in self.params:
            e = self.encode_text([""])
            return jnp.broadcast_to(e, (batch,) + e.shape[1:])
        # No text encoder loaded: zero unconditional embeddings.
        return jnp.zeros((batch, self.cfg.text.max_positions,
                          self.cfg.unet.cross_attention_dim), jnp.float32)

    # -- main ------------------------------------------------------------------

    def __call__(self, prompt=None, *, prompt_embeds=None,
                 negative_prompt_embeds=None, height: Optional[int] = None,
                 width: Optional[int] = None, num_inference_steps: int = 50,
                 guidance_scale: float = 7.5, rng=None, latents=None,
                 return_prompts_only: bool = False,
                 truncate_side: str = "right", output_latents: bool = False):
        """Returns images (B, H, W, 3) float32 in [0, 1] on device (the PIL
        conversion of the reference, custom_sd.py:653-666, happens host-side
        in the caller), or prompt embeddings when return_prompts_only."""
        if prompt_embeds is None:
            assert prompt is not None
            if isinstance(prompt, str):
                prompt = [prompt]
            prompt_embeds = self.encode_text(prompt, truncate_side)
        if return_prompts_only:
            return prompt_embeds

        b = prompt_embeds.shape[0]
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            neg = (negative_prompt_embeds if negative_prompt_embeds is not None
                   else self._uncond_embeds(b))
            ctx = jnp.concatenate([neg.astype(prompt_embeds.dtype),
                                   prompt_embeds], axis=0)
        else:
            ctx = prompt_embeds

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        height = height or self.cfg.default_size
        width = width or self.cfg.default_size
        h, w = height // self.cfg.vae_scale, width // self.cfg.vae_scale
        if latents is None:
            latents = jax.random.normal(
                rng, (b, h, w, self.latent_channels), jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma

        latents = self.denoise(latents, ctx, num_inference_steps,
                               guidance_scale)
        if output_latents:
            return latents
        images = self.decode_latents(latents)
        if self.safety_checker is not None:
            images, _ = self.safety_checker(images)
        return images

    @partial(jax.jit, static_argnames=("self", "num_inference_steps",
                                       "guidance_scale"))
    def denoise(self, latents, ctx, num_inference_steps: int,
                guidance_scale: float):
        ts, ratio = self.scheduler.timesteps(num_inference_steps)
        state = self.scheduler.init_state(latents.shape, latents.dtype)
        unet_params = self.params["unet"]
        # Run the UNet in its PARAMS' dtype regardless of the latent dtype:
        # __call__ draws f32 latents (scheduler math stays f32, beating the
        # reference's fp16 trajectory) and without this cast the whole UNet
        # silently promoted to f32 on the user path while the bench path
        # (denoise with bf16 latents) ran bf16 — 2x activation traffic and
        # a VMEM blowup in the Pallas GEGLU at small batches.
        w_in = unet_params["conv_in"]["w"].dtype
        unet_dtype = w_in if w_in in (jnp.bfloat16, jnp.float16,
                                      jnp.float32) else jnp.bfloat16
        do_cfg = guidance_scale > 1.0
        # Multistep solvers with non-uniform timesteps (DPM-Solver++) need
        # the NEXT timestep explicitly; uniform-grid schedulers derive it
        # from step_ratio and ignore the argument.
        prev_fn = getattr(self.scheduler, "prev_timesteps", None)
        xs = (ts, prev_fn(ts)) if prev_fn is not None else (ts, ts)
        pass_prev = prev_fn is not None

        def step(carry, t_pt):
            t, pt = t_pt
            latents, state = carry
            lat_in = jnp.concatenate([latents, latents]) if do_cfg else latents
            # q8 (int8-QK attention) measured SLOWER than the bf16 fast
            # kernel on v5e (1.45 vs 1.55 img/s: exact-softmax VPU work +
            # int32->f32 score converts outweigh the int8 MXU gain), so the
            # quantized mode keeps bf16 attention.
            eps = unet_mod.apply(unet_params, self.cfg.unet,
                                 lat_in.astype(unet_dtype),
                                 t.astype(jnp.float32),
                                 ctx.astype(unet_dtype))
            eps = eps.astype(latents.dtype)
            if do_cfg:
                eps_u, eps_t = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_t - eps_u)
            if pass_prev:
                latents, state = self.scheduler.step(state, eps, t, latents,
                                                     ratio, prev_timestep=pt)
            else:
                latents, state = self.scheduler.step(state, eps, t, latents,
                                                     ratio)
            return (latents, state), None

        (latents, _), _ = jax.lax.scan(step, (latents, state), xs)
        return latents

    @partial(jax.jit, static_argnames=("self",))
    def decode_latents(self, latents):
        # run the VAE in its params' dtype (same rule as denoise: f32
        # latents off the scheduler must not promote the whole decoder)
        vp = self.params["vae_decoder"]
        w = jax.tree_util.tree_leaves(vp)[0].dtype
        if w in (jnp.bfloat16, jnp.float16, jnp.float32):
            latents = latents.astype(w)
        img = vae_mod.decode(vp, self.cfg.vae, latents)
        return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
