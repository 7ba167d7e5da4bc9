"""Stable Diffusion stack tests: schedulers (analytic-trajectory exactness),
tiny UNet/VAE shapes, full pipeline denoise, custom-pipeline deltas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.models import clip as clip_mod
from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.models.sd import vae as vae_mod
from gill_tpu.models.sd.pipeline import (SDPipelineConfig,
                                         StableDiffusionPipeline,
                                         tiny_sd_config)
from gill_tpu.models.sd.scheduler import (DDIMScheduler, PNDMScheduler,
                                          SchedulerConfig)


def test_ddim_recovers_x0_on_analytic_eps():
    """With a model that returns the exact noise, DDIM must walk the
    trajectory back to x0."""
    sch = DDIMScheduler(SchedulerConfig())
    x0 = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 2), jnp.float32)
    noise = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 2), jnp.float32)
    ts, ratio = sch.timesteps(50)
    acp = sch.acp
    t0 = int(ts[0])
    sample = acp[t0] ** 0.5 * x0 + (1 - acp[t0]) ** 0.5 * noise
    state = sch.init_state(sample.shape)
    for t in np.asarray(ts):
        a_t = acp[int(t)]
        eps = (sample - a_t ** 0.5 * x0) / jnp.maximum(
            (1 - a_t) ** 0.5, 1e-8)
        sample, state = sch.step(state, eps, jnp.asarray(int(t)), sample, ratio)
    # set_alpha_to_one=False (SD convention) leaves sqrt(1-acp[0]) ~ 3% of
    # the noise in the final sample; the bound reflects that, not solver error.
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=0.1)


def test_plms_recovers_x0_on_analytic_eps():
    """On the analytic trajectory all stored eps are consistent, so the
    multistep blend stays exact and PLMS also recovers x0."""
    sch = PNDMScheduler(SchedulerConfig())
    x0 = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 2), jnp.float32)
    noise = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 2), jnp.float32)
    ts, ratio = sch.timesteps(50)
    acp = sch.acp
    assert ts.shape[0] == 51
    assert int(ts[1]) == int(ts[2])  # repeated warmup step
    t0 = int(ts[0])
    sample = acp[t0] ** 0.5 * x0 + (1 - acp[t0]) ** 0.5 * noise
    state = sch.init_state(sample.shape)
    for t in np.asarray(ts):
        a_t = acp[int(t)]
        eps = (sample - a_t ** 0.5 * x0) / jnp.maximum((1 - a_t) ** 0.5, 1e-8)
        sample, state = sch.step(state, eps, jnp.asarray(int(t)), sample, ratio)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=0.1)


def test_plms_timestep_schedule_values():
    sch = PNDMScheduler(SchedulerConfig())
    ts, ratio = sch.timesteps(50)
    ts = np.asarray(ts)
    assert ratio == 20
    assert ts[0] == 981 and ts[1] == 961 and ts[2] == 961 and ts[3] == 941
    assert ts[-1] == 1


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = tiny_sd_config()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "unet": unet_mod.init(k1, cfg.unet),
        "vae_decoder": vae_mod.init_decoder(k2, cfg.vae),
        "text_encoder": clip_mod.init_text(k3, cfg.text),
    }
    from gill_tpu.tokenizer import CLIPBPETokenizer

    tok = CLIPBPETokenizer.tiny()
    # remap ids into tiny text vocab range
    cfg.text.vocab_size = max(cfg.text.vocab_size, len(tok.encoder))
    params["text_encoder"] = clip_mod.init_text(
        k3, cfg.text)
    return StableDiffusionPipeline(cfg, params, tokenizer=tok)


def test_unet_shapes(tiny_pipe):
    cfg = tiny_pipe.cfg
    lat = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, cfg.unet.cross_attention_dim))
    out = unet_mod.apply(tiny_pipe.params["unet"], cfg.unet, lat,
                         jnp.asarray(10.0), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_decode_shapes(tiny_pipe):
    cfg = tiny_pipe.cfg
    lat = jnp.zeros((1, 8, 8, 4))
    img = vae_mod.decode(tiny_pipe.params["vae_decoder"], cfg.vae, lat)
    assert img.shape == (1, 16, 16, 3)  # one upsample in tiny cfg


def test_vae_encode_decode_roundtrip_shapes():
    cfg = tiny_sd_config()
    enc = vae_mod.init_encoder(jax.random.PRNGKey(1), cfg.vae)
    img = jnp.zeros((1, 16, 16, 3))
    lat = vae_mod.encode(enc, cfg.vae, img)
    assert lat.shape == (1, 8, 8, 4)


def test_pipeline_prompt_embeds_path(tiny_pipe):
    """GILLMapper-style conditioning: prompt_embeds bypass the text encoder
    (reference custom_sd.py:594-604)."""
    cfg = tiny_pipe.cfg
    pe = jnp.asarray(np.random.RandomState(0).randn(
        1, cfg.text.max_positions, cfg.unet.cross_attention_dim), jnp.float32)
    img = tiny_pipe(prompt_embeds=pe, height=32, width=32,
                    num_inference_steps=4, guidance_scale=7.5,
                    rng=jax.random.PRNGKey(0))
    assert img.shape == (1, 32, 32, 3)
    arr = np.asarray(img)
    assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1


def test_pipeline_return_prompts_only(tiny_pipe):
    out = tiny_pipe(prompt="a cat", return_prompts_only=True)
    assert out.shape == (1, tiny_pipe.cfg.text.max_positions,
                         tiny_pipe.cfg.text.hidden_size)


def test_pipeline_text_path_and_determinism(tiny_pipe):
    img1 = tiny_pipe(prompt="a dog", height=16, width=16,
                     num_inference_steps=3, guidance_scale=2.0,
                     rng=jax.random.PRNGKey(5))
    img2 = tiny_pipe(prompt="a dog", height=16, width=16,
                     num_inference_steps=3, guidance_scale=2.0,
                     rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_clip_tokenizer_truncate_side():
    from gill_tpu.tokenizer import CLIPBPETokenizer

    tok = CLIPBPETokenizer.tiny()
    long_text = "a " * 100
    right = tok(long_text, max_length=10, truncate_side="right")
    left = tok(long_text, max_length=10, truncate_side="left")
    assert right.input_ids.shape == left.input_ids.shape == (1, 10)
    assert right.input_ids[0, 0] == tok.bos_token_id
    assert right.input_ids[0, -1] == tok.eos_token_id


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M)
# ---------------------------------------------------------------------------

def _np_dpmpp_2m_trajectory(eps_fn, x, n_steps, acp, lower_order_final=True):
    """Independent numpy port of diffusers DPMSolverMultistepScheduler
    (algorithm_type='dpmsolver++', solver_order=2, prediction_type=
    'epsilon', lower_order_final): convert_model_output +
    multistep_dpm_solver_{first,second}_order_update."""
    T = len(acp)
    ts = np.linspace(0, T - 1, n_steps + 1).round()[::-1][:-1].astype(int)
    prev_ts = np.concatenate([ts[1:], [0]])
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha) - np.log(sigma)

    m = [None, None]  # model (x0) outputs, newest first
    h_last = None
    for i, (t, pt) in enumerate(zip(ts, prev_ts)):
        eps = eps_fn(x, t)
        x0 = (x - sigma[t] * eps) / alpha[t]
        h = lam[pt] - lam[t]
        lower = (i == 0) or (lower_order_final and i == n_steps - 1
                             and n_steps < 15)
        if lower or m[0] is None:
            d = x0
        else:
            r = h_last / h
            d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * m[0]
        x = (sigma[pt] / sigma[t]) * x - alpha[pt] * np.expm1(-h) * d
        m = [x0, m[0]]
        h_last = h
    return x


@pytest.mark.parametrize("n_steps", [8, 20])
def test_dpmpp_matches_numpy_port(n_steps):
    """Our scan-friendly DPM-Solver++ == the diffusers-structured numpy
    port on a full trajectory with a deterministic eps function."""
    from gill_tpu.models.sd.scheduler import (DPMSolverPPScheduler,
                                              SchedulerConfig)

    cfg = SchedulerConfig()
    sched = DPMSolverPPScheduler(cfg)
    acp = np.asarray(sched.acp, np.float64)
    rng = np.random.RandomState(0)
    w = rng.randn(4, 4).astype(np.float64) * 0.1

    def eps_np(x, t):
        return np.tanh(x @ w) + 1e-3 * t / 1000.0

    x0 = rng.randn(2, 4).astype(np.float64)
    ref = _np_dpmpp_2m_trajectory(eps_np, x0.copy(), n_steps, acp)

    ts, ratio = sched.timesteps(n_steps)
    prev_ts = sched.prev_timesteps(ts)
    state = sched.init_state(x0.shape, jnp.float32)
    x = jnp.asarray(x0, jnp.float32)
    for t, pt in zip(np.asarray(ts), np.asarray(prev_ts)):
        eps = jnp.asarray(eps_np(np.asarray(x, np.float64), int(t)),
                          jnp.float32)
        x, state = sched.step(state, eps, jnp.asarray(t), x, ratio,
                              prev_timestep=jnp.asarray(pt))
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-4, atol=2e-4)


def test_dpmpp_in_pipeline_tiny():
    """The dpm++ sampler runs through the full tiny pipeline."""
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod
    from gill_tpu.models.sd.pipeline import (StableDiffusionPipeline,
                                             tiny_sd_config)

    cfg = tiny_sd_config()
    k = jax.random.PRNGKey(0)
    params = {"unet": unet_mod.init(k, cfg.unet),
              "vae_decoder": vae_mod.init_decoder(k, cfg.vae)}
    pipe = StableDiffusionPipeline(cfg, params, sampler="dpm++")
    emb = jax.random.normal(k, (1, cfg.text.max_positions,
                                cfg.unet.cross_attention_dim))
    img = pipe(prompt_embeds=emb, num_inference_steps=4, guidance_scale=3.0,
               height=cfg.default_size, width=cfg.default_size)
    assert img.shape == (1, cfg.default_size, cfg.default_size, 3)
    assert bool(jnp.isfinite(img).all())


def test_dpmpp_25step_tracks_pndm_50step_trajectory():
    """Sampler-dividend gate (VERDICT r2 #2): the quality-equivalence claim
    behind the sd_dpm bench entry, measured. On a seeded tiny UNet with
    fixed latents/context, DPM-Solver++ 2M at 25 steps must land within a
    tight relative-L2 band of the 50-step PNDM reference trajectory
    (reference loop: gill/custom_sd.py:628-651), far from the divergence a
    degraded sampler shows (PNDM-12 ~0.31 relL2, measured). Caveat
    (ROADMAP.md): with random weights this pins trajectory consistency of
    the samplers on the real architecture — a human-quality CLIP-sim gate
    needs real SD weights, absent in this environment."""
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd.pipeline import (StableDiffusionPipeline,
                                             tiny_sd_config)

    cfg = tiny_sd_config()
    params = {"unet": unet_mod.init(jax.random.PRNGKey(0), cfg.unet),
              "vae_decoder": None}
    lat = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(8),
        (4, cfg.text.max_positions, cfg.unet.cross_attention_dim))

    def run(sampler, steps):
        pipe = StableDiffusionPipeline(cfg, params, sampler=sampler)
        return np.asarray(pipe.denoise(lat, ctx, steps, 7.5))

    ref = run("pndm", 50)

    def rel(a):
        return np.linalg.norm((a - ref).reshape(2, -1), axis=1) / \
            np.linalg.norm(ref.reshape(2, -1), axis=1)

    rel_dpm25 = rel(run("dpm++", 25))
    rel_pndm12 = rel(run("pndm", 12))
    assert (rel_dpm25 < 0.15).all(), rel_dpm25
    # degraded-sampler control: a too-coarse PNDM visibly diverges, and
    # DPM++ 25 must beat it by a wide margin
    assert (rel_pndm12 > 2 * rel_dpm25).all(), (rel_pndm12, rel_dpm25)
