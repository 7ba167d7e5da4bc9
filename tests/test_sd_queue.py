"""Cross-request SD batch queue (gill_tpu/serve/sd_queue.py): coalescing
concurrent generation jobs into one CFG denoise batch must be invisible —
each job's images identical to an unbatched pipeline call with the same
initial latents — while actually batching (the /v1/gill concurrency fix,
VERDICT r3 #6; reference per-request batching custom_sd.py:626-651)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.serve.sd_queue import SDBatchQueue


class FakePipe:
    """Records batch shapes; 'images' encode the input latents so result
    slicing is checkable. Mimics the StableDiffusionPipeline call surface
    the queue uses."""

    class _Cfg:
        default_size = 8
        vae_scale = 2

        class unet:
            cross_attention_dim = 6

    cfg = _Cfg()
    latent_channels = 4

    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def __call__(self, *, prompt_embeds, latents, guidance_scale=7.5,
                 num_inference_steps=50):
        if self.delay:
            time.sleep(self.delay)
        self.calls.append({"n": int(prompt_embeds.shape[0]),
                           "steps": num_inference_steps,
                           "guidance": guidance_scale})
        # image i = mean of latent row i, broadcast to (H, W, 3)
        m = jnp.mean(latents, axis=(1, 2, 3))
        return jnp.broadcast_to(m[:, None, None, None],
                                (latents.shape[0], 8, 8, 3))


def _embs(n=1):
    return jnp.zeros((n, 77, 6), jnp.float32)


def _lat(seed, n=1, h=4):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, h, h, 4),
                             jnp.float32)


def test_results_routed_to_the_right_job():
    pipe = FakePipe(delay=0.05)
    q = SDBatchQueue(pipe, max_batch=8)
    lats = [_lat(i) for i in range(5)]
    futs = [q.submit(_embs(), latents=la) for la in lats]
    outs = [f.result(timeout=30) for f in futs]
    q.close()
    for la, out in zip(lats, outs):
        assert out.shape == (1, 8, 8, 3)
        np.testing.assert_allclose(out[0, 0, 0, 0], float(jnp.mean(la)),
                                   rtol=1e-5)
    assert sum(c["n"] for c in pipe.calls) >= 5   # pads included
    assert q.stats["jobs"] == 5


def test_coalesces_queued_jobs_and_pads_to_bucket():
    pipe = FakePipe(delay=0.3)
    q = SDBatchQueue(pipe, max_batch=8)
    # job 0 occupies the worker; 1-3 queue up during its 0.3s "denoise"
    f0 = q.submit(_embs(), latents=_lat(0))
    time.sleep(0.05)
    futs = [q.submit(_embs(), latents=_lat(i)) for i in (1, 2, 3)]
    f0.result(timeout=30)
    for f in futs:
        f.result(timeout=30)
    q.close()
    assert q.stats["jobs"] == 4
    assert q.stats["batches"] == 2, pipe.calls   # 1 + coalesced 3
    # 3 jobs pad up to the 4 bucket
    assert pipe.calls[1]["n"] == 4
    assert q.stats["padded_latents"] == 1 + 4


def test_incompatible_configs_do_not_coalesce():
    pipe = FakePipe(delay=0.3)
    q = SDBatchQueue(pipe, max_batch=8)
    f0 = q.submit(_embs(), latents=_lat(0), num_inference_steps=50)
    time.sleep(0.05)
    f1 = q.submit(_embs(), latents=_lat(1), num_inference_steps=50)
    f2 = q.submit(_embs(), latents=_lat(2), num_inference_steps=25)
    f3 = q.submit(_embs(), latents=_lat(3), num_inference_steps=50)
    for f in (f0, f1, f2, f3):
        f.result(timeout=30)
    q.close()
    # batch1: job0; batch2: jobs 1+3 (same key); batch3: job 2
    steps_seen = [(c["steps"], c["n"]) for c in pipe.calls]
    assert (50, 2) in steps_seen and (25, 1) in steps_seen, steps_seen
    assert q.stats["batches"] == 3


def test_multi_latent_jobs_and_cap():
    pipe = FakePipe()
    q = SDBatchQueue(pipe, max_batch=8)
    out = q.submit(_embs(3), latents=_lat(0, n=3)).result(timeout=30)
    assert out.shape == (3, 8, 8, 3)
    with pytest.raises(AssertionError):
        q.submit(_embs(9), latents=_lat(1, n=9))
    q.close()
    with pytest.raises(RuntimeError):
        q.submit(_embs(), latents=_lat(2))


def test_failed_batch_contains_error_and_keeps_serving():
    class Boom(FakePipe):
        def __call__(self, **kw):
            if len(self.calls) == 0:
                self.calls.append({})
                raise RuntimeError("denoise exploded")
            return super().__call__(**kw)

    pipe = Boom()
    q = SDBatchQueue(pipe, max_batch=8)
    f0 = q.submit(_embs(), latents=_lat(0))
    with pytest.raises(RuntimeError, match="denoise exploded"):
        f0.result(timeout=30)
    # the queue survives and serves the next job
    out = q.submit(_embs(), latents=_lat(1)).result(timeout=30)
    assert out.shape == (1, 8, 8, 3)
    q.close()


def test_batched_images_match_unbatched_pipeline():
    """Numerical invisibility on the real (tiny) pipeline: a job's images
    equal a direct pipe() call with the same latents, whatever batch it
    landed in."""
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod
    from gill_tpu.models.sd.pipeline import (StableDiffusionPipeline,
                                             tiny_sd_config)

    cfg = tiny_sd_config()
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"unet": unet_mod.init(k1, cfg.unet),
              "vae_decoder": vae_mod.init_decoder(k2, cfg.vae)}
    pipe = StableDiffusionPipeline(cfg, params)
    h = cfg.default_size // cfg.vae_scale
    rng = np.random.RandomState(0)
    nct = cfg.text.max_positions   # must match the CFG uncond embeds
    embs = [jnp.asarray(rng.randn(1, nct, cfg.unet.cross_attention_dim),
                        jnp.float32) for _ in range(3)]
    lats = [jnp.asarray(rng.randn(1, h, h, 4), jnp.float32)
            for _ in range(3)]

    direct = [np.asarray(pipe(prompt_embeds=e, latents=la,
                              num_inference_steps=3))
              for e, la in zip(embs, lats)]

    q = SDBatchQueue(pipe, max_batch=8)
    # force coalescing: slow the worker's first grab via a leading job
    futs = [q.submit(e, latents=la, num_inference_steps=3)
            for e, la in zip(embs, lats)]
    outs = [f.result(timeout=120) for f in futs]
    q.close()
    for d, o in zip(direct, outs):
        np.testing.assert_allclose(o, d, atol=2e-5, rtol=1e-5)


def test_api_postprocess_uses_batcher(monkeypatch):
    """GILL.enable_sd_batching routes _postprocess_generation's SD stage
    through the queue with unchanged outputs."""
    import test_api as ta  # reuse the module's tiny-GILL construction
    # build a minimal GILL with tiny SD via the existing fixture pieces
    from gill_tpu.api import GILL
    from gill_tpu.config import GILLConfig
    from gill_tpu.models.gill import GILLCore
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod
    from gill_tpu.models.sd.pipeline import (StableDiffusionPipeline,
                                             tiny_sd_config)
    from gill_tpu.tokenizer import GPT2BPETokenizer, setup_gill_tokenizer

    tok = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tok, ta.NUM_TOKENS)
    cfg = GILLConfig(n_visual_tokens=2, num_tokens=ta.NUM_TOKENS,
                     num_clip_tokens=16, ret_emb_dim=8, gen_emb_dim=24,
                     image_size=16)
    core = GILLCore(cfg=cfg, opt_cfg=ta.OPT_TINY, vis_cfg=ta.VIS_TINY,
                    vocab_len=len(tok), img_start=img_ids[0],
                    pad_token_id=tok.pad_token_id,
                    bos_token_id=tok.bos_token_id)
    params = core.init_params(jax.random.PRNGKey(0))
    sd_cfg = tiny_sd_config()
    sd_cfg.unet.cross_attention_dim = 24
    sd_cfg.text.max_positions = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    sd_params = {"unet": unet_mod.init(k1, sd_cfg.unet),
                 "vae_decoder": vae_mod.init_decoder(k2, sd_cfg.vae)}
    pipe = StableDiffusionPipeline(sd_cfg, sd_params, tokenizer=None)
    gill = GILL(core, params, tok, sd_pipe=pipe, retrieval_index=None,
                decision_params=None, num_gen_images=1)

    kw = dict(num_words=2, gen_scale_factor=1e6, num_inference_steps=2)
    plain = gill.generate_for_images_and_texts(["a photo of"], **kw)
    gill.enable_sd_batching()
    batched = gill.generate_for_images_and_texts(["a photo of"], **kw)
    assert gill.sd_batcher.stats["jobs"] >= 1
    gill.sd_batcher.close()
    gill.sd_batcher = None
    assert len(plain) == len(batched)
    for p, b in zip(plain, batched):
        if isinstance(p, str):
            assert p == b
        else:
            (pi, ps), (bi, bs) = p["gen"][0], b["gen"][0]
            np.testing.assert_array_equal(np.asarray(pi), np.asarray(bi))
