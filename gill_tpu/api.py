"""Public inference API: the GILL wrapper + load_gill.

Parity target: reference `GILL` (gill/models.py:535-807) and `load_gill`
(models.py:810-902). `generate_for_images_and_texts` keeps the exact
signature and interleaved output structure:
  [str, {'gen': [(img, score)], 'ret': [(img, 'ret', score)],
         'decision': [label, probs]}, ...]

TPU-first data flow: decoding, [IMG]-window extraction, retrieval top-k,
decision MLP, GILLMapper and the SD denoise all stay on device; only token
ids, top-k indices/scores and final images cross to host.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from gill_tpu.config import GILLConfig
from gill_tpu.models import decision as decision_mod
from gill_tpu.models import mapper as mapper_mod
from gill_tpu.models import opt as opt_mod
from gill_tpu.models.gill import GILLCore, IGNORE
from gill_tpu.utils import image as image_utils
from gill_tpu.utils.image import truncate_caption


def _run_lookup(tokens, img_runs, img0):
    """hidden_lookup for engine-served generations: the serving engines
    capture each [IMG] run's hidden states into a tap ring indexed by run
    order (serve/gill_engine.py), so the run starting at token index i is
    ring row `count of [IMG0] in tokens[:i]` (newline truncation in
    _postprocess_generation only drops a suffix, so prefix counts agree)."""
    def lookup(i, t=np.asarray(tokens), h=img_runs):
        k = int(np.sum(t[:i] == img0))
        return h[min(k, h.shape[0] - 1)][None]          # (1, nt, E)
    return lookup


class GILL:
    def __init__(self, core: GILLCore, params: dict, tokenizer,
                 sd_pipe=None, retrieval_index=None, decision_params=None,
                 num_gen_images: int = 1, auto_layout: Optional[bool] = None,
                 lm_weight_precision: str = "bf16",
                 kv_cache_precision: str = "bf16"):
        """lm_weight_precision: "bf16" (parity default) or "w8" — per-channel
        int8 LM weights with dequant fused into the matmul weight stream
        (models/opt.py quantize_params_w8; 2267 vs 1498 tok/s/chip at
        opt-2.7b batch 16). kv_cache_precision: "bf16" or "int8" — int8 KV
        cache with per-token-per-head scales (halved cache traffic and 2x
        context headroom). Both opt-in serving modes."""
        if lm_weight_precision == "w8":
            params = dict(params)
            params["lm"] = opt_mod.quantize_params_w8(params["lm"])
        elif lm_weight_precision != "bf16":
            raise ValueError(lm_weight_precision)
        assert kv_cache_precision in ("bf16", "int8"), kv_cache_precision
        self.kv_int8 = kv_cache_precision == "int8"
        self.lm_weight_precision = lm_weight_precision
        self.core = core
        self.params = params
        self.tokenizer = tokenizer
        self.sd_pipe = sd_pipe
        self.index = retrieval_index
        self.decision_params = decision_params
        self.num_gen_images = num_gen_images
        self.idx2dec = decision_mod.IDX2DEC
        # Serving default on TPU: compile decode with compiler-chosen (AUTO)
        # input layouts and keep the relaid-out weights — avoids XLA
        # materializing transposed copies of the stacked q/k/v tensors
        # (3GB for opt-6.7b; the difference between fitting one chip or not).
        if auto_layout is None:
            auto_layout = jax.default_backend() == "tpu"
        self.auto_layout = auto_layout
        self.sd_batcher = None   # see enable_sd_batching()

        self._vis_fn = jax.jit(
            lambda p, px: self.core.get_visual_embs(p, px, "captioning"))
        self._ret_vis_fn = jax.jit(
            lambda p, px: self.core.get_visual_embs(p, px, "retrieval"))
        self._ret_map_fn = jax.jit(lambda p, h: mapper_mod.apply(
            p["adapters"]["ret_fc"], self.core.ret_mapper_cfg, h, None))
        self._gen_map_fn = jax.jit(lambda p, h, e: mapper_mod.apply(
            p["adapters"]["gen_fc"], self.core.gen_mapper_cfg, h, e))

    def _generate(self, input_embs, **kw):
        out = self.core.generate(self.params, input_embs,
                                 auto_layout=self.auto_layout,
                                 kv_int8=self.kv_int8, **kw)
        if "params" in out:
            # Adopt the relaid-out weights so later calls skip the placement.
            self.params = out.pop("params")
        return out

    def __call__(self, images, tgt_tokens=None, caption_len=None,
                 generate: bool = False, num_words: int = 32,
                 temperature: float = 1.0, top_p: float = 1.0,
                 ret_scale_factor: float = 1.0, gen_scale_factor: float = 1.0,
                 min_word_tokens: int = 0, mode: str = "captioning",
                 concat_captions: bool = False, input_prefix=None):
        """Train-forward vs generate dispatch (reference GILL.__call__,
        gill/models.py:563-580). `images` is pixel values (B,H,W,3) for
        training or prompt embeddings (B,T,E) when generate=True."""
        if generate:
            return self._generate(
                images, num_words=num_words,
                temperature=temperature, top_p=top_p,
                min_word_tokens=min_word_tokens,
                ret_scale_factor=ret_scale_factor,
                gen_scale_factor=gen_scale_factor)
        prefix_ids = None
        if input_prefix:
            prefix_ids = jnp.asarray(
                self.tokenizer.encode(input_prefix, add_special_tokens=False),
                jnp.int32)
        return self.core.forward(self.params, images, tgt_tokens, caption_len,
                                 mode=mode, concat_captions=concat_captions,
                                 prefix_ids=prefix_ids)

    # -- prompt assembly -------------------------------------------------------

    def _encode_prompts(self, prompts: List, always_add_bos: bool = False,
                        add_bos: bool = True):
        """Interleaved [PIL.Image | str] -> (embs (1,T,E), ids (1,T) with
        IGNORE at image positions). BOS added once unless always_add_bos
        (reference models.py:600-626). add_bos=False: these prompts
        CONTINUE a sequence (e.g. the suffix after a registered serving
        prefix, which already holds the BOS)."""
        embs, ids = [], []
        for p in prompts:
            if isinstance(p, Image.Image):
                px = image_utils.clip_preprocess(p, self.core.cfg.image_size)
                v = self._vis_fn(self.params, jnp.asarray(px)[None])
                embs.append(v)
                ids.append(np.full((1, v.shape[1]), IGNORE, np.int32))
            elif isinstance(p, str):
                tids = self.tokenizer.encode(p, add_special_tokens=add_bos)
                if not always_add_bos:
                    add_bos = False
                tids = np.asarray([tids], np.int32)
                embs.append(self.core.embed_tokens(self.params,
                                                   jnp.asarray(tids)))
                ids.append(tids)
            else:
                raise ValueError(
                    f"Input prompts should be PIL.Image.Image or str, got "
                    f"{type(p)}")
        return (jnp.concatenate([e.astype(jnp.float32) for e in embs], axis=1),
                np.concatenate(ids, axis=1))

    # -- main API ---------------------------------------------------------------

    def generate_for_images_and_texts(
            self, prompts: List, num_words: int = 0, min_word_tokens: int = 0,
            ret_scale_factor: float = 1.0, gen_scale_factor: float = 1.0,
            top_p: float = 1.0, temperature: float = 0.0,
            max_num_rets: int = 1, generator=None,
            always_add_bos: bool = False, guidance_scale: float = 7.5,
            num_inference_steps: int = 50):
        """See reference gill/models.py:582-762 for the contract."""
        input_embs, _ = self._encode_prompts(prompts, always_add_bos)
        if num_words <= 0:
            raise NotImplementedError(
                "Generation not implemented for num_words=0.")

        # The single-tap inference contract (reference models.py:663).
        assert len(self.core.cfg.text_emb_layers) == 1, \
            self.core.cfg.text_emb_layers
        rng = generator if generator is not None else jax.random.PRNGKey(0)
        out = self._generate(
            input_embs, num_words=num_words,
            min_word_tokens=min_word_tokens, temperature=temperature,
            top_p=top_p, ret_scale_factor=ret_scale_factor,
            gen_scale_factor=gen_scale_factor, max_img_runs=max_num_rets,
            rng=rng)
        tokens = np.asarray(out["tokens"][0])
        valid = np.asarray(out["valid"][0])
        tokens = tokens[valid]
        hidden = out["hidden"][0]  # device array (S, E)
        nt = self.core.cfg.num_tokens
        return self._postprocess_generation(
            tokens, lambda i: hidden[None, i: i + nt, :], max_num_rets,
            rng, guidance_scale, num_inference_steps)

    def _postprocess_generation(self, tokens, hidden_lookup, max_num_rets,
                                rng, guidance_scale, num_inference_steps):
        """Newline truncation, [IMG]-run detection and the per-run
        retrieval / decision / SD-generation branches (reference
        models.py:635-762). tokens: 1-D np.int32 of VALID generated ids;
        hidden_lookup(i) -> (1, num_tokens, E) hidden states of the run
        starting at token index i."""
        # Truncate at the first newline (reference models.py:635-644).
        nl_id = self.tokenizer.encode("\n", add_special_tokens=False)[0]
        nl = np.nonzero(tokens == nl_id)[0]
        if len(nl) and nl[0] > 0:
            tokens = tokens[: nl[0]]

        nt = self.core.cfg.num_tokens
        img0 = self.core.img_start
        ret_starts = [int(i) for i in np.nonzero(tokens == img0)[0]
                      ][:max_num_rets]
        # Keep only complete contiguous [IMG0..n) runs (models.py:661).
        ret_starts = [
            i for i in ret_starts
            if i + nt <= len(tokens)
            and tokens[i:i + nt].tolist() == list(range(img0, img0 + nt))]

        return_outputs: List = []
        if not ret_starts:
            caption = self.tokenizer.decode(tokens, skip_special_tokens=True)
            return_outputs.append(truncate_caption(caption))
            return return_outputs

        gen_prefix = "".join(f"[IMG{i}]" for i in range(nt))
        gen_prefix_ids = np.asarray(
            [self.tokenizer.encode(gen_prefix, add_special_tokens=False)],
            np.int32)
        gen_prefix_embs = self.core.embed_tokens(self.params,
                                                 jnp.asarray(gen_prefix_ids))

        seen_image_idx: List[int] = []
        last_ret_idx = 0
        for ret_idx in ret_starts:
            raw_emb = hidden_lookup(ret_idx)                  # (1, nt, E)
            image_outputs = {"gen": [], "ret": [], "decision": None}

            ret_emb = None
            if self.index is not None:
                ret_emb = self._ret_map_fn(self.params, raw_emb)[:, 0, :]
                ret_emb = ret_emb / jnp.linalg.norm(ret_emb, axis=-1,
                                                    keepdims=True)
                scores, top_idx = self.index.topk(
                    np.asarray(ret_emb[0]), k=3, seen_idx=seen_image_idx)
                # NOTE: the reference's stop condition compares the OUTER
                # dict length (always 3) to max_num_rets (models.py:690-691),
                # effectively returning all loadable top-3 unless
                # max_num_rets==3; we use the evident intent (stop after
                # max_num_rets retrieved images).
                for s, i in zip(scores, top_idx):
                    try:
                        seen_image_idx.append(int(i))
                        img = image_utils.get_image_from_url(
                            self.index.paths[int(i)])
                        image_outputs["ret"].append((img, "ret", float(s)))
                        if len(image_outputs["ret"]) >= max_num_rets:
                            break
                    except Exception:  # bad URL/image: try the next one
                        pass
                if self.decision_params is not None:
                    label, probs = decision_mod.decide(
                        self.decision_params, raw_emb[:, 0, :])
                    image_outputs["decision"] = [label] + probs
            else:
                image_outputs["decision"] = ["gen", [0, 1]]

            # Generation embedding via GILLMapper (models.py:706-719).
            gen_emb = self._gen_map_fn(self.params, raw_emb,
                                       gen_prefix_embs.astype(raw_emb.dtype))
            nct = self.core.cfg.num_clip_tokens
            if gen_emb.shape[1] > nct:
                gen_emb = gen_emb[:, :nct]
            elif gen_emb.shape[1] < nct:
                pad = jnp.zeros((gen_emb.shape[0], nct - gen_emb.shape[1],
                                 gen_emb.shape[2]), gen_emb.dtype)
                gen_emb = jnp.concatenate([gen_emb, pad], axis=1)

            if self.sd_pipe is not None:
                gen_emb_rep = jnp.broadcast_to(
                    gen_emb, (self.num_gen_images,) + gen_emb.shape[1:])
                gen_max_bs = 8    # reference per-request cap, models.py:724
                images = []
                if self.sd_batcher is not None:
                    # cross-request batching: the shared queue coalesces
                    # concurrent callers' latents into one CFG denoise
                    futs = [self.sd_batcher.submit(
                        gen_emb_rep[i:i + gen_max_bs],
                        guidance_scale=guidance_scale,
                        num_inference_steps=num_inference_steps, rng=rng)
                        for i in range(0, self.num_gen_images, gen_max_bs)]
                    for f in futs:
                        images.extend(self._to_pil(f.result()))
                else:
                    for i in range(0, self.num_gen_images, gen_max_bs):
                        arr = self.sd_pipe(
                            prompt_embeds=gen_emb_rep[i:i + gen_max_bs],
                            guidance_scale=guidance_scale,
                            num_inference_steps=num_inference_steps,
                            rng=rng)
                        images.extend(self._to_pil(arr))
                if self.index is not None and ret_emb is not None:
                    # Re-rank generated images by CLIP-space retrieval score
                    # (models.py:739-751) — scored on device.
                    px = np.stack([image_utils.clip_preprocess(
                        im.resize((224, 224)).convert("RGB"),
                        self.core.cfg.image_size) for im in images])
                    vis = self._ret_vis_fn(self.params, jnp.asarray(px))[:, 0]
                    vis = vis / jnp.linalg.norm(vis, axis=-1, keepdims=True)
                    rank_scores = np.asarray(vis @ ret_emb[0])
                    order = np.argsort(-rank_scores)
                    if self.num_gen_images > 1:
                        image_outputs["gen"] = [
                            (images[int(j)], float(rank_scores[int(j)]))
                            for j in order]
                    else:
                        image_outputs["gen"] = [(images[0],
                                                 float(rank_scores[0]))]
                else:
                    image_outputs["gen"] = [(images[0], 0)]
            else:
                image_outputs["gen"] = [np.asarray(gen_emb)]

            caption = self.tokenizer.decode(tokens[last_ret_idx:ret_idx],
                                            skip_special_tokens=True)
            last_ret_idx = ret_idx + 1
            return_outputs.append(truncate_caption(caption) + f" {gen_prefix}")
            return_outputs.append(image_outputs)
        return return_outputs

    # -- batched serving (beyond-reference) ------------------------------------

    def generate_for_images_and_texts_batch(
            self, prompts_batch: List[List], num_words: int = 32,
            min_word_tokens: int = 0, ret_scale_factor: float = 1.0,
            gen_scale_factor: float = 1.0, top_p: float = 1.0,
            temperature: float = 0.0, max_num_rets: int = 1, generator=None,
            always_add_bos: bool = False, guidance_scale: float = 7.5,
            num_inference_steps: int = 50, slots: int = 8, chunk: int = 16,
            max_seq: Optional[int] = None):
        """Serve MANY interleaved prompts concurrently over the
        continuous-batching GILL engine (serve/gill_engine.py) — same
        per-prompt output structure as generate_for_images_and_texts,
        returned in input order. max_num_rets>1 sizes the engine's
        device-side tap ring so each of the first max_num_rets [IMG] runs
        delivers its hidden states. temperature > 0 samples with
        per-request streams derived from `generator` (request i's stream is
        independent of slot packing, so results are reproducible across
        engine configurations — unlike the sequential path's shared
        stream, so sampled outputs differ from sequential sampled runs).

        The reference serves one prompt per full decode loop
        (models.py:582-644); here mixed-length prompts share one slot pool,
        so a batch of chat turns costs max-depth, not sum-of-depths.
        """
        if num_words <= 0:
            raise NotImplementedError(
                "Generation not implemented for num_words=0.")
        assert len(self.core.cfg.text_emb_layers) == 1, \
            self.core.cfg.text_emb_layers
        from gill_tpu.serve.gill_engine import (GillDecodeEngine,
                                                GillServeRequest)

        rng = generator if generator is not None else jax.random.PRNGKey(0)
        scale = (max(ret_scale_factor, 1.0) * max(gen_scale_factor, 1.0))
        # bf16 request embeddings on TPU: the engine's refill copies them
        # straight into the device-dtype wave buffer (a float32 staging
        # buffer costs a host-side conversion per wave).
        emb_dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                  else jnp.float32)
        base_seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        reqs = []
        for uid, prompts in enumerate(prompts_batch):
            embs, _ = self._encode_prompts(prompts, always_add_bos)
            reqs.append(GillServeRequest(
                uid=uid, embs=np.asarray(jnp.asarray(embs[0], emb_dt)),
                num_words=num_words, min_word_tokens=min_word_tokens,
                img_scale=scale, temperature=temperature, top_p=top_p,
                seed=(base_seed + uid) % (2**31 - 1),
                max_img_runs=max_num_rets))

        if not reqs:
            return []
        nt = self.core.cfg.num_tokens
        if max_seq is None:
            longest = max(r.embs.shape[0] for r in reqs)
            max_seq = -(-(longest + num_words
                          + nt * max_num_rets) // 64) * 64
        sampling = temperature > 0
        # One engine per (slots, chunk, sampling): a longer batch or a
        # deeper tap ring REPLACES the engine with a larger one (freeing
        # the old KV pool) instead of pinning one multi-GB pool per
        # prompt-length bucket.
        key = (slots, chunk, sampling)
        cache = getattr(self, "_serve_engines", None)
        if cache is None:
            cache = {}
            self._serve_engines = cache
        eng = cache.get(key)
        if eng is None or eng.max_seq < max_seq or eng.max_runs < max_num_rets:
            if self.kv_int8:
                import warnings

                warnings.warn("kv_cache_precision='int8' applies to the "
                              "sequential decode path; the serving engines "
                              "use a bf16 KV pool", stacklevel=2)
            kv_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                        else jnp.float32)
            eng = GillDecodeEngine(
                self.core, self.params, slots=slots,
                max_seq=max(max_seq, eng.max_seq if eng else 0),
                chunk=chunk, kv_dtype=kv_dtype, sampling=sampling,
                max_img_runs=max(max_num_rets,
                                 eng.max_runs if eng else 1))
            cache[key] = eng
        served = eng.run(reqs)

        outputs = []
        img0 = self.core.img_start
        for uid in range(len(prompts_batch)):
            res = served[uid]
            tokens = np.asarray(res["tokens"], np.int32)
            img_runs = jnp.asarray(res["img_runs"])   # (max_runs, nt, E)
            outputs.append(self._postprocess_generation(
                tokens, _run_lookup(tokens, img_runs, img0), max_num_rets,
                rng, guidance_scale, num_inference_steps))
        return outputs

    # -- online (streaming) serving --------------------------------------------

    def enable_sd_batching(self, max_batch: int = 8, warmup: bool = False,
                           **warmup_kw):
        """Route this model's SD generations through a shared cross-request
        batch queue (serve/sd_queue.py): concurrent /v1/gill callers'
        denoises coalesce into one ≤max_batch-latent CFG batch instead of
        serializing on the device. Per-request images are unchanged (each
        request's initial latents come from its own rng)."""
        if self.sd_batcher is None:
            from gill_tpu.serve.sd_queue import SDBatchQueue

            assert self.sd_pipe is not None, "no SD pipeline attached"
            self.sd_batcher = SDBatchQueue(self.sd_pipe,
                                           max_batch=max_batch)
            if warmup:
                self.sd_batcher.warmup(**warmup_kw)
        return self.sd_batcher

    def get_online_engine(self, slots: int = 4, chunk: int = 8,
                          max_seq: int = 512, sampling: bool = False,
                          max_img_runs: int = 1):
        """Lazily build the thread-owned online GILL serving engine
        (serve/online.py GillOnlineEngine over serve/gill_engine.py).
        Serving engines use a bf16 KV pool (kv_cache_precision='int8'
        applies to the sequential decode path only)."""
        from gill_tpu.serve.gill_engine import GillDecodeEngine
        from gill_tpu.serve.online import GillOnlineEngine

        key = (slots, chunk, max_seq, sampling, max_img_runs)
        cache = getattr(self, "_online_engines", None)
        if cache is None:
            cache = {}
            self._online_engines = cache
        online = cache.get(key)
        if online is None:
            if self.kv_int8:
                import warnings

                warnings.warn("kv_cache_precision='int8' applies to the "
                              "sequential decode path; the serving engines "
                              "use a bf16 KV pool", stacklevel=2)
            kv_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                        else jnp.float32)
            eng = GillDecodeEngine(self.core, self.params, slots=slots,
                                   max_seq=max_seq, chunk=chunk,
                                   kv_dtype=kv_dtype, sampling=sampling,
                                   max_img_runs=max_img_runs)
            online = GillOnlineEngine(eng)
            cache[key] = online
        return online

    def generate_async(self, prompts: List, num_words: int = 32,
                       min_word_tokens: int = 0,
                       ret_scale_factor: float = 1.0,
                       gen_scale_factor: float = 1.0,
                       temperature: float = 0.0, top_p: float = 1.0,
                       seed: int = 0, max_num_rets: int = 1,
                       always_add_bos: bool = False, *, slots: int = 4,
                       chunk: int = 8, max_seq: int = 512,
                       prefix_id: Optional[int] = None):
        """Submit one interleaved prompt to the online serving engine;
        returns a GillRequestHandle whose .tokens stream in (valid prefix)
        and whose .result() blocks until completion. Concurrent callers
        share the slot pool (continuous batching). Finish with
        finalize_async() to get the generate_for_images_and_texts-shaped
        outputs.

        prefix_id (from register_prefix_async): prompts then carry only
        the NEW turn — the registered prefix's KV rows are reused and no
        BOS is re-added."""
        embs, _ = self._encode_prompts(prompts, always_add_bos,
                                       add_bos=prefix_id is None)
        online = self.get_online_engine(slots=slots, chunk=chunk,
                                        max_seq=max_seq,
                                        sampling=temperature > 0,
                                        max_img_runs=max_num_rets)
        emb_dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                  else jnp.float32)
        scale = max(ret_scale_factor, 1.0) * max(gen_scale_factor, 1.0)
        return online.submit(np.asarray(jnp.asarray(embs[0], emb_dt)),
                             num_words, min_word_tokens=min_word_tokens,
                             img_scale=scale, temperature=temperature,
                             top_p=top_p, seed=seed,
                             max_img_runs=max_num_rets,
                             prefix_id=prefix_id)

    def register_prefix_async(self, prompts: List, *, slots: int = 4,
                              chunk: int = 8, max_seq: int = 512,
                              sampling: bool = False,
                              max_num_rets: int = 1) -> int:
        """Register a shared conversation prefix (system prompt + history,
        interleaved text and images) with the online GILL serving engine:
        its KV rows are prefilled once, and later generate_async calls
        passing the returned prefix_id send only their new prompts.
        Prefix ids are scoped to ONE engine configuration — use the same
        slots/chunk/max_seq/sampling/max_num_rets on the follow-ups."""
        embs, _ = self._encode_prompts(prompts)
        online = self.get_online_engine(slots=slots, chunk=chunk,
                                        max_seq=max_seq, sampling=sampling,
                                        max_img_runs=max_num_rets)
        emb_dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                  else jnp.float32)
        return online.register_prefix(
            np.asarray(jnp.asarray(embs[0], emb_dt)))

    def extend_prefix_async(self, prefix_id: int, prompts: List, *,
                            slots: int = 4, chunk: int = 8,
                            max_seq: int = 512, sampling: bool = False,
                            max_num_rets: int = 1) -> int:
        """Grow a registered conversation prefix by one turn's prompts
        (e.g. the user turn + the model's generated reply as a string):
        only the NEW rows are prefilled — incremental chat never
        re-prefills its history. Returns the new prefix id (the parent
        stays registered; drop_prefix_async frees it)."""
        embs, _ = self._encode_prompts(prompts, add_bos=False)
        online = self.get_online_engine(slots=slots, chunk=chunk,
                                        max_seq=max_seq, sampling=sampling,
                                        max_img_runs=max_num_rets)
        emb_dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
                  else jnp.float32)
        return online.extend_prefix(
            prefix_id, np.asarray(jnp.asarray(embs[0], emb_dt)))

    def drop_prefix_async(self, prefix_id: int, *, slots: int = 4,
                          chunk: int = 8, max_seq: int = 512,
                          sampling: bool = False,
                          max_num_rets: int = 1) -> None:
        """Free a registered prefix's cached KV on the online engine."""
        online = self.get_online_engine(slots=slots, chunk=chunk,
                                        max_seq=max_seq, sampling=sampling,
                                        max_img_runs=max_num_rets)
        online.drop_prefix(prefix_id)

    def finalize_async(self, handle, generator=None,
                       guidance_scale: float = 7.5,
                       num_inference_steps: int = 50,
                       max_num_rets: int = 1):
        """Wait for an async request and run the retrieval / decision / SD
        post-processing — same output structure as
        generate_for_images_and_texts. max_num_rets beyond the submit-time
        tap ring depth reuses the last captured run's hiddens."""
        tokens = np.asarray(handle.result(), np.int32)
        rng = generator if generator is not None else jax.random.PRNGKey(0)
        img_runs = jnp.asarray(handle.img_runs)
        return self._postprocess_generation(
            tokens, _run_lookup(tokens, img_runs, self.core.img_start),
            max_num_rets, rng, guidance_scale, num_inference_steps)

    @staticmethod
    def _to_pil(arr) -> List[Image.Image]:
        arr = np.asarray(arr)
        return [Image.fromarray((a * 255).round().astype(np.uint8))
                for a in arr]

    def get_log_likelihood_scores(self, prompts: List) -> float:
        """-CE of the interleaved sequence, image positions label-masked
        (reference models.py:764-807)."""
        embs, ids = self._encode_prompts(prompts)
        out = opt_mod.forward(self.params["lm"], self.core.opt_cfg,
                              embs, lm_head=self.core.lm_head_table(self.params))
        loss = opt_mod.loss_fn(out["logits"], jnp.asarray(ids))
        return -float(loss)


def load_gill(model_dir: str, load_ret_embs: bool = True,
              decision_model_fn: Optional[str] = "decision_model.pth.tar",
              weights_dir: Optional[str] = None, load_sd: bool = True,
              num_gen_images: int = 1, mesh=None,
              dtype=jnp.bfloat16, lm_weight_precision: str = "bf16",
              sd_precision: str = "bf16",
              kv_cache_precision: str = "bf16") -> GILL:
    """Builds an inference GILL from a reference-format checkpoint directory
    (model_args.json + pretrained_ckpt.pth.tar + cc3m*.npy + decision model;
    reference load_gill, gill/models.py:810-902). Frozen backbone weights
    come from `weights_dir` (see weights/loader.py search rules).

    lm_weight_precision: "bf16" | "w8" — opt-in int8 LM weight serving
    (see GILL.__init__). sd_precision: "bf16" | "int8" — opt-in W8A8 SD
    UNet (models/sd/unet.py quantize_params; quality gate in ROADMAP.md
    must pass with real weights before either int8 mode is a default)."""
    from gill_tpu.models import clip as clip_mod
    from gill_tpu.models.sd import unet as unet_mod
    from gill_tpu.models.sd import vae as vae_mod
    from gill_tpu.models.sd.pipeline import (SDPipelineConfig,
                                             StableDiffusionPipeline)
    from gill_tpu.nn.core import cast_tree
    from gill_tpu.retrieval import RetrievalIndex, load_embeddings
    from gill_tpu.tokenizer import (GPT2BPETokenizer, load_tokenizer,
                                    setup_gill_tokenizer)
    from gill_tpu.utils import ckpt as ckpt_utils
    from gill_tpu.weights import loader as wloader

    cfg = GILLConfig.from_json(os.path.join(model_dir, "model_args.json"))

    try:
        tokenizer = load_tokenizer(cfg.opt_version)
    except FileNotFoundError:
        print("WARNING: tokenizer assets missing; tiny byte-level tokenizer.")
        tokenizer = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tokenizer, cfg.num_tokens)

    core = GILLCore.build(cfg, vocab_len=len(tokenizer), img_start=img_ids[0],
                          pad_token_id=tokenizer.pad_token_id,
                          bos_token_id=tokenizer.bos_token_id)

    lm = wloader.load_opt(cfg.opt_version, core.opt_cfg, len(tokenizer),
                          weights_dir)
    vision = wloader.load_clip_vision(cfg.visual_encoder, core.vis_cfg,
                                      weights_dir)

    ckpt_path = os.path.join(model_dir, "pretrained_ckpt.pth.tar")
    if os.path.exists(ckpt_path):
        adapters = jax.tree_util.tree_map(
            jnp.asarray,
            ckpt_utils.load_reference_gill_checkpoint(ckpt_path, core))
    else:
        npz = os.path.join(model_dir, "ckpt")
        if os.path.exists(os.path.join(npz, "state.npz")):
            tree, _ = ckpt_utils.load_checkpoint(npz)
            adapters = jax.tree_util.tree_map(jnp.asarray, tree["adapters"])
        else:
            print("WARNING: no trained adapters found; random init.")
            adapters = core.init_adapters(jax.random.PRNGKey(0))

    params = cast_tree({"lm": lm, "vision": vision, "adapters": adapters},
                       dtype)
    # keep adapters fp32 for numerics of the small heads
    params["adapters"] = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, adapters)

    index = None
    if load_ret_embs:
        paths, mat = load_embeddings(model_dir)
        if paths is not None:
            scale = float(np.exp(np.asarray(adapters["logit_scale"],
                                            np.float32)))
            index = RetrievalIndex(paths, mat, scale, mesh=mesh)
        else:
            print(f"cc3m*.npy not found in {model_dir}; running without "
                  f"retrieval.")

    decision_params = None
    if decision_model_fn:
        dp = os.path.join(model_dir, decision_model_fn)
        if os.path.exists(dp):
            decision_params = jax.tree_util.tree_map(
                jnp.asarray, ckpt_utils.load_reference_decision_model(dp))

    sd_pipe = None
    if load_sd:
        if os.environ.get("GILL_TPU_TINY_SD") == "1":
            # smoke-test escape hatch: a tiny random SD so eval scripts can
            # run end-to-end on CPU without the 860M-param UNet.
            from gill_tpu.models.sd.pipeline import tiny_sd_config

            sd_cfg = tiny_sd_config()
            sd_cfg.unet.cross_attention_dim = cfg.gen_emb_dim
            sd_cfg.text.max_positions = cfg.num_clip_tokens
        else:
            sd_cfg = SDPipelineConfig()
        sd_dir = None
        for root in filter(None, [weights_dir,
                                  os.environ.get("GILL_TPU_WEIGHTS_DIR")]):
            cand = os.path.join(root, "stable-diffusion-v1-5")
            if os.path.isdir(cand):
                sd_dir = cand
                break
        if sd_dir is not None:
            sd_params = wloader_sd(sd_dir, sd_cfg, dtype)
        else:
            print("WARNING: no local SD weights; random-init SD pipeline.")
            k = jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(k, 3)
            sd_params = {
                "unet": unet_mod.init(k1, sd_cfg.unet, dtype),
                "vae_decoder": vae_mod.init_decoder(k2, sd_cfg.vae, dtype),
                "text_encoder": clip_mod.init_text(k3, sd_cfg.text, dtype),
            }
        sd_tok = None
        try:
            from gill_tpu.tokenizer import CLIPBPETokenizer

            if sd_dir and os.path.exists(os.path.join(sd_dir, "tokenizer",
                                                      "vocab.json")):
                sd_tok = CLIPBPETokenizer.from_files(
                    os.path.join(sd_dir, "tokenizer", "vocab.json"),
                    os.path.join(sd_dir, "tokenizer", "merges.txt"))
        except Exception:
            pass
        # Safety checker (reference custom_sd.py:653-661) — loaded whenever
        # the diffusers layout ships a safety_checker/ directory.
        checker = None
        if sd_dir and os.path.isdir(os.path.join(sd_dir, "safety_checker")):
            try:
                from gill_tpu.models.safety import load_safety_checker

                checker = load_safety_checker(
                    os.path.join(sd_dir, "safety_checker"), dtype=dtype)
            except Exception as e:
                print(f"WARNING: safety checker failed to load ({e}); "
                      f"running without it.")
        sd_pipe = StableDiffusionPipeline(sd_cfg, sd_params, tokenizer=sd_tok,
                                          safety_checker=checker,
                                          quantize=(sd_precision == "int8"))

    return GILL(core, params, tokenizer, sd_pipe=sd_pipe,
                retrieval_index=index, decision_params=decision_params,
                num_gen_images=num_gen_images,
                lm_weight_precision=lm_weight_precision,
                kv_cache_precision=kv_cache_precision)


def wloader_sd(sd_dir: str, sd_cfg, dtype=jnp.bfloat16) -> dict:
    """Loads diffusers-layout SD weights (unet/, vae/, text_encoder/)."""
    from gill_tpu.nn.core import cast_tree
    from gill_tpu.weights.convert import (clip_text_from_torch,
                                          sd_unet_from_torch,
                                          sd_vae_decoder_from_torch)
    from gill_tpu.weights.loader import load_state_dict_dir

    unet_sd = load_state_dict_dir(os.path.join(sd_dir, "unet"))
    vae_sd = load_state_dict_dir(os.path.join(sd_dir, "vae"))
    text_sd = load_state_dict_dir(os.path.join(sd_dir, "text_encoder"))
    params = {
        "unet": sd_unet_from_torch(unet_sd, sd_cfg.unet),
        "vae_decoder": sd_vae_decoder_from_torch(vae_sd, sd_cfg.vae),
        "text_encoder": clip_text_from_torch(text_sd, sd_cfg.text),
    }
    return cast_tree(jax.tree_util.tree_map(jnp.asarray, params), dtype)
