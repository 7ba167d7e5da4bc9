"""GILL core: frozen OPT + frozen CLIP ViT glued by small trainable adapters,
with the 3-mode multi-task forward (captioning / retrieval / generation).

Parity target: reference `GILLModel` (gill/models.py:39-441). TPU-first
redesigns (all behavior-preserving):

  * The 8 trainable [IMG] token rows are a separate (num_tokens, E) parameter
    that overrides the frozen embedding table at lookup and lm-head time.
    This removes the reference's gradient-mask hack (main.py:584-593) — only
    the adapter pytree is differentiated, by construction.
  * Per-sample Python label masking (models.py:218-227, 289-297, 357-361)
    becomes vectorized cumulative masks.
  * `concat_captions` packing (models.py:230-271, 302-355) — a data-dependent
    Python rearrangement in the reference — is a static, vectorized gather
    (`pack_pairs`) compiled into the step.
  * The [IMG]-window hidden-state extraction (models.py:383-387) is a
    take_along_axis gather with static window size num_tokens.

Params layout: {"lm": opt params, "vision": clip params, "adapters": {...}}.
Only "adapters" is trainable (matches the stripped-checkpoint philosophy,
reference main.py:415-418).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gill_tpu.config import CLIPVisionConfig, GILLConfig, OPTConfig
from gill_tpu.models import clip as clip_mod
from gill_tpu.models import mapper as mapper_mod
from gill_tpu.models import opt as opt_mod
from gill_tpu.nn import core as nn

IGNORE = -100


def _relayout_tree(tree, fmts):
    """device_put a pytree into target formats one leaf at a time.

    For leaves already in the target layout device_put is a no-op (same
    buffer); for host (numpy) leaves it is a single host->device transfer
    straight into the target layout. Only genuinely relaid-out device leaves
    copy, so peak memory is params + one leaf, not 2x params — the
    difference between opt-6.7b fitting or OOMing on a 16GB chip."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    fmt_leaves = jax.tree_util.tree_flatten(fmts)[0]
    out = []
    for i, f in enumerate(fmt_leaves):
        x = leaves[i]
        leaves[i] = None  # drop our ref before the copy materializes
        out.append(jax.device_put(x, f))
    return jax.tree_util.tree_unflatten(treedef, out)


@dataclasses.dataclass
class GILLCore:
    """Static model description; all apply methods are pure functions of
    (params, inputs) and jit/pjit-compatible."""

    cfg: GILLConfig
    opt_cfg: OPTConfig
    vis_cfg: CLIPVisionConfig
    vocab_len: int               # len(tokenizer) incl. <|image|> + [IMG0..7]
    img_start: int               # id of [IMG0] (contiguous run of num_tokens)
    pad_token_id: int = 1
    bos_token_id: int = 2

    @classmethod
    def build(cls, cfg: GILLConfig, vocab_len: int, img_start: int,
              pad_token_id: int = 1, bos_token_id: int = 2) -> "GILLCore":
        return cls(cfg=cfg, opt_cfg=cfg.opt, vis_cfg=cfg.vision,
                   vocab_len=vocab_len, img_start=img_start,
                   pad_token_id=pad_token_id, bos_token_id=bos_token_id)

    # -- mapper configs ------------------------------------------------------

    @property
    def lm_dim(self) -> int:
        return self.opt_cfg.word_embed_proj_dim

    def tap_specs(self) -> Tuple[Tuple[str, int, int], ...]:
        """One (param-suffix, layer-entry, in_dim) per cfg.text_emb_layers
        entry — the reference builds one TextFcLayer per tapped LM layer
        (gill/models.py:102-121): entries -1 / num_layers tap the final
        post-norm stream (word_embed_proj_dim); other entries tap that
        layer's raw hidden state (hidden_size)."""
        n_layers = self.opt_cfg.num_layers
        specs = []
        for i, e in enumerate(self.cfg.text_emb_layers):
            if not (-n_layers - 1 <= e <= n_layers):
                raise ValueError(
                    f"text_emb_layers entry {e} out of range for a "
                    f"{n_layers}-layer LM")
            final = e == -1 or e == n_layers
            in_dim = self.lm_dim if final else self.opt_cfg.hidden_size
            specs.append(("" if i == 0 else f"_{i}", e, in_dim))
        return tuple(specs)

    def ret_mapper_cfg_for(self, in_dim: int) -> mapper_mod.MapperConfig:
        return mapper_mod.MapperConfig(
            in_dim=in_dim, out_dim=self.cfg.ret_emb_dim,
            num_input_tokens=self.cfg.num_tokens, num_output_tokens=1,
            mode=self.cfg.ret_text_fc_mode)

    def gen_mapper_cfg_for(self, in_dim: int) -> mapper_mod.MapperConfig:
        return mapper_mod.MapperConfig(
            in_dim=in_dim, out_dim=self.cfg.gen_emb_dim,
            num_input_tokens=self.cfg.num_tokens,
            num_output_tokens=self.cfg.num_clip_tokens,
            mode=self.cfg.text_fc_mode)

    @property
    def ret_mapper_cfg(self) -> mapper_mod.MapperConfig:
        return self.ret_mapper_cfg_for(self.tap_specs()[0][2])

    @property
    def gen_mapper_cfg(self) -> mapper_mod.MapperConfig:
        return self.gen_mapper_cfg_for(self.tap_specs()[0][2])

    # -- init ----------------------------------------------------------------

    def init_params(self, key, dtype=jnp.float32) -> dict:
        klm, kvis, kad = jax.random.split(key, 3)
        lm = opt_mod.init(klm, self.opt_cfg, dtype)
        lm = opt_mod.resize_embeddings(lm, self.vocab_len, key=klm)
        return {
            "lm": lm,
            "vision": clip_mod.init_vision(kvis, self.vis_cfg, dtype),
            "adapters": self.init_adapters(kad, dtype),
        }

    def init_adapters(self, key, dtype=jnp.float32) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        vh = self.vis_cfg.hidden_size
        ad = {
            "img_embeddings": jax.random.normal(
                k1, (self.cfg.num_tokens, self.lm_dim), dtype) * 0.02,
            "visual_embeddings": nn.linear_init(
                k2, vh, self.lm_dim * self.cfg.n_visual_tokens, dtype=dtype),
            "visual_fc": nn.linear_init(k3, vh, self.cfg.ret_emb_dim, dtype=dtype),
            "logit_scale": jnp.asarray(math.log(1 / 0.07), dtype),
        }
        # One (ret_fc, gen_fc) mapper pair per tapped LM layer (reference
        # gill/models.py:102-121); first pair keeps the unsuffixed names so
        # single-layer checkpoints stay loadable.
        for suffix, _, in_dim in self.tap_specs():
            k4, kr, kg = jax.random.split(k4, 3)
            ad[f"ret_fc{suffix}"] = mapper_mod.init(
                kr, self.ret_mapper_cfg_for(in_dim), dtype)
            ad[f"gen_fc{suffix}"] = mapper_mod.init(
                kg, self.gen_mapper_cfg_for(in_dim), dtype)
        return ad

    # -- embeddings ----------------------------------------------------------

    def embed_tokens(self, params, ids):
        """Token embedding with trainable [IMG] row override."""
        table = params["lm"]["embed_tokens"]["weight"]
        base = table[ids]
        rel = ids - self.img_start
        in_img = (rel >= 0) & (rel < self.cfg.num_tokens)
        img = params["adapters"]["img_embeddings"].astype(base.dtype)[
            jnp.clip(rel, 0, self.cfg.num_tokens - 1)]
        return jnp.where(in_img[..., None], img, base)

    def lm_head_table(self, params):
        """Tied lm head = frozen table with [IMG] rows swapped in."""
        table = params["lm"]["embed_tokens"]["weight"]
        return jax.lax.dynamic_update_slice(
            table, params["adapters"]["img_embeddings"].astype(table.dtype),
            (self.img_start, 0))

    def renorm_img_embeddings(self, params):
        """Rescales each [IMG] row to the mean norm of the frozen rows
        (reference main.py:602-607), as a pure O(num_tokens x E) update."""
        table = params["lm"]["embed_tokens"]["weight"]
        frozen = table[: self.vocab_len - self.cfg.num_tokens]
        target = jnp.linalg.norm(frozen.astype(jnp.float32), axis=1).mean()
        img = params["adapters"]["img_embeddings"].astype(jnp.float32)
        norms = jnp.linalg.norm(img, axis=1, keepdims=True)
        img = img * (target / jnp.maximum(norms, 1e-8))
        ad = dict(params["adapters"])
        ad["img_embeddings"] = img.astype(params["adapters"]["img_embeddings"].dtype)
        out = dict(params)
        out["adapters"] = ad
        return out

    # -- vision --------------------------------------------------------------

    def get_visual_embs(self, params, pixel_values, mode: str = "captioning"):
        """pixel_values: (B, H, W, 3) NHWC. Reference gill/models.py:129-152."""
        if mode == "generation":
            return jnp.zeros((pixel_values.shape[0], 1, 768), pixel_values.dtype)
        pooled = clip_mod.vision_forward(
            params["vision"], self.vis_cfg, pixel_values)["pooler_output"]
        if mode == "captioning":
            v = nn.linear(params["adapters"]["visual_embeddings"], pooled)
            return v.reshape(v.shape[0], self.cfg.n_visual_tokens, self.lm_dim)
        if mode == "retrieval":
            v = nn.linear(params["adapters"]["visual_fc"], pooled)
            return v.reshape(v.shape[0], 1, self.cfg.ret_emb_dim)
        raise ValueError(mode)

    # -- label masking (vectorized) -------------------------------------------

    def _is_img(self, tokens, include_first: bool):
        rel = tokens - self.img_start
        lo = 0 if include_first else 1
        return (rel >= lo) & (rel < self.cfg.num_tokens)

    def mask_labels(self, tokens, mode: str):
        """tokens (B, T) -> labels with IGNORE from the first trigger onward.

        captioning: trigger = pad or any [IMG]   (reference models.py:218-227)
        ret/gen:    trigger = pad or [IMG1..7]   (models.py:289-297, 357-361)
        """
        if mode == "captioning":
            trig = (tokens == self.pad_token_id) | self._is_img(tokens, True)
        else:
            trig = (tokens == self.pad_token_id) | self._is_img(tokens, False)
        masked = jnp.cumsum(trig.astype(jnp.int32), axis=1) > 0
        return jnp.where(masked, IGNORE, tokens)

    def first_pad_idx(self, tokens, mode: str = "retrieval"):
        """Packing split point per row (reference `pad_idx`): first pad for
        ret/gen (models.py:289-297); first pad OR any [IMG] for captioning
        (models.py:218-227, where the [IMG] run is excluded from the packed
        content). T if no trigger."""
        t = tokens.shape[1]
        trig = tokens == self.pad_token_id
        if mode == "captioning":
            trig = trig | self._is_img(tokens, True)
        any_trig = trig.any(axis=1)
        first = jnp.argmax(trig.astype(jnp.int32), axis=1)
        return jnp.where(any_trig, first, t)

    # -- static pair packing (concat_captions) --------------------------------

    def pack_pairs(self, embs, labels, valid_len, bos_pos, last_idx):
        """Packs example pairs (2i, 2i+1) into rows of length 2T-1, dropping
        the second example's BOS (reference models.py:230-271/302-355 done as
        a static vectorized gather).

        embs (B, T, D); labels (B, T); valid_len (B,) = first-pad index;
        bos_pos: static int, position of BOS in each row (n_visual_tokens for
        captioning, 0 for ret/gen); last_idx (B,) position of last [IMG].

        Returns packed (B/2, 2T-1, D), labels (B/2, 2T-1),
        last_idx_pair (B/2, 2).
        """
        b, t, d = embs.shape
        assert b % 2 == 0
        a_e, b_e = embs[0::2], embs[1::2]
        a_l, b_l = labels[0::2], labels[1::2]
        len_a = valid_len[0::2]
        # Drop second BOS: shift positions >= bos_pos left by one.
        pos = jnp.arange(t - 1)
        b_gather = jnp.where(pos >= bos_pos, pos + 1, pos)
        b_e2 = jnp.take(b_e, b_gather, axis=1)
        b_l2 = jnp.take(b_l, b_gather, axis=1)

        p = jnp.arange(2 * t - 1)[None, :]                    # (1, 2T-1)
        from_a = p < len_a[:, None]
        a_idx = jnp.clip(p, 0, t - 1)
        b_idx = jnp.clip(p - len_a[:, None], 0, t - 2)
        packed_e = jnp.where(
            from_a[..., None],
            jnp.take_along_axis(a_e, a_idx[..., None].repeat(d, -1), axis=1),
            jnp.take_along_axis(b_e2, b_idx[..., None].repeat(d, -1), axis=1))
        packed_l = jnp.where(
            from_a,
            jnp.take_along_axis(a_l, a_idx, axis=1),
            jnp.take_along_axis(b_l2, b_idx, axis=1))
        last_pair = jnp.stack(
            [last_idx[0::2], len_a + last_idx[1::2] - 1], axis=1)  # (B/2, 2)
        return packed_e, packed_l, last_pair

    # -- forward ---------------------------------------------------------------

    def forward(self, params, pixel_values, tokens, caption_len, *,
                mode: str = "captioning", concat_captions: bool = False,
                prefix_ids: Optional[jnp.ndarray] = None,
                remat: bool = False) -> Dict[str, jnp.ndarray]:
        """One mode of the multi-task step (reference GILLModel.forward,
        gill/models.py:164-441).

        pixel_values: (B, H, W, 3); tokens: (B, T) [caption + [IMG0..7] +
        pads]; caption_len: (B,) attention-mask sums; prefix_ids: static
        prompt token ids (e.g. "A picture of") or None.

        Returns dict: logits, full_labels, last_embedding, last_output_logit,
        visual_embs, visual_embs_norm, input_embs_norm, llm_hidden.
        """
        cfg = self.cfg
        b, t = tokens.shape
        visual_embs = self.get_visual_embs(params, pixel_values, mode)
        visual_norm = jnp.sqrt((visual_embs.astype(jnp.float32) ** 2)
                               .sum(-1)).mean()

        text_embs = self.embed_tokens(params, tokens)
        input_norm = jnp.sqrt((text_embs.astype(jnp.float32) ** 2).sum(-1)).mean()
        last_idx = caption_len - 1  # token before EOS pad (models.py:183)

        n_prefix = 0
        prefix_embs = None
        if prefix_ids is not None:
            prefix_embs = jnp.broadcast_to(
                self.embed_tokens(params, prefix_ids)[None],
                (b, prefix_ids.shape[0], self.lm_dim))
            n_prefix = prefix_ids.shape[0]

        if mode == "captioning":
            parts = [visual_embs.astype(text_embs.dtype)]
            if prefix_embs is not None:
                parts.append(prefix_embs)
            cond = jnp.concatenate(parts, axis=1)
            embs = jnp.concatenate([cond, text_embs], axis=1)
            cond_len = cond.shape[1]
            labels = jnp.concatenate(
                [jnp.full((b, cond_len), IGNORE, jnp.int32),
                 self.mask_labels(tokens, mode)], axis=1)
            last_idx = last_idx + cond_len
            bos_pos = cond_len
            valid_len = self.first_pad_idx(tokens, mode) + cond_len
        else:
            if prefix_embs is not None:
                embs = jnp.concatenate([prefix_embs, text_embs], axis=1)
                labels = jnp.concatenate(
                    [jnp.full((b, n_prefix), IGNORE, jnp.int32),
                     self.mask_labels(tokens, mode)], axis=1)
                last_idx = last_idx + n_prefix
            else:
                embs = text_embs
                labels = self.mask_labels(tokens, mode)
            bos_pos = n_prefix
            valid_len = self.first_pad_idx(tokens, mode) + n_prefix

        if concat_captions:
            embs, labels, last_pair = self.pack_pairs(
                embs, labels, valid_len, bos_pos, last_idx)
        else:
            last_pair = last_idx[:, None]  # (B, 1)

        specs = self.tap_specs()
        n_layers = self.opt_cfg.num_layers
        need_hidden = any(e not in (-1, n_layers) for _, e, _ in specs)
        out = opt_mod.forward(params["lm"], self.opt_cfg, embs, remat=remat,
                              lm_head=self.lm_head_table(params),
                              collect_hidden=need_hidden)
        logits, hidden = out["logits"], out["last_hidden"]

        result = {
            "logits": logits,
            "full_labels": labels,
            "visual_embs": visual_embs,
            "visual_embs_norm": visual_norm,
            "input_embs_norm": input_norm,
            "ce_loss": opt_mod.loss_fn(logits, labels),
        }

        if mode in ("retrieval", "generation"):
            nt = cfg.num_tokens
            # Gather the num_tokens-wide [IMG] window ending at each
            # last-idx (models.py:383-387) for every packed sub-example.
            win = last_pair[..., None] - (nt - 1) + jnp.arange(nt)  # (B,P,nt)
            bp = win.shape[0] * win.shape[1]
            flat = win.reshape(win.shape[0], -1)                    # (B, P*nt)
            gat = lambda x: jnp.take_along_axis(
                x, flat[..., None].repeat(x.shape[-1], -1), axis=1
            ).reshape(bp, nt, x.shape[-1])
            win_embs = gat(embs)
            # Map each tapped layer's [IMG]-window states and SUM the mapper
            # outputs (reference gill/models.py:383-387, 417-422).
            kind = "ret" if mode == "retrieval" else "gen"
            mapped = None
            for suffix, e, in_dim in specs:
                tap = hidden if e in (-1, n_layers) else out["hidden_states"][e]
                win_hidden = gat(tap)
                mcfg = (self.ret_mapper_cfg_for(in_dim) if kind == "ret"
                        else self.gen_mapper_cfg_for(in_dim))
                m = mapper_mod.apply(params["adapters"][f"{kind}_fc{suffix}"],
                                     mcfg, win_hidden, win_embs)
                mapped = m if mapped is None else mapped + m
                if suffix == "":
                    result["llm_hidden"] = win_hidden

            logit_pos = jnp.maximum(last_pair - 1, 0)
            last_logit = jnp.take_along_axis(
                logits, logit_pos[..., None].repeat(logits.shape[-1], -1),
                axis=1).reshape(bp, -1)
            result["last_output_logit"] = last_logit

            if mode == "retrieval":
                ve = visual_embs[:, 0].astype(jnp.float32)
                ve = ve / jnp.linalg.norm(ve, axis=1, keepdims=True)
                le = mapped[:, 0].astype(jnp.float32)
                le = le / jnp.linalg.norm(le, axis=1, keepdims=True)
                scale = jnp.exp(params["adapters"]["logit_scale"]).astype(jnp.float32)
                result["visual_embs"] = scale * ve   # (B, 256), pre-scaled
                result["last_embedding"] = le        # (B*P, 256) normalized
            else:
                result["last_embedding"] = mapped    # (B*P, 77, 768)
        return result

    # -- decoding ---------------------------------------------------------------

    def generate(self, params, input_embs, *, num_words: int = 32,
                 min_word_tokens: int = 0, temperature: float = 0.0,
                 top_p: float = 1.0, ret_scale_factor: float = 1.0,
                 gen_scale_factor: float = 1.0, max_img_runs: int = 1,
                 rng: Optional[jax.Array] = None,
                 max_cache_len: Optional[int] = None,
                 auto_layout: bool = False,
                 unroll_layers: Optional[bool] = None,
                 kv_int8: bool = False):
        """jit-cached wrapper over _generate_impl (one compile per static
        decode configuration; prompt length buckets to reduce recompiles).

        auto_layout=True compiles with compiler-chosen input layouts and
        returns the params placed in that layout as out["params"] — callers
        keep them for subsequent calls. Avoids XLA materializing transposed
        copies of the stacked q/k/v weights (3GB for opt-6.7b single-chip;
        see bench.py).
        """
        if unroll_layers is None:
            # Unrolled decode layers measured 1498 vs 1022 tok/s/chip at
            # opt-2.7b batch 16 (scan-over-layers leaves the chip idle
            # between the per-layer weight-slice DMAs); costs compile time
            # linear in num_layers, amortized by the program cache below.
            unroll_layers = jax.default_backend() == "tpu"
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        b, t_in, e = input_embs.shape
        # Prompt-length bucketing: pad the prompt on the RIGHT to a multiple
        # of 64 and pass the real length as a DYNAMIC scalar. Real tokens
        # keep exact positions 0..t_in-1; pad positions write garbage cache
        # slots at [t_in, t_pad) which decode steps progressively overwrite
        # (the first decode token is written at cache_pos = t_in) and the
        # causal kv_offset mask never reads. One compiled program therefore
        # serves every prompt length in the bucket — a chat session growing
        # by a few tokens per turn compiles nothing after the first turn.
        bucket = 64
        t_pad = -(-t_in // bucket) * bucket
        if t_pad != t_in:
            input_embs = jnp.pad(input_embs,
                                 ((0, 0), (0, t_pad - t_in), (0, 0)))
        input_len = jnp.asarray(t_in, jnp.int32)
        if max_cache_len is None:
            steps = num_words + (self.cfg.num_tokens - 1) * max_img_runs
            max_cache_len = -(-(t_pad + steps) // 64) * 64
        max_cache_len = max(max_cache_len, t_pad)
        statics = (num_words, min_word_tokens, float(temperature),
                   float(top_p), float(ret_scale_factor),
                   float(gen_scale_factor), max_img_runs, max_cache_len,
                   b, t_pad, e, auto_layout, unroll_layers, kv_int8)
        cache = getattr(self, "_gen_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_gen_cache", cache)
        entry = cache.get(statics)
        if entry is None:
            def impl(params, input_embs, input_len, rng):
                return self._generate_impl(
                    params, input_embs, input_len, num_words=num_words,
                    min_word_tokens=min_word_tokens, temperature=temperature,
                    top_p=top_p, ret_scale_factor=ret_scale_factor,
                    gen_scale_factor=gen_scale_factor,
                    max_img_runs=max_img_runs, max_cache_len=max_cache_len,
                    rng=rng, unroll_layers=unroll_layers, kv_int8=kv_int8)

            if auto_layout:
                from jax.experimental import layout as jlayout

                auto = jlayout.Format(jlayout.Layout.AUTO)
                shapes = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
                auto_tree = jax.tree_util.tree_map(lambda _: auto, shapes)
                compiled = jax.jit(
                    impl, in_shardings=(auto_tree, auto, auto, auto)).lower(
                    shapes,
                    jax.ShapeDtypeStruct(input_embs.shape, input_embs.dtype),
                    jax.ShapeDtypeStruct(input_len.shape, input_len.dtype),
                    jax.ShapeDtypeStruct(rng.shape, rng.dtype)).compile()
                fmts = compiled.input_formats[0]
                entry = (compiled, fmts)
            else:
                entry = (jax.jit(impl), None)
            cache[statics] = entry
        fn, fmts = entry
        if fmts is not None:
            # Leaf-wise relayout (no-op when already in the target layout);
            # never holds two full copies of the weights, so the peak is
            # params + one leaf rather than 2x params.
            params = _relayout_tree(params, fmts[0])
            input_embs = jax.device_put(input_embs, fmts[1])
            input_len = jax.device_put(input_len, fmts[2])
            rng = jax.device_put(rng, fmts[3])
            out = fn(params, input_embs, input_len, rng)
            out["params"] = params
            return out
        return fn(params, input_embs, input_len, rng)

    def _generate_impl(self, params, input_embs, input_len=None, *,
                       num_words: int = 32,
                       min_word_tokens: int = 0, temperature: float = 0.0,
                       top_p: float = 1.0, ret_scale_factor: float = 1.0,
                       gen_scale_factor: float = 1.0, max_img_runs: int = 1,
                       rng: Optional[jax.Array] = None,
                       max_cache_len: Optional[int] = None,
                       unroll_layers: bool = False,
                       kv_int8: bool = False):
        """KV-cached lax.scan decoding with [IMG] logic (parity target:
        reference GILLModel.generate, gill/models.py:443-532, which
        re-forwards the full prefix per token with use_cache=False).

        Semantics preserved: [IMG1..7] banned; no [IMG] before
        min_word_tokens sampling iterations; |logit|*scale boost on [IMG0]
        when scale > 1; emitting [IMG0] force-commits the remaining
        [IMG1..n) tokens (forced tokens do not consume sampling iterations,
        matching the reference where the 8-token append costs one loop
        iteration). Runs num_words + (num_tokens-1)*max_img_runs scan steps;
        positions past the last sampling iteration emit pad and are marked
        invalid.

        Returns dict: tokens (B, S) int32, hidden (B, S, E) final-layer
        hidden state of each emitted token, valid (B, S) bool.
        """
        cfg = self.cfg
        b, t_in, _ = input_embs.shape
        nt = cfg.num_tokens
        steps = num_words + (nt - 1) * max_img_runs
        max_len = max_cache_len or (t_in + steps)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if input_len is None:
            input_len = jnp.asarray(t_in, jnp.int32)

        # Which LM stream feeds the [IMG]-window hidden states downstream
        # (reference generate collects hidden_states[text_emb_layers[i]] per
        # step, gill/models.py:466-468; inference uses a single tap).
        e0 = cfg.text_emb_layers[0]
        final_tap = e0 in (-1, self.opt_cfg.num_layers)

        lm_head = self.lm_head_table(params)
        cache = opt_mod.init_cache(self.opt_cfg, b, max_len,
                                   dtype=input_embs.dtype, kv_int8=kv_int8)
        pre = opt_mod.forward(params["lm"], self.opt_cfg, input_embs,
                              cache=cache, cache_pos=0, skip_logits=True)
        # Logits at the last REAL prompt position only (input_len may be
        # smaller than the padded t_in under prompt bucketing).
        h_last = jax.lax.dynamic_slice_in_dim(
            pre["last_hidden"], input_len - 1, 1, axis=1)
        logits0 = jax.lax.dot_general(
            h_last, lm_head.astype(h_last.dtype), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0]
        cache = pre["cache"]

        img0 = self.img_start
        filter_value = -jnp.inf

        def pick(logits, iter_count, rng_step):
            """Reference logit surgery + sampling for one step."""
            v = logits.shape[-1]
            ids = jnp.arange(v)
            ban = (ids > img0) & (ids < img0 + nt)          # [IMG1..n)
            logits = jnp.where(ban[None], filter_value, logits)
            gate = iter_count < min_word_tokens
            img_col = logits[:, img0]
            # ret and gen share [IMG0]; the reference applies both boosts
            # sequentially (|x|*ret then *gen, models.py:486-489).
            scale = ((ret_scale_factor if ret_scale_factor > 1 else 1.0)
                     * (gen_scale_factor if gen_scale_factor > 1 else 1.0))
            boosted = jnp.abs(img_col) * scale if scale > 1.0 else img_col
            img_col = jnp.where(gate, filter_value, boosted)
            logits = logits.at[:, img0].set(img_col)
            from gill_tpu.ops.sampling import sample
            return sample(rng_step, logits, temperature, top_p)

        def step(carry, _):
            logits, cache, pos, iter_count, force_k, rng = carry
            rng, sub = jax.random.split(rng)
            sampled = pick(logits, iter_count, sub)          # (B,)
            forced_tok = img0 + (nt - force_k)
            token = jnp.where(force_k > 0, forced_tok, sampled)
            done = (force_k == 0) & (iter_count >= num_words)
            token = jnp.where(done, self.pad_token_id, token)
            trigger = (force_k == 0) & (token == img0) & (~done)
            new_force = jnp.where(force_k > 0, force_k - 1,
                                  jnp.where(trigger, nt - 1, 0))
            new_iter = jnp.where(force_k > 0, iter_count, iter_count + 1)

            emb = self.embed_tokens(params, token[:, None]).astype(
                input_embs.dtype)
            out = opt_mod.forward(params["lm"], self.opt_cfg, emb,
                                  cache=cache, cache_pos=pos, lm_head=lm_head,
                                  collect_hidden=not final_tap,
                                  unroll_layers=unroll_layers)
            if final_tap:
                hidden = out["last_hidden"][:, 0]
            else:
                hidden = out["hidden_states"][e0][:, 0]
            return ((out["logits"][:, -1], out["cache"], pos + 1, new_iter,
                     new_force, rng),
                    (token, hidden, ~done))

        init = (logits0, cache, input_len,
                jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32), rng)
        _, (tokens, hidden, valid) = jax.lax.scan(step, init, None, length=steps)
        return {
            "tokens": tokens.T.astype(jnp.int32),        # (B, S)
            "hidden": jnp.moveaxis(hidden, 0, 1),        # (B, S, E)
            "valid": valid.T,                            # (B, S)
        }
