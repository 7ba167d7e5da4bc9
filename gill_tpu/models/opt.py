"""OPT decoder (frozen LM backbone) as a functional JAX model.

Feature-parity target: HF `OPTForCausalLM` as used by the reference
(gill/models.py:56-73) — `inputs_embeds` entry point, per-layer hidden-state
taps, tied lm_head, resizable embedding table for the 9 added tokens, and a
loss that masks -100 labels. TPU-first design choices:

  * layer weights are stacked along a leading L axis and the decoder body is
    a `lax.scan` over layers (one compilation of one layer; no 32x unrolled
    HLO),
  * decoding uses a preallocated KV cache updated with dynamic slices inside
    the scan (the reference re-forwards the whole prefix per token with
    `use_cache=False`, gill/models.py:465 — its #1 perf bug),
  * attention runs the Pallas flash kernel on TPU (ops/attention.py),
  * like the reference, no padding attention mask is applied in training
    forward passes (HF is called without attention_mask, so padding tokens
    attend normally and positions are `arange + 2`).
"""

from __future__ import annotations


from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from gill_tpu.config import OPTConfig
from gill_tpu.nn import core as nn
from gill_tpu.ops.attention import dot_product_attention


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: OPTConfig, dtype=jnp.float32):
    """Random-init parameter pytree (used for tests/benchmarks; real weights
    come from weights/convert.py). Layer leaves are allocated directly in
    stacked (L, ...) form — materializing per-layer copies first would
    transiently double memory (OOM for opt-6.7b on a 16GB chip)."""
    import math as _math

    n = cfg.num_layers
    keys = jax.random.split(key, 16)
    d, f = cfg.hidden_size, cfg.ffn_dim

    def lin(k, shape_in, shape_out):
        bound = 1.0 / _math.sqrt(shape_in)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (n, shape_in, shape_out), dtype,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (n, shape_out), dtype, -bound, bound),
        }

    def ln():
        return {"scale": jnp.ones((n, d), dtype), "bias": jnp.zeros((n, d), dtype)}

    layers = {
        "attn": {"q": lin(keys[0], d, d), "k": lin(keys[1], d, d),
                 "v": lin(keys[2], d, d), "o": lin(keys[3], d, d)},
        "attn_ln": ln(),
        "fc1": lin(keys[4], d, f),
        "fc2": lin(keys[5], f, d),
        "mlp_ln": ln(),
    }
    params = {
        "embed_tokens": nn.embedding_init(keys[6], cfg.vocab_size,
                                          cfg.word_embed_proj_dim, dtype),
        "embed_positions": nn.embedding_init(
            keys[7], cfg.max_positions + cfg.position_offset, d, dtype),
        "layers": layers,
    }
    if cfg.do_layer_norm_before:
        params["final_ln"] = nn.layer_norm_init(d, dtype)
    if cfg.word_embed_proj_dim != cfg.hidden_size:
        params["project_in"] = nn.linear_init(
            keys[8], cfg.word_embed_proj_dim, d, bias=False, dtype=dtype)
        params["project_out"] = nn.linear_init(
            keys[9], d, cfg.word_embed_proj_dim, bias=False, dtype=dtype)
    return params


def init_dummy(cfg: OPTConfig, dtype=jnp.bfloat16):
    """Zero-weight params with the right structure/shapes — for benchmarks
    where values don't matter. Avoids PRNG transients (random bits buffers
    can OOM a 16GB chip when initializing opt-6.7b)."""
    n, d, f = cfg.num_layers, cfg.hidden_size, cfg.ffn_dim

    def lin(si, so):
        return {"w": jnp.zeros((n, si, so), dtype), "b": jnp.zeros((n, so), dtype)}

    def ln():
        return {"scale": jnp.ones((n, d), dtype), "bias": jnp.zeros((n, d), dtype)}

    params = {
        "embed_tokens": {"weight": jnp.zeros(
            (cfg.vocab_size, cfg.word_embed_proj_dim), dtype)},
        "embed_positions": {"weight": jnp.zeros(
            (cfg.max_positions + cfg.position_offset, d), dtype)},
        "layers": {
            "attn": {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                     "o": lin(d, d)},
            "attn_ln": ln(), "fc1": lin(d, f), "fc2": lin(f, d), "mlp_ln": ln(),
        },
    }
    if cfg.do_layer_norm_before:
        params["final_ln"] = {"scale": jnp.ones((d,), dtype),
                              "bias": jnp.zeros((d,), dtype)}
    if cfg.word_embed_proj_dim != cfg.hidden_size:
        params["project_in"] = {"w": jnp.zeros(
            (cfg.word_embed_proj_dim, d), dtype)}
        params["project_out"] = {"w": jnp.zeros(
            (d, cfg.word_embed_proj_dim), dtype)}
    return params


def quantize_params_w8(params, kernel: bool = None):
    """W8A16 serving quantization of the decoder-layer weights: per-output-
    channel symmetric int8 with bf16-stream dequant (nn.linear "w8" leaves).
    Embeddings, norms, and project_in/out stay bf16 (lookup tables + tiny).
    Weight HBM traffic — the single-token decode bottleneck — halves.

    kernel: force the Pallas W8A16 matmul for small-M calls (ops/w8_matmul)
    instead of the XLA dequant-in-matmul form. XLA's form is faster when the
    model is small enough that its loop-hoisted bf16 weight copy fits HBM
    (<= 2.7b on a 16GB chip); at 6.7b the hoist OOMs and the opaque kernel
    is required. Default (None): kernel for hidden_size >= 4096 weights."""
    def q(leaf):
        def one(w):  # (in, out) per layer — keeps the fp32 transient small
            wf = w.astype(jnp.float32)
            amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
            return wq, scale[0]

        wq, ws = jax.lax.map(one, leaf["w"])  # stacked (L, in, out)
        out = {"w8": wq, "ws": ws}  # ws (L, out)
        if "b" in leaf:
            out["b"] = leaf["b"]
        if use_kernel:
            out["kern"] = ()  # static marker (empty pytree: no leaf)
        elif kernel is False:
            # explicit opt-OUT: forces the XLA dequant form even on the
            # stacked/unrolled path, where the Pallas kernel is otherwise
            # the default (nn.linear)
            out["xla"] = ()
        return out

    use_kernel = kernel
    if use_kernel is None:
        use_kernel = params["layers"]["attn"]["q"]["w"].shape[-1] >= 4096
    layers = params["layers"]
    new_layers = dict(layers)
    new_layers["attn"] = {k: q(v) for k, v in layers["attn"].items()}
    new_layers["fc1"] = q(layers["fc1"])
    new_layers["fc2"] = q(layers["fc2"])
    out = dict(params)
    out["layers"] = new_layers
    return out


def resize_embeddings(params, new_vocab: int, key=None, std: float = 0.02):
    """Grows the token-embedding table (reference: lm.resize_token_embeddings,
    gill/models.py:73). New rows are N(0, std)."""
    w = params["embed_tokens"]["weight"]
    old_vocab, dim = w.shape
    if new_vocab <= old_vocab:
        return params
    key = key if key is not None else jax.random.PRNGKey(0)
    new_rows = jax.random.normal(key, (new_vocab - old_vocab, dim), w.dtype) * std
    params = dict(params)
    params["embed_tokens"] = {"weight": jnp.concatenate([w, new_rows], axis=0)}
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def embed_tokens(params, ids):
    """Token ids -> input embeddings (the `input_embeddings` surface the GILL
    adapters read/write; reference gill/models.py:75)."""
    return params["embed_tokens"]["weight"][ids]


def _layer(cfg: OPTConfig, lp, h, kv_offset=None, cache_kv=None, cache_pos=None):
    """One decoder layer. Returns (h, (k, v)) where k/v are this layer's new
    key/value tensors (full seq when cache_kv is None, else updated cache).

    KV read-window bucketing note: the serving engines bound decode KV
    traffic by slicing the cache POOL once per chunk and passing the small
    window here as `cache_kv` (serve/engine.py _kv_window) — an earlier
    in-layer read slice broke XLA's in-place aliasing of the scan-carried
    cache and double-buffered the full pool (compile-time OOM at
    max_seq >= 1024)."""
    b, t, d = h.shape
    hd = cfg.head_dim
    pre_ln = cfg.do_layer_norm_before

    resid = h
    x = nn.layer_norm(lp["attn_ln"], h, cfg.layer_norm_eps) if pre_ln else h
    q = nn.linear(lp["attn"]["q"], x).reshape(b, t, cfg.num_heads, hd)
    k = nn.linear(lp["attn"]["k"], x).reshape(b, t, cfg.num_heads, hd)
    v = nn.linear(lp["attn"]["v"], x).reshape(b, t, cfg.num_heads, hd)

    if cache_kv is not None:
        ck, cv = cache_kv[0], cache_kv[1]
        kv8 = ck.dtype == jnp.int8
        if t == 1 and not isinstance(cache_pos, int):
            # Deferred-write decode: attend over the STALE cache (valid
            # keys < cache_pos) plus this token's own k/v, and return just
            # the new token — the caller writes all layers' tokens into
            # the cache with ONE small update-slice after the layer scan.
            # Threading updated caches through the scan as stacked outputs
            # made XLA materialize two full-cache copies per decode step
            # (3.3 ms/step at opt-2.7b batch 16).
            scales = (cache_kv[2], cache_kv[3]) if kv8 else None
            rck, rcv = ck, cv
            attn = dot_product_attention(q, rck, rcv, causal=True,
                                         kv_offset=cache_pos - 1,
                                         extra_kv=(k, v), kv_scales=scales)
            if kv8:
                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                new_kv = (k8, v8, ks, vs)
            else:
                new_kv = (k.astype(ck.dtype), v.astype(cv.dtype))
        else:
            if isinstance(cache_pos, int) and cache_pos == 0:
                # Prefill: attend over the just-computed prompt k/v rather
                # than the full preallocated cache — shorter KV span and a
                # static zero offset, so the Pallas flash path is eligible.
                attn = dot_product_attention(q, k, v, causal=True)
            else:
                assert not kv8, "int8 KV cache: prefill/decode paths only"
                ck2 = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype), (0, cache_pos, 0, 0))
                cv2 = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype), (0, cache_pos, 0, 0))
                attn = dot_product_attention(q, ck2, cv2, causal=True,
                                             kv_offset=cache_pos)
                ck, cv = ck2, cv2
            if kv8:
                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                new_kv = (
                    jax.lax.dynamic_update_slice(ck, k8, (0, cache_pos, 0, 0)),
                    jax.lax.dynamic_update_slice(cv, v8, (0, cache_pos, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        cache_kv[2], ks, (0, cache_pos, 0)),
                    jax.lax.dynamic_update_slice(
                        cache_kv[3], vs, (0, cache_pos, 0)),
                )
            elif isinstance(cache_pos, int) and cache_pos == 0:
                new_kv = (
                    jax.lax.dynamic_update_slice(
                        ck, k.astype(ck.dtype), (0, cache_pos, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        cv, v.astype(cv.dtype), (0, cache_pos, 0, 0)),
                )
            else:
                new_kv = (ck, cv)
    else:
        attn = dot_product_attention(q, k, v, causal=True, kv_offset=kv_offset)
        new_kv = (k, v)

    x = nn.linear(lp["attn"]["o"], attn.reshape(b, t, d))
    h = resid + x
    if not pre_ln:
        h = nn.layer_norm(lp["attn_ln"], h, cfg.layer_norm_eps)

    resid = h
    x = nn.layer_norm(lp["mlp_ln"], h, cfg.layer_norm_eps) if pre_ln else h
    x = nn.linear(lp["fc2"], jax.nn.relu(nn.linear(lp["fc1"], x)))
    h = resid + x
    if not pre_ln:
        h = nn.layer_norm(lp["mlp_ln"], h, cfg.layer_norm_eps)
    return h, new_kv


def _layer_view(layers, i: int):
    """Layer-i parameter view for the unrolled path. Quantized (w8) leaves
    keep the stacked int8 array plus `layer_idx` (dispatched to
    w8_matmul_stacked in nn.linear — no materialized per-layer slice);
    everything else is sliced as before."""
    if isinstance(layers, dict):
        if "w8" in layers:
            out = {"w8": layers["w8"], "ws": layers["ws"][i],
                   "layer_idx": i}
            if "b" in layers:
                out["b"] = layers["b"][i]
            for marker in ("kern", "xla"):   # static kernel-choice markers
                if marker in layers:
                    out[marker] = ()
            return out
        return {k: _layer_view(v, i) for k, v in layers.items()}
    if isinstance(layers, tuple) and not layers:  # "kern" static marker
        return ()
    return layers[i]


def forward(params, cfg: OPTConfig, inputs_embeds, *, positions=None,
            collect_hidden: bool = False, cache=None, cache_pos=None,
            remat: bool = False, lm_head=None, unroll_layers: bool = False,
            skip_logits: bool = False):
    """Decoder forward from input embeddings.

    Args:
      inputs_embeds: (B, T, word_embed_proj_dim).
      positions: (B, T) int positions; default arange(T) (+cache_pos if set).
      collect_hidden: also return per-layer hidden states (L+1, B, T, D)
        (index 0 = embeddings; mirrors HF output_hidden_states).
      cache: optional KV cache dict {"k","v"} with leaves (L, B, S, H, Dh);
        when given, inputs are written at cache_pos and attention spans the
        cache prefix. The serving engines pass a row-window SLICE of their
        pool here to bound decode KV traffic (serve/engine.py _kv_window).
      remat: rematerialize each layer (training memory saver).

    Returns dict with "logits" (B, T, vocab) fp32, "last_hidden" (B, T, E),
    optionally "hidden_states", and "cache" (updated) if cache was passed.
    """
    b, t, _ = inputs_embeds.shape
    h = inputs_embeds
    if "project_in" in params:
        h = nn.linear(params["project_in"], h)
    if positions is None:
        positions = jnp.arange(t)[None, :]
        if cache_pos is not None:
            # cache_pos may be per-element (B,) — the continuous-batching
            # engine decodes slots at different sequence depths.
            cp = (cache_pos[:, None] if jnp.ndim(cache_pos) == 1
                  else cache_pos)
            positions = positions + cp
    pos_emb = params["embed_positions"]["weight"][positions + cfg.position_offset]
    h = h + pos_emb.astype(h.dtype)
    h0 = h

    layer_fn = _layer
    if remat:
        layer_fn = jax.checkpoint(
            lambda lp, h, kv_offset: _layer(cfg, lp, h, kv_offset),
            static_argnums=(),
        )

    # Deferred-write decode (see _layer): layers return only the new
    # token's k/v; ONE update-slice below writes every layer's token.
    defer = (cache is not None and t == 1
             and not isinstance(cache_pos, int))

    kv8 = cache is not None and cache["k"].dtype == jnp.int8
    if cache is not None:
        ckeys = ("k", "v", "ks", "vs") if kv8 else ("k", "v")

        def assemble(news):
            """news: per-cache-key stacked layer outputs. Deferred decode:
            ONE small update-slice per cache array; otherwise the stacked
            outputs ARE the new cache."""
            if not defer:
                return dict(zip(ckeys, news))
            out = {}
            if jnp.ndim(cache_pos) == 1:
                # Per-slot positions (continuous-batching engine): one
                # scatter per cache array at (layer, slot, pos[slot]).
                bidx = jnp.arange(b)
                for key, new in zip(ckeys, news):
                    out[key] = cache[key].at[:, bidx, cache_pos].set(
                        new[:, :, 0], mode="drop")
                return out
            for key, new in zip(ckeys, news):
                idx = (0, 0, cache_pos) + (0,) * (cache[key].ndim - 3)
                out[key] = jax.lax.dynamic_update_slice(cache[key], new, idx)
            return out

        if unroll_layers:
            # Per-layer weight views: W8 leaves keep the STACKED (L, K, N)
            # int8 array + a static layer index instead of slicing — a
            # slice feeding a pallas custom-call forces XLA to materialize
            # a full per-layer weight copy every step (traced at 20.2
            # ms/token for opt-6.7b, 2.4x the weight traffic —
            # scripts/profile_opt67.py); w8_matmul_stacked indexes the
            # stack inside its BlockSpec so the int8 weights stream
            # straight from HBM.
            hs_list = []
            news = [[] for _ in ckeys]
            for i in range(cfg.num_layers):
                lp = _layer_view(params["layers"], i)
                h, nkv = _layer(cfg, lp, h,
                                cache_kv=tuple(cache[k][i] for k in ckeys),
                                cache_pos=cache_pos)
                hs_list.append(h)
                for lst, n in zip(news, nkv):
                    lst.append(n)
            hs = jnp.stack(hs_list) if collect_hidden else None
            out_cache = assemble([jnp.stack(lst) for lst in news])
        else:
            def body(h, xs):
                lp = xs[0]
                h, nkv = _layer(cfg, lp, h, cache_kv=xs[1:],
                                cache_pos=cache_pos)
                return h, (h,) + nkv

            h, ys = jax.lax.scan(
                body, h, (params["layers"],) + tuple(cache[k] for k in ckeys))
            hs = ys[0]
            out_cache = assemble(list(ys[1:]))
    else:
        def body(h, lp):
            if remat:
                h, _ = layer_fn(lp, h, None)
            else:
                h, _ = _layer(cfg, lp, h)
            return h, h

        h, hs = jax.lax.scan(body, h, params["layers"])
        out_cache = None

    if cfg.do_layer_norm_before:
        h = nn.layer_norm(params["final_ln"], h, cfg.layer_norm_eps)
    if "project_out" in params:
        h = nn.linear(params["project_out"], h)

    out = {"last_hidden": h}
    if not skip_logits:
        head = params["embed_tokens"]["weight"] if lm_head is None else lm_head
        # bf16 MXU matmul with fp32 accumulation: avoids materializing an
        # fp32 copy of the (V, E) table (825MB for opt-6.7b — an OOM on one
        # chip). skip_logits=True elides the head entirely (prefill only
        # needs logits at one position — the caller gathers h and projects).
        out["logits"] = jax.lax.dot_general(
            h, head.astype(h.dtype), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    if collect_hidden:
        # (L+1, B, T, D): index 0 = embedding stream, index i = layer i
        # output (pre-final-norm), matching HF hidden_states[:-1]; the final
        # post-norm state is "last_hidden" (== HF hidden_states[-1]).
        out["hidden_states"] = jnp.concatenate([h0[None], hs], axis=0)
    if out_cache is not None:
        out["cache"] = out_cache
    return out


def loss_fn(logits, labels, ignore_index: int = -100):
    """Shifted next-token CE with -100 masking; mean over valid targets.

    Matches HF CausalLMOutput.loss semantics used at reference main.py:508.
    """
    logits = logits[:, :-1, :]
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_cache(cfg: OPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16,
               kv_int8: bool = False):
    """Preallocated KV cache. kv_int8: int8 values with per-token-per-head
    fp32 scales ("ks"/"vs") — halves the cache HBM traffic that dominates
    long-context decode steps, with fully dynamic (per written token)
    quantization. Supported on the prefill (static cache_pos=0) and
    deferred single-token decode paths."""
    shape = (cfg.num_layers, batch, max_seq, cfg.num_heads, cfg.head_dim)
    if kv_int8:
        sshape = shape[:-1]
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "ks": jnp.zeros(sshape, jnp.float32),
                "vs": jnp.zeros(sshape, jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _quantize_kv(x):
    """(B, T, H, D) -> int8 values + per-(B,T,H) fp32 scales."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    x8 = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return x8, scale
