"""Continuous-batching serving for the FULL GILL decode (beyond-reference).

engine.py serves a plain LM; this engine serves GILLCore's decode semantics
(reference GILLModel.generate, gill/models.py:443-532) over a slot pool:

  * prompts are interleaved image+text EMBEDDING sequences (assembled by
    api.GILL._encode_prompts — reference models.py:600-626), so prefill
    plants (R, P, E) embeddings rather than token ids;
  * every decode step applies the reference's logit surgery per slot with
    per-request parameters: [IMG1..n) banned, no [IMG0] before
    min_word_tokens sampling iterations, |logit|*scale boost on [IMG0],
    and emitting [IMG0] force-commits the remaining [IMG1..n) tokens
    (models.py:476-520);
  * the hidden state of each [IMG] token (the GILLMapper/retrieval input,
    models.py:660-662) is captured device-side into a per-slot
    (max_img_runs, num_tokens, E) ring of tap buffers — a per-slot run
    counter advances on each fed [IMG0], so run k's hiddens land in ring
    row k (the api's max_num_rets>1 selection, models.py:651) — and the
    host fetches max_img_runs*num_tokens rows per finished request
    instead of streaming (steps, E) hidden blocks;
  * scheduling is the asynchronous chunk pipeline of engine.run_pipelined:
    GILL generation is closed-budget (num_words + (num_tokens-1) *
    max_img_runs scan steps, no EOS), so refills are planned entirely
    host-side and the device runs chunk-to-chunk without host syncs;
  * register_prefix() caches a shared EMBEDDING prefix's KV rows (a chat
    session's system prompt + history, images included) so follow-up
    turns prefill only their suffix rows — the plain-LM engine's prefix
    caching lifted from token ids to embedding sequences.

Greedy decode only (temperature 0 — the inference-examples/demo default).
"""
from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.engine import _bucket, _kv_window, _kv_window_merge


@dataclass
class GillServeRequest:
    uid: int
    embs: np.ndarray               # (P, E) interleaved prompt embeddings;
                                   # with prefix_id set: the SUFFIX rows only
    num_words: int
    min_word_tokens: int = 0
    img_scale: float = 1.0         # ret_scale * gen_scale boost on [IMG0]
    max_img_runs: int = 1
    temperature: float = 0.0       # 0 = greedy; needs engine sampling=True
    top_p: float = 1.0
    seed: int = 0                  # per-request sampling stream
    prefix_id: Optional[int] = None  # from GillDecodeEngine.register_prefix:
                                     # embs then carry only the rows AFTER
                                     # the cached prefix (chat sessions do
                                     # not resend history embeddings)


@dataclass
class _GSlot:
    uid: int
    budget: int                    # fed decode steps still to cover
    generated: List[int] = field(default_factory=list)
    valid: List[bool] = field(default_factory=list)
    fresh: bool = True
    planned: int = 0               # FED steps covered by dispatched chunks
    fed: int = 0                   # FED steps covered by COLLECTED blocks
    prefix_ok: bool = True         # valid prefix still unbroken (latches)
    done: bool = False


class GillDecodeEngine:
    """Slot-pooled continuous batching over a GILLCore param pytree.

    core: models.gill.GILLCore (provides cfg/opt_cfg/img_start/pad id and
    the [IMG]-merged embedding table). params: the GILL param pytree
    ({"lm", "vision", "adapters"}).
    """

    def __init__(self, core, params, *, slots: int = 8, max_seq: int = 512,
                 chunk: int = 16, prefill_buckets=(64, 128, 256),
                 unroll_layers: Optional[bool] = None,
                 kv_dtype=jnp.bfloat16, mesh=None, sampling: bool = False,
                 max_img_runs: int = 1, kv_read_buckets="auto"):
        # sampling=True compiles per-slot temperature/top-p sampling into
        # the chunk program (a (slots, V) sort per step — measurable cost;
        # greedy-only engines skip it). Keys are stateless: per-request
        # seed folded with the slot position, so a request's stream is
        # reproducible regardless of slot packing or chunking.
        self.sampling = sampling
        self.core = core
        self.cfg = core.opt_cfg
        self.nt = core.cfg.num_tokens
        # device-side tap ring depth: how many [IMG] runs per request get
        # their hidden states captured (api max_num_rets, models.py:651)
        assert max_img_runs >= 1, max_img_runs
        self.max_runs = max_img_runs
        self.img0 = core.img_start
        self.pad_id = core.pad_token_id
        e0 = core.cfg.text_emb_layers[0]
        self.final_tap = e0 in (-1, core.opt_cfg.num_layers)
        self.tap_layer = e0
        self.slots = slots
        self.max_seq = max_seq
        self.chunk = chunk
        buckets = sorted(set(b for b in prefill_buckets if b <= max_seq))
        if not buckets or buckets[-1] < max_seq:
            # every admissible prompt (plen <= max_seq) must find a bucket
            buckets.append(max_seq)
        self.buckets = tuple(buckets)
        if unroll_layers is None:
            unroll_layers = jax.default_backend() == "tpu"
        self.unroll = unroll_layers
        # KV read-window buckets (see serve/engine.py): one chunk-program
        # variant per bucket; the scheduler picks the smallest window that
        # covers every slot's position bound. Closed-budget GILL decode
        # freezes finished slots device-side (pos advances only while
        # `valid`), so the bound shrinks back when deep requests retire.
        if kv_read_buckets == "auto":
            kv_read_buckets, b = [], 256
            while b < max_seq:
                kv_read_buckets.append(b)
                b *= 2
        self.kv_buckets = tuple(sorted(
            {b for b in (kv_read_buckets or ()) if b < max_seq}
            | {max_seq}))
        # LM params with the [IMG]-adapter rows merged into the embedding
        # table, so embed_tokens AND the tied lm head see the learned rows.
        lm = dict(params["lm"])
        lm["embed_tokens"] = {"weight": core.lm_head_table(params)}
        self.params = lm
        self.emb_dim = int(lm["embed_tokens"]["weight"].shape[1])
        assert kv_dtype != jnp.int8, \
            "int8 KV needs init_cache(kv_int8=True) scale plumbing, which " \
            "the serving engine does not carry; use bf16"
        self.cache = opt_mod.init_cache(self.cfg, slots, max_seq,
                                        dtype=kv_dtype)
        self.mesh = mesh
        if mesh is not None:
            # Megatron-TP serving of the flagship decode: LM matrices shard
            # over "model", the KV pool by heads; the [IMG]-merged embed
            # table, tap buffers and scheduler state replicate. bf16 only
            # (the Pallas W8 kernel is a single-chip path).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gill_tpu.parallel.partition import param_shardings

            assert not any(
                isinstance(leaf, dict) and "w8" in leaf
                for leaf in jax.tree_util.tree_leaves(
                    self.params, is_leaf=lambda x: isinstance(x, dict))), \
                "mesh mode requires bf16 params (w8 kernel is single-chip)"
            self.params = jax.device_put(self.params,
                                         param_shardings(mesh, self.params))
            cache_sh = NamedSharding(mesh, P(None, None, None, "model",
                                             None))
            self.cache = jax.device_put(self.cache, cache_sh)
        self._dstate = None
        self._dtap = None
        self._state: List[Optional[_GSlot]] = [None] * slots
        # host-side upper bounds on each slot's device pos (see _run_chunk)
        self._shadow = np.zeros((slots,), np.int64)
        self._cap = np.zeros((slots,), np.int64)
        self._prefixes: Dict[int, dict] = {}
        self._next_prefix_id = 0
        self.stats = {"prefills": 0, "prefill_reqs": 0, "chunks": 0,
                      "decode_steps": 0, "tokens_out": 0,
                      "prefix_hits": 0, "prefix_tokens_saved": 0,
                      "kv_rows_read": 0}   # sum of per-chunk read windows

    # -- state ------------------------------------------------------------

    def _ctx(self):
        if self.mesh is None:
            import contextlib

            return contextlib.nullcontext()
        return jax.sharding.set_mesh(self.mesh)

    def _fresh_state(self):
        B = self.slots
        return ({"pos": jnp.zeros((B,), jnp.int32),
                 "tok": jnp.full((B,), self.pad_id, jnp.int32),
                 "iter": jnp.zeros((B,), jnp.int32),
                 "force": jnp.zeros((B,), jnp.int32),
                 "valid": jnp.zeros((B,), bool),
                 "nw": jnp.ones((B,), jnp.int32),
                 "mw": jnp.zeros((B,), jnp.int32),
                 "scale": jnp.ones((B,), jnp.float32),
                 "temp": jnp.zeros((B,), jnp.float32),
                 "topp": jnp.ones((B,), jnp.float32),
                 "seed": jnp.zeros((B,), jnp.int32)},
                {"tap": jnp.zeros((B, self.max_runs, self.nt, self.emb_dim),
                                  jnp.float32),
                 # fed-[IMG0] count minus 1 = the ring row the CURRENT run
                 # writes; -1 = no run started yet
                 "run": jnp.full((B,), -1, jnp.int32)})

    def _rbucket(self, n: int) -> int:
        # powers of TWO (the plain-LM engine uses powers of four): gill
        # prefill waves carry (R, P, E) embedding payloads, so request-row
        # padding costs real host->device bandwidth, not just compute
        r = 1
        while r < n:
            r = min(r * 2, self.slots)
        return r

    def warmup(self):
        """Compile every (prompt bucket, wave size) prefill variant and the
        chunk program via out-of-range scatters (state-inert, like the
        plain-LM engine's warmup)."""
        with self._ctx():
            if self._dstate is None:
                self._dstate, self._dtap = self._fresh_state()
            rbs = sorted({self._rbucket(n)
                          for n in range(1, self.slots + 1)})
            tgt = self.cache["k"].dtype
            if tgt == jnp.int8:
                tgt = jnp.bfloat16
            for pb in self.buckets:
                for nreq in rbs:
                    z = jnp.zeros((nreq, pb, self.emb_dim), tgt)
                    i32 = jnp.ones((nreq,), jnp.int32)
                    f32 = jnp.ones((nreq,), jnp.float32)
                    self.cache, self._dstate, self._dtap = self._prefill_fn(
                        self.params, self.cache, self._dstate, self._dtap,
                        z, i32, jnp.full((nreq,), self.slots, jnp.int32),
                        i32, jnp.zeros((nreq,), jnp.int32), f32,
                        jnp.zeros((nreq,), jnp.float32), f32,
                        jnp.zeros((nreq,), jnp.int32), pb, nreq)
            for kv_hi in self.kv_buckets:
                out = self._chunk_fn(self.params, self.cache, self._dstate,
                                     self._dtap, kv_hi)
                self.cache, self._dstate, self._dtap = out[0], out[1], out[2]
            jax.block_until_ready(out[3])

    # -- logit surgery (reference models.py:476-489), vectorized per slot --

    def _surgery(self, logits, iter_c, mw, scale):
        img0, nt = self.img0, self.nt
        v = logits.shape[-1]
        ids = jnp.arange(v)
        ban = (ids > img0) & (ids < img0 + nt)
        logits = jnp.where(ban[None], -jnp.inf, logits)
        gate = iter_c < mw
        img_col = logits[:, img0]
        boosted = jnp.where(scale > 1.0, jnp.abs(img_col) * scale, img_col)
        img_col = jnp.where(gate, -jnp.inf, boosted)
        return logits.at[:, img0].set(img_col)

    def _choose(self, logits, pos, temp, topp, seed):
        """Post-surgery token choice: greedy, or (sampling=True) per-slot
        temperature/top-p with a stateless per-(seed, position) key.
        (The exact top-k prefilter in sample_per_row measured a WASH here
        — lax.top_k over the 50k vocab costs as much as the sort on v5e —
        so the plain path stays the default; see ROADMAP.)"""
        if not self.sampling:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from gill_tpu.ops.sampling import sample_per_row

        keys = jax.vmap(lambda s, p: jax.random.fold_in(
            jax.random.PRNGKey(s), p))(seed, pos)
        return sample_per_row(keys, logits, temp, topp)

    def _pick(self, logits, iter_c, mw, scale, pos, temp, topp, seed):
        return self._choose(self._surgery(logits, iter_c, mw, scale),
                            pos, temp, topp, seed)

    # -- jitted programs ---------------------------------------------------

    @functools.cached_property
    def _prefill_fn(self):
        cfg, nt, img0 = self.cfg, self.nt, self.img0

        @functools.partial(jax.jit, static_argnums=(13, 14),
                           donate_argnums=(1, 2))
        def prefill(params, cache, state, tap_state, embs, true_len,
                    slot_ids, nw, mw, scale, temp, topp, seed,
                    plen, nreq):
            del plen, nreq
            small = opt_mod.init_cache(cfg, embs.shape[0], embs.shape[1],
                                       dtype=cache["k"].dtype)
            out = opt_mod.forward(params, cfg, embs, cache=small,
                                  cache_pos=0, unroll_layers=False,
                                  skip_logits=True)
            h_last = jnp.take_along_axis(
                out["last_hidden"], true_len[:, None, None] - 1,
                axis=1)[:, 0]                                  # (R, E)
            head = params["embed_tokens"]["weight"]
            logits0 = jax.lax.dot_general(
                h_last, head.astype(h_last.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            first = self._pick(logits0, jnp.zeros_like(true_len), mw, scale,
                               true_len, temp, topp, seed)
            trigger = first == img0
            force0 = jnp.where(trigger, nt - 1, 0).astype(jnp.int32)

            new_cache = {}
            for key in cache:
                rows = out["cache"][key]
                new_cache[key] = cache[key].at[
                    :, slot_ids, :rows.shape[2]].set(
                    rows.astype(cache[key].dtype), mode="drop")
            sid = slot_ids
            state = {
                "pos": state["pos"].at[sid].set(true_len, mode="drop"),
                "tok": state["tok"].at[sid].set(first, mode="drop"),
                "iter": state["iter"].at[sid].set(1, mode="drop"),
                "force": state["force"].at[sid].set(force0, mode="drop"),
                "valid": state["valid"].at[sid].set(True, mode="drop"),
                "nw": state["nw"].at[sid].set(nw, mode="drop"),
                "mw": state["mw"].at[sid].set(mw, mode="drop"),
                "scale": state["scale"].at[sid].set(scale, mode="drop"),
                "temp": state["temp"].at[sid].set(temp, mode="drop"),
                "topp": state["topp"].at[sid].set(topp, mode="drop"),
                "seed": state["seed"].at[sid].set(seed, mode="drop"),
            }
            # reset the tap ring + run counter for refilled slots
            zt = jnp.zeros((sid.shape[0],) + tap_state["tap"].shape[1:],
                           tap_state["tap"].dtype)
            tap_state = {
                "tap": tap_state["tap"].at[sid].set(zt, mode="drop"),
                "run": tap_state["run"].at[sid].set(
                    jnp.full((sid.shape[0],), -1, jnp.int32), mode="drop"),
            }
            return new_cache, state, tap_state

        return prefill

    # -- embedding-level prefix caching ------------------------------------
    # A GILL chat session's shared context (system prompt + history,
    # including image embeddings) is an EMBEDDING prefix: register it once,
    # cache its KV rows device-side, and later requests carry only the new
    # turn's suffix rows. This is the plain-LM engine's register_prefix
    # (engine.py) lifted from token ids to the embedding sequences this
    # engine prefills (beyond-reference; the reference re-runs the full
    # prompt every turn, gill/models.py:600-626).

    def register_prefix(self, embs) -> int:
        """Prefill a shared (P, E) embedding prefix ONCE and cache its KV
        rows; requests pass the returned id as GillServeRequest.prefix_id
        with embs holding only their suffix rows. Memory: L*2*H*Dh*2
        bytes/row (~0.3 MB/row at opt-2.7b bf16) per registered prefix.

        The suffix prefill runs at a STATIC offset equal to the prefix
        length, so each distinct registered length compiles one program
        variant per (suffix bucket, wave size) on first use."""
        embs = np.asarray(embs)
        if embs.ndim != 2 or embs.shape[1] != self.emb_dim:
            raise ValueError(f"prefix embs must be (P, {self.emb_dim}), "
                             f"got {embs.shape}")
        if not 1 <= embs.shape[0] < self.max_seq:
            raise ValueError(f"prefix length {embs.shape[0]} must be in "
                             f"[1, max_seq={self.max_seq})")
        tgt = self.cache["k"].dtype
        if tgt == jnp.int8:
            tgt = jnp.bfloat16
        with self._ctx():
            kv = self._prefix_kv_fn(self.params,
                                    jnp.asarray(embs, tgt)[None],
                                    plen=embs.shape[0])
            jax.block_until_ready(kv["k"])
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = {"n": int(embs.shape[0]),
                               "k": kv["k"], "v": kv["v"]}
        return pid

    def extend_prefix(self, prefix_id: int, embs) -> int:
        """Extend a registered embedding prefix by `embs` rows, prefilling
        ONLY the new rows at the parent's offset — an incremental chat
        session (turn prompt + generated reply re-embedded each round)
        never re-prefills its history. Returns a NEW prefix id for
        [parent rows | embs]; the parent stays registered (drop_prefix
        frees it).

        Compile note: extension/suffix programs are specialized on the
        prefix length (static offset), so each DISTINCT history length
        compiles once. Rolling sessions should quantize their turn sizes
        (e.g. pad turns to 16/32/64 rows) to bound the variant set."""
        parent = self._prefixes.get(prefix_id)
        if parent is None:
            raise ValueError(f"unknown prefix_id {prefix_id}")
        embs = np.asarray(embs)
        if embs.ndim != 2 or embs.shape[1] != self.emb_dim:
            raise ValueError(f"extension embs must be (P, {self.emb_dim}), "
                             f"got {embs.shape}")
        n = parent["n"]
        if not (1 <= embs.shape[0] and n + embs.shape[0] < self.max_seq):
            raise ValueError(
                f"extension length {embs.shape[0]} must be >= 1 and keep "
                f"the prefix under max_seq ({n} + {embs.shape[0]} vs "
                f"{self.max_seq})")
        tgt = self.cache["k"].dtype
        if tgt == jnp.int8:
            tgt = jnp.bfloat16
        with self._ctx():
            kv = self._prefix_extend_fn(
                self.params, parent["k"], parent["v"],
                jnp.asarray(embs, tgt)[None], pfx=n, plen=embs.shape[0])
            jax.block_until_ready(kv["k"])
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = {"n": n + int(embs.shape[0]),
                               "k": kv["k"], "v": kv["v"]}
        return pid

    def drop_prefix(self, prefix_id: int) -> None:
        """Free a registered prefix's cached KV. Later requests referencing
        the id fail admission with "unknown prefix_id"."""
        if self._prefixes.pop(prefix_id, None) is None:
            raise ValueError(f"unknown prefix_id {prefix_id}")

    @functools.cached_property
    def _prefix_extend_fn(self):
        cfg = self.cfg
        kv_dtype = self.cache["k"].dtype

        @functools.partial(jax.jit, static_argnames=("pfx", "plen"))
        def run(params, pk, pv, embs, *, pfx, plen):
            # embs (1, plen, E) exact; pk/pv (L, 1, pfx, H, Dh) the
            # parent's cached KV; returns (L, 1, pfx+plen, H, Dh).
            del plen
            small = opt_mod.init_cache(cfg, 1, pfx + embs.shape[1],
                                       dtype=kv_dtype)
            for key, rows in (("k", pk), ("v", pv)):
                small[key] = small[key].at[:, :, :pfx].set(
                    rows.astype(small[key].dtype))
            out = opt_mod.forward(params, cfg, embs, cache=small,
                                  cache_pos=pfx, unroll_layers=False,
                                  skip_logits=True)
            return {"k": out["cache"]["k"], "v": out["cache"]["v"]}

        return run

    @functools.cached_property
    def _prefix_kv_fn(self):
        cfg = self.cfg
        kv_dtype = self.cache["k"].dtype

        @functools.partial(jax.jit, static_argnames=("plen",))
        def run(params, embs, *, plen):
            # embs (1, plen, E) exact — no bucket padding: the suffix
            # prefill's kv_offset mask treats every row < offset as valid,
            # so padded zero-KV rows would be attended, not masked.
            del plen
            small = opt_mod.init_cache(cfg, 1, embs.shape[1],
                                       dtype=kv_dtype)
            out = opt_mod.forward(params, cfg, embs, cache=small,
                                  cache_pos=0, unroll_layers=False,
                                  skip_logits=True)
            return {"k": out["cache"]["k"], "v": out["cache"]["v"]}

        return run

    @functools.cached_property
    def _prefill_prefix_fn(self):
        cfg, nt, img0 = self.cfg, self.nt, self.img0

        @functools.partial(jax.jit, static_argnums=(15, 16, 17),
                           donate_argnums=(1, 2))
        def prefill(params, cache, state, tap_state, pk, pv, embs, true_len,
                    slot_ids, nw, mw, scale, temp, topp, seed,
                    pfx, plen, nreq):
            # Suffix prefill at static offset pfx: embs (R, P, E) are the
            # SUFFIX rows; pk/pv (L, 1, pfx, H, Dh) the shared prefix's
            # cached KV, broadcast across the wave. models/opt.py's
            # nonzero-int cache_pos path attends the suffix queries over
            # [prefix rows | causal suffix]; true_len counts SUFFIX rows.
            del plen, nreq
            r = embs.shape[0]
            small = opt_mod.init_cache(cfg, r, pfx + embs.shape[1],
                                       dtype=cache["k"].dtype)
            for key, rows in (("k", pk), ("v", pv)):
                small[key] = small[key].at[:, :, :pfx].set(
                    jnp.broadcast_to(
                        rows.astype(small[key].dtype),
                        (cfg.num_layers, r, pfx) + rows.shape[3:]))
            out = opt_mod.forward(params, cfg, embs, cache=small,
                                  cache_pos=pfx, unroll_layers=False,
                                  skip_logits=True)
            h_last = jnp.take_along_axis(
                out["last_hidden"], true_len[:, None, None] - 1,
                axis=1)[:, 0]                                  # (R, E)
            head = params["embed_tokens"]["weight"]
            logits0 = jax.lax.dot_general(
                h_last, head.astype(h_last.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # sampling-key counter = absolute position (pfx + true_len),
            # matching what a full-prompt prefill of the same request draws
            first = self._pick(logits0, jnp.zeros_like(true_len), mw, scale,
                               pfx + true_len, temp, topp, seed)
            trigger = first == img0
            force0 = jnp.where(trigger, nt - 1, 0).astype(jnp.int32)

            new_cache = {}
            for key in cache:
                rows = out["cache"][key]          # (L, R, pfx+P, H, Dh)
                new_cache[key] = cache[key].at[
                    :, slot_ids, :rows.shape[2]].set(
                    rows.astype(cache[key].dtype), mode="drop")
            sid = slot_ids
            state = {
                "pos": state["pos"].at[sid].set(pfx + true_len, mode="drop"),
                "tok": state["tok"].at[sid].set(first, mode="drop"),
                "iter": state["iter"].at[sid].set(1, mode="drop"),
                "force": state["force"].at[sid].set(force0, mode="drop"),
                "valid": state["valid"].at[sid].set(True, mode="drop"),
                "nw": state["nw"].at[sid].set(nw, mode="drop"),
                "mw": state["mw"].at[sid].set(mw, mode="drop"),
                "scale": state["scale"].at[sid].set(scale, mode="drop"),
                "temp": state["temp"].at[sid].set(temp, mode="drop"),
                "topp": state["topp"].at[sid].set(topp, mode="drop"),
                "seed": state["seed"].at[sid].set(seed, mode="drop"),
            }
            zt = jnp.zeros((sid.shape[0],) + tap_state["tap"].shape[1:],
                           tap_state["tap"].dtype)
            tap_state = {
                "tap": tap_state["tap"].at[sid].set(zt, mode="drop"),
                "run": tap_state["run"].at[sid].set(
                    jnp.full((sid.shape[0],), -1, jnp.int32), mode="drop"),
            }
            return new_cache, state, tap_state

        return prefill

    @functools.cached_property
    def _chunk_fn(self):
        cfg, nt, img0 = self.cfg, self.nt, self.img0
        pad_id, max_seq = self.pad_id, self.max_seq
        steps, unroll = self.chunk, self.unroll
        max_runs = self.max_runs
        final_tap, tap_layer = self.final_tap, self.tap_layer

        @functools.partial(jax.jit, static_argnums=(4,),
                           donate_argnums=(1, 2))
        def run_chunk(params, cache, state, tap_state, kv_hi):
            head = params["embed_tokens"]["weight"]
            B = state["tok"].shape[0]
            rows = jnp.arange(B)
            # KV read window: decode over a [0, kv_hi) slice of the pool,
            # carried through the scan in place of the full cache (see
            # engine._kv_window: an in-scan slice double-buffers the full
            # pool and OOMs compilation at deep max_seq).
            windowed = kv_hi < max_seq
            win = _kv_window(cache, kv_hi) if windowed else cache

            def step(carry, _):
                win, pos, tok, iter_c, force, valid, tap, run = carry
                emb = opt_mod.embed_tokens(params, tok[:, None])
                out = opt_mod.forward(params, cfg, emb, cache=win,
                                      cache_pos=pos, lm_head=head,
                                      collect_hidden=not final_tap,
                                      unroll_layers=unroll)
                if final_tap:
                    hidden = out["last_hidden"][:, 0]
                else:
                    hidden = out["hidden_states"][tap_layer][:, 0]
                # per-run [IMG] tap capture for the fed token: each fed
                # [IMG0] advances the slot's run counter, so run k's nt
                # hiddens land in ring row k (rows >= max_runs are dropped)
                idx = tok - img0
                run = run + ((idx == 0) & valid).astype(run.dtype)
                ci = jnp.clip(idx, 0, nt - 1)
                ri = jnp.clip(run, 0, max_runs - 1)
                hit = (idx >= 0) & (idx < nt) & valid & (run >= 0) \
                    & (run < max_runs)
                cur = tap[rows, ri, ci]
                tap = tap.at[rows, ri, ci].set(
                    jnp.where(hit[:, None], hidden.astype(tap.dtype), cur))

                logits = out["logits"][:, -1]
                # key counter = pos + 1: the fed token sits at `pos`, and
                # the prefill already drew with counter true_len (== the
                # first fed position) for token 0 — using pre-increment pos
                # here would reuse that key for token 1
                sampled = self._pick(logits, iter_c, carry_mw, carry_scale,
                                     pos + 1, carry_temp, carry_topp,
                                     carry_seed)
                forced_tok = (img0 + (nt - force)).astype(jnp.int32)
                nxt = jnp.where(force > 0, forced_tok, sampled)
                done = (force == 0) & (iter_c >= carry_nw)
                nxt = jnp.where(done, pad_id, nxt)
                trigger = (force == 0) & (nxt == img0) & (~done)
                new_force = jnp.where(force > 0, force - 1,
                                      jnp.where(trigger, nt - 1, 0))
                new_iter = jnp.where(force > 0, iter_c, iter_c + 1)
                new_valid = ~done
                # budget freeze: once a slot's closed budget is spent
                # (valid latched False) it stops advancing, so until refill
                # it neither inflates the KV read window nor burns cache
                # rows on pad feeds (its outputs were already discarded)
                pos = jnp.minimum(pos + valid, max_seq - 1)
                return ((out["cache"], pos, nxt, new_iter, new_force,
                         new_valid, tap, run), (nxt, new_valid))

            carry_nw = state["nw"]
            carry_mw = state["mw"]
            carry_scale = state["scale"]
            carry_temp = state["temp"]
            carry_topp = state["topp"]
            carry_seed = state["seed"]
            entry_tok, entry_valid = state["tok"], state["valid"]
            (win, pos, tok, iter_c, force, valid, tap, run), \
                (toks, valids) = jax.lax.scan(
                    step,
                    (win, state["pos"], state["tok"], state["iter"],
                     state["force"], state["valid"], tap_state["tap"],
                     tap_state["run"]),
                    None, length=steps)
            cache = _kv_window_merge(cache, win) if windowed else win
            toks = jnp.concatenate([entry_tok[None], toks], axis=0)
            valids = jnp.concatenate([entry_valid[None], valids], axis=0)
            state = {"pos": pos, "tok": tok, "iter": iter_c, "force": force,
                     "valid": valid, "nw": carry_nw, "mw": carry_mw,
                     "scale": carry_scale, "temp": carry_temp,
                     "topp": carry_topp, "seed": carry_seed}
            return cache, state, {"tap": tap, "run": run}, toks, valids

        return run_chunk

    # -- scheduler ---------------------------------------------------------

    def _validate(self, req: GillServeRequest) -> int:
        """Admission check (run BEFORE any request is scheduled, so a bad
        request cannot abort a batch mid-run). Returns the step budget."""
        plen = req.embs.shape[0]
        if req.prefix_id is not None:
            pfx = self._prefixes.get(req.prefix_id)
            if pfx is None:
                raise ValueError(f"request {req.uid}: unknown prefix_id "
                                 f"{req.prefix_id}")
            if plen < 1:
                raise ValueError(
                    f"request {req.uid}: prefixed requests must carry >= 1 "
                    "suffix embedding row")
            plen += pfx["n"]
        budget = req.num_words + (self.nt - 1) * req.max_img_runs
        if plen + budget + 1 > self.max_seq:
            raise ValueError(
                f"request {req.uid}: {plen}+{budget}+1 exceeds max_seq "
                f"{self.max_seq}")
        if req.temperature > 0 and not self.sampling:
            raise ValueError(
                f"request {req.uid}: temperature > 0 needs an engine built "
                "with sampling=True")
        if req.max_img_runs > self.max_runs:
            raise ValueError(
                f"request {req.uid}: max_img_runs {req.max_img_runs} "
                f"exceeds the engine's tap ring depth {self.max_runs} "
                "(build the engine with max_img_runs >= the request's)")
        return budget

    def _refill(self, queue: List[GillServeRequest]):
        wave = []
        for s in range(self.slots):
            if self._state[s] is not None or not queue:
                continue
            req = queue.pop(0)
            wave.append((s, req, self._validate(req)))
        if not wave:
            return
        # One batched prefill launch per prefix group (requests without a
        # prefix share one group) — same grouping rationale as the plain-LM
        # engine: a shared prefix implies a shared workload, so mixed-prefix
        # waves are rare.
        groups: Dict[Optional[int], list] = {}
        for ent in wave:
            groups.setdefault(ent[1].prefix_id, []).append(ent)
        for pid, grp in groups.items():
            self._prefill_group(pid, grp)
        for s, req, budget in wave:
            self._state[s] = _GSlot(uid=req.uid, budget=budget)
            plen = req.embs.shape[0]
            if req.prefix_id is not None:
                plen += self._prefixes[req.prefix_id]["n"]
            # host-side pos bound for the KV read window: pos starts at the
            # prompt length and freezes (valid latch) once the closed
            # budget is spent
            self._shadow[s] = plen
            self._cap[s] = min(plen + budget + 1, self.max_seq - 1)

    def _prefill_group(self, pid: Optional[int], wave):
        pfx = None if pid is None else self._prefixes[pid]
        pb = max(_bucket(req.embs.shape[0], self.buckets)
                 for _, req, _ in wave)
        if pfx is not None and pfx["n"] + pb > self.max_seq:
            raise ValueError(
                f"prefix {pid} ({pfx['n']}) + suffix bucket {pb} exceeds "
                f"max_seq {self.max_seq}; use a smaller suffix bucket")
        nreq = self._rbucket(len(wave))
        # Build the wave buffer directly in the device dtype: a float32
        # staging buffer cost ~280 ms/wave of HOST-side bf16 conversion on
        # a thin frontend (measured, scripts/profile_gill_serve.py) — a
        # request whose embs already arrive as bfloat16 copies straight in.
        tgt = self.cache["k"].dtype
        if tgt == jnp.int8:
            tgt = jnp.bfloat16
        embs = np.zeros((nreq, pb, self.emb_dim), np.dtype(tgt))
        lens = np.ones((nreq,), np.int32)
        slot_ids = np.full((nreq,), self.slots, np.int32)
        nw = np.ones((nreq,), np.int32)
        mw = np.zeros((nreq,), np.int32)
        scale = np.ones((nreq,), np.float32)
        temp = np.zeros((nreq,), np.float32)
        topp = np.ones((nreq,), np.float32)
        seed = np.zeros((nreq,), np.int32)
        for i, (s, req, _) in enumerate(wave):
            embs[i, : req.embs.shape[0]] = req.embs
            lens[i] = req.embs.shape[0]
            slot_ids[i] = s
            nw[i] = req.num_words
            mw[i] = req.min_word_tokens
            scale[i] = req.img_scale
            temp[i] = req.temperature
            topp[i] = req.top_p
            seed[i] = req.seed
        if pfx is None:
            self.cache, self._dstate, self._dtap = self._prefill_fn(
                self.params, self.cache, self._dstate, self._dtap,
                jnp.asarray(embs),
                jnp.asarray(lens), jnp.asarray(slot_ids), jnp.asarray(nw),
                jnp.asarray(mw), jnp.asarray(scale), jnp.asarray(temp),
                jnp.asarray(topp), jnp.asarray(seed), pb, nreq)
        else:
            self.cache, self._dstate, self._dtap = self._prefill_prefix_fn(
                self.params, self.cache, self._dstate, self._dtap,
                pfx["k"], pfx["v"], jnp.asarray(embs),
                jnp.asarray(lens), jnp.asarray(slot_ids), jnp.asarray(nw),
                jnp.asarray(mw), jnp.asarray(scale), jnp.asarray(temp),
                jnp.asarray(topp), jnp.asarray(seed),
                pfx["n"], pb, nreq)
            self.stats["prefix_hits"] += len(wave)
            self.stats["prefix_tokens_saved"] += pfx["n"] * len(wave)
        self.stats["prefills"] += 1
        self.stats["prefill_reqs"] += len(wave)

    def _collect_block(self, block, results):
        toks, valids, tap, snap = block
        arr = np.asarray(toks)
        var = np.asarray(valids)
        tap_host = None
        for s, (st, was_fresh) in snap.items():
            if st.done:
                continue
            st.fed += arr.shape[0] - 1
            lo = 0 if was_fresh else 1
            for r in range(lo, arr.shape[0]):
                # exactly `budget` tokens, like GILLCore's fixed-length scan
                # (a request that keeps triggering [IMG] runs is truncated
                # mid-run there too — reference semantics)
                if len(st.generated) >= st.budget:
                    break
                st.generated.append(int(arr[r, s]))
                st.valid.append(bool(var[r, s]))
            # Finish only once this block's FED coverage reaches the
            # budget: output m's hidden tap is captured at fed step m+1
            # (the step that FEEDS the token), so a block whose rows reach
            # `budget` outputs at fed coverage budget-1 (budget == K*chunk
            # + 1) does not yet hold the LAST output's tap row — taking
            # the tap snapshot there would deliver a zero row for an [IMG]
            # run ending on the final output.
            if len(st.generated) >= st.budget and st.fed >= st.budget:
                if tap_host is None:
                    tap_host = np.asarray(tap)
                v = np.asarray(st.valid, bool)
                toks_v = np.asarray(st.generated, np.int32)
                # valid is a monotone prefix (done latches)
                n_valid = int(v.cumprod().sum())
                toks_v = toks_v[:n_valid]
                st.done = True
                results[st.uid] = {"tokens": toks_v.tolist(),
                                   # first run (legacy consumers) + the
                                   # full (max_runs, nt, E) tap ring
                                   "img_hidden": tap_host[s, 0].copy(),
                                   "img_runs": tap_host[s].copy()}
                self.stats["tokens_out"] += len(toks_v)

    def run(self, requests: List[GillServeRequest], *, depth: int = 2
            ) -> Dict[int, dict]:
        """Serve all requests (pipelined scheduler — GILL decode is
        closed-budget). Returns uid -> {"tokens": [ids] (valid prefix,
        reference-semantics), "img_hidden": (num_tokens, E) np.ndarray —
        the FIRST [IMG0..n) run's hidden states, "img_runs":
        (max_img_runs, num_tokens, E) — the full tap ring, run k in row k
        (api selects runs from tokens; rows are zero when no run was
        emitted)}."""
        # admission up front: a bad request must not abort the batch mid-run
        for req in requests:
            self._validate(req)
        queue = list(requests)
        results: Dict[int, dict] = {}
        pending = deque()
        with self._ctx():
            return self._run_inner(queue, results, pending, depth)

    def _run_chunk(self):
        """Dispatch one decode chunk at the smallest KV read window covering
        every slot's position bound (see serve/engine.py _run_chunk)."""
        if len(self.kv_buckets) > 1:
            end = np.minimum(np.minimum(self._shadow + self.chunk,
                                        self._cap), self.max_seq - 1)
            hi = int(end.max()) if end.size else self.max_seq
            kv_hi = next(b for b in self.kv_buckets if b >= hi)
            self._shadow = end
        else:
            kv_hi = self.max_seq
        out = self._chunk_fn(self.params, self.cache, self._dstate,
                             self._dtap, kv_hi)
        self.cache, self._dstate, self._dtap = out[0], out[1], out[2]
        self.stats["chunks"] += 1
        self.stats["decode_steps"] += self.chunk
        self.stats["kv_rows_read"] += kv_hi
        return out[3], out[4]

    def _reset_pool(self):
        self._dstate, self._dtap = self._fresh_state()
        self._state = [None] * self.slots
        self._shadow = np.zeros((self.slots,), np.int64)
        self._cap = np.zeros((self.slots,), np.int64)

    def _run_inner(self, queue, results, pending, depth):
        self._reset_pool()
        while True:
            for s in range(self.slots):
                st = self._state[s]
                if st is not None and st.planned >= st.budget:
                    self._state[s] = None
                    self._shadow[s] = 0      # retired slots stop bounding
                    self._cap[s] = 0         # the KV read window
            self._refill(queue)
            active = [s for s in range(self.slots)
                      if self._state[s] is not None]
            if not active and not pending:
                break
            if active:
                toks, valids = self._run_chunk()
                snap = {}
                for s in active:
                    st = self._state[s]
                    snap[s] = (st, st.fresh)
                    st.planned += self.chunk   # fed steps (no entry bonus)
                    st.fresh = False
                pending.append((toks, valids, self._dtap["tap"], snap))
            while len(pending) > depth or (not active and pending):
                self._collect_block(pending.popleft(), results)
        # (the loop can only break once pending is empty — the in-loop
        # collector is the single drain point)
        return results
