"""Continuous-batching LM serving engine (beyond-reference feature).

The reference serves one request at a time through a full-reforward decode
loop (/root/reference/gill/models.py:443-532). This engine keeps a fixed
pool of batch SLOTS over one preallocated KV cache; each slot runs its own
request at its own sequence depth, and finished slots are refilled from the
queue without draining the batch. With mixed request lengths that removes
the pad-to-longest tax of wave scheduling (every wave costs max(len) steps
for all slots).

TPU-first design:
  * All shapes static: prompts pad to a bucket, decode runs in fixed-size
    CHUNKS of steps under one jitted lax.scan; the host scheduler only
    intervenes between chunks (the device never waits on per-token host
    logic — important over a high-latency link).
  * Per-slot sequence depths ride the deferred-write decode path
    (models/opt.py forward): cache_pos is a (B,) vector, attention masks
    per slot (ops/attention.py _decode_attention), and the post-scan KV
    write is one scatter at (layer, slot, pos[slot]) — measured within 1%
    of the uniform-position dynamic_update_slice (scripts/
    serve_scatter_probe.py: 11.63 vs 11.51 ms/step at 2.7b W8, 16x512).
  * Decode state (pos/tok/active) is DEVICE-RESIDENT and donated through
    every program: the host pushes nothing between chunks and reads back
    only the generated tokens (one transfer per chunk) — three extra
    host->device pushes per chunk measured ~27 ms each over this link.
  * Prefill reuses the static-offset flash-attention prefill (cache_pos=0)
    BATCHED over every refill of one scheduler visit (prompts pad to the
    wave's largest bucket, request count to a power of two), plants the
    prompts' k/v rows into the engine cache with one scatter, and sets the
    slots' decode state on device. One launch per wave means the relay
    dispatch and the full LM weight stream are paid per WAVE, not per
    request; slot-id padding rows scatter out of range and drop.
  * The big cache is donated through every program, so slots update
    in place — no per-chunk cache copies.

A host-finished slot (max_new reached) keeps decoding garbage until it is
refilled — every chunk step computes all slots anyway (the step cost is
cache-bandwidth-bound, not per-active-slot), so freezing it early would
save nothing, and its outputs are simply discarded. Device-side EOS does
freeze the slot so positions stop advancing (outputs after EOS are pads).

Prefix caching: register_prefix() prefills a shared prompt prefix once and
caches its KV rows; requests carrying the returned prefix_id prefill only
their suffix at a static offset (the nonzero-int cache_pos path in
models/opt.py forward). Chat workloads with a common system/context prompt
pay the shared tokens' prefill compute and weight stream exactly once.

Greedy decode only (the serving default here and in the reference demo);
EOS and per-request max_new_tokens both end a request.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod


@dataclass
class ServeRequest:
    uid: int
    prompt: List[int]              # token ids, already tokenized (FULL
                                   # prompt, including any shared prefix)
    max_new_tokens: int
    prefix_id: Optional[int] = None  # from DecodeEngine.register_prefix:
                                     # prompt must start with that prefix's
                                     # tokens; prefill then computes only
                                     # the suffix


@dataclass
class _SlotState:
    uid: int
    pos: int                       # next cache row to write
    generated: List[int] = field(default_factory=list)
    max_new: int = 0
    fresh: bool = True             # first token still on device (chunk row 0)
    planned: int = 0               # tokens covered by DISPATCHED chunks
                                   # (pipelined scheduler only)
    done: bool = False             # result delivered (pipelined scheduler)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


def _kv_window(cache, kv_hi: int):
    """Rows [0, kv_hi) of every KV-cache leaf (seq axis 2). The chunk
    programs slice ONCE at entry and carry the small window through their
    decode scan: slicing per-layer inside the scan body defeats XLA's
    in-place aliasing of the cache carry, double-buffering the FULL pool —
    a measured compile-time OOM (19.75 GB planned vs 15.75 GB HBM) at
    max_seq >= 1024 on opt-2.7b/16 slots. The entry slice costs one
    window-sized copy per chunk, amortized over `chunk` decode steps that
    each SAVE (max_seq - kv_hi) cache rows of read traffic per slot."""
    return {k: jax.lax.slice_in_dim(v, 0, kv_hi, axis=2)
            for k, v in cache.items()}


def _kv_window_merge(cache, win):
    """Write a chunk-updated window back over the pool's rows [0, kv_hi).
    One contiguous update-slice per cache leaf: the pool enters donated,
    so XLA updates it in place."""
    return {k: jax.lax.dynamic_update_slice_in_dim(cache[k], win[k], 0,
                                                   axis=2)
            for k in cache}


class DecodeEngine:
    """Slot-based continuous batching over one OPT param pytree.

    params/cfg: as produced by models/opt.py (optionally quantize_params_w8
    for W8A16 serving). slots: batch width of the decode program. max_seq:
    KV rows per slot (prompt + generation must fit). chunk: decode steps
    per host round-trip.
    """

    def __init__(self, params, cfg: OPTConfig, *, slots: int = 16,
                 max_seq: int = 512, chunk: int = 32,
                 prefill_buckets=(64, 128, 256, 512),
                 eos_id: Optional[int] = None, pad_id: int = 1,
                 unroll_layers: bool = True, kv_dtype=jnp.bfloat16,
                 mesh=None, kv_read_buckets="auto"):
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_seq = max_seq
        self.chunk = chunk
        self.buckets = tuple(b for b in sorted(set(prefill_buckets))
                             if b <= max_seq)
        # KV read-window buckets: the chunk program compiles one variant per
        # bucket and the scheduler picks the smallest one covering every
        # slot's position bound, so decode KV traffic tracks the actual
        # context depth instead of the provisioned max_seq (a pool built
        # with max_seq=2048 serving ~200-token chats otherwise reads 8x the
        # cache rows it needs, every step). "auto" = a power-of-two ladder
        # from 256; None/() = the single full-read variant (old behavior).
        if kv_read_buckets == "auto":
            kv_read_buckets, b = [], 256
            while b < max_seq:
                kv_read_buckets.append(b)
                b *= 2
        self.kv_buckets = tuple(sorted(
            {b for b in (kv_read_buckets or ()) if b < max_seq}
            | {max_seq}))
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.unroll = unroll_layers
        self.mesh = mesh
        # int8 KV: per-token-per-head fp32 scales ride along as "ks"/"vs"
        # cache arrays (models/opt.py init_cache) — the capacity lever that
        # roughly halves KV bytes per slot, so a pool can hold 2x the
        # context (or slots) in the same HBM. Supported on the prefill
        # (static cache_pos=0) and deferred decode paths; prefix caching
        # and mesh sharding stay bf16-only.
        self._kv8 = kv_dtype == jnp.int8
        self.cache = opt_mod.init_cache(
            cfg, slots, max_seq,
            dtype=jnp.bfloat16 if self._kv8 else kv_dtype,
            kv_int8=self._kv8)
        # KV pool physical layout: left to XLA ("auto"). On TPU it stores
        # the pool COMPACT between dispatches (S-minor, no head_dim
        # padding) but the chunk/prefill loop bodies want the scatter-
        # preferred row-major PADDED form (head_dim 80 -> lane 128, 1.6x),
        # so every chunk round-trips the pool through compact->padded->
        # compact copies, and at deep pools the padded temps OOM
        # compilation (max_seq 2048 x 16 slots int8 needs 16.9 of
        # 15.75 GB — 8 GB of it two padded pool copies). Pinning the pool
        # row-major on the program boundaries (jax.experimental.layout
        # Format in jit in_/out_shardings) removes the copies (temps -> 0
        # on a mock chunk) but was a MEASURED serving regression — 524
        # tok/s with None (replicated) for the other operands (strips the
        # compiler's W8 weight-stream layouts), 39 tok/s with UNSPECIFIED
        # markers (breaks donation: per-chunk host round-trips), vs 808
        # auto on the same trace (opt-2.7b W8, 16 slots). Deep pools
        # therefore trade SLOTS, not layout; see ROADMAP round 5.
        if mesh is not None:
            # Tensor-parallel serving: Megatron specs shard the LM matrices
            # over "model" (parallel/partition.py) and the KV cache shards
            # by heads; GSPMD inserts the per-layer psums. bf16 weights
            # only — the Pallas W8 kernel is a single-chip path (custom
            # calls are not GSPMD-partitionable).
            assert not self._kv8, \
                "int8 KV is a single-chip capacity mode; mesh serving " \
                "shards the bf16 cache by heads"
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gill_tpu.parallel.partition import param_shardings

            assert not any(
                isinstance(leaf, dict) and "w8" in leaf
                for leaf in jax.tree_util.tree_leaves(
                    params, is_leaf=lambda x: isinstance(x, dict))), \
                "mesh mode requires bf16 params (w8 kernel is single-chip)"
            self.params = jax.device_put(params,
                                         param_shardings(mesh, params))
            cache_sh = NamedSharding(mesh, P(None, None, None, "model",
                                             None))
            self.cache = jax.device_put(self.cache, cache_sh)
        self._dstate = None            # device {"pos","tok","active","limit"}
        self._state: List[Optional[_SlotState]] = [None] * slots
        # host-side upper bounds on each slot's device pos (see _run_chunk)
        self._shadow = np.zeros((slots,), np.int64)
        self._cap = np.zeros((slots,), np.int64)
        self._prefixes: Dict[int, dict] = {}
        self._next_prefix_id = 0
        self.stats = {"prefills": 0, "prefill_reqs": 0, "chunks": 0,
                      "decode_steps": 0, "tokens_out": 0,
                      "prefix_hits": 0, "prefix_tokens_saved": 0,
                      "kv_rows_read": 0}   # sum of per-chunk read windows

    def _ctx(self):
        if self.mesh is None:
            import contextlib

            return contextlib.nullcontext()
        return jax.sharding.set_mesh(self.mesh)

    def _rbucket(self, n: int) -> int:
        # powers of 4 capped at the slot count: few jit variants (the
        # prefill compute at these wave sizes is cheap next to the weight
        # stream, so over-padding costs little)
        r = 1
        while r < n:
            r = min(r * 4, self.slots)
        return r

    def warmup(self):
        """Compile every (prompt bucket, wave size) prefill variant and the
        chunk program without touching live state: all pad slot ids are out
        of range, so every scatter drops and the programs are no-ops."""
        with self._ctx():
            if self._dstate is None:
                self._dstate = self._fresh_state()
            rbs = sorted({self._rbucket(n)
                          for n in range(1, self.slots + 1)})
            for pb in self.buckets:
                for nreq in rbs:
                    toks = np.full((nreq, pb), self.pad_id, np.int32)
                    self.cache, self._dstate, _ = self._prefill_fn(
                        self.params, self.cache, self._dstate,
                        jnp.asarray(toks),
                        jnp.ones((nreq,), jnp.int32),
                        jnp.full((nreq,), self.slots, jnp.int32),
                        jnp.ones((nreq,), jnp.int32),
                        pb, nreq)
            for kv_hi in self.kv_buckets:
                self.cache, self._dstate, toks = self._chunk_fn(
                    self.params, self.cache, self._dstate, kv_hi)
            jax.block_until_ready(toks)

    def _fresh_state(self):
        return {"pos": jnp.zeros((self.slots,), jnp.int32),
                "tok": jnp.full((self.slots,), self.pad_id, jnp.int32),
                "active": jnp.zeros((self.slots,), bool),
                # pos value at which the slot's token budget is exhausted:
                # the device freezes it there, so an unfilled finished slot
                # stops inflating the KV read-window bound
                "limit": jnp.zeros((self.slots,), jnp.int32)}

    # -- jitted programs ----------------------------------------------------

    @functools.cached_property
    def _prefill_fn(self):
        cfg, kv8 = self.cfg, self._kv8

        @functools.partial(jax.jit, static_argnums=(7, 8),
                           donate_argnums=(1, 2))
        def prefill(params, cache, state, tokens, true_len, slot_ids,
                    limits, plen, nreq):
            # Batched prefill: tokens (R, P), true_len (R,), slot_ids (R,).
            # One program launch plants R prompts into R slots — the weight
            # stream (the W8 dequant fallback reads the full LM once per
            # forward) and the relay dispatch overhead are paid once per
            # refill WAVE instead of once per request. Pad rows carry
            # slot_id == n_slots, dropped by every scatter below.
            del plen, nreq
            emb = opt_mod.embed_tokens(params, tokens)          # (R, P, E)
            small = opt_mod.init_cache(cfg, tokens.shape[0], tokens.shape[1],
                                       dtype=jnp.bfloat16
                                       if kv8 else cache["k"].dtype,
                                       kv_int8=kv8)
            # scan-over-layers: prefill is compute-bound (M = R * bucket),
            # and the unrolled W8 path would materialize per-layer weight
            # slices at M > 256 (nn.linear falls back to dequant there)
            out = opt_mod.forward(params, cfg, emb, cache=small, cache_pos=0,
                                  unroll_layers=False, skip_logits=True)
            # logits only at the last valid position (the 50k-vocab head
            # over the whole prompt would dominate prefill cost)
            h_last = jnp.take_along_axis(
                out["last_hidden"], true_len[:, None, None] - 1,
                axis=1)[:, 0]                                    # (R, E)
            head = params["embed_tokens"]["weight"]
            logits = jax.lax.dot_general(
                h_last, head.astype(h_last.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (R,)
            new_cache = {}
            for key in cache:
                rows = out["cache"][key]                 # (L, R, P, H, D)
                new_cache[key] = cache[key].at[
                    :, slot_ids, :rows.shape[2]].set(
                    rows.astype(cache[key].dtype), mode="drop")
            state = {"pos": state["pos"].at[slot_ids].set(true_len,
                                                          mode="drop"),
                     "tok": state["tok"].at[slot_ids].set(first,
                                                          mode="drop"),
                     "active": state["active"].at[slot_ids].set(True,
                                                                mode="drop"),
                     "limit": state["limit"].at[slot_ids].set(limits,
                                                              mode="drop")}
            return new_cache, state, first

        return prefill

    # -- prefix caching -------------------------------------------------------

    def register_prefix(self, tokens: List[int]) -> int:
        """Prefill a shared prompt prefix ONCE and cache its KV rows
        device-side; requests whose prompt starts with these tokens pass the
        returned id as ServeRequest.prefix_id and pay prefill compute only
        for their suffix (vLLM-style prefix caching, restricted to explicit
        registration — no content hashing). Memory: L*2*H*Dh*2 bytes/token
        (~0.3 MB/token at opt-2.7b bf16) per registered prefix.

        The suffix prefill runs at a STATIC offset equal to the prefix
        length, so each distinct registered length compiles one program
        variant per (suffix bucket, wave size) on first use."""
        tokens = [int(t) for t in tokens]
        if self._kv8:
            raise ValueError(
                "prefix caching needs a bf16 KV cache (the static-offset "
                "suffix prefill has no int8 path — models/opt.py _layer); "
                "build the engine with kv_dtype=bfloat16")
        if not 1 <= len(tokens) < self.max_seq:
            raise ValueError(f"prefix length {len(tokens)} must be in "
                             f"[1, max_seq={self.max_seq})")
        with self._ctx():
            kv = self._prefix_kv_fn(
                self.params, jnp.asarray([tokens], jnp.int32),
                plen=len(tokens))
            jax.block_until_ready(kv["k"])
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = {"tokens": tokens, "k": kv["k"], "v": kv["v"]}
        return pid

    def extend_prefix(self, prefix_id: int, tokens: List[int]) -> int:
        """Extend a registered prefix by `tokens`, prefilling ONLY the new
        tokens at the parent's offset (the parent's cached KV rows are
        attended, not recomputed) — an incremental chat session therefore
        never re-prefills its history. Returns a NEW prefix id for
        [parent tokens | tokens]; the parent stays registered
        (drop_prefix frees it).

        Compile note: extension/suffix programs are specialized on the
        prefix length (static offset), so each DISTINCT history length
        compiles once. Rolling sessions should quantize their turn sizes
        (e.g. pad turns to 16/32/64 tokens) to bound the variant set."""
        parent = self._prefixes.get(prefix_id)
        if parent is None:
            raise ValueError(f"unknown prefix_id {prefix_id}")
        tokens = [int(t) for t in tokens]
        n = len(parent["tokens"])
        if not tokens or n + len(tokens) >= self.max_seq:
            raise ValueError(
                f"extension length {len(tokens)} must be >= 1 and keep the "
                f"prefix under max_seq ({n} + {len(tokens)} vs "
                f"{self.max_seq})")
        with self._ctx():
            kv = self._prefix_extend_fn(
                self.params, parent["k"], parent["v"],
                jnp.asarray([tokens], jnp.int32), pfx=n, plen=len(tokens))
            jax.block_until_ready(kv["k"])
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = {"tokens": parent["tokens"] + tokens,
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
        def run(params, pk, pv, tokens, *, pfx, plen):
            # tokens (1, plen) exact; pk/pv (L, 1, pfx, H, Dh) the parent's
            # cached KV. Returns the concatenated (L, 1, pfx+plen, H, Dh).
            del plen
            emb = opt_mod.embed_tokens(params, tokens)
            small = opt_mod.init_cache(cfg, 1, pfx + tokens.shape[1],
                                       dtype=kv_dtype)
            for key, rows in (("k", pk), ("v", pv)):
                small[key] = small[key].at[:, :, :pfx].set(
                    rows.astype(small[key].dtype))
            out = opt_mod.forward(params, cfg, emb, cache=small,
                                  cache_pos=pfx, unroll_layers=False,
                                  skip_logits=True)
            return {"k": out["cache"]["k"], "v": out["cache"]["v"]}

        return run

    @functools.cached_property
    def _prefix_kv_fn(self):
        cfg = self.cfg
        kv_dtype = self.cache["k"].dtype

        @functools.partial(jax.jit, static_argnames=("plen",))
        def run(params, tokens, *, plen):
            # tokens (1, plen) exact — no bucket padding: the suffix
            # prefill's kv_offset mask treats every row < offset as valid,
            # so padded zero-KV rows would be attended, not masked.
            emb = opt_mod.embed_tokens(params, tokens)
            small = opt_mod.init_cache(cfg, 1, plen, dtype=kv_dtype)
            out = opt_mod.forward(params, cfg, emb, cache=small, cache_pos=0,
                                  unroll_layers=False, skip_logits=True)
            return {"k": out["cache"]["k"], "v": out["cache"]["v"]}

        return run

    @functools.cached_property
    def _prefix_prefill_fn(self):
        cfg = self.cfg

        @functools.partial(jax.jit, static_argnums=(9, 10, 11),
                           donate_argnums=(1, 2))
        def prefill(params, cache, state, pk, pv, tokens, true_len,
                    slot_ids, limits, pfx, plen, nreq):
            # Suffix prefill at static offset pfx: tokens (R, P) are the
            # SUFFIX ids; pk/pv (L, 1, pfx, H, Dh) are the shared prefix's
            # cached KV rows, broadcast across the wave. models/opt.py's
            # nonzero-int cache_pos path attends the suffix queries over
            # [prefix rows | causal suffix] and returns the fully planted
            # small cache; true_len counts SUFFIX tokens.
            del plen, nreq
            r = tokens.shape[0]
            emb = opt_mod.embed_tokens(params, tokens)
            small = opt_mod.init_cache(cfg, r, pfx + tokens.shape[1],
                                       dtype=cache["k"].dtype)
            for key, rows in (("k", pk), ("v", pv)):
                small[key] = small[key].at[:, :, :pfx].set(
                    jnp.broadcast_to(
                        rows.astype(small[key].dtype),
                        (cfg.num_layers, r, pfx) + rows.shape[3:]))
            out = opt_mod.forward(params, cfg, emb, cache=small,
                                  cache_pos=pfx, unroll_layers=False,
                                  skip_logits=True)
            h_last = jnp.take_along_axis(
                out["last_hidden"], true_len[:, None, None] - 1,
                axis=1)[:, 0]
            head = params["embed_tokens"]["weight"]
            logits = jax.lax.dot_general(
                h_last, head.astype(h_last.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            new_cache = {}
            for key in cache:
                rows = out["cache"][key]          # (L, R, pfx+P, H, Dh)
                new_cache[key] = cache[key].at[
                    :, slot_ids, :rows.shape[2]].set(
                    rows.astype(cache[key].dtype), mode="drop")
            state = {"pos": state["pos"].at[slot_ids].set(pfx + true_len,
                                                          mode="drop"),
                     "tok": state["tok"].at[slot_ids].set(first,
                                                          mode="drop"),
                     "active": state["active"].at[slot_ids].set(True,
                                                                mode="drop"),
                     "limit": state["limit"].at[slot_ids].set(limits,
                                                              mode="drop")}
            return new_cache, state, first

        return prefill

    @functools.cached_property
    def _chunk_fn(self):
        cfg, unroll = self.cfg, self.unroll
        pad_id, max_seq = self.pad_id, self.max_seq
        eos, steps = self.eos_id, self.chunk

        @functools.partial(jax.jit, static_argnums=(3,),
                           donate_argnums=(1, 2))
        def run_chunk(params, cache, state, kv_hi):
            # KV read window: decode over a [0, kv_hi) slice of the pool
            # (carried through the scan in place of the full cache — see
            # _kv_window) so per-step KV traffic follows the actual context
            # depth, not the provisioned max_seq. Out-of-window scatter
            # rows (parked slots frozen deeper than kv_hi) drop harmlessly
            # (mode="drop" in models/opt.py assemble).
            windowed = kv_hi < max_seq
            win = _kv_window(cache, kv_hi) if windowed else cache

            def step(carry, _):
                win, pos, tok, active, limit = carry
                # budget freeze: a slot whose token budget is exhausted
                # (pos reached limit) stops advancing, so until refill it
                # neither inflates the KV read window nor decodes garbage
                act = active & (pos < limit)
                emb = opt_mod.embed_tokens(params, tok[:, None])
                out = opt_mod.forward(params, cfg, emb, cache=win,
                                      cache_pos=pos, unroll_layers=unroll)
                nxt = jnp.argmax(out["logits"][:, -1], axis=-1) \
                         .astype(jnp.int32)
                nxt = jnp.where(act, nxt, pad_id)
                new_active = active
                if eos is not None:
                    # EOS latches only on genuinely emitted tokens (frozen
                    # slots emit pads, which must not flip the latch)
                    new_active = new_active & ((nxt != eos) | ~act)
                # inactive slots neither advance nor emit; their parked
                # cache row is overwritten harmlessly until refill
                pos = jnp.minimum(pos + act, max_seq - 1)
                return (out["cache"], pos, nxt, new_active, limit), nxt

            entry_tok = state["tok"]
            (win, pos, tok, active, limit), toks = jax.lax.scan(
                step, (win, state["pos"], state["tok"], state["active"],
                       state["limit"]),
                None, length=steps)
            cache = _kv_window_merge(cache, win) if windowed else win
            # Row 0 = the ENTRY tokens: for a slot just refilled this is the
            # prefill's first generated token, so the host learns it from
            # this one transfer instead of a per-prefill sync (measured
            # ~65 ms round-trip per refill over this link).
            toks = jnp.concatenate([entry_tok[None], toks], axis=0)
            return cache, {"pos": pos, "tok": tok, "active": active,
                           "limit": limit}, toks

        return run_chunk

    def _run_chunk(self):
        """Dispatch one decode chunk at the smallest KV read window covering
        every slot's position bound. The bound is tracked host-side: a
        slot's pos starts at its prompt length (refill), advances at most
        `chunk` per dispatched chunk, and freezes at its budget limit
        (device-enforced), so the window shrinks back after deep requests
        retire. Picking the bucket costs no device round-trip."""
        if len(self.kv_buckets) > 1:
            end = np.minimum(np.minimum(self._shadow + self.chunk,
                                        self._cap), self.max_seq - 1)
            hi = int(end.max()) if end.size else self.max_seq
            kv_hi = next(b for b in self.kv_buckets if b >= hi)
            self._shadow = end
        else:
            kv_hi = self.max_seq
        self.cache, self._dstate, toks = self._chunk_fn(
            self.params, self.cache, self._dstate, kv_hi)
        self.stats["chunks"] += 1
        self.stats["decode_steps"] += self.chunk
        self.stats["kv_rows_read"] += kv_hi
        return toks

    def _reset_pool(self):
        self._dstate = self._fresh_state()
        self._state = [None] * self.slots
        self._shadow = np.zeros((self.slots,), np.int64)
        self._cap = np.zeros((self.slots,), np.int64)

    # -- scheduler ----------------------------------------------------------

    def _refill(self, queue: List[ServeRequest]):
        # Fire-and-forget: no device->host sync here. The prefill's first
        # generated token reaches the host as row 0 of the NEXT chunk's
        # token block (the slot is marked `fresh` until then).
        #
        # All refills of one scheduler visit run as ONE batched prefill
        # launch: prompts pad to the wave's largest bucket, the request
        # count pads to a power of two (pad rows scatter to the
        # out-of-range slot id == n_slots and are dropped). Per-request
        # launches cost a relay dispatch AND a full LM weight stream each;
        # the wave pays both once.
        wave = []                      # (slot, request) pairs
        for s in range(self.slots):
            if self._state[s] is not None or not queue:
                continue
            req = queue.pop(0)
            plen = len(req.prompt)
            if plen + req.max_new_tokens > self.max_seq:
                raise ValueError(
                    f"request {req.uid}: {plen}+{req.max_new_tokens} exceeds "
                    f"max_seq {self.max_seq}")
            if req.prefix_id is not None:
                pfx = self._prefixes.get(req.prefix_id)
                if pfx is None:
                    raise ValueError(f"request {req.uid}: unknown prefix_id "
                                     f"{req.prefix_id}")
                n = len(pfx["tokens"])
                if plen <= n or req.prompt[:n] != pfx["tokens"]:
                    raise ValueError(
                        f"request {req.uid}: prompt must extend prefix "
                        f"{req.prefix_id} ({n} tokens) by >= 1 token")
            wave.append((s, req))
        if not wave:
            return
        # One batched prefill launch per prefix group (requests without a
        # prefix share one group). Grouping keeps the static-offset suffix
        # programs simple; mixed-prefix refill waves are rare by design
        # (a shared prefix implies a shared workload).
        groups: Dict[Optional[int], list] = {}
        for s, req in wave:
            groups.setdefault(req.prefix_id, []).append((s, req))
        for pid, grp in groups.items():
            if pid is None:
                self._prefill_wave(grp)
            else:
                self._prefill_prefix_wave(pid, grp)
        for s, req in wave:
            self._state[s] = _SlotState(uid=req.uid, pos=len(req.prompt),
                                        max_new=req.max_new_tokens)
            # host-side pos bound for the KV read window: the device pos
            # starts at the prompt length and freezes at the budget limit
            self._shadow[s] = len(req.prompt)
            self._cap[s] = min(len(req.prompt) + req.max_new_tokens - 1,
                               self.max_seq - 1)

    def _limits(self, grp, base):
        return np.asarray(
            [min(base[i] + req.max_new_tokens - 1, self.max_seq - 1)
             for i, (_, req) in enumerate(grp)]
            + [1] * (self._rbucket(len(grp)) - len(grp)), np.int32)

    def _prefill_wave(self, grp):
        pb = max(_bucket(len(req.prompt), self.buckets) for _, req in grp)
        nreq = self._rbucket(len(grp))
        toks = np.full((nreq, pb), self.pad_id, np.int32)
        lens = np.ones((nreq,), np.int32)
        slot_ids = np.full((nreq,), self.slots, np.int32)   # OOB -> dropped
        for i, (s, req) in enumerate(grp):
            toks[i, :len(req.prompt)] = req.prompt
            lens[i] = len(req.prompt)
            slot_ids[i] = s
        limits = self._limits(grp, [len(req.prompt) for _, req in grp])
        self.cache, self._dstate, _ = self._prefill_fn(
            self.params, self.cache, self._dstate, jnp.asarray(toks),
            jnp.asarray(lens), jnp.asarray(slot_ids), jnp.asarray(limits),
            pb, nreq)
        self.stats["prefills"] += 1
        self.stats["prefill_reqs"] = (self.stats.get("prefill_reqs", 0)
                                      + len(grp))

    def _prefill_prefix_wave(self, pid: int, grp):
        pfx = self._prefixes[pid]
        n_pfx = len(pfx["tokens"])
        suffixes = [req.prompt[n_pfx:] for _, req in grp]
        pb = max(_bucket(len(sfx), self.buckets) for sfx in suffixes)
        if n_pfx + pb > self.max_seq:
            raise ValueError(
                f"prefix {pid} ({n_pfx}) + suffix bucket {pb} exceeds "
                f"max_seq {self.max_seq}; use a smaller suffix bucket")
        nreq = self._rbucket(len(grp))
        toks = np.full((nreq, pb), self.pad_id, np.int32)
        lens = np.ones((nreq,), np.int32)
        slot_ids = np.full((nreq,), self.slots, np.int32)   # OOB -> dropped
        for i, ((s, _), sfx) in enumerate(zip(grp, suffixes)):
            toks[i, :len(sfx)] = sfx
            lens[i] = len(sfx)
            slot_ids[i] = s
        limits = self._limits(grp, [len(req.prompt) for _, req in grp])
        self.cache, self._dstate, _ = self._prefix_prefill_fn(
            self.params, self.cache, self._dstate, pfx["k"], pfx["v"],
            jnp.asarray(toks), jnp.asarray(lens), jnp.asarray(slot_ids),
            jnp.asarray(limits), n_pfx, pb, nreq)
        self.stats["prefills"] += 1
        self.stats["prefill_reqs"] = (self.stats.get("prefill_reqs", 0)
                                      + len(grp))
        self.stats["prefix_hits"] += len(grp)
        self.stats["prefix_tokens_saved"] += n_pfx * len(grp)

    def _collect(self, toks: np.ndarray):
        """Fold one chunk's tokens into per-slot results; close finished
        slots (max_new host-side, EOS by token value). toks row 0 holds the
        chunk-ENTRY tokens — consumed only by `fresh` slots (it is their
        prefill-produced first token; for everyone else it repeats the
        already-collected previous token)."""
        for s in range(self.slots):
            st = self._state[s]
            if st is None:
                continue
            rows = toks[:, s] if st.fresh else toks[1:, s]
            st.fresh = False
            for t in rows:
                if len(st.generated) >= st.max_new:
                    break
                t = int(t)
                st.generated.append(t)
                if self.eos_id is not None and t == self.eos_id:
                    break
            done = (len(st.generated) >= st.max_new
                    or (self.eos_id is not None
                        and st.generated[-1] == self.eos_id))
            if done:
                self._finished.append((st.uid, st.generated))
                self._state[s] = None
                # retired slot: its position no longer bounds the KV read
                # window (the device keeps the slot frozen at its limit;
                # out-of-window writes drop), so shrink the window bound
                # now instead of waiting for the next refill
                self._shadow[s] = 0
                self._cap[s] = 0

    def _drain(self, results):
        for uid, gen in self._finished:
            results[uid] = gen
            self.stats["tokens_out"] += len(gen)
        self._finished = []

    def run(self, requests: List[ServeRequest]) -> Dict[int, List[int]]:
        """Serve all requests; returns uid -> generated token ids (greedy).
        The first generated token comes from the prefill; EOS (when set) is
        included in the output like the reference's tokenizer decode."""
        queue = list(requests)
        self._finished: List = []
        results: Dict[int, List[int]] = {}
        with self._ctx():
            self._reset_pool()
            while queue or any(st is not None for st in self._state):
                self._refill(queue)
                if not any(st is not None for st in self._state):
                    continue             # everything finished in prefill
                toks = self._run_chunk()
                self._collect(np.asarray(toks))
        self._drain(results)
        return results

    def _collect_block(self, block, results: Dict[int, List[int]]):
        """Fold one PIPELINED chunk's token block into the requests that
        occupied each slot when that chunk was dispatched (the snapshot
        captures the _SlotState objects, so collection is correct even
        after the slot has been refilled by a later request)."""
        toks, snap = block
        arr = np.asarray(toks)
        for s, (st, was_fresh) in snap.items():
            if st.done:
                continue
            rows = arr[:, s] if was_fresh else arr[1:, s]
            for t in rows:
                if len(st.generated) >= st.max_new:
                    break
                t = int(t)
                st.generated.append(t)
                if self.eos_id is not None and t == self.eos_id:
                    break
            if (len(st.generated) >= st.max_new
                    or (self.eos_id is not None and st.generated
                        and st.generated[-1] == self.eos_id)):
                st.done = True
                results[st.uid] = st.generated
                self.stats["tokens_out"] += len(st.generated)

    def run_pipelined(self, requests: List[ServeRequest], *,
                      depth: int = 2) -> Dict[int, List[int]]:
        """Asynchronous chunk pipeline: the scheduler never waits for a
        chunk's tokens before dispatching the next one. Refill planning
        needs no device data — each request's token budget (max_new_tokens)
        is known host-side, so a slot is reusable the moment enough chunks
        to cover its budget have been DISPATCHED (the refill prefill
        executes on device strictly after those chunks). Token blocks come
        back as futures and are folded into results with a lag of up to
        `depth` chunks, off the device's critical path: the device runs
        chunk-to-chunk with no host round-trip in between, which removes
        run()'s per-chunk sync stall and lets a smaller `chunk` cut the
        budget-overshoot waste without paying more syncs.

        EOS (when set) stays correct — the device freezes the slot and the
        collector stops at the EOS token — and the planner is EOS-AWARE
        with a lag of at most `depth` chunks: a slot whose collected block
        contained the EOS retires immediately (st.done) instead of waiting
        for its full token budget to be dispatched, so early-EOS-heavy
        workloads refill within `depth` chunks of the EOS landing. For
        closed-budget generation (the reference's fixed num_words decode,
        gill/models.py:443-464) this scheduler strictly dominates run()."""
        queue = list(requests)
        results: Dict[int, List[int]] = {}
        from collections import deque

        pending = deque()
        with self._ctx():
            self._reset_pool()
            while True:
                # retire slots whose budget is covered by dispatched chunks
                # OR whose request already finished at collection (EOS seen
                # in a collected block): pending blocks for the old request
                # skip it via the done flag, and the refill prefill
                # overwrites the frozen slot
                for s in range(self.slots):
                    st = self._state[s]
                    if st is not None and (st.done
                                           or st.planned >= st.max_new):
                        self._state[s] = None
                        self._shadow[s] = 0      # see _collect: retired
                        self._cap[s] = 0         # slots stop bounding the
                                                 # KV read window
                self._refill(queue)
                active = [s for s in range(self.slots)
                          if self._state[s] is not None]
                if not active and not pending:
                    break
                if active:
                    toks = self._run_chunk()
                    snap = {}
                    for s in active:
                        st = self._state[s]
                        snap[s] = (st, st.fresh)
                        # a fresh slot also yields its prefill token (row 0)
                        st.planned += self.chunk + (1 if st.fresh else 0)
                        st.fresh = False
                    pending.append((toks, snap))
                while len(pending) > depth or (not active and pending):
                    self._collect_block(pending.popleft(), results)
        # (the loop can only break once pending is empty — the in-loop
        # collector is the single drain point)
        return results

    def run_waves(self, requests: List[ServeRequest]) -> Dict[int, List[int]]:
        """Wave-scheduling baseline: fill all slots, decode until EVERY slot
        finishes, then take the next wave — i.e. what batching looks like
        without continuous refill. Same programs, same chunk size."""
        results: Dict[int, List[int]] = {}
        queue = list(requests)
        with self._ctx():
            self._reset_pool()
            while queue:
                wave, queue = queue[:self.slots], queue[self.slots:]
                self._finished = []
                self._refill(wave)
                while any(st is not None for st in self._state):
                    toks = self._run_chunk()
                    self._collect(np.asarray(toks))
                self._drain(results)
        return results
