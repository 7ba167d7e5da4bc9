"""Speculative decoding for low-latency single-stream serving.

The target model's decode step is weight-bandwidth-bound (the whole int8/
bf16 weight set streams from HBM per token — see README perf table), so at
batch 1 the chip is almost idle between weight reads. A small DRAFT model
proposes K tokens cheaply; the target then scores all K in ONE multi-token
cached forward (its weights stream once per round instead of once per
token) and commits the longest prefix it agrees with, plus its own
correction token. Greedy outputs are therefore EXACTLY the target model's
greedy outputs — the draft only affects speed, never content
(tests/test_speculative.py proves token-identity for agreeing,
disagreeing, and pathological drafts).

TPU-first mechanics (everything shape-static under one jitted round):
  * draft: K single-token deferred-write decode steps under lax.scan;
  * verify: one target forward over the (K+1)-token window
    [last_committed, d_1..d_K] at a traced cache offset (the multi-token
    cached path in models/opt.py — query i attends keys <= pos + i);
  * acceptance: vectorized prefix-match of draft tokens vs the target's
    argmax, capped at K-1 so the draft cache never develops a hole (the
    draft wrote KV rows only for [last, d_1..d_{K-1}]); the round returns
    a fixed (K,) token block plus a count;
  * rollback is free: rejected tokens' KV rows sit exactly where the next
    round's verify window rewrites them, so both caches stay dense.

Rounds run in fixed-size batches per host round-trip (like the
continuous-batching engine's chunks), so the high-latency link is paid
per ~R rounds, not per token.

Plain-text greedy serving only — the GILL [IMG] decode logic stays on the
reference-parity path in models/gill.py.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod


class SpeculativeDecoder:
    """Greedy two-model speculative decoding, batch 1.

    tparams/tcfg: the serving (target) model; dparams/dcfg: the draft.
    Both must share a tokenizer/vocabulary (e.g. two OPT sizes). k: draft
    tokens per round (<= k tokens commit per round, >= 1 always commits).
    """

    def __init__(self, tparams, tcfg: OPTConfig, dparams, dcfg: OPTConfig,
                 *, k: int = 8, max_seq: int = 512,
                 prefill_buckets=(64, 128, 256, 512),
                 rounds_per_call: int = 8, eos_id: Optional[int] = None,
                 pad_id: int = 1, unroll_layers: bool = True,
                 kv_dtype=jnp.bfloat16):
        assert tcfg.vocab_size == dcfg.vocab_size, "shared vocab required"
        assert kv_dtype != jnp.int8, \
            "int8 KV needs init_cache(kv_int8=True) scale plumbing, which " \
            "the speculative decoder does not carry; use bf16"
        self.tparams, self.tcfg = tparams, tcfg
        self.dparams, self.dcfg = dparams, dcfg
        self.k = k
        self.max_seq = max_seq
        buckets = sorted(set(b for b in prefill_buckets if b <= max_seq))
        if not buckets or buckets[-1] < max_seq:
            # every admissible prompt must find a bucket (a 600-token
            # prompt under max_seq=1024 previously crashed on next())
            buckets.append(max_seq)
        self.buckets = tuple(buckets)
        self.rounds = rounds_per_call
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.unroll = unroll_layers
        self.kv_dtype = kv_dtype
        # last generate()'s acceptance telemetry: {"rounds", "accepted",
        # "k"} — acceptance rate = accepted / (rounds * (k - 1)) of the
        # REFUTABLE draft positions (each round always commits >= 1 token
        # regardless of the draft; only the k-1 capped prefix varies)
        self.last_stats = None

    # -- jitted programs ----------------------------------------------------

    @functools.cached_property
    def _prefill_fn(self):
        tcfg, dcfg, kv_dtype = self.tcfg, self.dcfg, self.kv_dtype
        max_seq = self.max_seq

        @functools.partial(jax.jit, static_argnames=("plen",))
        def prefill(tparams, dparams, tokens, true_len, *, plen):
            del plen
            caches = {}
            for name, params, cfg in (("t", tparams, tcfg),
                                      ("d", dparams, dcfg)):
                emb = opt_mod.embed_tokens(params, tokens)
                cache = opt_mod.init_cache(cfg, 1, max_seq, dtype=kv_dtype)
                # write the prompt rows into the big cache via the
                # static-offset prefill, then keep only the target's last
                # valid logits
                small = opt_mod.init_cache(cfg, 1, tokens.shape[1],
                                           dtype=kv_dtype)
                out = opt_mod.forward(params, cfg, emb, cache=small,
                                      cache_pos=0, skip_logits=True)
                for key in cache:
                    cache[key] = jax.lax.dynamic_update_slice(
                        cache[key], out["cache"][key].astype(kv_dtype),
                        (0, 0, 0, 0, 0))
                caches[name] = cache
                if name == "t":
                    h_last = jnp.take_along_axis(
                        out["last_hidden"], true_len[None, None, None] - 1,
                        axis=1)[:, 0]
                    head = params["embed_tokens"]["weight"]
                    logits = jax.lax.dot_general(
                        h_last, head.astype(h_last.dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    first = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
            # the draft's cache rows cover the prompt only; its next row to
            # write is true_len (it has not seen `first` yet) — handled by
            # the round's draft scan starting at pos_d = pos
            return caches["t"], caches["d"], first

        return prefill

    @functools.cached_property
    def _rounds_fn(self):
        tcfg, dcfg = self.tcfg, self.dcfg
        k, unroll, n_rounds = self.k, self.unroll, self.rounds

        def one_round(tparams, dparams, tcache, dcache, pos, last):
            # -- draft K tokens (deferred-write single-token steps) ------
            def dstep(carry, j):
                dcache, tok = carry
                emb = opt_mod.embed_tokens(dparams, tok[None, None])
                out = opt_mod.forward(dparams, dcfg, emb, cache=dcache,
                                      cache_pos=pos + j,
                                      unroll_layers=unroll)
                nxt = jnp.argmax(out["logits"][0, -1]).astype(jnp.int32)
                return (out["cache"], nxt), nxt

            (dcache, _), drafts = jax.lax.scan(
                dstep, (dcache, last), jnp.arange(k))        # drafts: (k,)

            # -- verify: ONE target forward over [last, d_1..d_k] --------
            window = jnp.concatenate([last[None], drafts])   # (k+1,)
            emb = opt_mod.embed_tokens(tparams, window[None])
            out = opt_mod.forward(tparams, tcfg, emb, cache=tcache,
                                  cache_pos=pos, unroll_layers=unroll)
            tcache = out["cache"]
            agree = jnp.argmax(out["logits"][0], axis=-1) \
                       .astype(jnp.int32)                    # (k+1,)

            # -- accept the agreeing prefix (capped at k-1: the draft has
            # no KV row for d_k, so committing it would leave a hole) ----
            match = drafts == agree[:-1]                     # (k,)
            n = jnp.minimum(jnp.cumprod(match).sum(), k - 1)
            committed = jnp.where(jnp.arange(k) < n, drafts, 0)
            correction = agree[n]
            committed = committed.at[n].set(correction)
            committed = jnp.where(jnp.arange(k) <= n, committed,
                                  jnp.int32(-1))             # -1 = unused
            return tcache, dcache, pos + n + 1, correction, committed, n + 1

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def run_rounds(tparams, dparams, tcache, dcache, pos, last):
            def body(carry, _):
                tcache, dcache, pos, last = carry
                tcache, dcache, pos, last, committed, cnt = one_round(
                    tparams, dparams, tcache, dcache, pos, last)
                return (tcache, dcache, pos, last), (committed, cnt)

            (tcache, dcache, pos, last), (blocks, counts) = jax.lax.scan(
                body, (tcache, dcache, pos, last), None, length=n_rounds)
            return tcache, dcache, pos, last, blocks, counts

        return run_rounds

    # -- host loop -----------------------------------------------------------

    def generate(self, prompt: List[int], max_new_tokens: int) -> List[int]:
        """Greedy generation, token-identical to the target model's own
        greedy decode (the draft affects only wall-clock)."""
        plen = len(prompt)
        # worst case: one blind rounds-batch past the last needed token
        # (up to rounds*k commits) plus the final verify window (k+1 rows)
        need = plen + max_new_tokens + self.rounds * self.k + self.k + 1
        if need > self.max_seq:
            raise ValueError(
                f"prompt {plen} + {max_new_tokens} new (+ round slack "
                f"{self.rounds * self.k + self.k + 1}) exceeds max_seq "
                f"{self.max_seq}")
        pb = next(b for b in self.buckets if b >= plen)
        toks = np.full((1, pb), self.pad_id, np.int32)
        toks[0, :plen] = prompt
        tcache, dcache, first = self._prefill_fn(
            self.tparams, self.dparams, jnp.asarray(toks),
            jnp.asarray(plen, jnp.int32), plen=pb)
        out = [int(first)]
        if self.eos_id is not None and out[-1] == self.eos_id:
            return out
        pos = jnp.asarray(plen, jnp.int32)
        last = jnp.asarray(out[-1], jnp.int32)
        stats = {"rounds": 0, "accepted": 0, "k": self.k}
        self.last_stats = stats
        while len(out) < max_new_tokens:
            tcache, dcache, pos, last, blocks, counts = self._rounds_fn(
                self.tparams, self.dparams, tcache, dcache, pos, last)
            blocks = np.asarray(blocks)                 # (rounds, k)
            counts = np.asarray(counts)                 # (rounds,)
            stats["rounds"] += int(self.rounds)
            stats["accepted"] += int(counts.sum()) - int(self.rounds)
            stop = False
            for r in range(self.rounds):
                for t in blocks[r, :counts[r]]:
                    out.append(int(t))
                    if (len(out) >= max_new_tokens
                            or (self.eos_id is not None
                                and out[-1] == self.eos_id)):
                        stop = True
                        break
                if stop:
                    break
            if stop:
                break
        return out[:max_new_tokens]
