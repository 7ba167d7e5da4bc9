"""Online serving: asynchronous request intake + token streaming over the
continuous-batching engines.

The reference serves its demo through a gradio queue with concurrency 1
(/root/reference/demo/app_gradio.py:216-218) — one request occupies the
whole model until it finishes. Here a single scheduler thread owns the
engine and multiplexes every in-flight request over the slot pool:

  * `submit()` is non-blocking and thread-safe; it returns a RequestHandle
    whose tokens appear chunk-by-chunk (streaming) and which signals
    completion via an Event.
  * The scheduler loop = the synchronous engine scheduler (refill -> chunk
    -> collect) with the queue fed from outside; between visits it drains
    whatever arrived, so new requests join the running batch at the next
    chunk boundary (<= chunk * step_time latency, no batch drain).
  * When idle, the loop parks on the queue — no busy-polling, no device
    work.
  * A scheduler-side crash is CONTAINED: every in-flight and queued handle
    is failed with the error (result()/stream() raise instead of blocking
    forever), and later submits are rejected.

Only the scheduler thread touches the engine/device; handles are the only
shared state (append-only token lists under a per-handle condition).
"""
from __future__ import annotations

import itertools
import queue
import threading
from typing import List, Optional

from gill_tpu.serve.engine import DecodeEngine, ServeRequest


class RequestHandle:
    """Streamed result of one submitted request."""

    def __init__(self, uid: int, prompt: List[int], max_new: int):
        self.uid = uid
        self.prompt = prompt
        self.max_new = max_new
        self.prefix_id: Optional[int] = None
        self.tokens: List[int] = []
        self.done = threading.Event()
        self.cond = threading.Condition()
        self.error: Optional[str] = None
        self.cancelled = False

    def cancel(self) -> None:
        """Request cancellation (e.g. the client disconnected). Safe from
        any thread and idempotent. The scheduler honors it at the next
        chunk boundary (_ThreadedEngine._cancel_sweep): a still-queued
        request finishes immediately with no tokens; an in-flight one
        stops decoding (its device slot is deactivated and freed for
        waiting requests) and completes with the tokens streamed so far.
        result() then returns that partial list (check .cancelled);
        stream() simply ends. Cancelling a finished request is a no-op:
        the flag is set but the full result stays available."""
        self.cancelled = True

    def result(self, timeout: Optional[float] = None) -> List[int]:
        if not self.done.wait(timeout):
            raise TimeoutError(f"request {self.uid} still running")
        if self.error:
            raise RuntimeError(self.error)
        return self.tokens

    def stream(self):
        """Yield tokens as they arrive; ends when the request completes."""
        sent = 0
        while True:
            with self.cond:
                while len(self.tokens) == sent and not self.done.is_set():
                    self.cond.wait()
                new = self.tokens[sent:]
            for t in new:
                yield t
            sent += len(new)
            if self.done.is_set() and sent == len(self.tokens):
                if self.error:
                    raise RuntimeError(self.error)
                return


class _PrefixReg:
    """Prefix-registration ticket, processed by the scheduler thread (only
    that thread may touch the engine/device). payload: token ids for the
    plain-LM engine, an (P, E) embedding array for the GILL engine.
    parent: an existing prefix id to EXTEND instead of registering anew."""

    def __init__(self, payload, parent: Optional[int] = None):
        self.payload = payload
        self.parent = parent
        self.pid: Optional[int] = None
        self.error: Optional[str] = None
        self.done = threading.Event()


class GillRequestHandle(RequestHandle):
    """RequestHandle + the [IMG] runs' hidden states, set at completion
    (the GILLMapper / retrieval-head input): img_hidden is the first run
    (nt, E); img_runs the engine's full (max_img_runs, nt, E) tap ring.
    A cancelled request completes with img_hidden/img_runs still None —
    partial decodes carry no usable [IMG] taps."""

    def __init__(self, uid, request):
        super().__init__(uid, [], request.num_words)
        self.request = request
        self.img_hidden = None
        self.img_runs = None


class _ThreadedEngine:
    """Shared scheduler-thread scaffolding: locked submit/close (no
    register-after-shutdown race), queue draining, crash containment."""

    _thread_name = "serve-scheduler"

    def __init__(self, engine):
        self.eng = engine
        self._q: "queue.Queue" = queue.Queue()
        self._uid = itertools.count()
        self._handles = {}
        self._stop = False
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._guarded_loop,
                                        daemon=True, name=self._thread_name)
        self._thread.start()

    def _register(self, handle):
        with self._lock:
            if self._stop:
                raise RuntimeError("engine closed")
            self._handles[handle.uid] = handle
            self._q.put(handle)
        return handle

    def _submit_reg(self, reg: _PrefixReg) -> int:
        """Queue a prefix registration/extension ticket and block until
        the scheduler thread (the only engine/device owner) processes it."""
        with self._lock:
            if self._stop:
                raise RuntimeError("engine closed")
            self._q.put(reg)
        while not reg.done.wait(0.2):
            if not self._thread.is_alive():
                raise RuntimeError("engine closed")
        if reg.error:
            raise RuntimeError(reg.error)
        return reg.pid

    def extend_prefix(self, prefix_id: int, payload) -> int:
        """Extend a registered prefix (engine extend_prefix) via the
        scheduler thread; returns the NEW prefix id."""
        return self._submit_reg(_PrefixReg(payload, parent=prefix_id))

    def drop_prefix(self, prefix_id: int) -> None:
        """Free a registered prefix's cached KV. Safe from any thread (a
        host-dict pop); queued requests still referencing the id fail
        admission with "unknown prefix_id"."""
        self.eng.drop_prefix(prefix_id)

    def close(self):
        with self._lock:
            if self._stop:
                return
            self._stop = True
            self._q.put(None)
        self._thread.join()

    def _guarded_loop(self):
        err = "engine closed"
        try:
            self._loop()
        except BaseException as e:   # noqa: BLE001 — a scheduler crash
            # must fail the handles, not strand their callers forever
            err = f"serving scheduler crashed: {type(e).__name__}: {e}"
            with self._lock:
                self._stop = True
        finally:
            self._fail_leftovers(err)

    def _fail_leftovers(self, msg: str):
        with self._lock:
            leftovers = list(self._handles.values())
            self._handles.clear()
        for h in leftovers:
            with h.cond:
                if not h.done.is_set():
                    h.error = msg
                    h.done.set()
                    h.cond.notify_all()

    def _cancel_sweep(self, waiting: list):
        """Honor RequestHandle.cancel() at the chunk boundary (scheduler
        thread only). Queued requests complete immediately with no tokens;
        in-flight ones free their slot (host-side now, device-side via
        _deactivate_slots so the slot stops decoding and stops inflating
        the KV read window) and complete with the tokens streamed so far."""
        eng = self.eng
        keep = []
        for w in waiting:
            if isinstance(w, RequestHandle) and w.cancelled:
                eng.stats["cancelled"] = eng.stats.get("cancelled", 0) + 1
                self._finish_cancelled(w)
            else:
                keep.append(w)
        waiting[:] = keep
        dead = []
        for s, st in enumerate(eng._state):
            if st is None:
                continue
            h = self._handles.get(st.uid)
            if h is not None and h.cancelled:
                dead.append(s)
                eng._state[s] = None
                eng._shadow[s] = 0
                eng._cap[s] = 0
                eng.stats["tokens_out"] += len(h.tokens)
                eng.stats["cancelled"] = eng.stats.get("cancelled", 0) + 1
                self._finish_cancelled(h)
        if dead:
            self._deactivate_slots(dead)

    def _finish_cancelled(self, h: RequestHandle):
        self._handles.pop(h.uid, None)
        with h.cond:
            if not h.done.is_set():
                h.done.set()
                h.cond.notify_all()

    def _deactivate_slots(self, slots: List[int]) -> None:
        raise NotImplementedError

    def _drain_queue(self, waiting: list, block: bool):
        try:
            item = self._q.get(block=block)
        except queue.Empty:
            return
        while True:
            if item is not None:
                waiting.append(item)
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return


class OnlineEngine(_ThreadedEngine):
    """Online front-end over the plain-LM DecodeEngine."""

    _thread_name = "lm-serve-scheduler"

    def submit(self, prompt: List[int], max_new_tokens: int, *,
               prefix_id: Optional[int] = None) -> RequestHandle:
        if len(prompt) + max_new_tokens > self.eng.max_seq:
            raise ValueError(
                f"{len(prompt)}+{max_new_tokens} exceeds max_seq "
                f"{self.eng.max_seq}")
        if prefix_id is not None:
            # Admission-time validation: a bad prefix reference must fail
            # THIS caller, not crash the scheduler at refill time.
            pfx = self.eng._prefixes.get(prefix_id)
            if pfx is None:
                raise ValueError(f"unknown prefix_id {prefix_id}")
            n = len(pfx["tokens"])
            if len(prompt) <= n or list(prompt[:n]) != pfx["tokens"]:
                raise ValueError(
                    f"prompt must extend prefix {prefix_id} ({n} tokens) "
                    f"by >= 1 token")
        h = RequestHandle(next(self._uid), list(prompt), max_new_tokens)
        h.prefix_id = prefix_id
        return self._register(h)

    def register_prefix(self, tokens: List[int]) -> int:
        """Register a shared prompt prefix (DecodeEngine.register_prefix)
        via the scheduler thread — it alone touches the engine/device.
        Blocks until the prefix KV is cached; returns the id for submit()."""
        if not 1 <= len(tokens) < self.eng.max_seq:
            raise ValueError(f"prefix length {len(tokens)} must be in "
                             f"[1, max_seq={self.eng.max_seq})")
        return self._submit_reg(_PrefixReg([int(t) for t in tokens]))

    def _deactivate_slots(self, slots: List[int]) -> None:
        """Stop the device decoding cancelled slots: the chunk program's
        EOS/budget latch is the `active` flag (engine.py _chunk_fn), so one
        host-side scatter parks the slot — it emits pads and freezes pos
        until a refill's prefill scatter re-activates it."""
        import jax.numpy as jnp

        eng = self.eng
        idx = jnp.asarray(slots, jnp.int32)
        st = dict(eng._dstate)
        st["active"] = st["active"].at[idx].set(False)
        eng._dstate = st

    def _deliver(self):
        """Push engine-side progress out to the handles (called after each
        collect; finished slots have already moved to eng._finished)."""
        eng = self.eng
        live = [st for st in eng._state if st is not None]
        fin = list(eng._finished)
        eng._finished = []
        for st in live:
            h = self._handles[st.uid]
            if len(st.generated) > len(h.tokens):
                with h.cond:
                    h.tokens.extend(st.generated[len(h.tokens):])
                    h.cond.notify_all()
        for uid, gen in fin:
            h = self._handles.pop(uid)
            eng.stats["tokens_out"] += len(gen)
            with h.cond:
                h.tokens = list(gen)
                h.done.set()
                h.cond.notify_all()

    def _loop(self):
        import numpy as np

        eng = self.eng
        with eng._ctx():
            eng._reset_pool()
            eng._finished = []
            waiting: List[RequestHandle] = []
            while True:
                idle = (not waiting
                        and all(st is None for st in eng._state))
                self._drain_queue(waiting, block=idle)
                if self._stop:
                    break
                regs = [w for w in waiting if isinstance(w, _PrefixReg)]
                if regs:
                    waiting = [w for w in waiting
                               if not isinstance(w, _PrefixReg)]
                    for rg in regs:
                        try:
                            rg.pid = (
                                eng.register_prefix(rg.payload)
                                if rg.parent is None else
                                eng.extend_prefix(rg.parent, rg.payload))
                        except Exception as e:  # noqa: BLE001 — fails the
                            # registering caller, not the scheduler
                            rg.error = f"{type(e).__name__}: {e}"
                        rg.done.set()
                self._cancel_sweep(waiting)
                if waiting:
                    reqs = [ServeRequest(uid=h.uid, prompt=h.prompt,
                                         max_new_tokens=h.max_new,
                                         prefix_id=h.prefix_id)
                            for h in waiting]
                    eng._refill(reqs)
                    taken = len(waiting) - len(reqs)
                    waiting = waiting[taken:]
                if all(st is None for st in eng._state):
                    continue
                toks = eng._run_chunk()
                eng._collect(np.asarray(toks))
                self._deliver()


class GillOnlineEngine(_ThreadedEngine):
    """Online front-end over GillDecodeEngine: asynchronous intake of
    FULL-GILL decode requests, chunk-boundary refill, per-token streaming
    of the valid prefix, and [IMG]-run hidden delivery at completion."""

    _thread_name = "gill-serve-scheduler"

    def submit(self, prompt_embs, num_words: int, *,
               min_word_tokens: int = 0, img_scale: float = 1.0,
               temperature: float = 0.0, top_p: float = 1.0,
               seed: int = 0, max_img_runs: int = 1,
               prefix_id: Optional[int] = None) -> GillRequestHandle:
        from gill_tpu.serve.gill_engine import GillServeRequest

        # with prefix_id set, prompt_embs carry only the suffix rows
        # AFTER the registered prefix (gill_engine.register_prefix)
        req = GillServeRequest(
            uid=next(self._uid), embs=prompt_embs, num_words=num_words,
            min_word_tokens=min_word_tokens, img_scale=img_scale,
            temperature=temperature, top_p=top_p, seed=seed,
            max_img_runs=max_img_runs, prefix_id=prefix_id)
        self.eng._validate(req)      # admission: reject before scheduling
        return self._register(GillRequestHandle(req.uid, req))

    def register_prefix(self, embs) -> int:
        """Register a shared (P, E) embedding prefix
        (GillDecodeEngine.register_prefix) via the scheduler thread — it
        alone touches the engine/device. Blocks until the prefix KV is
        cached; returns the id for submit(prefix_id=...)."""
        import numpy as np

        embs = np.asarray(embs)
        if embs.ndim != 2 or embs.shape[1] != self.eng.emb_dim:
            raise ValueError(f"prefix embs must be (P, {self.eng.emb_dim}),"
                             f" got {embs.shape}")
        if not 1 <= embs.shape[0] < self.eng.max_seq:
            raise ValueError(f"prefix length {embs.shape[0]} must be in "
                             f"[1, max_seq={self.eng.max_seq})")
        return self._submit_reg(_PrefixReg(embs))

    def _deactivate_slots(self, slots: List[int]) -> None:
        """Stop the device decoding cancelled slots. The gill chunk
        program has no standalone active flag — `done` derives from
        (force == 0) & (iter >= nw) and re-latches valid every step
        (gill_engine.py _chunk_fn) — so parking a slot means draining its
        force counter and pushing iter past any budget; valid is cleared
        too so pos freezes from the very next fed token."""
        import jax.numpy as jnp

        eng = self.eng
        idx = jnp.asarray(slots, jnp.int32)
        st = dict(eng._dstate)
        st["iter"] = st["iter"].at[idx].set(jnp.int32(2 ** 30))
        st["force"] = st["force"].at[idx].set(0)
        st["valid"] = st["valid"].at[idx].set(False)
        eng._dstate = st

    def _deliver(self, toks, valids, tap_dev):
        """Fold one chunk's rows into slot states; stream each request's
        VALID token prefix incrementally; finish slots whose budget AND
        fed (tap) coverage are both collected."""
        import numpy as np

        eng = self.eng
        tap_host = None
        for s in range(eng.slots):
            st = eng._state[s]
            if st is None:
                continue
            h = self._handles[st.uid]
            lo = 0 if st.fresh else 1
            st.fresh = False
            st.fed += toks.shape[0] - 1
            new_tok = []
            for r in range(lo, toks.shape[0]):
                if len(st.generated) >= st.budget:
                    break
                t = int(toks[r, s])
                st.generated.append(t)
                st.valid.append(bool(valids[r, s]))
                if st.prefix_ok and valids[r, s]:
                    new_tok.append(t)
                else:
                    st.prefix_ok = False   # valid latches off
            if new_tok:
                with h.cond:
                    h.tokens.extend(new_tok)
                    h.cond.notify_all()
            # output m's tap is captured at fed step m+1 — finish only
            # once fed coverage reaches the budget (see gill_engine
            # _collect_block for the boundary case)
            if len(st.generated) >= st.budget and st.fed >= st.budget:
                if tap_host is None:
                    tap_host = np.asarray(tap_dev)
                eng._state[s] = None
                self._handles.pop(st.uid)
                eng.stats["tokens_out"] += len(h.tokens)
                with h.cond:
                    h.img_hidden = tap_host[s, 0].copy()
                    h.img_runs = tap_host[s].copy()
                    h.done.set()
                    h.cond.notify_all()

    def _loop(self):
        eng = self.eng
        with eng._ctx():
            eng._reset_pool()
            waiting: List[GillRequestHandle] = []
            while True:
                idle = (not waiting
                        and all(st is None for st in eng._state))
                self._drain_queue(waiting, block=idle)
                if self._stop:
                    break
                regs = [w for w in waiting if isinstance(w, _PrefixReg)]
                if regs:
                    waiting = [w for w in waiting
                               if not isinstance(w, _PrefixReg)]
                    for rg in regs:
                        try:
                            rg.pid = (
                                eng.register_prefix(rg.payload)
                                if rg.parent is None else
                                eng.extend_prefix(rg.parent, rg.payload))
                        except Exception as e:  # noqa: BLE001 — fails the
                            # registering caller, not the scheduler
                            rg.error = f"{type(e).__name__}: {e}"
                        rg.done.set()
                self._cancel_sweep(waiting)
                if waiting:
                    reqs = [h.request for h in waiting]
                    eng._refill(reqs)
                    taken = len(waiting) - len(reqs)
                    waiting = waiting[taken:]
                if all(st is None for st in eng._state):
                    continue
                import numpy as np

                toks, valids = eng._run_chunk()
                self._deliver(np.asarray(toks), np.asarray(valids),
                              eng._dtap["tap"])
