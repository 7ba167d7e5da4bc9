"""Online serving: asynchronous request intake + token streaming over the
continuous-batching DecodeEngine.

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
        self.tokens: List[int] = []
        self.done = threading.Event()
        self.cond = threading.Condition()
        self.error: Optional[str] = None

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


class GillRequestHandle(RequestHandle):
    """RequestHandle + the first [IMG] run's hidden states, set at
    completion (the GILLMapper / retrieval-head input)."""

    def __init__(self, uid, prompt_embs, max_new, min_word, img_scale,
                 temperature=0.0, top_p=1.0, seed=0):
        super().__init__(uid, [], max_new)
        self.prompt_embs = prompt_embs
        self.min_word = min_word
        self.img_scale = img_scale
        self.temperature = temperature
        self.top_p = top_p
        self.seed = seed
        self.img_hidden = None


class GillOnlineEngine:
    """Thread-owning front-end over GillDecodeEngine: asynchronous intake
    of FULL-GILL decode requests, chunk-boundary refill, per-token
    streaming of the valid prefix, and [IMG]-run hidden delivery at
    completion. Same contract as OnlineEngine, different decode semantics
    (see serve/gill_engine.py)."""

    def __init__(self, engine):
        self.eng = engine
        self._q: "queue.Queue[Optional[GillRequestHandle]]" = queue.Queue()
        self._uid = itertools.count()
        self._handles = {}
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="gill-serve-scheduler")
        self._thread.start()

    def submit(self, prompt_embs, num_words: int, *,
               min_word_tokens: int = 0, img_scale: float = 1.0,
               temperature: float = 0.0, top_p: float = 1.0,
               seed: int = 0) -> GillRequestHandle:
        if self._stop:
            raise RuntimeError("engine closed")
        eng = self.eng
        if temperature > 0 and not eng.sampling:
            raise ValueError("temperature > 0 needs an engine built with "
                             "sampling=True")
        budget = num_words + (eng.nt - 1)
        if prompt_embs.shape[0] + budget + 1 > eng.max_seq:
            raise ValueError(
                f"{prompt_embs.shape[0]}+{budget}+1 exceeds max_seq "
                f"{eng.max_seq}")
        h = GillRequestHandle(next(self._uid), prompt_embs, num_words,
                              min_word_tokens, img_scale, temperature,
                              top_p, seed)
        self._handles[h.uid] = h
        self._q.put(h)
        return h

    def close(self):
        self._stop = True
        self._q.put(None)
        self._thread.join()

    def _drain_queue(self, waiting, block: bool):
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

    def _deliver(self, toks, valids, tap_dev):
        """Fold one chunk's rows into slot states; stream each request's
        VALID token prefix; finish slots whose budget is collected."""
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
            for r in range(lo, toks.shape[0]):
                if len(st.generated) >= st.budget:
                    break
                st.generated.append(int(toks[r, s]))
                st.valid.append(bool(valids[r, s]))
            v = np.asarray(st.valid, bool)
            n_valid = int(v.cumprod().sum())
            if n_valid > len(h.tokens):
                with h.cond:
                    h.tokens = [int(t) for t in st.generated[:n_valid]]
                    h.cond.notify_all()
            if len(st.generated) >= st.budget:
                if tap_host is None:
                    tap_host = np.asarray(tap_dev)
                eng._state[s] = None
                self._handles.pop(st.uid)
                eng.stats["tokens_out"] += n_valid
                with h.cond:
                    h.tokens = [int(t) for t in st.generated[:n_valid]]
                    h.img_hidden = tap_host[s].copy()
                    h.done.set()
                    h.cond.notify_all()

    def _loop(self):
        import numpy as np

        from gill_tpu.serve.gill_engine import GillServeRequest

        eng = self.eng
        with eng._ctx():
            eng._dstate, eng._dtap = eng._fresh_state()
            eng._state = [None] * eng.slots
            waiting = []
            while True:
                idle = (not waiting
                        and all(st is None for st in eng._state))
                self._drain_queue(waiting, block=idle)
                if self._stop:
                    break
                if waiting:
                    reqs = [GillServeRequest(
                        uid=h.uid, embs=h.prompt_embs,
                        num_words=h.max_new,
                        min_word_tokens=h.min_word,
                        img_scale=h.img_scale,
                        temperature=h.temperature, top_p=h.top_p,
                        seed=h.seed) for h in waiting]
                    eng._refill(reqs)
                    taken = len(waiting) - len(reqs)
                    waiting = waiting[taken:]
                if all(st is None for st in eng._state):
                    continue
                (eng.cache, eng._dstate, eng._dtap, toks,
                 valids) = eng._chunk_fn(eng.params, eng.cache,
                                         eng._dstate, eng._dtap)
                eng.stats["chunks"] += 1
                eng.stats["decode_steps"] += eng.chunk
                self._deliver(np.asarray(toks), np.asarray(valids),
                              eng._dtap["tap"])
        for h in list(self._handles.values()):
            with h.cond:
                h.error = "engine closed"
                h.done.set()
                h.cond.notify_all()
        self._handles.clear()


class OnlineEngine:
    """Thread-owning front-end over DecodeEngine for online serving."""

    def __init__(self, engine: DecodeEngine):
        self.eng = engine
        self._q: "queue.Queue[Optional[RequestHandle]]" = queue.Queue()
        self._uid = itertools.count()
        self._handles = {}
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="gill-serve-scheduler")
        self._thread.start()

    def submit(self, prompt: List[int], max_new_tokens: int) -> RequestHandle:
        if self._stop:
            raise RuntimeError("engine closed")
        if len(prompt) + max_new_tokens > self.eng.max_seq:
            raise ValueError(
                f"{len(prompt)}+{max_new_tokens} exceeds max_seq "
                f"{self.eng.max_seq}")
        h = RequestHandle(next(self._uid), list(prompt), max_new_tokens)
        self._handles[h.uid] = h
        self._q.put(h)
        return h

    def close(self):
        self._stop = True
        self._q.put(None)
        self._thread.join()

    # -- scheduler thread ---------------------------------------------------

    def _drain_queue(self, waiting: List[RequestHandle], block: bool):
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
                    h.tokens = list(st.generated)
                    h.cond.notify_all()
        for uid, gen in fin:
            h = self._handles.pop(uid)
            eng.stats["tokens_out"] += len(gen)
            with h.cond:
                h.tokens = list(gen)
                h.done.set()
                h.cond.notify_all()

    def _loop(self):
        eng = self.eng
        with eng._ctx():
            eng._dstate = eng._fresh_state()
            eng._state = [None] * eng.slots
            eng._finished = []
            waiting: List[RequestHandle] = []
            while True:
                idle = (not waiting
                        and all(st is None for st in eng._state))
                self._drain_queue(waiting, block=idle)
                if self._stop:
                    break
                if waiting:
                    reqs = [ServeRequest(uid=h.uid, prompt=h.prompt,
                                         max_new_tokens=h.max_new)
                            for h in waiting]
                    eng._refill(reqs)
                    taken = len(waiting) - len(reqs)
                    waiting = waiting[taken:]
                if all(st is None for st in eng._state):
                    continue
                eng.cache, eng._dstate, toks = eng._chunk_fn(
                    eng.params, eng.cache, eng._dstate)
                eng.stats["chunks"] += 1
                eng.stats["decode_steps"] += eng.chunk
                import numpy as np

                eng._collect(np.asarray(toks))
                self._deliver()
        # fail any leftovers so nobody blocks forever
        for h in list(self._handles.values()):
            with h.cond:
                h.error = "engine closed"
                h.done.set()
                h.cond.notify_all()
        self._handles.clear()
