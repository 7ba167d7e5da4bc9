"""Cross-request Stable-Diffusion batching for the serving path.

The reference batches ≤8 latents per REQUEST (custom_sd.py:626-651); under
concurrent serving (/v1/gill) each request's denoise would serialize on
the one device. This queue coalesces concurrent generation jobs into one
CFG denoise batch: while the device runs one batch, arrivals accumulate
and form the next — no artificial linger, so a lone request still starts
immediately.

Per-request determinism is preserved: the SUBMITTER draws its initial
latents from its own rng (exactly the array StableDiffusionPipeline
would draw internally, pipeline.py:149-151), so a job's images match the
unbatched path regardless of which jobs it shares a batch with.

Batches only coalesce jobs with identical (guidance_scale, steps, H, W)
— the denoise program is compiled per those statics — and the latent
count is padded up to a power-of-two bucket (compile 1/2/4/8 variants
once, not one per occupancy)."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class _Job:
    __slots__ = ("embs", "latents", "guidance", "steps", "n", "future")

    def __init__(self, embs, latents, guidance, steps):
        self.embs = embs                    # (n, 77, 768)
        self.latents = latents              # (n, h, w, 4) pre-sigma
        self.guidance = float(guidance)
        self.steps = int(steps)
        self.n = embs.shape[0]
        self.future: "Future" = Future()

    def key(self):
        return (self.guidance, self.steps, self.latents.shape[1:])


class SDBatchQueue:
    """submit() returns a Future of (n, H, W, 3) float32 images in [0,1].

    One worker thread owns the pipeline (single device touch point);
    handler threads block on their futures."""

    def __init__(self, sd_pipe, *, max_batch: int = 8,
                 linger_s: float = 0.010,
                 default_size: Optional[int] = None):
        self.pipe = sd_pipe
        self.max_batch = max_batch
        # Short gather window after the first job: clients that were
        # served in the PREVIOUS batch resubmit within ~1 ms of their
        # future resolving, but the worker reaches _gather first — without
        # the linger a 4-client steady state alternates batches {1},{3}
        # instead of {4} (measured: 1.09x vs serialized; with linger
        # ~1.5x). 10 ms against a multi-second denoise is noise.
        self.linger_s = linger_s
        self._q: "queue.Queue[Optional[_Job]]" = queue.Queue()
        self._pending: List[_Job] = []      # head-of-line incompatible jobs
        self._lock = threading.Lock()
        self._stop = False
        self.stats = {"jobs": 0, "batches": 0, "latents": 0,
                      "padded_latents": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="sd-batch-queue")
        self._thread.start()

    # -- client side --------------------------------------------------------

    def submit(self, prompt_embeds, *, guidance_scale: float = 7.5,
               num_inference_steps: int = 50, rng=None,
               latents=None) -> "Future":
        """prompt_embeds (n, 77, 768) with n <= max_batch (the reference's
        per-request cap; callers chunk larger requests). latents may be
        passed explicitly; otherwise drawn from rng exactly as the
        pipeline would draw them."""
        with self._lock:
            if self._stop:
                raise RuntimeError("SDBatchQueue closed")
        embs = jnp.asarray(prompt_embeds)
        n = embs.shape[0]
        assert 1 <= n <= self.max_batch, (n, self.max_batch)
        if latents is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            size = self.pipe.cfg.default_size
            h = w = size // self.pipe.cfg.vae_scale
            latents = jax.random.normal(
                rng, (n, h, w, self.pipe.latent_channels), jnp.float32)
        job = _Job(embs, jnp.asarray(latents), guidance_scale,
                   num_inference_steps)
        self._q.put(job)
        return job.future

    def close(self):
        with self._lock:
            if self._stop:
                return
            self._stop = True
        self._q.put(None)
        self._thread.join()

    # -- worker side ----------------------------------------------------------

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, cap)

    def _gather(self):
        """Block for one job, then coalesce every ALREADY-QUEUED compatible
        job up to max_batch. Incompatible jobs stay in arrival order for
        the next batch (no starvation: _pending drains first)."""
        if self._pending:
            first = self._pending.pop(0)
        else:
            first = self._q.get()
            if first is None:
                return None
        import time as _t

        batch = [first]
        n = first.n
        keep: List[_Job] = []
        # drain pending leftovers first, then the queue (with a short
        # linger so same-cycle resubmitters make this batch)
        scan = self._pending
        self._pending = []
        deadline = _t.monotonic() + self.linger_s
        while n < self.max_batch:
            if scan:
                job = scan.pop(0)
            else:
                try:
                    wait = deadline - _t.monotonic()
                    if wait > 0:
                        job = self._q.get(timeout=wait)
                    else:
                        job = self._q.get_nowait()
                except queue.Empty:
                    break
                if job is None:
                    # re-post the sentinel for the outer loop
                    self._q.put(None)
                    break
            if job.key() == first.key() and n + job.n <= self.max_batch:
                batch.append(job)
                n += job.n
            else:
                keep.append(job)
        self._pending = keep + self._pending
        return batch

    def _loop(self):
        while True:
            batch = self._gather()
            if batch is None:
                for job in self._pending:
                    job.future.set_exception(RuntimeError("queue closed"))
                return
            try:
                self._run_batch(batch)
            except Exception as e:  # containment: fail the batch, keep serving
                for job in batch:
                    if not job.future.done():
                        job.future.set_exception(e)

    def _run_batch(self, batch: List[_Job]):
        embs = jnp.concatenate([j.embs for j in batch], axis=0)
        lats = jnp.concatenate([j.latents for j in batch], axis=0)
        n = embs.shape[0]
        nb = self._bucket(n, self.max_batch)
        if nb > n:   # pad rows re-denoise row 0; sliced off before delivery
            embs = jnp.concatenate(
                [embs, jnp.broadcast_to(embs[:1], (nb - n,) + embs.shape[1:])])
            lats = jnp.concatenate(
                [lats, jnp.broadcast_to(lats[:1], (nb - n,) + lats.shape[1:])])
        first = batch[0]
        images = self.pipe(prompt_embeds=embs, latents=lats,
                           guidance_scale=first.guidance,
                           num_inference_steps=first.steps)
        images = np.asarray(images[:n])
        self.stats["jobs"] += len(batch)
        self.stats["batches"] += 1
        self.stats["latents"] += n
        self.stats["padded_latents"] += nb
        i = 0
        for job in batch:
            job.future.set_result(images[i: i + job.n])
            i += job.n

    def warmup(self, buckets=(1, 2, 4, 8), *, guidance_scale: float = 7.5,
               num_inference_steps: int = 50):
        """Precompile the denoise program for each occupancy bucket so the
        first live batch of any size doesn't compile inside a request."""
        size = self.pipe.cfg.default_size
        h = w = size // self.pipe.cfg.vae_scale
        for b in buckets:
            if b > self.max_batch:
                continue
            embs = jnp.zeros((b, 77, self.pipe.cfg.unet.cross_attention_dim),
                             jnp.float32)
            lats = jnp.zeros((b, h, w, self.pipe.latent_channels),
                             jnp.float32)
            jax.block_until_ready(self.pipe(
                prompt_embeds=embs, latents=lats,
                guidance_scale=guidance_scale,
                num_inference_steps=num_inference_steps))
