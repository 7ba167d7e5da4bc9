"""Validation loop (parity target: reference gill/validate.py:18-343).

Per batch, all three modes run with the "A picture of" prefix; captioning
additionally greedy-decodes captions for BLEU-1..4; retrieval embeddings
accumulate across the whole val set for full-matrix top-1/5 in both
directions (the model-selection metric, validate.py:343). Loss metrics come
out of the SPMD eval step already globally reduced; only the (N, 256)
embedding accumulation and caption tokens need the reference's cross-rank
gathers (validate.py:94-155), done here with one process_allgather per
batch over each host's local rows.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.parallel.partition import host_local_rows
from gill_tpu.train.bleu import bleu_score
from gill_tpu.train.trainer import make_eval_step
from gill_tpu.utils.meters import AverageMeter, ProgressMeter


def _embed_for_caption_decode(core, params, pixels, prefix_ids):
    vis = core.get_visual_embs(params, pixels, "captioning")
    parts = [vis]
    if prefix_ids is not None and len(prefix_ids):
        pe = core.embed_tokens(params, jnp.asarray(prefix_ids)[None])
        parts.append(jnp.broadcast_to(
            pe, (vis.shape[0], pe.shape[1], pe.shape[2])).astype(vis.dtype))
    return jnp.concatenate(parts, axis=1)


def generate_caption_tokens(core, params, pixels, prefix_ids,
                            num_words: int = 32):
    """Greedy caption decode with the input prefix
    (reference validate.py:123-137). min_word_tokens == num_words so no
    [IMG] token can ever be sampled mid-caption (validate.py:124-126).
    Returns (B, S) int32 with pad at invalid positions."""
    embs = _embed_for_caption_decode(core, params, pixels, prefix_ids)
    out = core.generate(params, embs, num_words=num_words,
                        min_word_tokens=num_words, temperature=0.0,
                        max_img_runs=1)
    # host_local_rows: under a multi-controller mesh the generate outputs
    # are GLOBAL batch-sharded arrays (np.asarray would raise on
    # non-addressable shards); each host keeps its own rows and the caller's
    # process_allgather reassembles the global order.
    toks = host_local_rows(out["tokens"])
    valid = host_local_rows(out["valid"])
    return np.where(valid, toks, core.pad_token_id).astype(np.int32)


def decode_tokens(tokenizer, rows, strip_img_tokens: int = 0) -> list:
    """strip_img_tokens=N removes the literal [IMG0..N) strings after
    decode — the reference strips them from the BLEU ground-truth captions
    (gill/validate.py:230-232); skip_special_tokens does NOT cover
    add_tokens()-registered tokens, so without this every GT reference
    carries an unmatchable [IMG] tail and BLEU is deflated."""
    caps = [tokenizer.decode(r, skip_special_tokens=True) for r in rows]
    if strip_img_tokens:
        for i in range(strip_img_tokens):
            caps = [c.replace(f"[IMG{i}]", "") for c in caps]
        caps = [c.strip() for c in caps]
    return caps


def generate_captions(core, params, pixels, prefix_ids, tokenizer,
                      num_words: int = 32):
    toks = generate_caption_tokens(core, params, pixels, prefix_ids,
                                   num_words)
    return decode_tokens(tokenizer, toks)


# (core, tc, prefix) -> (core, tc, eval_step, ret_fn). Strong refs to the
# key objects keep their ids stable; without this cache every validate()
# call re-jits the eval step and retrieval forward (one full recompile per
# epoch).
_EVAL_FN_CACHE: dict = {}


def _get_eval_fns(core, tc, prefix_ids):
    key = (id(core), id(tc),
           tuple(int(x) for x in prefix_ids) if prefix_ids is not None
           else None)
    hit = _EVAL_FN_CACHE.get(key)
    if hit is not None and hit[0] is core and hit[1] is tc:
        return hit[2], hit[3]
    pj = jnp.asarray(prefix_ids) if prefix_ids is not None else None
    eval_step = make_eval_step(core, tc, prefix_ids=pj)
    ret_fn = jax.jit(lambda p, px, t, l: core.forward(
        p, px, t, l, mode="retrieval", prefix_ids=pj))
    _EVAL_FN_CACHE[key] = (core, tc, eval_step, ret_fn)
    return eval_step, ret_fn


def validate(core, tc, adapters, frozen, val_loader, tokenizer,
             epoch: int = 0, writer=None, prefix_ids=None,
             max_steps: Optional[int] = None,
             decode_captions: bool = True, put_batch=None) -> float:
    """`put_batch` maps a host-local numpy batch dict onto device arrays;
    multi-host callers pass main.py's globalizing put_batch (every process
    contributes its shard of one GLOBAL batch-sharded array — a bare
    jnp.asarray makes host-local arrays, which silently evaluates each
    host's shard as if it were the whole batch under a multi-controller
    mesh). Defaults to plain device puts for single-process runs."""
    eval_step, ret_fn = _get_eval_fns(core, tc, prefix_ids)
    if put_batch is None:
        def put_batch(batch):
            return {k: jnp.asarray(v) for k, v in batch.items()}

    meters = {k: AverageMeter(k, ":.4f") for k in
              ("loss", "cap_ce", "ret_ce", "gen_ce", "cont_loss", "gen_l2",
               "cap_top1", "cap_top5")}
    all_vis, all_txt = [], []
    gen_caps, gt_caps = [], []

    steps = max_steps if max_steps and max_steps > 0 else len(val_loader)
    progress = ProgressMeter(steps, list(meters.values()), prefix="Val: ")

    params = {"lm": frozen["lm"], "vision": frozen["vision"],
              "adapters": adapters}

    # Cross-process gathers replace the reference's per-batch NCCL
    # all_gathers (validate.py:94-155): every host sees the global embedding
    # set / caption tokens, so the full-val-set retrieval and BLEU metrics
    # are computed over the whole set on every host.
    world = jax.process_count()
    if world > 1:
        from jax.experimental import multihost_utils

        def gather(x):
            g = np.asarray(
                multihost_utils.process_allgather(host_local_rows(x)))
            return g.reshape((-1,) + g.shape[2:])
    else:
        gather = np.asarray

    for i, batch in enumerate(val_loader):
        if i >= steps:
            break
        paths = batch.pop("path", None)
        cap_imgs = batch.pop("caption_img", None)
        jb = put_batch(batch)
        metrics = eval_step(adapters, frozen, jb, concat=False)
        for k, m in meters.items():
            if k in metrics:
                m.update(float(metrics[k]), len(jb["ret_tokens"]))

        r = ret_fn(params, jb["pixels"], jb["ret_tokens"], jb["ret_len"])
        all_vis.append(gather(r["visual_embs"]).astype(np.float32))
        all_txt.append(gather(r["last_embedding"]).astype(np.float32))

        if decode_captions:
            toks = generate_caption_tokens(core, params, jb["pixels"],
                                           prefix_ids)
            nt = core.cfg.num_tokens
            batch_gen = decode_tokens(tokenizer, gather(toks))
            batch_gt = decode_tokens(tokenizer, gather(jb["ret_tokens"]),
                                     strip_img_tokens=nt)
            gen_caps.extend(batch_gen)
            gt_caps.extend(batch_gt)
            if i == 0 and writer is not None and jax.process_index() == 0:
                # Val caption grid: input | GT caption | generated caption
                # (reference validate.py:196-211).
                from gill_tpu.utils.image import (CLIP_MEAN, CLIP_STD,
                                                  caption_grid)

                px = np.clip(
                    host_local_rows(jb["pixels"]) * CLIP_STD + CLIP_MEAN,
                    0, 1)
                local_gen = decode_tokens(tokenizer, toks)
                local_gt = decode_tokens(tokenizer,
                                         host_local_rows(jb["ret_tokens"]),
                                         strip_img_tokens=nt)
                grid = caption_grid(px, local_gt, local_gen)
                writer.add_image("val/images_captioning",
                                 grid.transpose(2, 0, 1), epoch + 1)
        if i % 10 == 0:
            progress.display(i + 1)

    # Whole-val-set retrieval top-1/5 (reference validate.py:248-265).
    vis = np.concatenate(all_vis)
    txt = np.concatenate(all_txt)
    sims = vis @ txt.T
    n = sims.shape[0]
    order_i2t = np.argsort(-sims, axis=1)
    order_t2i = np.argsort(-sims.T, axis=1)
    tgt = np.arange(n)
    top1_i2t = float((order_i2t[:, 0] == tgt).mean() * 100)
    top5_i2t = float((order_i2t[:, :5] == tgt[:, None]).any(1).mean() * 100)
    top1_t2i = float((order_t2i[:, 0] == tgt).mean() * 100)
    top5_t2i = float((order_t2i[:, :5] == tgt[:, None]).any(1).mean() * 100)

    results: Dict[str, float] = {f"val/{k}": m.avg for k, m in meters.items()}
    results.update({
        "val/t2i_top1": top1_t2i, "val/t2i_top5": top5_t2i,
        "val/i2t_top1": top1_i2t, "val/i2t_top5": top5_i2t,
        "val/top1": (top1_t2i + top1_i2t) / 2,
        "val/top5": (top5_t2i + top5_i2t) / 2,
    })
    if gen_caps:
        b1, b2, b3, b4 = bleu_score(gen_caps, gt_caps)
        results.update({"val/bleu1": b1 * 100, "val/bleu2": b2 * 100,
                        "val/bleu3": b3 * 100, "val/bleu4": b4 * 100})
    if writer is not None:
        for k, v in results.items():
            writer.add_scalar(k, v, epoch + 1)
    print(" * " + "  ".join(f"{k}={v:.3f}" for k, v in results.items()),
          flush=True)
    # Model-selection metric (reference validate.py:343 returns the t2i top1).
    return results["val/t2i_top1"]
