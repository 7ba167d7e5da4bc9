"""SPMD training step: the reference's per-step work (main.py:462-607) as one
pjit-compiled program.

One step = 3 forwards (captioning / retrieval / generation) on the same
batch + combined loss + AdamW update of the adapter pytree only + [IMG]-row
renorm. The reference's DDP all-reduce, contrastive all_gather with local
overwrite (main.py:522-535), gradient masking (main.py:584-593) and host-side
renorm (main.py:602-607) all disappear: GSPMD inserts collectives over the
mesh, only adapters are differentiated, and the renorm is a fused device op.

Loss (main.py:480-563):
  total = cap_scale * CE_cap
        + ret_scale * (0.5 * CE_ret + (InfoNCE_t2i + InfoNCE_i2t) / 2)
        + gen_scale * (0.5 * CE_gen + mean L2(clip_emb, mapped))
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gill_tpu.config import TrainConfig
from gill_tpu.models.gill import GILLCore
from gill_tpu.train import losses as L


@dataclasses.dataclass
class TrainState:
    adapters: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.adapters, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def lr_schedule(tc: TrainConfig):
    """Linear warmup to tc.lr over lr_warmup_steps, then staircase decay by
    lr_schedule_gamma every lr_schedule_step_size * steps_per_epoch steps
    (reference main.py:342-344)."""
    warmup = optax.linear_schedule(0.0, tc.lr, tc.lr_warmup_steps)
    decay = optax.exponential_decay(
        tc.lr, transition_steps=tc.lr_schedule_step_size * tc.steps_per_epoch,
        decay_rate=tc.lr_schedule_gamma, staircase=True)
    return optax.join_schedules([warmup, decay], [tc.lr_warmup_steps])


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip) if tc.grad_clip > 0
        else optax.identity(),
        optax.adamw(lr_schedule(tc), b1=tc.beta1, b2=tc.beta2, eps=1e-8,
                    weight_decay=tc.weight_decay),
    )
    if tc.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, tc.grad_accumulation_steps)
    return tx


def init_state(core: GILLCore, tc: TrainConfig, adapters) -> TrainState:
    tx = make_optimizer(tc)
    return TrainState(adapters=adapters, opt_state=tx.init(adapters),
                      step=jnp.zeros((), jnp.int32))


def compute_losses(core: GILLCore, params, batch, tc: TrainConfig,
                   concat_captions: bool, prefix_ids=None) -> Tuple[jnp.ndarray, Dict]:
    """Runs all three modes and combines losses; returns (loss, metrics)."""
    pixels = batch["pixels"]
    metrics: Dict[str, jnp.ndarray] = {}
    total = 0.0

    # captioning
    cap = core.forward(params, pixels, batch["ret_tokens"], batch["ret_len"],
                       mode="captioning", concat_captions=concat_captions,
                       prefix_ids=prefix_ids, remat=tc.remat)
    top1, top5 = L.token_accuracy(cap["logits"][:, :-1], cap["full_labels"][:, 1:])
    ce_cap = cap["ce_loss"] * tc.cap_loss_scale
    total += ce_cap
    metrics.update(cap_ce=ce_cap, cap_top1=top1, cap_top5=top5,
                   vis_norm_cap=cap["visual_embs_norm"],
                   inp_norm=cap["input_embs_norm"])

    # Small viz extras for TB image grids (reference main.py:675-720):
    # predicted caption tokens and per-batch retrieval argmaxes. Device-side
    # argmaxes keep the host transfer to a few hundred ints per log window.
    nv = core.cfg.n_visual_tokens
    metrics["_viz"] = {
        "pred_tokens": jnp.argmax(
            cap["logits"][:, max(nv - 1, 0):-1], axis=-1).astype(jnp.int32),
    }

    # retrieval
    ret = core.forward(params, pixels, batch["ret_tokens"], batch["ret_len"],
                       mode="retrieval", concat_captions=concat_captions,
                       prefix_ids=prefix_ids, remat=tc.remat)
    ce_ret = ret["ce_loss"] * tc.ret_loss_scale * 0.5
    total += ce_ret
    # Global contrastive matrix; GSPMD all_gathers sharded embeddings.
    logits_per_image = ret["visual_embs"] @ ret["last_embedding"].T
    logits_per_text = logits_per_image.T
    cont = (L.contrastive_loss(logits_per_text)
            + L.contrastive_loss(logits_per_image)) / 2.0
    total += tc.ret_loss_scale * cont
    t2i1, t2i5 = L.contrastive_acc(logits_per_text, topk=(1, 5))
    i2t1, i2t5 = L.contrastive_acc(logits_per_image, topk=(1, 5))
    nb = pixels.shape[0]
    metrics["_viz"]["t2i_idx"] = jnp.argmax(
        logits_per_text[:nb, :nb], axis=-1).astype(jnp.int32)
    metrics["_viz"]["i2t_idx"] = jnp.argmax(
        logits_per_image[:nb, :nb], axis=-1).astype(jnp.int32)
    metrics.update(ret_ce=ce_ret, cont_loss=cont, t2i_top1=t2i1, t2i_top5=t2i5,
                   i2t_top1=i2t1, i2t_top5=i2t5,
                   vis_norm_ret=ret["visual_embs_norm"])

    # generation
    gen = core.forward(params, pixels, batch["gen_tokens"], batch["gen_len"],
                       mode="generation", concat_captions=concat_captions,
                       prefix_ids=prefix_ids, remat=tc.remat)
    ce_gen = gen["ce_loss"] * tc.gen_loss_scale * 0.5
    total += ce_gen
    mapped = gen["last_embedding"]
    clip_emb = batch["clip_emb"].astype(mapped.dtype)
    if mapped.shape != clip_emb.shape:
        mapped = mapped.reshape(clip_emb.shape)
    gen_l2 = L.l2_loss(clip_emb.astype(jnp.float32),
                       mapped.astype(jnp.float32)).mean() * tc.gen_loss_scale
    total += gen_l2
    metrics.update(gen_ce=ce_gen, gen_l2=gen_l2, loss=total)
    return total, metrics


def make_train_step(core: GILLCore, tc: TrainConfig, prefix_ids=None):
    """Returns step(state, frozen, batch, concat: static bool) -> (state, metrics).

    `frozen` = {"lm", "vision"} pytree; `state.adapters` is the trainable
    pytree. jit-compatible; shard inputs with parallel.partition and jit will
    run it SPMD over the mesh.
    """
    tx = make_optimizer(tc)

    @partial(jax.jit, static_argnames=("concat",), donate_argnums=(0,))
    def step(state: TrainState, frozen, batch, concat: bool = False):
        def loss_fn(adapters):
            params = {"lm": frozen["lm"], "vision": frozen["vision"],
                      "adapters": adapters}
            return compute_losses(core, params, batch, tc, concat, prefix_ids)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.adapters)
        updates, new_opt = tx.update(grads, state.opt_state, state.adapters)
        adapters = optax.apply_updates(state.adapters, updates)
        # [IMG]-row renorm to the frozen-row mean norm (main.py:602-607).
        params = {"lm": frozen["lm"], "vision": frozen["vision"],
                  "adapters": adapters}
        adapters = core.renorm_img_embeddings(params)["adapters"]
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = lr_schedule(tc)(state.step)
        metrics["img_emb_norm"] = jnp.linalg.norm(
            adapters["img_embeddings"].astype(jnp.float32), axis=1).mean()
        new_state = TrainState(adapters=adapters, opt_state=new_opt,
                               step=state.step + 1)
        return new_state, metrics

    return step


def make_eval_step(core: GILLCore, tc: TrainConfig, prefix_ids=None):
    @partial(jax.jit, static_argnames=("concat",))
    def step(adapters, frozen, batch, concat: bool = False):
        params = {"lm": frozen["lm"], "vision": frozen["vision"],
                  "adapters": adapters}
        _, metrics = compute_losses(core, params, batch, tc, concat, prefix_ids)
        return metrics

    return step
