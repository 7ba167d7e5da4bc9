"""GILL-TPU training CLI.

Parity target: the reference trainer (main.py) — same flags, same loss
recipe, same logging surface — re-architected as a single pjit-compiled SPMD
step over a ("data","model") mesh instead of mp.spawn + DDP + NCCL.

Example (CPU smoke config, mirroring reference README.md:107-115):
  python main.py --opt-version facebook/opt-125m \
      --visual-model openai/clip-vit-base-patch16 \
      --dataset cc3m --val-dataset cc3m --dataset-dir datasets \
      --image-dir data/ --exp-name smoke --precision fp32 \
      --batch-size 2 --val-batch-size 2 --epochs 2 \
      --steps-per-epoch 2 --val-steps-per-epoch 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser(description="GILL-TPU training")
    p.add_argument("--opt-version", default="facebook/opt-6.7b")
    p.add_argument("--visual-model", default="openai/clip-vit-large-patch14")
    p.add_argument("--num-tokens", default=8, type=int)
    p.add_argument("--num-clip-tokens", default=77, type=int)
    p.add_argument("-d", "--dataset", default="cc3m")
    p.add_argument("--val-dataset", default="cc3m")
    p.add_argument("--dataset-dir", default="datasets")
    p.add_argument("--image-dir", default="data/")
    p.add_argument("--log-base-dir", default="./runs")
    p.add_argument("--exp-name", default="gill_tpu")
    p.add_argument("-j", "--workers", default=2, type=int)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--steps-per-epoch", dest="steps_per_epoch", default=2000,
                   type=int)
    p.add_argument("--steps_per_epoch", dest="steps_per_epoch", type=int,
                   help=argparse.SUPPRESS)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--val-steps-per-epoch", dest="val_steps_per_epoch",
                   default=-1, type=int)
    p.add_argument("--val_steps_per_epoch", dest="val_steps_per_epoch",
                   type=int, help=argparse.SUPPRESS)
    p.add_argument("-b", "--batch-size", default=200, type=int)
    p.add_argument("--val-batch-size", default=None, type=int)
    p.add_argument("--lr", "--learning-rate", default=1e-3, type=float)
    p.add_argument("--lr-warmup-steps", default=2000, type=int)
    p.add_argument("--lr-schedule-step-size", dest="lr_schedule_step_size",
                   default=5, type=int)
    p.add_argument("--lr-schedule-gamma", dest="lr_schedule_gamma",
                   default=0.1, type=float)
    p.add_argument("--grad-accumulation-steps", default=1, type=int)
    p.add_argument("--grad-clip", default=1.0, type=float)
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--frozen-lm-precision", default=None,
                   choices=["bf16", "fp32", "w8"],
                   help="override the frozen LM's precision; 'w8' stores "
                        "the frozen decoder as per-channel int8 (halved "
                        "HBM: OPT-6.7B fits one 16GB chip for training) — "
                        "matmuls dequantize in-flight and gradients flow "
                        "through to the adapters unchanged")
    p.add_argument("--cap-loss-scale", default=1.0, type=float)
    p.add_argument("--ret-loss-scale", default=1.0, type=float)
    p.add_argument("--gen-loss-scale", default=1.0, type=float)
    p.add_argument("--concat-captions-prob", default=0.5, type=float)
    p.add_argument("--input-prompt", default="A picture of")
    p.add_argument("--image-size", default=224, type=int)
    p.add_argument("--ret-emb-dim", default=256, type=int)
    p.add_argument("--gen-emb-dim", default=768, type=int)
    p.add_argument("--text-fc-mode", default="gill_mapper",
                   choices=["linear", "gill_mapper"])
    p.add_argument("--ret-text-fc-mode", default="linear",
                   choices=["linear", "gill_mapper"])
    p.add_argument("--max-len", default=32, type=int)
    p.add_argument("--n-visual-tokens", default=4, type=int)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--beta2", default=0.95, type=float)
    p.add_argument("--wd", "--weight-decay", dest="weight_decay",
                   default=0.01, type=float)
    p.add_argument("-p", "--print-freq", default=10, type=int)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("--seed", default=None, type=int)
    # TPU-native replacements for the reference's distributed flags
    p.add_argument("--dp-size", default=-1, type=int,
                   help="data-parallel mesh size (-1 = all devices / tp)")
    p.add_argument("--tp-size", default=1, type=int,
                   help="tensor-parallel mesh size over the frozen LM")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize frozen-LM layers in the train step "
                        "(needed for opt-6.7b on 16GB chips)")
    p.add_argument("--weights-dir", default=None,
                   help="root dir with local HF checkpoints for frozen "
                        "backbones (else $GILL_TPU_WEIGHTS_DIR, else random)")
    p.add_argument("--tokenizer-dir", default=None,
                   help="dir with vocab.json/merges.txt (else "
                        "$GILL_TPU_TOKENIZER_DIR, else tiny byte-level)")
    p.add_argument("--platform", default=None,
                   help="force jax platform, e.g. cpu")
    p.add_argument("--profile-steps", default=0, type=int,
                   help="capture a jax.profiler trace of the first N steps")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (TPU pods; "
                        "replaces the reference's NCCL rendezvous)")
    p.add_argument("--ckpt-backend", default="npz",
                   choices=("npz", "orbax"),
                   help="checkpoint format: npz = single-host trainable "
                        "pytree (default); orbax = sharding-aware "
                        "collective save/restore for multi-host runs")
    return p.parse_args(argv)


def dump_git_status(out_path: str):
    """Run provenance (reference utils.py:16-21)."""
    try:
        with open(out_path, "w") as f:
            for cmd in ("git rev-parse HEAD", "git --no-pager diff --stat"):
                f.write(subprocess.run(
                    cmd.split(), capture_output=True, text=True).stdout)
    except Exception:
        pass


def build_tokenizer(args):
    from gill_tpu.tokenizer import (GPT2BPETokenizer, load_tokenizer,
                                    setup_gill_tokenizer)

    try:
        tok = load_tokenizer(args.tokenizer_dir or args.opt_version)
    except FileNotFoundError:
        print("WARNING: no tokenizer assets found; using tiny byte-level "
              "tokenizer (fine for smoke runs).", flush=True)
        tok = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tok, args.num_tokens)
    assert img_ids == list(range(img_ids[0], img_ids[0] + args.num_tokens))
    return tok, img_ids


def main(argv):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    if args.multihost:
        jax.distributed.initialize()
    import jax.numpy as jnp

    from gill_tpu.config import GILLConfig, TrainConfig
    from gill_tpu.data.dataset import DataLoader, get_dataset
    from gill_tpu.models.gill import GILLCore
    from gill_tpu.nn.core import cast_tree, param_count
    from gill_tpu.parallel import create_mesh, param_shardings
    from gill_tpu.parallel.partition import batch_sharding, replicated
    from gill_tpu.train.trainer import init_state, make_train_step, TrainState
    from gill_tpu.train.validate import validate
    from gill_tpu.utils import ckpt as ckpt_utils
    from gill_tpu.utils.meters import AverageMeter, ProgressMeter
    from gill_tpu.weights import loader as wloader

    # ---- log dir (collision-free; reference main.py:176-188) ----
    # Rank 0 picks + creates the dir (makedirs is the atomic claim — the
    # exists()/makedirs pair alone is a race under concurrent launches);
    # other processes reuse the un-suffixed path and write nothing, like
    # the reference's is_main_process gating.
    log_dir = os.path.join(args.log_base_dir, args.exp_name)
    if jax.process_index() == 0:
        i = 1
        while True:
            try:
                os.makedirs(log_dir)
                break
            except FileExistsError:
                log_dir = os.path.join(args.log_base_dir,
                                       f"{args.exp_name}_{i}")
                i += 1
        with open(os.path.join(log_dir, "args.json"), "w") as f:
            json.dump(vars(args), f, indent=4)
        dump_git_status(os.path.join(log_dir, "git_info.txt"))
        print(f"Logging to {log_dir}.", flush=True)
    if jax.process_count() > 1:
        # Rank 0 may have suffixed the dir (collision dedup above); the
        # orbax backend saves COLLECTIVELY from every process, so all ranks
        # must agree on the path. Broadcast it (null-padded utf-8).
        from jax.experimental import multihost_utils

        buf = np.zeros(1024, np.uint8)
        enc = log_dir.encode()
        assert len(enc) <= buf.size, log_dir
        if jax.process_index() == 0:
            buf[: len(enc)] = np.frombuffer(enc, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        log_dir = bytes(buf[buf != 0]).decode()

    if args.seed is not None:
        np.random.seed(args.seed)

    # ---- tokenizer + [IMG] tokens (reference main.py:255-280) ----
    tokenizer, img_ids = build_tokenizer(args)

    # ---- model config; persist model_args.json (main.py:283-284) ----
    cfg = GILLConfig(
        opt_version=args.opt_version, visual_encoder=args.visual_model,
        n_visual_tokens=args.n_visual_tokens, ret_emb_dim=args.ret_emb_dim,
        gen_emb_dim=args.gen_emb_dim, text_fc_mode=args.text_fc_mode,
        ret_text_fc_mode=args.ret_text_fc_mode, num_tokens=args.num_tokens,
        num_clip_tokens=args.num_clip_tokens, max_len=args.max_len,
        retrieval_token_idx=tuple(img_ids), gen_token_idx=tuple(img_ids),
        image_size=args.image_size)
    if jax.process_index() == 0:
        cfg.to_json(os.path.join(log_dir, "model_args.json"))

    core = GILLCore.build(cfg, vocab_len=len(tokenizer), img_start=img_ids[0],
                          pad_token_id=tokenizer.pad_token_id,
                          bos_token_id=tokenizer.bos_token_id)

    tc = TrainConfig(
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        val_steps_per_epoch=args.val_steps_per_epoch,
        batch_size=args.batch_size, val_batch_size=args.val_batch_size,
        lr=args.lr, lr_warmup_steps=args.lr_warmup_steps,
        lr_schedule_step_size=args.lr_schedule_step_size,
        lr_schedule_gamma=args.lr_schedule_gamma,
        grad_accumulation_steps=args.grad_accumulation_steps,
        grad_clip=args.grad_clip, precision=args.precision,
        cap_loss_scale=args.cap_loss_scale, ret_loss_scale=args.ret_loss_scale,
        gen_loss_scale=args.gen_loss_scale,
        concat_captions_prob=args.concat_captions_prob,
        input_prompt=args.input_prompt, max_len=args.max_len,
        beta1=args.beta1, beta2=args.beta2, weight_decay=args.weight_decay,
        print_freq=args.print_freq, seed=args.seed,
        dp_size=args.dp_size, tp_size=args.tp_size, remat=args.remat)

    # ---- frozen backbones + adapters ----
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    lm = wloader.load_opt(args.opt_version, core.opt_cfg, len(tokenizer),
                          args.weights_dir)
    vision = wloader.load_clip_vision(args.visual_model, core.vis_cfg,
                                      args.weights_dir)
    frozen = cast_tree({"lm": lm, "vision": vision}, dtype)
    if args.frozen_lm_precision == "w8":
        if args.tp_size > 1:
            raise SystemExit("--frozen-lm-precision w8 is a single-chip/"
                             "DP memory lever; use bf16 with --tp-size>1")
        from gill_tpu.models import opt as opt_mod

        frozen["lm"] = opt_mod.quantize_params_w8(
            cast_tree(frozen["lm"], jnp.bfloat16))
    elif args.frozen_lm_precision in ("bf16", "fp32"):
        frozen["lm"] = cast_tree(
            frozen["lm"], jnp.bfloat16 if args.frozen_lm_precision == "bf16"
            else jnp.float32)
    adapters = core.init_adapters(jax.random.PRNGKey(args.seed or 0))

    n_train = param_count(adapters)
    n_frozen = param_count(frozen)
    report = (f"Trainable params: {n_train:,}\n"
              f"Frozen params:   {n_frozen:,}\n")
    print(report, flush=True)
    if jax.process_index() == 0:
        with open(os.path.join(log_dir, "param_count.txt"), "w") as f:
            f.write(report)

    # ---- mesh + shardings (auto-shrink DP to divide the batch) ----
    n_dev = len(jax.devices())
    tp = max(1, tc.tp_size)
    if tp > n_dev:
        raise SystemExit(
            f"--tp-size {tp} exceeds the {n_dev} available device(s)")
    dp = tc.dp_size if tc.dp_size > 0 else n_dev // tp
    while dp > 1 and (tc.batch_size % dp != 0 or dp * tp > n_dev):
        dp -= 1
    mesh = create_mesh(dp, tp, devices=jax.devices()[: dp * tp])
    print(f"Mesh: {mesh}", flush=True)
    frozen = jax.device_put(frozen, param_shardings(mesh, frozen))
    state = init_state(core, tc, adapters)
    state = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: replicated(mesh), state,
        is_leaf=lambda x: hasattr(x, "shape")))

    best_acc1 = -1.0
    if args.resume:
        if (args.ckpt_backend == "orbax"
                or ckpt_utils.latest_orbax_step(args.resume) is not None):
            # Collective sharded restore: arrays land directly on their
            # mesh shardings (each host reads only the shards it owns) —
            # the fresh `state` above provides the target placement.
            tree, meta = ckpt_utils.load_checkpoint_orbax(
                args.resume, target={"adapters": state.adapters,
                                     "opt_state": state.opt_state})
            state = TrainState(adapters=tree["adapters"],
                               opt_state=tree["opt_state"],
                               step=jnp.asarray(meta["step"], jnp.int32))
        else:
            tree, meta = ckpt_utils.load_checkpoint(args.resume)
            state = TrainState(
                adapters=jax.tree_util.tree_map(jnp.asarray,
                                                tree["adapters"]),
                opt_state=jax.tree_util.tree_map(jnp.asarray,
                                                 tree["opt_state"]),
                step=jnp.asarray(meta["step"], jnp.int32))
            state = jax.device_put(state, jax.tree_util.tree_map(
                lambda _: replicated(mesh), state,
                is_leaf=lambda x: hasattr(x, "shape")))
        args.start_epoch = meta.get("epoch", 0)
        best_acc1 = meta.get("best_acc1", -1.0)
        print(f"Resumed from {args.resume} @ epoch {args.start_epoch}.")

    # ---- data ----
    train_ds = get_dataset(args, "train", tokenizer, img_ids)
    val_ds = get_dataset(args, "val", tokenizer, img_ids)
    print(f"Training with {len(train_ds)} examples, validating with "
          f"{len(val_ds)}.", flush=True)
    # Per-host interleaved shard (DistributedSampler equivalent); with one
    # process rank=0/world=1.
    rank, world = jax.process_index(), jax.process_count()
    per_host = tc.batch_size // world
    train_loader = DataLoader(train_ds, per_host, shuffle=True,
                              seed=args.seed or 0, num_threads=args.workers,
                              rank=rank, world=world)
    # drop_last=False: leftover val samples still count (the reference uses
    # an auxiliary loader for the sampler remainder, validate.py:311-317).
    val_loader = DataLoader(val_ds, (tc.val_batch_size or tc.batch_size) // world,
                            shuffle=False, num_threads=args.workers,
                            rank=rank, world=world, drop_last=False)

    prefix_ids = np.asarray(
        tokenizer(args.input_prompt, add_special_tokens=False).input_ids,
        np.int32) if args.input_prompt else None

    # ---- TB writer (rank-0 only, like the reference's is_main_process
    # gating, main.py:299-303) ----
    writer = None
    if jax.process_index() == 0:
        # Pure-Python event writer (gill_tpu/utils/tb.py) — same on-disk
        # format the reference's torch SummaryWriter produces
        # (reference main.py:299-303), with no torch dependency.
        from gill_tpu.utils.tb import SummaryWriter

        writer = SummaryWriter(log_dir)

    step_fn = make_train_step(core, tc)
    b_shard = batch_sharding(mesh)

    def put_batch(batch):
        # Each process feeds its host-local shard; the global array spans the
        # mesh (the reference's DistributedSampler + per-GPU split,
        # main.py:204-237,318-320). With one process this is equivalent to a
        # plain device_put onto the batch sharding.
        return {k: jax.make_array_from_process_local_data(
                    b_shard, np.asarray(v))
                for k, v in batch.items()
                if k not in ("path", "caption_img")}

    def run_validate(epoch):
        return validate(core, tc, state.adapters, frozen, val_loader,
                        tokenizer, epoch=epoch, writer=writer,
                        prefix_ids=prefix_ids,
                        max_steps=tc.val_steps_per_epoch,
                        decode_captions=True, put_batch=put_batch)

    if args.evaluate:
        run_validate(args.start_epoch)
        return

    with jax.sharding.set_mesh(mesh):
        for epoch in range(args.start_epoch, tc.epochs):
            if epoch == 0:
                run_validate(epoch - 1)
            train_loader.set_epoch(epoch)
            # Per-EPOCH concat-decision stream (not one stateful stream
            # across epochs): a resumed run replays the identical decisions
            # for its epochs, keeping --resume trajectories bit-consistent
            # with uninterrupted runs (reference resume semantics,
            # main.py:347-367).
            rng = np.random.RandomState(
                ((args.seed or 0) + 1000003 * (epoch + 1)) % (2 ** 31))

            meters = {k: AverageMeter(k, ":.4e") for k in
                      ("loss", "cap_ce", "cont_loss", "gen_l2")}
            acc_meters = {k: AverageMeter(k, ":6.2f") for k in
                          ("cap_top1", "cap_top5", "t2i_top1", "i2t_top1")}
            batch_time = AverageMeter("time/batch", ":6.3f")
            data_time = AverageMeter("time/data", ":6.3f")
            progress = ProgressMeter(
                tc.steps_per_epoch,
                [batch_time, *meters.values(), *acc_meters.values()],
                prefix=f"Epoch: [{epoch}]")

            it = iter(train_loader)
            end = time.time()
            # Metric sums accumulate ON DEVICE every step (scalar adds are
            # ~free and don't force a host sync); the host fetches the sums
            # once per print window and logs true window AVERAGES — matching
            # the reference's every-step meter updates (main.py:628-651)
            # without a 30ms device->host round-trip per step.
            msum, mcount = None, 0
            win_t0 = time.time()
            for i in range(tc.steps_per_epoch):
                try:
                    batch = next(it)
                except StopIteration:
                    train_loader.set_epoch(epoch * 1000 + i)
                    it = iter(train_loader)
                    batch = next(it)
                data_time.update(time.time() - end)
                concat = bool(rng.uniform() < tc.concat_captions_prob) and \
                    (tc.batch_size % 2 == 0)
                actual_step = epoch * tc.steps_per_epoch + i + 1
                # relative to THIS run's second executed step, so --resume
                # + --profile-steps still traces (absolute step 2 is long
                # gone on a resumed run)
                run_step = ((epoch - args.start_epoch)
                            * tc.steps_per_epoch + i + 1)
                if args.profile_steps and run_step == 2:
                    jax.profiler.start_trace(os.path.join(log_dir, "trace"))
                state, metrics = step_fn(state, frozen, put_batch(batch),
                                         concat=concat)
                viz = metrics.pop("_viz", None)
                msum = metrics if msum is None else jax.tree_util.tree_map(
                    jnp.add, msum, metrics)
                mcount += 1
                if args.profile_steps and \
                        run_step == 1 + args.profile_steps:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                if actual_step == 1 or (i + 1) % tc.print_freq == 0:
                    # TB image grids: (input | GT caption | predicted caption)
                    # plus t2i / i2t retrieval mosaics
                    # (reference main.py:675-720).
                    if writer is not None and "pixels" in batch:
                        from gill_tpu.utils.image import (CLIP_MEAN, CLIP_STD,
                                                          caption_grid,
                                                          make_grid)

                        nshow = 16
                        px = np.asarray(batch["pixels"])
                        px = np.clip(px * CLIP_STD + CLIP_MEAN, 0, 1)
                        gt_caps = [tokenizer.decode(row)
                                   for row in np.asarray(batch["ret_tokens"])]
                        if viz is not None:
                            from gill_tpu.parallel.partition import \
                                host_local_rows

                            # multi-controller: the step's viz outputs are
                            # batch-sharded; rank 0 renders its local rows
                            pred = host_local_rows(viz["pred_tokens"])[:nshow]
                            pred_caps = [tokenizer.decode(row) for row in pred]
                            if len(pred_caps) < len(px):
                                # concat-packed step: each packed row covers
                                # two examples (reference main.py:697-699).
                                pred_caps = [c for c in pred_caps for _ in
                                             (0, 1)]
                            grid = caption_grid(px[:nshow], gt_caps[:nshow],
                                                pred_caps[:nshow])
                            writer.add_image("train/images_gen_cap",
                                             grid.transpose(2, 0, 1),
                                             actual_step)
                            # Retrieval mosaics: the image each caption
                            # retrieved, and the caption each image retrieved.
                            t2i = host_local_rows(viz["t2i_idx"]) % len(px)
                            grid = caption_grid(px[t2i[:nshow]],
                                                gt_caps[:nshow], None)
                            writer.add_image("train/t2i_ret",
                                             grid.transpose(2, 0, 1),
                                             actual_step)
                            i2t = host_local_rows(viz["i2t_idx"]) % len(gt_caps)
                            grid = caption_grid(
                                px[:nshow],
                                [gt_caps[j] for j in i2t[:nshow]], None)
                            writer.add_image("train/i2t_ret",
                                             grid.transpose(2, 0, 1),
                                             actual_step)
                        else:
                            grid = make_grid(px[:nshow], nrow=4)
                            writer.add_image("train/images",
                                             grid.transpose(2, 0, 1),
                                             actual_step)
                    # float() blocks until every step in the window has
                    # actually executed, so the wall-clock delta / steps is an
                    # honest secs-per-batch under async dispatch.
                    window = {k: float(v) / mcount for k, v in msum.items()}
                    batch_time.update((time.time() - win_t0) / mcount, mcount)
                    msum, mcount = None, 0
                    win_t0 = time.time()
                    for k, m in meters.items():
                        m.update(window[k], tc.batch_size)
                    for k, m in acc_meters.items():
                        m.update(window[k], tc.batch_size)
                    progress.display(i + 1)
                    if writer is not None:
                        for k, v in window.items():
                            writer.add_scalar(f"train/{k}", v, actual_step)
                        writer.add_scalar(
                            "metrics/examples_per_sec",
                            tc.batch_size / max(batch_time.avg, 1e-9),
                            actual_step)
                        writer.add_scalar(
                            "metrics/total_secs_per_batch", batch_time.avg,
                            actual_step)
                end = time.time()

            acc1 = run_validate(epoch)
            is_best = acc1 > best_acc1
            best_acc1 = max(acc1, best_acc1)
            meta = {"epoch": epoch + 1, "best_acc1": float(best_acc1)}
            if args.ckpt_backend == "orbax":
                # collective: every process writes the shards it owns
                ckpt_utils.save_checkpoint_orbax(
                    {"adapters": state.adapters,
                     "opt_state": state.opt_state},
                    log_dir, step=int(state.step), meta=meta)
                if is_best and jax.process_index() == 0:
                    with open(os.path.join(log_dir, "orbax_best.json"),
                              "w") as f:
                        json.dump({"step": int(state.step), **meta}, f)
            elif jax.process_index() == 0:
                ckpt_utils.save_checkpoint(
                    {"adapters": jax.device_get(state.adapters),
                     "opt_state": jax.device_get(state.opt_state)},
                    log_dir, step=int(state.step), is_best=is_best,
                    meta=meta)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main(sys.argv[1:])
