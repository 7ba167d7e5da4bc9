"""End-to-end train step on an 8-device virtual mesh (DP x TP) — the
multi-device coverage the reference never had."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import CLIPVisionConfig, GILLConfig, OPTConfig, TrainConfig
from gill_tpu.models.gill import GILLCore
from gill_tpu.parallel import create_mesh, param_shardings
from gill_tpu.parallel.partition import batch_sharding, replicated
from gill_tpu.train.trainer import init_state, make_train_step, lr_schedule

OPT_TINY = OPTConfig(vocab_size=64, hidden_size=16, ffn_dim=32, num_layers=2,
                     num_heads=2, word_embed_proj_dim=16, max_positions=96)
VIS_TINY = CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                            num_heads=2, image_size=16, patch_size=8)
NUM_TOKENS = 4
VOCAB_LEN = 64 + 1 + NUM_TOKENS
IMG_START = 65
PAD, BOS = 1, 2


def make_core():
    cfg = GILLConfig(n_visual_tokens=2, num_tokens=NUM_TOKENS, num_clip_tokens=6,
                     ret_emb_dim=8, gen_emb_dim=12)
    return GILLCore(cfg=cfg, opt_cfg=OPT_TINY, vis_cfg=VIS_TINY,
                    vocab_len=VOCAB_LEN, img_start=IMG_START,
                    pad_token_id=PAD, bos_token_id=BOS)


def make_batch(b=8, t=12, seed=0):
    rng = np.random.RandomState(seed)
    tokens = np.full((b, t), PAD, np.int32)
    lens = []
    for i in range(b):
        n_words = rng.randint(1, t - NUM_TOKENS - 1)
        row = [BOS] + list(rng.randint(4, 60, n_words)) + list(
            range(IMG_START, IMG_START + NUM_TOKENS))
        tokens[i, : len(row)] = row
        lens.append(len(row))
    return {
        "pixels": jnp.asarray(rng.randn(b, 16, 16, 3).astype(np.float32)),
        "ret_tokens": jnp.asarray(tokens),
        "ret_len": jnp.asarray(np.array(lens, np.int32)),
        "gen_tokens": jnp.asarray(tokens),
        "gen_len": jnp.asarray(np.array(lens, np.int32)),
        "clip_emb": jnp.asarray(rng.randn(b, 6, 12).astype(np.float32)),
    }


@pytest.mark.parametrize("concat", [False, True])
def test_train_step_runs_and_learns(concat):
    core = make_core()
    tc = TrainConfig(lr=2e-3, lr_warmup_steps=2, steps_per_epoch=100,
                     grad_clip=1.0)
    params = core.init_params(jax.random.PRNGKey(0))
    frozen = {"lm": params["lm"], "vision": params["vision"]}
    state = init_state(core, tc, params["adapters"])
    step = make_train_step(core, tc)
    batch = make_batch()

    losses = []
    for _ in range(12):
        state, metrics = step(state, frozen, batch, concat=concat)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfits the fixed batch once past warmup noise
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # [IMG] rows renormed to frozen mean norm
    frozen_norm = np.linalg.norm(
        np.asarray(frozen["lm"]["embed_tokens"]["weight"])[: VOCAB_LEN - NUM_TOKENS],
        axis=1).mean()
    np.testing.assert_allclose(float(metrics["img_emb_norm"]), frozen_norm,
                               rtol=1e-4)


def test_train_step_sharded_mesh_matches_single_device():
    core = make_core()
    tc = TrainConfig(lr=1e-3, lr_warmup_steps=2, steps_per_epoch=10)
    params = core.init_params(jax.random.PRNGKey(0))
    frozen = {"lm": params["lm"], "vision": params["vision"]}
    batch = make_batch()

    fresh = lambda: jax.tree_util.tree_map(jnp.array, params["adapters"])

    # single device
    state1 = init_state(core, tc, fresh())
    step = make_train_step(core, tc)
    state1, m1 = step(state1, frozen, batch, concat=False)

    # 4x2 mesh: DP over data, TP over the frozen LM
    mesh = create_mesh(dp_size=4, tp_size=2)
    fro_sh = param_shardings(mesh, frozen)
    frozen_s = jax.device_put(frozen, fro_sh)
    state2 = init_state(core, tc, fresh())
    state2 = jax.device_put(state2, jax.tree_util.tree_map(
        lambda _: replicated(mesh), state2,
        is_leaf=lambda x: hasattr(x, "shape")))
    batch_s = jax.device_put(batch, jax.tree_util.tree_map(
        lambda _: batch_sharding(mesh), batch))
    with jax.sharding.set_mesh(mesh):
        state2, m2 = step(state2, frozen_s, batch_s, concat=False)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4, atol=2e-4)
    l1 = jax.tree_util.tree_leaves(state1.adapters)
    l2 = jax.tree_util.tree_leaves(state2.adapters)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3)


def test_lr_schedule():
    tc = TrainConfig(lr=1e-3, lr_warmup_steps=10, steps_per_epoch=4,
                     lr_schedule_step_size=5, lr_schedule_gamma=0.1)
    s = lr_schedule(tc)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    # decay after 5 epochs x 4 steps = 20 post-warmup steps
    np.testing.assert_allclose(float(s(10 + 19)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(10 + 20)), 1e-4, rtol=1e-6)


def test_train_step_remat_matches_no_remat():
    """--remat (per-layer jax.checkpoint in the frozen LM, the 6.7b-on-16GB
    memory plan in ROADMAP.md) must not change the math: same loss and same
    adapter update as the plain step."""
    import dataclasses

    core = make_core()
    tc0 = TrainConfig(lr=1e-3, lr_warmup_steps=2, steps_per_epoch=10)
    tc1 = dataclasses.replace(tc0, remat=True)
    params = core.init_params(jax.random.PRNGKey(0))
    frozen = {"lm": params["lm"], "vision": params["vision"]}
    batch = make_batch()
    fresh = lambda: jax.tree_util.tree_map(jnp.array, params["adapters"])

    s0, m0 = make_train_step(core, tc0)(
        init_state(core, tc0, fresh()), frozen, batch, concat=False)
    s1, m1 = make_train_step(core, tc1)(
        init_state(core, tc1, fresh()), frozen, batch, concat=False)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0.adapters),
                    jax.tree_util.tree_leaves(s1.adapters)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_train_step_w8_frozen_lm():
    """int8 frozen decoder (the single-chip OPT-6.7B training mode): the
    step runs, gradients flow to the adapters, and with fine-grained
    per-channel scales the loss tracks the bf16-frozen loss closely."""
    from gill_tpu.models import opt as opt_mod

    core = make_core()
    tc = TrainConfig(lr=1e-2, lr_warmup_steps=1, steps_per_epoch=4,
                     batch_size=8)
    params = core.init_params(jax.random.PRNGKey(0))
    frozen_bf = {"lm": params["lm"], "vision": params["vision"]}
    frozen_w8 = {"lm": opt_mod.quantize_params_w8(params["lm"]),
                 "vision": params["vision"]}
    batch = make_batch()
    step = make_train_step(core, tc)

    cp = lambda t: jax.tree_util.tree_map(jnp.array, t)
    s_bf = init_state(core, tc, cp(params["adapters"]))
    s_w8 = init_state(core, tc, cp(params["adapters"]))
    losses_bf, losses_w8 = [], []
    for _ in range(3):
        s_bf, m_bf = step(s_bf, frozen_bf, batch, concat=False)
        s_w8, m_w8 = step(s_w8, frozen_w8, batch, concat=False)
        losses_bf.append(float(m_bf["loss"]))
        losses_w8.append(float(m_w8["loss"]))
    # quantization shifts the loss slightly but not the trajectory
    np.testing.assert_allclose(losses_w8, losses_bf, rtol=0.05)
    # adapters moved (gradients flowed through the dequant matmuls)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        s_w8.adapters, params["adapters"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_train_step_w8_frozen_dp_mesh():
    """DP=8 over the virtual mesh with the int8 frozen decoder — the
    v5e-8 configuration of the single-chip OPT-6.7B training mode
    (param_shardings must resolve the quantized leaf structure)."""
    from gill_tpu.models import opt as opt_mod

    core = make_core()
    tc = TrainConfig(lr=1e-3, lr_warmup_steps=1, steps_per_epoch=4,
                     batch_size=16)
    params = core.init_params(jax.random.PRNGKey(0))
    frozen = {"lm": opt_mod.quantize_params_w8(params["lm"]),
              "vision": params["vision"]}
    mesh = create_mesh(dp_size=8, tp_size=1)
    frozen = jax.device_put(frozen, param_shardings(mesh, frozen))
    state = init_state(core, tc, params["adapters"])
    state = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: replicated(mesh), state,
        is_leaf=lambda x: hasattr(x, "shape")))
    batch = make_batch(b=16)
    batch = jax.device_put(batch, jax.tree_util.tree_map(
        lambda _: batch_sharding(mesh), batch))
    step = make_train_step(core, tc)
    with jax.sharding.set_mesh(mesh):
        state, m = step(state, frozen, batch, concat=False)
    assert np.isfinite(float(m["loss"]))
