"""Round-2 regression tests: prompt-length bucketing, val-caption decode
parity (min_word_tokens == num_words, reference gill/validate.py:124-126),
multi-layer text_emb_layers taps (gill/models.py:102-121, 383-387), and the
multi-host batch-assembly path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import GILLConfig
from gill_tpu.models.gill import GILLCore

from test_gill_forward import (BOS, IMG_START, NUM_TOKENS, PAD, VOCAB_LEN,
                               make_core)
from test_generate import _reference_greedy


@pytest.fixture(scope="module")
def core_params():
    core = make_core()
    params = core.init_params(jax.random.PRNGKey(3))
    return core, params


def _prompt(core, t, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(1, t, core.lm_dim).astype(np.float32) * 0.02)


# ---------------------------------------------------------------------------
# prompt bucketing
# ---------------------------------------------------------------------------

def test_bucketed_prompt_lengths_share_one_compile(core_params):
    core, params = core_params
    object.__setattr__(core, "_gen_cache", {})
    for t in (4, 11, 23):
        out = core.generate(params, _prompt(core, t, seed=t), num_words=4,
                            temperature=0.0)
        ref_tokens, _ = _reference_greedy(core, params, _prompt(core, t, seed=t),
                                          num_words=4)
        got = np.asarray(out["tokens"][0])[np.asarray(out["valid"][0])]
        assert got.tolist() == ref_tokens[: len(got)], t
    # All three prompt lengths pad into the same 64-bucket -> ONE compiled
    # decode program (the recompile-per-chat-turn fix).
    assert len(core._gen_cache) == 1, list(core._gen_cache)


def test_bucketed_hidden_matches_unbucketed(core_params):
    core, params = core_params
    embs = _prompt(core, 9)
    out = core.generate(params, embs, num_words=5, temperature=0.0)
    raw = jax.jit(lambda p, e: core._generate_impl(p, e, num_words=5))(
        params, embs)
    np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                  np.asarray(raw["tokens"]))
    np.testing.assert_allclose(np.asarray(out["hidden"], np.float32),
                               np.asarray(raw["hidden"], np.float32),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# val caption decode: no [IMG] tokens can be sampled
# ---------------------------------------------------------------------------

def test_min_word_tokens_gate_blocks_img(core_params):
    core, params = core_params
    embs = _prompt(core, 6)
    # A boost large enough to force [IMG0] whenever the gate is open.
    out = core.generate(params, embs, num_words=6, min_word_tokens=6,
                        temperature=0.0, gen_scale_factor=1e6)
    toks = np.asarray(out["tokens"][0])[np.asarray(out["valid"][0])]
    assert not np.any((toks >= IMG_START) & (toks < IMG_START + NUM_TOKENS))
    # Sanity: with the gate open the same boost does emit [IMG].
    out2 = core.generate(params, embs, num_words=6, min_word_tokens=0,
                         temperature=0.0, gen_scale_factor=1e6)
    toks2 = np.asarray(out2["tokens"][0])[np.asarray(out2["valid"][0])]
    assert np.any((toks2 >= IMG_START) & (toks2 < IMG_START + NUM_TOKENS))


def test_validate_caption_decode_has_no_img_tokens(core_params):
    from gill_tpu.train.validate import generate_caption_tokens

    core, params = core_params
    pixels = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32))
    toks = generate_caption_tokens(core, params, pixels, prefix_ids=None,
                                   num_words=8)
    assert not np.any((toks >= IMG_START) & (toks < IMG_START + NUM_TOKENS))


# ---------------------------------------------------------------------------
# text_emb_layers multi-layer taps
# ---------------------------------------------------------------------------

def _make_multitap_core(layers):
    base = make_core()
    cfg_kw = {f.name: getattr(base.cfg, f.name)
              for f in base.cfg.__dataclass_fields__.values()}
    cfg_kw["text_emb_layers"] = tuple(layers)
    cfg = GILLConfig(**cfg_kw)
    return GILLCore(cfg=cfg, opt_cfg=base.opt_cfg, vis_cfg=base.vis_cfg,
                    vocab_len=VOCAB_LEN, img_start=IMG_START,
                    pad_token_id=PAD, bos_token_id=BOS)


def test_tap_specs_dims_and_validation():
    core = _make_multitap_core([-1, 1, 2])
    specs = core.tap_specs()
    n_layers = core.opt_cfg.num_layers
    assert specs[0] == ("", -1, core.lm_dim)
    assert specs[1] == ("_1", 1, core.opt_cfg.hidden_size)
    assert specs[2][1] == 2
    with pytest.raises(ValueError):
        _make_multitap_core([n_layers + 1]).tap_specs()


def test_multitap_forward_sums_mapper_outputs():
    """A second tap with all-zero mapper weights must reproduce the
    single-tap output exactly (sum semantics, reference models.py:417-422)."""
    core1 = _make_multitap_core([-1])
    core2 = _make_multitap_core([-1, 1])
    params = core1.init_params(jax.random.PRNGKey(0))
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    ad2 = dict(p2["adapters"])
    extra = core2.init_adapters(jax.random.PRNGKey(1))
    for k in ("ret_fc_1", "gen_fc_1"):
        ad2[k] = jax.tree_util.tree_map(jnp.zeros_like, extra[k])
    p2["adapters"] = ad2

    rng = np.random.RandomState(0)
    row = [BOS, 10, 11, 12] + list(range(IMG_START, IMG_START + NUM_TOKENS))
    tokens = np.full((2, 14), PAD, np.int32)
    tokens[0, : len(row)] = row
    tokens[1, : len(row)] = row
    lens = np.array([len(row)] * 2, np.int32)
    pixels = rng.randn(2, 16, 16, 3).astype(np.float32)

    for mode in ("retrieval", "generation"):
        out1 = core1.forward(params, jnp.asarray(pixels), jnp.asarray(tokens),
                             jnp.asarray(lens), mode=mode)
        out2 = core2.forward(p2, jnp.asarray(pixels), jnp.asarray(tokens),
                             jnp.asarray(lens), mode=mode)
        np.testing.assert_allclose(np.asarray(out1["last_embedding"]),
                                   np.asarray(out2["last_embedding"]),
                                   rtol=1e-5, atol=1e-6)

    # And a non-zero second tap must CHANGE the output.
    ad2["ret_fc_1"] = extra["ret_fc_1"]
    p2["adapters"] = ad2
    out3 = core2.forward(p2, jnp.asarray(pixels), jnp.asarray(tokens),
                         jnp.asarray(lens), mode="retrieval")
    out1 = core1.forward(params, jnp.asarray(pixels), jnp.asarray(tokens),
                         jnp.asarray(lens), mode="retrieval")
    assert not np.allclose(np.asarray(out3["last_embedding"]),
                           np.asarray(out1["last_embedding"]))


def test_multitap_train_step_runs():
    from gill_tpu.config import TrainConfig
    from gill_tpu.train.trainer import init_state, make_train_step

    core = _make_multitap_core([-1, 1])
    params = core.init_params(jax.random.PRNGKey(0))
    tc = TrainConfig(lr=1e-3, batch_size=2, lr_warmup_steps=2)
    state = init_state(core, tc, params["adapters"])
    frozen = {"lm": params["lm"], "vision": params["vision"]}
    step = make_train_step(core, tc)

    rng = np.random.RandomState(0)
    row = [BOS, 10, 11, 12] + list(range(IMG_START, IMG_START + NUM_TOKENS))
    tokens = np.full((2, 14), PAD, np.int32)
    tokens[0, : len(row)] = row
    tokens[1, : len(row)] = row
    lens = np.array([len(row)] * 2, np.int32)
    batch = {
        "pixels": jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32)),
        "ret_tokens": jnp.asarray(tokens), "ret_len": jnp.asarray(lens),
        "gen_tokens": jnp.asarray(tokens), "gen_len": jnp.asarray(lens),
        "clip_emb": jnp.asarray(rng.randn(
            2, core.cfg.num_clip_tokens, core.cfg.gen_emb_dim
        ).astype(np.float32)),
    }
    state, metrics = step(state, frozen, batch, concat=False)
    assert np.isfinite(float(metrics["loss"]))
    # grads must flow into the second tap's mappers
    leaves = jax.tree_util.tree_leaves(state.adapters["ret_fc_1"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


# ---------------------------------------------------------------------------
# multi-host batch assembly (single-process exercise of the API)
# ---------------------------------------------------------------------------

def test_make_array_from_process_local_data_on_mesh():
    from gill_tpu.parallel import create_mesh
    from gill_tpu.parallel.partition import batch_sharding

    mesh = create_mesh(dp_size=4, tp_size=2, devices=jax.devices()[:8])
    shard = batch_sharding(mesh)
    local = np.arange(8 * 3, dtype=np.int32).reshape(8, 3)
    arr = jax.make_array_from_process_local_data(shard, local)
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), local)
