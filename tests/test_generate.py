"""Decode-loop tests: KV-cached scan generation vs a straightforward
full-reforward python loop implementing the reference semantics
(gill/models.py:443-532)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.models import opt as opt_mod
from gill_tpu.ops.sampling import top_p_filter

from test_gill_forward import make_core, IMG_START, NUM_TOKENS, PAD, BOS, VOCAB_LEN


@pytest.fixture(scope="module")
def core_params():
    core = make_core()
    params = core.init_params(jax.random.PRNGKey(3))
    return core, params


def _reference_greedy(core, params, input_embs, num_words, min_word_tokens=0,
                      scale=1.0):
    """Python loop: full re-forward each iteration, [IMG] ban/boost/force."""
    lm_head = core.lm_head_table(params)
    embs = input_embs
    out_tokens = []
    hiddens = {}
    i = 0
    while i < num_words:
        o = opt_mod.forward(params["lm"], core.opt_cfg, embs, lm_head=lm_head)
        logits = np.asarray(o["logits"][:, -1]).copy()
        for j in range(1, NUM_TOKENS):
            logits[:, IMG_START + j] = -np.inf
        if i < min_word_tokens:
            logits[:, IMG_START] = -np.inf
        elif scale > 1:
            logits[:, IMG_START] = np.abs(logits[:, IMG_START]) * scale
        tok = int(np.argmax(logits[0]))
        if tok == IMG_START:
            new = list(range(IMG_START, IMG_START + NUM_TOKENS))
        else:
            new = [tok]
        out_tokens.extend(new)
        new_embs = core.embed_tokens(params, jnp.asarray([new]))
        embs = jnp.concatenate([embs, new_embs], axis=1)
        i += 1
    # hidden states of every emitted token via one final forward
    o = opt_mod.forward(params["lm"], core.opt_cfg, embs, lm_head=lm_head)
    h = np.asarray(o["last_hidden"])[0, input_embs.shape[1]:]
    return out_tokens, h


def test_greedy_matches_reference_loop(core_params):
    core, params = core_params
    rng = np.random.RandomState(0)
    input_embs = jnp.asarray(rng.randn(1, 4, core.lm_dim).astype(np.float32) * 0.02)
    ref_tokens, _ = _reference_greedy(core, params, input_embs, num_words=6)
    out = core.generate(params, input_embs, num_words=6, temperature=0.0)
    got = np.asarray(out["tokens"][0])
    valid = np.asarray(out["valid"][0])
    assert got[valid].tolist()[: len(ref_tokens)] == ref_tokens[: valid.sum()]


def test_img_force_commit_and_hidden_parity(core_params):
    """A huge gen_scale forces [IMG0] immediately; the full [IMG0..n) run
    must be committed and its hidden states must match a full re-forward
    (the VIST trick, reference evals/generate_vist_images.py num_words=2)."""
    core, params = core_params
    rng = np.random.RandomState(1)
    input_embs = jnp.asarray(rng.randn(1, 3, core.lm_dim).astype(np.float32) * 0.02)
    out = core.generate(params, input_embs, num_words=2, gen_scale_factor=1e5,
                        max_img_runs=2)
    toks = np.asarray(out["tokens"][0])
    valid = np.asarray(out["valid"][0])
    # [IMG0..3] + one more sampled token
    assert toks[:NUM_TOKENS].tolist() == list(range(IMG_START, IMG_START + NUM_TOKENS))
    assert valid[: NUM_TOKENS + 1].all()

    ref_tokens, ref_hidden = _reference_greedy(
        core, params, input_embs, num_words=2, scale=1e5)
    assert toks[valid].tolist() == ref_tokens
    got_hidden = np.asarray(out["hidden"][0])[: len(ref_tokens)]
    np.testing.assert_allclose(got_hidden, ref_hidden, atol=2e-4, rtol=2e-4)


def test_min_word_tokens_gate(core_params):
    core, params = core_params
    rng = np.random.RandomState(2)
    input_embs = jnp.asarray(rng.randn(1, 3, core.lm_dim).astype(np.float32) * 0.02)
    out = core.generate(params, input_embs, num_words=5, min_word_tokens=3,
                        gen_scale_factor=1e5)
    toks = np.asarray(out["tokens"][0])
    # first 3 sampled tokens cannot be [IMG]
    assert all(t < IMG_START or t >= IMG_START + NUM_TOKENS for t in toks[:3])
    # gate lifts at iteration 3 -> boost forces [IMG0] there
    assert toks[3] == IMG_START
    assert toks[3:3 + NUM_TOKENS].tolist() == list(
        range(IMG_START, IMG_START + NUM_TOKENS))


def test_top_p_filter():
    logits = jnp.asarray([[2.0, 1.0, 0.5, -1.0, -3.0]])
    f99 = np.asarray(top_p_filter(logits, 0.99))
    assert np.isfinite(f99[0, :3]).all()
    assert not np.isfinite(f99[0, 4])
    f01 = np.asarray(top_p_filter(logits, 0.01))
    # only the top token survives
    assert np.isfinite(f01[0, 0])
    assert not np.isfinite(f01[0, 1:]).any()


def test_auto_layout_decode_matches(core_params):
    """auto_layout=True (compiler-chosen weight layouts) must be
    numerically identical to the default path."""
    core, params = core_params
    rng = np.random.RandomState(5)
    input_embs = jnp.asarray(rng.randn(1, 4, core.lm_dim).astype(np.float32) * 0.02)
    out1 = core.generate(params, input_embs, num_words=5, temperature=0.0)
    out2 = core.generate(params, input_embs, num_words=5, temperature=0.0,
                         auto_layout=True)
    np.testing.assert_array_equal(np.asarray(out1["tokens"]),
                                  np.asarray(out2["tokens"]))
    assert "params" in out2  # relaid-out params returned for reuse
    # reusing the returned params hits the same compiled fn with no relayout
    out3 = core.generate(out2["params"], input_embs, num_words=5,
                         temperature=0.0, auto_layout=True)
    np.testing.assert_array_equal(np.asarray(out2["tokens"]),
                                  np.asarray(out3["tokens"]))


def test_sampled_decode_runs(core_params):
    core, params = core_params
    rng = np.random.RandomState(3)
    input_embs = jnp.asarray(rng.randn(2, 3, core.lm_dim).astype(np.float32) * 0.02)
    out = core.generate(params, input_embs, num_words=4, temperature=0.7,
                        top_p=0.9, rng=jax.random.PRNGKey(7))
    assert out["tokens"].shape == (2, 4 + NUM_TOKENS - 1)
    assert np.asarray(out["tokens"]).max() < VOCAB_LEN


def test_kv_int8_cache_decode_matches_bf16(core_params):
    """int8 KV cache (per-token-per-head scales) produces the same greedy
    tokens as the bf16 cache on a tiny model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    core, params = core_params
    emb = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 7, core.opt_cfg.word_embed_proj_dim)) * 0.3
    ref = core._generate_impl(params, emb, num_words=8, min_word_tokens=8)
    out = core._generate_impl(params, emb, num_words=8, min_word_tokens=8,
                              kv_int8=True)
    np.testing.assert_array_equal(np.asarray(ref["tokens"]),
                                  np.asarray(out["tokens"]))
    # hidden states close (int8 cache quantization noise only)
    rel = float(jnp.linalg.norm(out["hidden"] - ref["hidden"])
                / jnp.linalg.norm(ref["hidden"]))
    assert rel < 0.02, rel
