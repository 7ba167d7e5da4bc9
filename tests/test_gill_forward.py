"""GILL core forward: shapes, label masking, [IMG]-row override, packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import CLIPVisionConfig, GILLConfig, OPTConfig
from gill_tpu.models.gill import GILLCore, IGNORE

OPT_TINY = OPTConfig(vocab_size=64, hidden_size=16, ffn_dim=32, num_layers=2,
                     num_heads=2, word_embed_proj_dim=16, max_positions=64)
VIS_TINY = CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                            num_heads=2, image_size=16, patch_size=8)

NUM_TOKENS = 4
VOCAB_LEN = 64 + 1 + NUM_TOKENS  # base + <|image|> + [IMG0..3]
IMG_START = 65
PAD = 1
BOS = 2


def make_core():
    cfg = GILLConfig(n_visual_tokens=2, num_tokens=NUM_TOKENS, num_clip_tokens=6,
                     ret_emb_dim=8, gen_emb_dim=12)
    return GILLCore(cfg=cfg, opt_cfg=OPT_TINY, vis_cfg=VIS_TINY,
                    vocab_len=VOCAB_LEN, img_start=IMG_START,
                    pad_token_id=PAD, bos_token_id=BOS)


@pytest.fixture(scope="module")
def core_params():
    core = make_core()
    params = core.init_params(jax.random.PRNGKey(0))
    return core, params


def _batch(t=12):
    # caption: BOS w w w [IMG0..3] PAD... ; len = 8
    row = [BOS, 10, 11, 12] + list(range(IMG_START, IMG_START + NUM_TOKENS))
    tokens = np.full((2, t), PAD, np.int32)
    tokens[0, :8] = row
    tokens[1, :8] = [BOS, 20, 21, 22] + list(range(IMG_START, IMG_START + NUM_TOKENS))
    caption_len = np.array([8, 8], np.int32)
    pixels = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
    return jnp.asarray(pixels), jnp.asarray(tokens), jnp.asarray(caption_len)


def test_embed_override(core_params):
    core, params = core_params
    ids = jnp.array([[5, IMG_START, IMG_START + 3, 63]])
    emb = core.embed_tokens(params, ids)
    np.testing.assert_allclose(
        np.asarray(emb[0, 1]), np.asarray(params["adapters"]["img_embeddings"][0]))
    np.testing.assert_allclose(
        np.asarray(emb[0, 2]), np.asarray(params["adapters"]["img_embeddings"][3]))
    np.testing.assert_allclose(
        np.asarray(emb[0, 0]), np.asarray(params["lm"]["embed_tokens"]["weight"][5]))


def test_mask_labels(core_params):
    core, _ = core_params
    tokens = jnp.array([[BOS, 10, IMG_START, IMG_START + 1, PAD, 7]])
    cap = np.asarray(core.mask_labels(tokens, "captioning"))
    assert cap.tolist() == [[BOS, 10, IGNORE, IGNORE, IGNORE, IGNORE]]
    ret = np.asarray(core.mask_labels(tokens, "retrieval"))
    # [IMG0] stays a target; [IMG1] onward masked
    assert ret.tolist() == [[BOS, 10, IMG_START, IGNORE, IGNORE, IGNORE]]


def test_captioning_forward_shapes(core_params):
    core, params = core_params
    px, tok, clen = _batch()
    out = core.forward(params, px, tok, clen, mode="captioning")
    b, t = tok.shape
    nv = core.cfg.n_visual_tokens
    assert out["logits"].shape == (b, t + nv, VOCAB_LEN)
    assert out["full_labels"].shape == (b, t + nv)
    # visual prefix labels are all IGNORE
    assert np.all(np.asarray(out["full_labels"])[:, :nv] == IGNORE)
    assert np.isfinite(float(out["ce_loss"]))


@pytest.mark.parametrize("mode", ["retrieval", "generation"])
def test_ret_gen_forward_shapes(core_params, mode):
    core, params = core_params
    px, tok, clen = _batch()
    out = core.forward(params, px, tok, clen, mode=mode)
    if mode == "retrieval":
        assert out["last_embedding"].shape == (2, core.cfg.ret_emb_dim)
        assert out["visual_embs"].shape == (2, core.cfg.ret_emb_dim)
        # normalized text embedding
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["last_embedding"]), axis=1), 1.0,
            atol=1e-5)
    else:
        assert out["last_embedding"].shape == (
            2, core.cfg.num_clip_tokens, core.cfg.gen_emb_dim)
    assert out["llm_hidden"].shape == (2, NUM_TOKENS, core.lm_dim)
    assert out["last_output_logit"].shape == (2, VOCAB_LEN)


def test_window_gather_targets_img_positions(core_params):
    """The hidden window must cover exactly the [IMG0..n] positions."""
    core, params = core_params
    px, tok, clen = _batch()
    embs = core.embed_tokens(params, tok)
    out = core.forward(params, px, tok, clen, mode="generation")
    # win_embs (inside forward) are the [IMG] token embeddings; verify via
    # the mapper input-adding path by recomputing the expected window.
    idx = int(clen[0]) - 1
    expected = np.asarray(embs[0, idx - NUM_TOKENS + 1: idx + 1])
    img_rows = np.asarray(params["adapters"]["img_embeddings"])
    np.testing.assert_allclose(expected, img_rows, atol=1e-6)


def test_pack_pairs_matches_python_reference(core_params):
    core, params = core_params
    rng = np.random.RandomState(1)
    b, t, d = 4, 6, 3
    embs = rng.randn(b, t, d).astype(np.float32)
    labels = rng.randint(3, 50, (b, t)).astype(np.int32)
    valid_len = np.array([4, 5, 3, 6], np.int32)
    last_idx = valid_len - 1
    bos_pos = 1

    pe, plab, lp = core.pack_pairs(
        jnp.asarray(embs), jnp.asarray(labels), jnp.asarray(valid_len),
        bos_pos, jnp.asarray(last_idx))
    assert pe.shape == (2, 2 * t - 1, d)
    assert plab.shape == (2, 2 * t - 1)

    for i in range(2):
        a, bb = 2 * i, 2 * i + 1
        la = valid_len[a]
        b_nobos = np.concatenate([embs[bb][:bos_pos], embs[bb][bos_pos + 1:]], 0)
        bl_nobos = np.concatenate([labels[bb][:bos_pos], labels[bb][bos_pos + 1:]], 0)
        exp_e = np.concatenate([embs[a][:la], b_nobos], 0)[: 2 * t - 1]
        exp_l = np.concatenate([labels[a][:la], bl_nobos], 0)[: 2 * t - 1]
        n = exp_e.shape[0]
        np.testing.assert_allclose(np.asarray(pe[i])[:n], exp_e, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(plab[i])[:n], exp_l)
        assert int(lp[i, 0]) == last_idx[a]
        assert int(lp[i, 1]) == la + last_idx[bb] - 1


def test_concat_captions_forward(core_params):
    core, params = core_params
    px, tok, clen = _batch()
    out = core.forward(params, px, tok, clen, mode="retrieval",
                       concat_captions=True)
    # 2 examples -> 1 packed row -> still 2 retrieval embeddings
    assert out["last_embedding"].shape == (2, core.cfg.ret_emb_dim)
    nv_t = tok.shape[1]
    assert out["logits"].shape[1] == 2 * nv_t - 1


def test_first_pad_idx_mode_semantics(core_params):
    """Captioning packs split BEFORE the [IMG] run (reference
    models.py:218-227); ret/gen split at the first pad (models.py:289-297)."""
    core, _ = core_params
    tokens = jnp.array([[BOS, 10, 11, IMG_START, IMG_START + 1,
                         IMG_START + 2, IMG_START + 3, PAD]])
    assert int(core.first_pad_idx(tokens, "captioning")[0]) == 3
    assert int(core.first_pad_idx(tokens, "retrieval")[0]) == 7
    no_pad = jnp.array([[BOS, 10, 11, 12, 13, 14, 15, 16]])
    assert int(core.first_pad_idx(no_pad, "retrieval")[0]) == 8


def test_renorm_img_embeddings(core_params):
    core, params = core_params
    p2 = core.renorm_img_embeddings(params)
    frozen = np.asarray(params["lm"]["embed_tokens"]["weight"])[
        : VOCAB_LEN - NUM_TOKENS]
    target = np.linalg.norm(frozen, axis=1).mean()
    norms = np.linalg.norm(np.asarray(p2["adapters"]["img_embeddings"]), axis=1)
    np.testing.assert_allclose(norms, target, rtol=1e-5)
