"""Inference API tests: interleaved prompt encoding, [IMG]-triggered
retrieval + decision + SD generation, output structure parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gill_tpu.api import GILL
from gill_tpu.models import decision as decision_mod
from gill_tpu.models import clip as clip_mod
from gill_tpu.models.sd import unet as unet_mod
from gill_tpu.models.sd import vae as vae_mod
from gill_tpu.models.sd.pipeline import StableDiffusionPipeline, tiny_sd_config
from gill_tpu.retrieval import RetrievalIndex
from gill_tpu.tokenizer import GPT2BPETokenizer, setup_gill_tokenizer

from test_gill_forward import OPT_TINY, VIS_TINY, NUM_TOKENS
from gill_tpu.config import GILLConfig
from gill_tpu.models.gill import GILLCore


@pytest.fixture(scope="module")
def gill(tmp_path_factory):
    tok = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tok, NUM_TOKENS)
    cfg = GILLConfig(n_visual_tokens=2, num_tokens=NUM_TOKENS,
                     num_clip_tokens=16, ret_emb_dim=8, gen_emb_dim=24,
                     image_size=16)
    core = GILLCore(cfg=cfg, opt_cfg=OPT_TINY, vis_cfg=VIS_TINY,
                    vocab_len=len(tok), img_start=img_ids[0],
                    pad_token_id=tok.pad_token_id,
                    bos_token_id=tok.bos_token_id)
    params = core.init_params(jax.random.PRNGKey(0))

    sd_cfg = tiny_sd_config()
    sd_cfg.unet.cross_attention_dim = 24
    sd_cfg.text.max_positions = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    sd_params = {"unet": unet_mod.init(k1, sd_cfg.unet),
                 "vae_decoder": vae_mod.init_decoder(k2, sd_cfg.vae)}
    sd_pipe = StableDiffusionPipeline(sd_cfg, sd_params, tokenizer=None)

    # fake retrieval index over local image files
    tmp = tmp_path_factory.mktemp("ret")
    paths = []
    for i in range(5):
        p = str(tmp / f"img{i}.png")
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (16, 16, 3), np.uint8)
        ).save(p)
        paths.append(p)
    emb_mat = np.random.RandomState(9).randn(5, 8).astype(np.float32)
    index = RetrievalIndex(paths, emb_mat, logit_scale=10.0)

    dec = decision_mod.init(jax.random.PRNGKey(2), in_dim=OPT_TINY.hidden_size)
    return GILL(core, params, tok, sd_pipe=sd_pipe, retrieval_index=index,
                decision_params=dec, num_gen_images=1)


@pytest.fixture(autouse=True)
def _local_image_fetch(monkeypatch):
    from gill_tpu.utils import image as image_utils

    def fake_fetch(url):
        return Image.open(url).resize((224, 224)).convert("RGB")

    monkeypatch.setattr(image_utils, "get_image_from_url", fake_fetch)
    import gill_tpu.api as api_mod

    monkeypatch.setattr(api_mod.image_utils, "get_image_from_url", fake_fetch)


def _img():
    return Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (20, 24, 3), np.uint8))


def test_text_only_generation(gill):
    out = gill.generate_for_images_and_texts(
        [_img(), "Q: what is this?\nA:"], num_words=4, min_word_tokens=4)
    assert len(out) == 1
    assert isinstance(out[0], str)


def test_img_triggered_generation_structure(gill):
    out = gill.generate_for_images_and_texts(
        ["a photo of"], num_words=2, gen_scale_factor=1e6,
        num_inference_steps=2)
    # [caption+' [IMG0..]', image_outputs]
    assert len(out) == 2
    assert isinstance(out[0], str) and "[IMG0]" in out[0]
    d = out[1]
    assert set(d.keys()) == {"gen", "ret", "decision"}
    assert d["decision"] is not None and d["decision"][0] in ("gen", "ret")
    # retrieval returned (img, 'ret', score) triples from the fake index
    assert len(d["ret"]) >= 1
    img, tag, score = d["ret"][0]
    assert tag == "ret" and isinstance(img, Image.Image)
    # generation returned a (PIL, score) pair
    gimg, gscore = d["gen"][0]
    assert isinstance(gimg, Image.Image)
    assert gimg.size == (16, 16)


def test_batch_serving_matches_sequential(gill):
    """generate_for_images_and_texts_batch (continuous-batching GILL
    engine) must reproduce the sequential API outputs for a mixed batch:
    text-only, [IMG]-boosted, and image-conditioned prompts."""
    batch = [
        [_img(), "Q: what is this?\nA:"],
        ["a photo of"],
        ["tell me a story about"],
    ]
    kw = dict(num_words=3, gen_scale_factor=1e6, num_inference_steps=2)
    seq = [gill.generate_for_images_and_texts(p, **kw) for p in batch]
    got = gill.generate_for_images_and_texts_batch(
        batch, slots=2, chunk=3, **kw)

    assert len(got) == len(seq)
    for g, s in zip(got, seq):
        _assert_outputs_match(g, s)


def _assert_outputs_match(g, s):
    assert len(g) == len(s)
    for gi, si in zip(g, s):
        if isinstance(si, str):
            assert gi == si
        else:
            assert set(gi.keys()) == set(si.keys())
            assert gi["decision"][0] == si["decision"][0]
            np.testing.assert_allclose(gi["decision"][1],
                                       si["decision"][1], atol=1e-3)
            assert len(gi["ret"]) == len(si["ret"])
            for (ri, rt, rs), (qi, qt, qs) in zip(gi["ret"], si["ret"]):
                assert rt == qt
                assert abs(rs - qs) < 1e-3
                np.testing.assert_array_equal(np.asarray(ri),
                                              np.asarray(qi))
            for (ri, rs), (qi, qs) in zip(gi["gen"], si["gen"]):
                assert abs(rs - qs) < 1e-2
                np.testing.assert_allclose(np.asarray(ri, np.float32),
                                           np.asarray(qi, np.float32),
                                           atol=2.0)


def test_batch_serving_multi_img_runs(gill):
    """max_num_rets=2 through the engine: a boosted prompt emits two [IMG]
    runs; the engine's tap ring must deliver BOTH runs' hiddens so the
    batched outputs (two image_outputs dicts, distinct mapper inputs)
    match the sequential path's max_num_rets=2 results exactly."""
    batch = [
        ["a photo of"],                         # 2 boosted runs
        [_img(), "Q: what is this?\nA:"],       # mixed into the slot pool
    ]
    kw = dict(num_words=3, gen_scale_factor=1e6, max_num_rets=2,
              num_inference_steps=2)
    seq = [gill.generate_for_images_and_texts(p, **kw) for p in batch]
    got = gill.generate_for_images_and_texts_batch(
        batch, slots=2, chunk=3, **kw)
    # the boosted prompt must actually produce two runs (caption, dict,
    # caption, dict) or the test exercises nothing
    n_dicts = sum(isinstance(x, dict) for x in seq[0])
    assert n_dicts == 2, seq[0]
    for g, s in zip(got, seq):
        _assert_outputs_match(g, s)


def test_no_retrieval_defaults_to_gen(gill):
    g2 = GILL(gill.core, gill.params, gill.tokenizer, sd_pipe=gill.sd_pipe,
              retrieval_index=None, decision_params=None)
    out = g2.generate_for_images_and_texts(
        ["x"], num_words=2, gen_scale_factor=1e6, num_inference_steps=2)
    assert out[1]["decision"] == ["gen", [0, 1]]
    assert out[1]["ret"] == []


def test_log_likelihood_scores(gill):
    s1 = gill.get_log_likelihood_scores([_img(), "a dog"])
    s2 = gill.get_log_likelihood_scores([_img(), "zzqqxx yy"])
    assert np.isfinite(s1) and np.isfinite(s2)
    assert s1 < 0 and s2 < 0


def test_retrieval_index_topk_and_downweight():
    emb = np.eye(4, dtype=np.float32)
    idx = RetrievalIndex([f"p{i}" for i in range(4)], emb, logit_scale=1.0)
    q = np.asarray([1.0, 0, 0, 0], np.float32)
    scores, top = idx.topk(q, k=2)
    assert top[0] == 0
    scores2, top2 = idx.topk(q, k=2, seen_idx=[0])
    assert top2[0] != 0


def test_retrieval_index_sharded_over_mesh():
    """The 3GB-index-equivalent sharded over the 8-device data axis must
    return identical top-k to the unsharded index (incl. row padding)."""
    from gill_tpu.parallel import create_mesh

    rng = np.random.RandomState(0)
    n, d = 37, 16  # deliberately not a multiple of 8 -> padding path
    emb = rng.randn(n, d).astype(np.float32)
    q = rng.randn(d).astype(np.float32)
    q = q / np.linalg.norm(q)
    idx1 = RetrievalIndex([f"p{i}" for i in range(n)], emb, logit_scale=7.0)
    mesh = create_mesh(dp_size=8, tp_size=1)
    idx2 = RetrievalIndex([f"p{i}" for i in range(n)], emb, logit_scale=7.0,
                          mesh=mesh)
    s1, t1 = idx1.topk(q, k=5, seen_idx=[3])
    s2, t2 = idx2.topk(q, k=5, seen_idx=[3])
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)

    # batched queries, per-query seen sets: one program, same results as
    # the serial path on both the sharded and unsharded index
    qs = rng.randn(3, d).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    seen = [[1], [], [0, 2]]
    for idx in (idx1, idx2):
        sb, tb = idx.topk_batch(qs, k=4, seen_idx=seen)
        assert sb.shape == (3, 4) and tb.shape == (3, 4)
        for b in range(3):
            s_one, t_one = idx.topk(qs[b], k=4, seen_idx=seen[b])
            np.testing.assert_array_equal(tb[b], t_one)
            np.testing.assert_allclose(sb[b], s_one, rtol=1e-5)
