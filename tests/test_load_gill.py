"""End-to-end load_gill from a checkpoint directory (deployment path):
model_args.json + our npz adapters + cc3m pickle + decision npz."""

import json
import os
import pickle

import jax
import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def ckpt_dir(tmp_path):
    from gill_tpu.config import GILLConfig
    from gill_tpu.models.gill import GILLCore
    from gill_tpu.tokenizer import GPT2BPETokenizer, setup_gill_tokenizer
    from gill_tpu.utils.ckpt import save_checkpoint

    cfg = GILLConfig(opt_version="test/opt-tiny",
                     visual_encoder="test/clip-tiny",
                     n_visual_tokens=2, num_tokens=4, num_clip_tokens=6,
                     ret_emb_dim=8, gen_emb_dim=12, image_size=16)
    cfg.to_json(str(tmp_path / "model_args.json"))

    tok = GPT2BPETokenizer.tiny()
    img_ids = setup_gill_tokenizer(tok, 4)
    core = GILLCore.build(cfg, vocab_len=len(tok), img_start=img_ids[0],
                          pad_token_id=tok.pad_token_id,
                          bos_token_id=tok.bos_token_id)
    adapters = core.init_adapters(jax.random.PRNGKey(7))
    save_checkpoint({"adapters": jax.device_get(adapters)}, str(tmp_path),
                    step=5)

    # retrieval blob (reference cc3m*.npy format: pickled dict)
    rng = np.random.RandomState(0)
    with open(tmp_path / "cc3m_embeddings.npy", "wb") as f:
        pickle.dump({"paths": [f"p{i}" for i in range(6)],
                     "embeddings": list(rng.randn(6, 8).astype(np.float32))}, f)

    # decision model (our npz flavor)
    np.savez(tmp_path / "decision_model.npz",
             w=rng.randn(16, 2).astype(np.float32),
             b=np.zeros(2, np.float32))
    return str(tmp_path)


def test_load_gill_roundtrip(ckpt_dir):
    from gill_tpu.api import load_gill

    model = load_gill(ckpt_dir, decision_model_fn="decision_model.npz",
                      load_sd=False, weights_dir=None)
    assert model.index is not None and model.index.n == 6
    assert model.decision_params is not None
    assert model.core.cfg.num_tokens == 4

    # text-only generation works end to end off the loaded state
    out = model.generate_for_images_and_texts(
        [Image.new("RGB", (20, 20)), "Q: hi\nA:"], num_words=3,
        min_word_tokens=3)
    assert len(out) >= 1 and isinstance(out[0], str)

    # forced [IMG] goes down the retrieval branch with the loaded index
    out = model.generate_for_images_and_texts(
        ["x"], num_words=2, gen_scale_factor=1e6)
    if len(out) == 2:  # [IMG] emitted
        assert out[1]["decision"][0] in ("gen", "ret")


def test_load_gill_without_index(ckpt_dir):
    from gill_tpu.api import load_gill

    model = load_gill(ckpt_dir, load_ret_embs=False, load_sd=False,
                      decision_model_fn=None)
    assert model.index is None
    out = model.generate_for_images_and_texts(
        ["x"], num_words=2, gen_scale_factor=1e6)
    if len(out) == 2:
        # no index -> decision defaults to 'gen' (reference models.py:702-704)
        assert out[1]["decision"] == ["gen", [0, 1]]


def test_load_gill_w8_serving(ckpt_dir):
    """Opt-in W8A16 LM weights through the full serving path."""
    from gill_tpu.api import load_gill

    model = load_gill(ckpt_dir, load_sd=False, decision_model_fn=None,
                      lm_weight_precision="w8")
    assert "w8" in model.params["lm"]["layers"]["attn"]["q"]
    out = model.generate_for_images_and_texts(["hello"], num_words=3,
                                              min_word_tokens=3)
    assert len(out) >= 1 and isinstance(out[0], str)
