"""Component tests: reference checkpoint importers, decision classifier,
P2 vote filtering, LPIPS math, demo session plumbing."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "evals"))

torch = pytest.importorskip("torch")

from test_gill_forward import make_core  # noqa: E402


def test_reference_gill_ckpt_import(tmp_path):
    """Round-trip a reference-layout pretrained_ckpt.pth.tar into adapters."""
    from torch import nn as tnn

    from gill_tpu.utils.ckpt import load_reference_gill_checkpoint
    from test_mapper import TorchTextFc

    core = make_core()
    lm_dim = core.lm_dim
    vh = core.vis_cfg.hidden_size
    torch.manual_seed(0)
    ret_fc = TorchTextFc(lm_dim, core.cfg.ret_emb_dim, 1, "linear")
    gen_fc = TorchTextFc(lm_dim, core.cfg.gen_emb_dim,
                         core.cfg.num_clip_tokens, "gill_mapper",
                         hidden=512, nhead=4, ff=2048, n_enc=4, n_dec=4)
    sd = {}
    sd["module.model.input_embeddings.weight"] = torch.randn(
        core.vocab_len, lm_dim)
    ve = tnn.Linear(vh, lm_dim * core.cfg.n_visual_tokens)
    vf = tnn.Linear(vh, core.cfg.ret_emb_dim)
    sd.update({f"module.model.visual_embeddings.{k}": v
               for k, v in ve.state_dict().items()})
    sd.update({f"module.model.visual_fc.{k}": v
               for k, v in vf.state_dict().items()})
    sd["module.model.logit_scale"] = torch.tensor(2.5)
    sd.update({f"module.model.ret_text_hidden_fcs.0.{k}": v
               for k, v in ret_fc.state_dict().items()})
    sd.update({f"module.model.gen_text_hidden_fcs.0.{k}": v
               for k, v in gen_fc.state_dict().items()})
    path = str(tmp_path / "pretrained_ckpt.pth.tar")
    torch.save({"state_dict": sd}, path)

    adapters = load_reference_gill_checkpoint(path, core)
    assert adapters["img_embeddings"].shape == (core.cfg.num_tokens, lm_dim)
    np.testing.assert_allclose(
        adapters["img_embeddings"],
        sd["module.model.input_embeddings.weight"][-core.cfg.num_tokens:].numpy())
    assert adapters["visual_embeddings"]["w"].shape == (
        vh, lm_dim * core.cfg.n_visual_tokens)
    assert float(adapters["logit_scale"]) == 2.5
    assert adapters["gen_fc"]["query_embs"].shape == (
        1, core.cfg.num_clip_tokens, 512)


def test_shipped_decision_model_loads():
    """The real decision_model.pth.tar shipped with the reference repo."""
    from gill_tpu.utils.ckpt import load_reference_decision_model

    path = "/root/reference/checkpoints/gill_opt/decision_model.pth.tar"
    if not os.path.exists(path):
        pytest.skip("reference checkpoint not present")
    dp = load_reference_decision_model(path)
    assert dp["w"].shape == (4096, 2)
    assert dp["b"].shape == (2,)
    from gill_tpu.models import decision as decision_mod

    label, probs = decision_mod.decide(
        jax.tree_util.tree_map(jnp.asarray, dp), jnp.ones((1, 4096)))
    assert label in ("gen", "ret")


def test_decision_training_learns():
    from gill_tpu.models import decision as decision_mod
    import optax
    from train_decision_classifier import macro_f1

    rng = np.random.RandomState(0)
    n, d = 200, 16
    w_true = rng.randn(d)
    x = rng.randn(n, d).astype(np.float32)
    y = (x @ w_true > 0).astype(np.int32)

    dp = decision_mod.init(jax.random.PRNGKey(0), in_dim=d)
    tx = optax.adamw(1e-2)
    opt_state = tx.init(dp)

    @jax.jit
    def step(dp, opt_state, key):
        def loss_fn(dp):
            logits = decision_mod.apply(dp, jnp.asarray(x), train=True,
                                        rng=key)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(y)).mean()
        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, opt_state = tx.update(grads, opt_state, dp)
        return optax.apply_updates(dp, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    for _ in range(150):
        key, sub = jax.random.split(key)
        dp, opt_state, loss = step(dp, opt_state, sub)
    preds = np.asarray(jnp.argmax(decision_mod.apply(dp, jnp.asarray(x)), -1))
    assert macro_f1(preds, y) > 0.9


def test_p2_majority_vote():
    from process_p2_annotations import majority_vote

    assert majority_vote(["gen"] * 5) == "gen"
    assert majority_vote(["ret"] * 4 + ["gen"]) == "ret"
    assert majority_vote(["gen"] * 3 + ["same"] * 2) == "gen"
    assert majority_vote(["gen"] * 3 + ["ret"] * 2) == "same"
    assert majority_vote(["gen", "gen", "ret", "ret", "same"]) == "same"


def test_lpips_math_runs():
    from lpips_2dirs import ALEX_CONVS, lpips_distance

    rng = np.random.RandomState(0)
    params = {}
    in_ch = 3
    for i, (out_ch, k, s, p) in enumerate(ALEX_CONVS):
        params[f"conv{i}"] = {
            "w": jnp.asarray(rng.randn(k, k, in_ch, out_ch).astype(np.float32) * 0.05),
            "b": jnp.zeros((out_ch,), jnp.float32)}
        params[f"lin{i}"] = {"w": jnp.abs(jnp.asarray(
            rng.randn(out_ch).astype(np.float32)))}
        in_ch = out_ch
    a = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)).clip(-1, 1)
    b = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)).clip(-1, 1)
    d_ab = float(lpips_distance(params, a, b))
    d_aa = float(lpips_distance(params, a, a))
    assert d_ab > d_aa >= 0.0
    assert d_aa < 1e-6


def test_demo_chat_session(monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
    from app_gradio import ChatSession

    class FakeModel:
        class core:
            class cfg:
                num_tokens = 4

        def generate_for_images_and_texts(self, conv, **kw):
            assert conv[-1].startswith("Q: hi")
            from PIL import Image as PILImage

            img = PILImage.new("RGB", (8, 8))
            return ["a caption [IMG0][IMG1][IMG2][IMG3]",
                    {"gen": [(img, 0.5)], "ret": [], "decision": ["gen", 0.9, 0.1]}]

    s = ChatSession(FakeModel())
    reply = s.user_turn("hi")
    assert reply[0] == "a caption"
    assert reply[1].size == (8, 8)
    assert len(s.conversation) == 3  # Q, text out, image out
