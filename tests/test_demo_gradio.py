"""Drives the demo's gradio WEB branch through a fake-gradio shim.

gradio is not installed in this image, so the Blocks construction +
callbacks (reference demo/app_gradio.py:38-218) would otherwise never
execute. The shim implements exactly the gradio API surface the demo uses
(Blocks context manager, components, submit/click event registration) and
the test pushes a full turn and an export-conversation click through the
registered callbacks — the same code paths a browser session would hit.
"""

import os
import sys
import types

import jax
import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self._blocks = _FakeGradio.current
        if self._blocks is not None:
            self._blocks.components.append(self)

    def submit(self, fn, inputs, outputs):
        self._blocks.events.append(("submit", self, fn, inputs, outputs))

    def click(self, fn, inputs, outputs):
        self._blocks.events.append(("click", self, fn, inputs, outputs))


class _Blocks:
    def __init__(self, *args, **kwargs):
        self.components = []
        self.events = []
        self.queued = None
        self.launched = None

    def __enter__(self):
        _FakeGradio.current = self
        return self

    def __exit__(self, *exc):
        _FakeGradio.current = None
        return False

    def queue(self, **kwargs):
        self.queued = kwargs
        return self

    def launch(self, **kwargs):
        self.launched = kwargs


class _FakeGradio(types.ModuleType):
    current = None

    def __init__(self):
        super().__init__("gradio")
        self.Blocks = _Blocks
        for name in ("Chatbot", "Textbox", "Image", "Slider", "State",
                     "Button", "File"):
            setattr(self, name, type(name, (_Component,), {}))


@pytest.fixture()
def tiny_model(tmp_path):
    import json  # noqa: F401  (parity with test_load_gill fixture shape)
    import pickle

    from gill_tpu.api import load_gill
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
    save_checkpoint(
        {"adapters": jax.device_get(core.init_adapters(jax.random.PRNGKey(7)))},
        str(tmp_path), step=1)
    rng = np.random.RandomState(0)
    with open(tmp_path / "cc3m_embeddings.npy", "wb") as f:
        pickle.dump({"paths": [f"p{i}" for i in range(6)],
                     "embeddings": list(rng.randn(6, 8).astype(np.float32))},
                    f)
    return load_gill(str(tmp_path), load_sd=False, decision_model_fn=None,
                     weights_dir=None)


def test_gradio_blocks_one_turn_and_export(tiny_model, tmp_path):
    import app_gradio

    fake_gr = _FakeGradio()
    args = types.SimpleNamespace(host="0.0.0.0", port=7860,
                                 save_dir=str(tmp_path / "out"))
    os.makedirs(args.save_dir, exist_ok=True)

    demo = app_gradio.build_blocks(fake_gr, tiny_model, args)
    kinds = {type(c).__name__ for c in demo.components}
    assert {"Chatbot", "Textbox", "Image", "Slider", "State", "Button",
            "File"} <= kinds
    events = {kind: (fn, ins, outs) for kind, _, fn, ins, outs
              in demo.events}
    assert set(events) == {"submit", "click"}

    # one full user turn through the submit callback: text + uploaded image
    respond = events["submit"][0]
    upload = np.zeros((24, 24, 3), np.uint8)
    history, session = respond("hi there", upload, None, 1.3, 0.0, None)
    assert len(history) == 1 and history[0][0] == "hi there"
    assert all(isinstance(x, (str, tuple)) for x in history[0][1])
    assert isinstance(session.conversation[0], Image.Image)  # upload resized
    assert session.conversation[0].size == (224, 224)

    # second turn reuses the session state (conversation grows)
    n_before = len(session.conversation)
    history, session = respond("and again", None, history, 1.3, 0.0, session)
    assert len(history) == 2 and len(session.conversation) > n_before

    # export click writes a self-contained shareable HTML transcript
    export = events["click"][0]
    path = export(session)
    assert path is not None and os.path.exists(path)
    html = open(path).read()
    assert "hi there" in html and "data:image/png;base64," in html
    assert export(None) is None  # empty-session guard

    # the real launcher wires queue(max_size=1).launch(...) like the
    # reference (demo/app_gradio.py:214)
    import unittest.mock as mock

    with mock.patch.dict(sys.modules, {"gradio": fake_gr}):
        app_gradio.launch_gradio(tiny_model, args)
    # a second Blocks was built and launched by launch_gradio
