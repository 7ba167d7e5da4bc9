"""Golden-parity tests: JAX CLIP towers vs random-init HF torch CLIP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import CLIPVisionConfig
from gill_tpu.models import clip as clip_mod
from gill_tpu.weights.convert import clip_text_from_torch, clip_vision_from_torch

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VIS = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                       num_heads=4, image_size=32, patch_size=8)
TXT = clip_mod.CLIPTextConfig(vocab_size=100, hidden_size=32,
                              intermediate_size=64, num_layers=2, num_heads=4,
                              max_positions=16, eos_token_id=99)


def test_vision_parity():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=VIS.hidden_size, intermediate_size=VIS.intermediate_size,
        num_hidden_layers=VIS.num_layers, num_attention_heads=VIS.num_heads,
        image_size=VIS.image_size, patch_size=VIS.patch_size,
        hidden_act="quick_gelu")
    torch.manual_seed(0)
    tm = transformers.CLIPVisionModel(hf_cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, clip_vision_from_torch(tm.state_dict(), VIS))

    rng = np.random.RandomState(0)
    px_nchw = rng.randn(2, 3, VIS.image_size, VIS.image_size).astype(np.float32)
    with torch.no_grad():
        t_out = tm(pixel_values=torch.tensor(px_nchw))
    j_out = clip_mod.vision_forward(params, VIS,
                                    jnp.asarray(px_nchw.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_out["pooler_output"]),
                               t_out.pooler_output.numpy(), atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(j_out["last_hidden"]),
                               t_out.last_hidden_state.numpy(), atol=3e-5, rtol=3e-5)


def test_text_parity():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=TXT.vocab_size, hidden_size=TXT.hidden_size,
        intermediate_size=TXT.intermediate_size,
        num_hidden_layers=TXT.num_layers, num_attention_heads=TXT.num_heads,
        max_position_embeddings=TXT.max_positions, hidden_act="quick_gelu",
        eos_token_id=TXT.eos_token_id, bos_token_id=98)
    torch.manual_seed(1)
    tm = transformers.CLIPTextModel(hf_cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, clip_text_from_torch(tm.state_dict(), TXT))

    ids = np.array([[98, 5, 9, 30, 99, 0, 0, 0],
                    [98, 1, 2, 3, 4, 5, 6, 99]], dtype=np.int64)
    with torch.no_grad():
        t_out = tm(input_ids=torch.tensor(ids))
    j_out = clip_mod.text_forward(params, TXT, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(j_out["last_hidden"]),
                               t_out.last_hidden_state.numpy(), atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(j_out["pooler_output"]),
                               t_out.pooler_output.numpy(), atol=3e-5, rtol=3e-5)
