"""Parity: our mapper vs an equivalent torch module built on
torch.nn.Transformer (the reference's gill_mapper core, gill/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.models import mapper as mapper_mod
from gill_tpu.weights.convert import text_fc_layer_from_torch

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402


class TorchTextFc(tnn.Module):
    """Equivalent of the reference TextFcLayer for conversion testing."""

    def __init__(self, in_dim, out_dim, n_out, mode, hidden=64, nhead=4,
                 ff=128, n_enc=2, n_dec=2):
        super().__init__()
        self.mode = mode
        if mode == "linear":
            self.model = tnn.Linear(in_dim, out_dim)
        else:
            self.fc = tnn.Linear(in_dim, hidden)
            self.tfm = tnn.Transformer(
                batch_first=True, norm_first=True, d_model=hidden,
                num_encoder_layers=n_enc, num_decoder_layers=n_dec,
                dim_feedforward=ff, dropout=0.0, nhead=nhead)
            self.model = tnn.Linear(hidden, out_dim)
            self.query_embs = tnn.Parameter(torch.randn(1, n_out, hidden))
        self.n_out = n_out

    def forward(self, x, input_embs=None):
        if self.mode == "gill_mapper":
            if input_embs is not None:
                x = x + input_embs
            x = self.fc(x)
            x = self.tfm(x, self.query_embs.repeat(x.shape[0], 1, 1))
        out = self.model(x)
        if self.mode == "linear" and out.shape[1] != self.n_out:
            out = out[:, : self.n_out, :]
        return out


def test_linear_mode_parity():
    torch.manual_seed(0)
    tm = TorchTextFc(24, 16, n_out=1, mode="linear").eval()
    cfg = mapper_mod.MapperConfig(in_dim=24, out_dim=16, num_input_tokens=8,
                                  num_output_tokens=1, mode="linear")
    params = jax.tree_util.tree_map(
        jnp.asarray, text_fc_layer_from_torch(tm.state_dict(), "", "linear"))
    x = np.random.RandomState(0).randn(3, 8, 24).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.tensor(x))
    j_out = mapper_mod.apply(params, cfg, jnp.asarray(x))
    assert j_out.shape == (3, 1, 16)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("with_input_embs", [True, False])
def test_gill_mapper_parity(with_input_embs):
    torch.manual_seed(1)
    tm = TorchTextFc(24, 16, n_out=7, mode="gill_mapper").eval()
    cfg = mapper_mod.MapperConfig(
        in_dim=24, out_dim=16, num_input_tokens=8, num_output_tokens=7,
        mode="gill_mapper", hidden_dim=64, num_heads=4, ffn_dim=128,
        num_encoder_layers=2, num_decoder_layers=2)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        text_fc_layer_from_torch(tm.state_dict(), "", "gill_mapper", d_model=64,
                                 num_encoder_layers=2, num_decoder_layers=2))
    rng = np.random.RandomState(1)
    x = rng.randn(3, 8, 24).astype(np.float32)
    embs = rng.randn(3, 8, 24).astype(np.float32) if with_input_embs else None
    with torch.no_grad():
        t_out = tm(torch.tensor(x), torch.tensor(embs) if embs is not None else None)
    j_out = mapper_mod.apply(params, cfg, jnp.asarray(x),
                             jnp.asarray(embs) if embs is not None else None)
    assert j_out.shape == (3, 7, 16)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=3e-5, rtol=3e-5)
