"""Tensor-parallel serving path: KV-cached decode with the frozen LM sharded
over the "model" axis must match single-device decoding."""

import jax
import jax.numpy as jnp
import numpy as np

from gill_tpu.parallel import create_mesh, param_shardings
from gill_tpu.parallel.partition import replicated

from test_gill_forward import make_core


def test_tp_sharded_decode_matches_single_device():
    core = make_core()
    params = core.init_params(jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    input_embs = jnp.asarray(rng.randn(1, 4, core.lm_dim).astype(np.float32) * 0.02)

    out1 = core.generate(params, input_embs, num_words=6, temperature=0.0)
    toks1 = np.asarray(out1["tokens"])

    mesh = create_mesh(dp_size=1, tp_size=8)
    params_s = jax.device_put(params, param_shardings(mesh, params))
    embs_s = jax.device_put(input_embs, replicated(mesh))
    with jax.sharding.set_mesh(mesh):
        out2 = core.generate(params_s, embs_s, num_words=6, temperature=0.0)
    toks2 = np.asarray(out2["tokens"])
    np.testing.assert_array_equal(toks1, toks2)
    np.testing.assert_allclose(np.asarray(out1["hidden"]),
                               np.asarray(out2["hidden"]), atol=2e-4,
                               rtol=2e-4)


def test_partition_specs_shapes():
    """TP rules shard exactly the attention/MLP matrices of the LM."""
    from jax.sharding import PartitionSpec as P

    from gill_tpu.parallel.partition import param_pspecs

    core = make_core()
    params = core.init_params(jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    assert specs["lm"]["layers"]["attn"]["q"]["w"] == P(None, None, "model")
    assert specs["lm"]["layers"]["attn"]["o"]["w"] == P(None, "model", None)
    assert specs["lm"]["layers"]["fc1"]["w"] == P(None, None, "model")
    assert specs["lm"]["layers"]["fc2"]["w"] == P(None, "model", None)
    assert specs["lm"]["layers"]["attn_ln"]["scale"] == P()
    assert specs["lm"]["embed_tokens"]["weight"] == P()
    assert specs["vision"]["layers"]["attn"]["q"]["w"] == P()
    assert specs["adapters"]["gen_fc"]["tfm"]["encoder"]["layers"][
        "self_attn"]["q"]["w"] == P()
