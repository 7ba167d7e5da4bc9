"""Golden-parity tests: our JAX OPT vs a random-init HF torch OPT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.weights.convert import opt_from_torch

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = OPTConfig(vocab_size=128, hidden_size=32, ffn_dim=64, num_layers=2,
                 num_heads=4, word_embed_proj_dim=32, max_positions=64)


def _make_torch_opt(cfg: OPTConfig, seed=0):
    hf_cfg = transformers.OPTConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_dim, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        word_embed_proj_dim=cfg.word_embed_proj_dim,
        max_position_embeddings=cfg.max_positions,
        do_layer_norm_before=cfg.do_layer_norm_before,
        dropout=0.0, attention_dropout=0.0, activation_function="relu",
    )
    torch.manual_seed(seed)
    model = transformers.OPTForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def pair():
    tm = _make_torch_opt(TINY)
    params = opt_from_torch(tm.state_dict(), TINY)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tm, params


def test_logits_parity(pair):
    tm, params = pair
    ids = np.array([[2, 5, 9, 30, 100, 7], [2, 1, 1, 90, 3, 6]], dtype=np.int64)
    with torch.no_grad():
        t_out = tm(input_ids=torch.tensor(ids), output_hidden_states=True)
    embs = opt_mod.embed_tokens(params, jnp.asarray(ids))
    j_out = opt_mod.forward(params, TINY, embs, collect_hidden=True)
    np.testing.assert_allclose(
        np.asarray(j_out["logits"]), t_out.logits.numpy(), atol=2e-5, rtol=2e-5)
    # final hidden (post final_layer_norm) == HF hidden_states[-1]
    np.testing.assert_allclose(
        np.asarray(j_out["last_hidden"]), t_out.hidden_states[-1].numpy(),
        atol=2e-5, rtol=2e-5)
    # per-layer hidden states == HF hidden_states[:-1]
    for i in range(TINY.num_layers):
        np.testing.assert_allclose(
            np.asarray(j_out["hidden_states"][i]),
            t_out.hidden_states[i].numpy(), atol=2e-5, rtol=2e-5)


def test_inputs_embeds_parity(pair):
    tm, params = pair
    rng = np.random.RandomState(0)
    embs = rng.randn(2, 5, TINY.word_embed_proj_dim).astype(np.float32)
    with torch.no_grad():
        t_out = tm(inputs_embeds=torch.tensor(embs))
    j_out = opt_mod.forward(params, TINY, jnp.asarray(embs))
    np.testing.assert_allclose(
        np.asarray(j_out["logits"]), t_out.logits.numpy(), atol=2e-5, rtol=2e-5)


def test_loss_parity(pair):
    tm, params = pair
    ids = np.array([[2, 5, 9, 30, 100, 7]], dtype=np.int64)
    labels = ids.copy()
    labels[0, :2] = -100
    with torch.no_grad():
        t_out = tm(input_ids=torch.tensor(ids), labels=torch.tensor(labels))
    embs = opt_mod.embed_tokens(params, jnp.asarray(ids))
    j_out = opt_mod.forward(params, TINY, embs)
    j_loss = opt_mod.loss_fn(j_out["logits"], jnp.asarray(labels))
    np.testing.assert_allclose(float(j_loss), float(t_out.loss), atol=1e-5, rtol=1e-5)


def test_kv_cache_decode_matches_full_forward(pair):
    _, params = pair
    ids = np.array([[2, 5, 9, 30, 100, 7, 11, 42]], dtype=np.int64)
    embs = opt_mod.embed_tokens(params, jnp.asarray(ids))
    full = opt_mod.forward(params, TINY, embs)

    max_seq = 16
    cache = opt_mod.init_cache(TINY, 1, max_seq, dtype=jnp.float32)
    # Prefill with the first 5 tokens, then decode one at a time.
    out = opt_mod.forward(params, TINY, embs[:, :5], cache=cache, cache_pos=0)
    logits = [out["logits"]]
    cache = out["cache"]
    for i in range(5, 8):
        step = opt_mod.forward(params, TINY, embs[:, i:i + 1], cache=cache,
                               cache_pos=i)
        cache = step["cache"]
        logits.append(step["logits"])
    cached_logits = np.concatenate([np.asarray(l) for l in logits], axis=1)
    np.testing.assert_allclose(cached_logits, np.asarray(full["logits"]),
                               atol=2e-4, rtol=2e-4)


def test_resize_embeddings(pair):
    _, params = pair
    p2 = opt_mod.resize_embeddings(params, TINY.vocab_size + 9,
                                   key=jax.random.PRNGKey(1))
    assert p2["embed_tokens"]["weight"].shape == (TINY.vocab_size + 9,
                                                  TINY.word_embed_proj_dim)
    # old rows intact
    np.testing.assert_array_equal(
        np.asarray(p2["embed_tokens"]["weight"][: TINY.vocab_size]),
        np.asarray(params["embed_tokens"]["weight"]))


def test_opt350m_projections():
    cfg = OPTConfig(vocab_size=96, hidden_size=32, ffn_dim=64, num_layers=2,
                    num_heads=4, word_embed_proj_dim=16, max_positions=64,
                    do_layer_norm_before=False)
    tm = _make_torch_opt(cfg, seed=1)
    params = jax.tree_util.tree_map(jnp.asarray, opt_from_torch(tm.state_dict(), cfg))
    ids = np.array([[2, 5, 9, 30]], dtype=np.int64)
    with torch.no_grad():
        t_out = tm(input_ids=torch.tensor(ids))
    embs = opt_mod.embed_tokens(params, jnp.asarray(ids))
    j_out = opt_mod.forward(params, cfg, embs)
    np.testing.assert_allclose(np.asarray(j_out["logits"]), t_out.logits.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_w8_quantized_decode_close_to_bf16():
    """W8A16 weight quantization: greedy decode logits stay close on a tiny
    model (per-channel int8 weights, dequant fused into the matmul)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gill_tpu.config import OPTConfig
    from gill_tpu.models import opt as opt_mod

    cfg = TINY
    params = opt_mod.init(jax.random.PRNGKey(0), cfg)
    qparams = opt_mod.quantize_params_w8(params)
    assert "w8" in qparams["layers"]["attn"]["q"]
    assert qparams["layers"]["fc1"]["w8"].dtype == jnp.int8

    emb = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 6, cfg.word_embed_proj_dim)) * 0.1
    ref = opt_mod.forward(params, cfg, emb)["logits"]
    out = opt_mod.forward(qparams, cfg, emb)["logits"]
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel

    # cached decode path works with w8 leaves too
    cache = opt_mod.init_cache(cfg, 2, 8)
    pre = opt_mod.forward(qparams, cfg, emb, cache=cache, cache_pos=0)
    step = opt_mod.forward(qparams, cfg, emb[:, :1], cache=pre["cache"],
                           cache_pos=jnp.asarray(6))
    assert step["logits"].shape == (2, 1, cfg.vocab_size)


def test_w8_matmul_kernel_matches_xla():
    """Pallas W8A16 kernel (interpret) vs the dequant-then-matmul form."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from gill_tpu.ops.w8_matmul import w8_matmul

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 1024).astype(np.float32))
    w8 = jnp.asarray(rng.randint(-127, 128, (1024, 1024)).astype(np.int8))
    ws = jnp.asarray((np.abs(rng.randn(1024)) * 1e-3 + 1e-4).astype(np.float32))
    b = jnp.asarray(rng.randn(1024).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = w8_matmul(x, w8, ws, b, block_n=512, block_k=512)
    ref = x @ (w8.astype(jnp.float32) * ws[None, :]) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_w8_matmul_stacked_matches_xla():
    """Stacked-weights kernel (interpret): per-layer BlockSpec indexing of
    the (L, K, N) int8 stack must match slicing + dequant-matmul for every
    layer index (dynamic idx, one kernel instance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from gill_tpu.ops.w8_matmul import w8_matmul_stacked

    rng = np.random.RandomState(1)
    L, K, N = 3, 1024, 512
    x = jnp.asarray(rng.randn(8, K).astype(np.float32))
    w8 = jnp.asarray(rng.randint(-127, 128, (L, K, N)).astype(np.int8))
    for i in range(L):
        ws = jnp.asarray(
            (np.abs(rng.randn(N)) * 1e-3 + 1e-4).astype(np.float32))
        b = jnp.asarray(rng.randn(N).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out = w8_matmul_stacked(x, w8, ws, b, i,
                                    block_n=256, block_k=512)
        ref = x @ (w8[i].astype(jnp.float32) * ws[None, :]) + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_layer_view_w8_stacked_forward():
    """The unrolled + w8 forward (stacked-weight views) matches the scan
    forward with sliced-dequant weights on CPU."""
    import jax.numpy as jnp
    import numpy as np

    from gill_tpu.config import OPTConfig
    from gill_tpu.models import opt as opt_mod

    import jax

    cfg = OPTConfig(num_layers=2, hidden_size=64, ffn_dim=128, num_heads=4,
                    vocab_size=100, max_positions=32,
                    word_embed_proj_dim=64)
    params = opt_mod.init(jax.random.PRNGKey(3), cfg)
    qparams = opt_mod.quantize_params_w8(params)
    emb = jnp.asarray(np.random.RandomState(0).randn(2, 5, 64) * 0.1,
                      jnp.float32)
    cache = opt_mod.init_cache(cfg, 2, 8, dtype=jnp.float32)
    ref = opt_mod.forward(qparams, cfg, emb, cache=cache, cache_pos=0,
                          unroll_layers=False)
    out = opt_mod.forward(qparams, cfg, emb, cache=cache, cache_pos=0,
                          unroll_layers=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]), rtol=1e-5,
                               atol=1e-5)
    # deferred decode step too
    step_r = opt_mod.forward(qparams, cfg, emb[:, :1], cache=ref["cache"],
                             cache_pos=jnp.asarray(5), unroll_layers=False)
    step_u = opt_mod.forward(qparams, cfg, emb[:, :1], cache=out["cache"],
                             cache_pos=jnp.asarray(5), unroll_layers=True)
    np.testing.assert_allclose(np.asarray(step_u["logits"]),
                               np.asarray(step_r["logits"]), rtol=1e-5,
                               atol=1e-5)


def test_forward_kv_window_slice_matches_full_read():
    """The serving engines bound decode KV traffic by slicing the cache pool
    to rows [0, kv_hi) BEFORE forward and merging the updated window back
    after (serve/engine.py _kv_window/_kv_window_merge — an in-layer read
    slice double-buffered the full pool and OOM'd compilation at deep
    max_seq). As long as every slot's cache_pos < kv_hi, the windowed
    forward's logits and merged cache match the full-cache forward."""
    import numpy as np

    from gill_tpu.serve.engine import _kv_window, _kv_window_merge

    cfg = OPTConfig(num_layers=2, hidden_size=64, ffn_dim=128, num_heads=4,
                    vocab_size=96, max_positions=128, word_embed_proj_dim=64)
    params = opt_mod.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    cache = opt_mod.init_cache(cfg, 3, 64, dtype=jnp.float32)
    cache = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.1),
        cache)
    pos = jnp.asarray([5, 17, 30], jnp.int32)
    emb = opt_mod.embed_tokens(params, jnp.asarray([[7], [9], [11]], jnp.int32))
    full = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=pos)
    win = opt_mod.forward(params, cfg, emb, cache=_kv_window(cache, 32),
                          cache_pos=pos)
    np.testing.assert_allclose(np.asarray(win["logits"]),
                               np.asarray(full["logits"]),
                               atol=1e-5, rtol=1e-5)
    # the merged pool must carry the deferred writes at each slot's pos and
    # leave rows beyond the window untouched
    merged = _kv_window_merge(cache, win["cache"])
    for key in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(merged[key][:, jnp.arange(3), pos]),
            np.asarray(full["cache"][key][:, jnp.arange(3), pos]),
            atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(merged[key][:, :, 32:]),
                                      np.asarray(cache[key][:, :, 32:]))
