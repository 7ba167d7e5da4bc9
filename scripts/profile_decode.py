"""Ablation timing of the OPT cached-decode step: time the full KV-cached
greedy decode with components knocked out; component cost = full - ablated.

Env: GILL_BENCH_MODEL (facebook/opt-2.7b), GILL_BENCH_BATCH (16),
GILL_BENCH_PROMPT (32), GILL_BENCH_GEN (96).
"""

import os
import time

import jax
import jax.numpy as jnp


def main():
    import bench
    from gill_tpu.config import OPTConfig
    from gill_tpu.models import opt as opt_mod
    from gill_tpu.nn import core as nn

    bench._enable_compile_cache()

    model = os.environ.get("GILL_BENCH_MODEL", "facebook/opt-2.7b")
    batch = int(os.environ.get("GILL_BENCH_BATCH", "16"))
    prompt_len = int(os.environ.get("GILL_BENCH_PROMPT", "32"))
    gen_len = int(os.environ.get("GILL_BENCH_GEN", "96"))
    cfg = OPTConfig.from_name(model)
    emb_dim = cfg.word_embed_proj_dim
    max_len = prompt_len + gen_len

    prompt = jax.random.normal(
        jax.random.PRNGKey(1), (batch, prompt_len, emb_dim), jnp.bfloat16) * 0.02

    orig_layer = opt_mod._layer

    def layer_ablate(skip):
        def f(cfg_, lp, h, kv_offset=None, cache_kv=None, cache_pos=None):
            b, t, d = h.shape
            hd = cfg_.head_dim
            resid = h
            x = nn.layer_norm(lp["attn_ln"], h, cfg_.layer_norm_eps)
            new_kv = cache_kv
            if "attn" not in skip:
                q = nn.linear(lp["attn"]["q"], x).reshape(b, t, cfg_.num_heads, hd)
                k = nn.linear(lp["attn"]["k"], x).reshape(b, t, cfg_.num_heads, hd)
                v = nn.linear(lp["attn"]["v"], x).reshape(b, t, cfg_.num_heads, hd)
                if cache_kv is not None:
                    ck, cv = cache_kv
                    if "cacheupd" not in skip:
                        ck = jax.lax.dynamic_update_slice(
                            ck, k.astype(ck.dtype), (0, cache_pos, 0, 0))
                        cv = jax.lax.dynamic_update_slice(
                            cv, v.astype(cv.dtype), (0, cache_pos, 0, 0))
                    from gill_tpu.ops.attention import dot_product_attention
                    if "attncore" not in skip:
                        if isinstance(cache_pos, int) and cache_pos == 0:
                            attn = dot_product_attention(q, k, v, causal=True)
                        else:
                            attn = dot_product_attention(
                                q, ck, cv, causal=True, kv_offset=cache_pos)
                    else:
                        attn = q
                    new_kv = (ck, cv)
                else:
                    from gill_tpu.ops.attention import dot_product_attention
                    attn = dot_product_attention(q, k, v, causal=True)
                    new_kv = (k, v)
                x = nn.linear(lp["attn"]["o"], attn.reshape(b, t, d))
                h = resid + x
            resid = h
            x = nn.layer_norm(lp["mlp_ln"], h, cfg_.layer_norm_eps)
            if "mlp" not in skip:
                x = nn.linear(lp["fc2"], jax.nn.relu(nn.linear(lp["fc1"], x)))
                h = resid + x
            return h, new_kv
        return f

    def build_decode(skip_lm_head=False):
        def decode(params, prompt):
            cache = opt_mod.init_cache(cfg, batch, max_len, dtype=jnp.bfloat16)
            pre = opt_mod.forward(params, cfg, prompt, cache=cache, cache_pos=0)
            logits0, cache = pre["logits"][:, -1], pre["cache"]

            def step(carry, _):
                logits, cache, pos = carry
                tok = jnp.argmax(logits, axis=-1)
                emb = opt_mod.embed_tokens(params, tok[:, None]).astype(jnp.bfloat16)
                out = opt_mod.forward(params, cfg, emb, cache=cache,
                                      cache_pos=pos,
                                      skip_logits=skip_lm_head)
                if skip_lm_head:
                    lg = jnp.zeros_like(logits).at[:, 0].set(
                        out["last_hidden"][:, -1, 0].astype(jnp.float32))
                else:
                    lg = out["logits"][:, -1]
                return (lg, out["cache"], pos + 1), tok.sum()

            (_, _, _), s = jax.lax.scan(
                step, (logits0, cache, jnp.asarray(prompt_len)), None,
                length=gen_len)
            return s.sum()
        return decode

    from jax.experimental import layout as jlayout

    def run(decode):
        auto = jlayout.Format(jlayout.Layout.AUTO)
        p_shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            opt_mod.init_dummy(cfg, jnp.bfloat16))
        auto_tree = jax.tree_util.tree_map(lambda _: auto, p_shapes)
        compiled = jax.jit(decode, in_shardings=(auto_tree, auto)).lower(
            p_shapes, jax.ShapeDtypeStruct(prompt.shape, prompt.dtype)).compile()
        fmts = compiled.input_formats[0]
        params = jax.jit(lambda: opt_mod.init_dummy(cfg, jnp.bfloat16),
                         out_shardings=fmts[0])()
        pr = jax.device_put(prompt, fmts[1])
        t = bench._timed_scalar(lambda p, x: compiled(p, x), params, pr)
        del params
        return t

    results = {}
    base = run(build_decode())
    results["baseline"] = base
    print(f"baseline       {base*1e3:8.2f} ms  {batch*gen_len/base:8.1f} tok/s",
          flush=True)
    for name, skip in [("attn-core", ("attncore",)),
                       ("cache-upd", ("cacheupd", "attncore")),
                       ("whole-attn", ("attn",)),
                       ("mlp", ("mlp",))]:
        opt_mod._layer = layer_ablate(skip)
        t = run(build_decode())
        opt_mod._layer = orig_layer
        print(f"w/o {name:<11}{t*1e3:8.2f} ms  (delta {1e3*(base-t):7.2f})",
              flush=True)
    t = run(build_decode(skip_lm_head=True))
    print(f"w/o lm-head    {t*1e3:8.2f} ms  (delta {1e3*(base-t):7.2f})",
          flush=True)


if __name__ == "__main__":
    main()
