"""Continuous-batching serving engine (gill_tpu/serve/engine.py).

The engine's per-slot machinery (vector cache_pos through the deferred-write
decode, per-slot attention masks, scatter KV writes, slot refill) must be
invisible: greedy outputs are identical to a plain one-request-at-a-time
KV-cached decode, no matter how requests are packed into slots.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.config import OPTConfig
from gill_tpu.models import opt as opt_mod
from gill_tpu.serve.engine import DecodeEngine, ServeRequest


@pytest.fixture(scope="module")
def tiny():
    cfg = OPTConfig(num_layers=2, hidden_size=64, ffn_dim=128, num_heads=4,
                    vocab_size=128, max_positions=256,
                    word_embed_proj_dim=64)
    params = opt_mod.init(jax.random.PRNGKey(11), cfg)
    return params, cfg


def _reference_greedy(params, cfg, prompt, n_new):
    """Plain KV-cached greedy decode, one token per forward, batch 1."""
    cache = opt_mod.init_cache(cfg, 1, 256, dtype=jnp.float32)
    emb = opt_mod.embed_tokens(params, jnp.asarray([prompt], jnp.int32))
    out = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=0)
    tok = int(jnp.argmax(out["logits"][0, len(prompt) - 1]))
    # crop the prefill cache writes beyond the prompt (batch-1 full-length
    # prefill writes all padded rows; the engine's bucketed prefill pads too
    # but masks by true length) — rewrite rows >= len(prompt) with zeros
    cache = out["cache"]
    gen = [tok]
    pos = len(prompt)
    for _ in range(n_new - 1):
        emb = opt_mod.embed_tokens(params, jnp.asarray([[tok]], jnp.int32))
        out = opt_mod.forward(params, cfg, emb, cache=cache,
                              cache_pos=jnp.asarray(pos))
        cache = out["cache"]
        tok = int(jnp.argmax(out["logits"][0, -1]))
        gen.append(tok)
        pos += 1
    return gen


def test_engine_matches_reference_decode(tiny):
    params, cfg = tiny
    rng = np.random.RandomState(0)
    reqs = []
    for uid in range(7):
        plen = int(rng.randint(3, 20))
        prompt = rng.randint(2, 120, size=plen).tolist()
        reqs.append(ServeRequest(uid=uid, prompt=prompt,
                                 max_new_tokens=int(rng.randint(2, 12))))

    eng = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                       prefill_buckets=(8, 16, 32), unroll_layers=False,
                       kv_dtype=jnp.float32)
    results = eng.run(reqs)

    assert set(results) == set(r.uid for r in reqs)
    for r in reqs:
        assert len(results[r.uid]) == r.max_new_tokens
        ref = _reference_greedy(params, cfg, r.prompt, r.max_new_tokens)
        assert results[r.uid] == ref, f"uid {r.uid}"


def test_engine_wave_equals_continuous(tiny):
    """Scheduling must not change tokens — only throughput."""
    params, cfg = tiny
    rng = np.random.RandomState(1)
    reqs = [ServeRequest(uid=i, prompt=rng.randint(2, 120, size=int(
        rng.randint(3, 14))).tolist(), max_new_tokens=int(rng.randint(1, 9)))
        for i in range(9)]

    eng = DecodeEngine(params, cfg, slots=4, max_seq=32, chunk=3,
                       prefill_buckets=(16,), unroll_layers=False,
                       kv_dtype=jnp.float32)
    cont = eng.run(reqs)
    waves = eng.run_waves(reqs)
    assert cont == waves


def test_engine_continuous_does_less_decode_work(tiny):
    """With skewed lengths, wave scheduling pays max(len) steps per wave;
    continuous refill should finish in fewer decode chunks."""
    params, cfg = tiny
    rng = np.random.RandomState(2)
    # one long request per group of shorts
    reqs = []
    for i in range(8):
        n = 24 if i % 4 == 0 else 3
        reqs.append(ServeRequest(
            uid=i, prompt=rng.randint(2, 120, size=5).tolist(),
            max_new_tokens=n))

    eng = DecodeEngine(params, cfg, slots=4, max_seq=64, chunk=2,
                       prefill_buckets=(8,), unroll_layers=False,
                       kv_dtype=jnp.float32)
    eng.run(reqs)
    cont_chunks = eng.stats["chunks"]
    eng.stats.update(chunks=0)
    eng.run_waves(reqs)
    wave_chunks = eng.stats["chunks"]
    assert cont_chunks < wave_chunks, (cont_chunks, wave_chunks)


def test_engine_eos_stops_request(tiny):
    params, cfg = tiny
    rng = np.random.RandomState(3)
    prompt = rng.randint(2, 120, size=6).tolist()
    eng = DecodeEngine(params, cfg, slots=2, max_seq=64, chunk=4,
                       prefill_buckets=(8,), unroll_layers=False,
                       kv_dtype=jnp.float32)
    free_run = eng.run([ServeRequest(uid=0, prompt=prompt,
                                     max_new_tokens=10)])[0]
    # pick a token the model actually emits mid-stream as the "EOS"
    eos = free_run[4]
    eng2 = DecodeEngine(params, cfg, slots=2, max_seq=64, chunk=4,
                        prefill_buckets=(8,), unroll_layers=False,
                        kv_dtype=jnp.float32, eos_id=eos)
    stopped = eng2.run([ServeRequest(uid=0, prompt=prompt,
                                     max_new_tokens=10)])[0]
    assert stopped == free_run[:free_run.index(eos) + 1]


def test_engine_unrolled_matches_scan(tiny):
    """unroll_layers=True (the TPU serving default) produces the same
    tokens as the scan-over-layers path."""
    params, cfg = tiny
    rng = np.random.RandomState(4)
    reqs = [ServeRequest(uid=i, prompt=rng.randint(2, 120, size=int(
        rng.randint(3, 12))).tolist(), max_new_tokens=6) for i in range(4)]
    out_scan = DecodeEngine(params, cfg, slots=2, max_seq=32, chunk=4,
                            prefill_buckets=(16,), unroll_layers=False,
                            kv_dtype=jnp.float32).run(reqs)
    out_unroll = DecodeEngine(params, cfg, slots=2, max_seq=32, chunk=4,
                              prefill_buckets=(16,), unroll_layers=True,
                              kv_dtype=jnp.float32).run(reqs)
    assert out_scan == out_unroll


def test_engine_warmup_is_inert_and_prefills_are_batched(tiny):
    """warmup() precompiles every (bucket, wave) prefill variant via
    out-of-range scatters — it must not change outputs; a wave of requests
    refills in ONE prefill launch (the batched-prefill contract)."""
    params, cfg = tiny
    rng = np.random.RandomState(5)
    reqs = [ServeRequest(uid=i, prompt=rng.randint(2, 120, size=int(
        rng.randint(3, 20))).tolist(), max_new_tokens=4) for i in range(6)]

    plain = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                         prefill_buckets=(8, 32), unroll_layers=False,
                         kv_dtype=jnp.float32).run(reqs)
    eng = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                       prefill_buckets=(8, 32), unroll_layers=False,
                       kv_dtype=jnp.float32)
    eng.warmup()
    warmed = eng.run(reqs)
    assert warmed == plain
    assert eng.stats["prefill_reqs"] == len(reqs)
    # 6 requests over 3 slots = 2+ waves, but far fewer launches than reqs
    assert eng.stats["prefills"] < len(reqs)


def test_engine_pipelined_matches_run(tiny):
    """The asynchronous chunk pipeline must be invisible in the outputs:
    same tokens as the synchronous scheduler for any depth/packing."""
    params, cfg = tiny
    rng = np.random.RandomState(7)
    reqs = [ServeRequest(uid=i, prompt=rng.randint(2, 120, size=int(
        rng.randint(3, 20))).tolist(), max_new_tokens=int(rng.randint(1, 14)))
        for i in range(11)]

    sync = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                        prefill_buckets=(8, 32), unroll_layers=False,
                        kv_dtype=jnp.float32).run(reqs)
    for depth in (1, 2, 5):
        eng = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                           prefill_buckets=(8, 32), unroll_layers=False,
                           kv_dtype=jnp.float32)
        piped = eng.run_pipelined(reqs, depth=depth)
        assert piped == sync, f"depth {depth}"


def test_engine_pipelined_eos(tiny):
    """EOS stays correct in pipelined mode (collector truncates at EOS even
    though the planner scheduled the full budget)."""
    params, cfg = tiny
    rng = np.random.RandomState(8)
    prompt = rng.randint(2, 120, size=6).tolist()
    free_run = DecodeEngine(params, cfg, slots=2, max_seq=64, chunk=4,
                            prefill_buckets=(8,), unroll_layers=False,
                            kv_dtype=jnp.float32).run(
        [ServeRequest(uid=0, prompt=prompt, max_new_tokens=10)])[0]
    eos = free_run[4]
    eng = DecodeEngine(params, cfg, slots=2, max_seq=64, chunk=4,
                       prefill_buckets=(8,), unroll_layers=False,
                       kv_dtype=jnp.float32, eos_id=eos)
    stopped = eng.run_pipelined([ServeRequest(uid=0, prompt=prompt,
                                              max_new_tokens=10)])[0]
    assert stopped == free_run[:free_run.index(eos) + 1]


def test_engine_tp_mesh_matches_single_device(tiny):
    """mesh= : Megatron-TP sharded engine over the 8-device virtual mesh
    produces the same tokens as the single-device engine."""
    import jax

    from gill_tpu.parallel import create_mesh

    params, cfg = tiny
    rng = np.random.RandomState(6)
    reqs = [ServeRequest(uid=i, prompt=rng.randint(2, 120, size=int(
        rng.randint(3, 12))).tolist(), max_new_tokens=int(rng.randint(2, 8)))
        for i in range(6)]

    single = DecodeEngine(params, cfg, slots=2, max_seq=32, chunk=4,
                          prefill_buckets=(16,), unroll_layers=False,
                          kv_dtype=jnp.float32).run(reqs)
    mesh = create_mesh(dp_size=2, tp_size=4)   # 4 heads -> TP=4
    sharded = DecodeEngine(params, cfg, slots=2, max_seq=32, chunk=4,
                           prefill_buckets=(16,), unroll_layers=False,
                           kv_dtype=jnp.float32, mesh=mesh).run(reqs)
    assert single == sharded


def test_engine_prefix_caching_matches_full_prefill(tiny):
    """Requests carrying a registered prefix_id must produce exactly the
    tokens of a full-prompt prefill — the cached prefix KV + static-offset
    suffix prefill is a pure optimization."""
    params, cfg = tiny
    rng = np.random.RandomState(9)
    prefix = rng.randint(2, 120, size=11).tolist()
    suffixes = [rng.randint(2, 120, size=int(rng.randint(1, 9))).tolist()
                for _ in range(6)]
    full_reqs = [ServeRequest(uid=i, prompt=prefix + sfx, max_new_tokens=6)
                 for i, sfx in enumerate(suffixes)]

    plain = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                         prefill_buckets=(8, 32), unroll_layers=False,
                         kv_dtype=jnp.float32).run(full_reqs)

    eng = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                       prefill_buckets=(8, 32), unroll_layers=False,
                       kv_dtype=jnp.float32)
    pid = eng.register_prefix(prefix)
    pfx_reqs = [ServeRequest(uid=i, prompt=prefix + sfx, max_new_tokens=6,
                             prefix_id=pid)
                for i, sfx in enumerate(suffixes)]
    cached = eng.run(pfx_reqs)
    assert cached == plain
    assert eng.stats["prefix_hits"] == len(suffixes)
    assert eng.stats["prefix_tokens_saved"] == len(prefix) * len(suffixes)
    # pipelined scheduler takes the same path
    piped = eng.run_pipelined(pfx_reqs)
    assert piped == plain


def test_engine_prefix_validation(tiny):
    params, cfg = tiny
    eng = DecodeEngine(params, cfg, slots=2, max_seq=32, chunk=2,
                       prefill_buckets=(8,), unroll_layers=False,
                       kv_dtype=jnp.float32)
    pid = eng.register_prefix([5, 6, 7])
    # prompt must START with the prefix tokens
    with pytest.raises(ValueError, match="extend prefix"):
        eng.run([ServeRequest(uid=0, prompt=[9, 9, 9, 9],
                              max_new_tokens=2, prefix_id=pid)])
    # and extend it by at least one token
    with pytest.raises(ValueError, match="extend prefix"):
        eng.run([ServeRequest(uid=0, prompt=[5, 6, 7],
                              max_new_tokens=2, prefix_id=pid)])
    with pytest.raises(ValueError, match="unknown prefix_id"):
        eng.run([ServeRequest(uid=0, prompt=[5, 6, 7, 8],
                              max_new_tokens=2, prefix_id=99)])


def test_engine_pipelined_eos_aware_refill(tiny):
    """The pipelined planner retires an EOS-finished slot within `depth`
    chunks of collection instead of dispatching its whole budget: with one
    EOS-heavy request and a queue behind it, pipelined chunk count must not
    exceed the synchronous scheduler's by more than the collection lag."""
    params, cfg = tiny
    rng = np.random.RandomState(10)
    prompt = rng.randint(2, 120, size=6).tolist()
    probe = DecodeEngine(params, cfg, slots=1, max_seq=64, chunk=2,
                         prefill_buckets=(8,), unroll_layers=False,
                         kv_dtype=jnp.float32)
    free = probe.run([ServeRequest(uid=0, prompt=prompt,
                                   max_new_tokens=40)])[0]
    eos = free[2]   # EOS lands on token 3 of a 40-token budget
    reqs = [ServeRequest(uid=i, prompt=prompt, max_new_tokens=40)
            for i in range(4)]

    def chunks_of(fn_name):
        e = DecodeEngine(params, cfg, slots=1, max_seq=64, chunk=2,
                         prefill_buckets=(8,), unroll_layers=False,
                         kv_dtype=jnp.float32, eos_id=eos)
        out = getattr(e, fn_name)(reqs)
        for r in reqs:
            assert out[r.uid] == free[:free.index(eos) + 1], fn_name
        return e.stats["chunks"]

    sync_chunks = chunks_of("run")
    piped_chunks = chunks_of("run_pipelined")
    # without EOS-aware retirement the planner would dispatch
    # ceil(40/2)=20 chunks per request (80 total); with it, each request
    # costs the sync count plus at most the depth-2 collection lag
    assert piped_chunks <= sync_chunks + 2 * len(reqs), \
        (piped_chunks, sync_chunks)


def test_engine_extend_prefix_matches_fresh_registration(tiny):
    """extend_prefix prefills only the new tokens at the parent's offset;
    the result must be indistinguishable from registering the full
    concatenation, and dropped prefixes must fail admission."""
    params, cfg = tiny
    rng = np.random.RandomState(17)
    base = rng.randint(2, 120, size=7).tolist()
    turn = rng.randint(2, 120, size=5).tolist()
    sfx = rng.randint(2, 120, size=3).tolist()

    eng = DecodeEngine(params, cfg, slots=2, max_seq=64, chunk=4,
                       prefill_buckets=(8, 32), unroll_layers=False,
                       kv_dtype=jnp.float32)
    pid_full = eng.register_prefix(base + turn)
    want = eng.run([ServeRequest(uid=0, prompt=base + turn + sfx,
                                 max_new_tokens=6, prefix_id=pid_full)])

    pid0 = eng.register_prefix(base)
    pid1 = eng.extend_prefix(pid0, turn)
    got = eng.run([ServeRequest(uid=0, prompt=base + turn + sfx,
                                max_new_tokens=6, prefix_id=pid1)])
    assert got == want

    # the parent stays registered until dropped
    eng.run([ServeRequest(uid=1, prompt=base + [9], max_new_tokens=2,
                          prefix_id=pid0)])
    eng.drop_prefix(pid0)
    with pytest.raises(ValueError, match="unknown prefix_id"):
        eng.run([ServeRequest(uid=2, prompt=base + [9], max_new_tokens=2,
                              prefix_id=pid0)])
    with pytest.raises(ValueError, match="unknown prefix_id"):
        eng.extend_prefix(pid0, [5])
    with pytest.raises(ValueError, match="unknown prefix_id"):
        eng.drop_prefix(pid0)
    with pytest.raises(ValueError, match="extension length"):
        eng.extend_prefix(pid1, [])


def test_engine_kv_read_buckets_match_full_read(tiny):
    """KV read-window bucketing: the chunk program compiles one variant per
    bucket and the scheduler picks the smallest window covering every slot's
    position bound (device budget freeze keeps retired slots from inflating
    it). Must be invisible in the tokens — only the read traffic changes."""
    params, cfg = tiny
    rng = np.random.RandomState(23)
    reqs = [ServeRequest(uid=i,
                         prompt=rng.randint(2, 120,
                                            size=int(rng.randint(3, 20))
                                            ).tolist(),
                         max_new_tokens=int(rng.randint(2, 14)))
            for i in range(11)]

    kw = dict(slots=4, max_seq=64, chunk=4, prefill_buckets=(8, 16, 32),
              unroll_layers=False, kv_dtype=jnp.float32)
    full = DecodeEngine(params, cfg, kv_read_buckets=None, **kw)
    bkt = DecodeEngine(params, cfg, kv_read_buckets=(16, 32, 48), **kw)
    assert full.kv_buckets == (64,)
    assert bkt.kv_buckets == (16, 32, 48, 64)

    want = full.run_pipelined(list(reqs))
    got = bkt.run_pipelined(list(reqs))
    assert got == want
    # narrow windows were actually dispatched
    assert bkt.stats["kv_rows_read"] < bkt.stats["chunks"] * bkt.max_seq, \
        bkt.stats
    assert full.stats["kv_rows_read"] == full.stats["chunks"] * full.max_seq

    # same through run() and with EOS mid-stream
    eos = want[reqs[0].uid][1]
    full_e = DecodeEngine(params, cfg, kv_read_buckets=None, eos_id=eos,
                          **kw)
    bkt_e = DecodeEngine(params, cfg, kv_read_buckets=(16, 32, 48),
                         eos_id=eos, **kw)
    assert bkt_e.run(list(reqs)) == full_e.run(list(reqs))

    # and through the prefix-cached path
    base = rng.randint(2, 120, size=9).tolist()
    pid_f = full.register_prefix(base)
    pid_b = bkt.register_prefix(base)
    preqs_f = [ServeRequest(uid=i, prompt=base + rng.randint(
        2, 120, size=4 + i).tolist(), max_new_tokens=5, prefix_id=pid_f)
        for i in range(3)]
    preqs_b = [ServeRequest(uid=r.uid, prompt=r.prompt, max_new_tokens=5,
                            prefix_id=pid_b) for r in preqs_f]
    assert bkt.run(preqs_b) == full.run(preqs_f)


def test_engine_budget_freeze_bounds_kv_window(tiny):
    """One deep request next to a stream of shallow ones: once the deep
    slot's budget is exhausted (device freeze), the window must shrink back
    to the shallow depth even though the slot is never refilled."""
    params, cfg = tiny
    deep = ServeRequest(uid=0, prompt=list(range(2, 40)),
                        max_new_tokens=20)          # pos caps at 57
    shallow = [ServeRequest(uid=1 + i, prompt=[5, 6, 7],
                            max_new_tokens=4) for i in range(8)]
    eng = DecodeEngine(params, cfg, slots=2, max_seq=64, chunk=4,
                       prefill_buckets=(8, 64), unroll_layers=False,
                       kv_dtype=jnp.float32, kv_read_buckets=(16, 32, 48))
    res = eng.run([deep] + shallow)
    assert len(res[0]) == 20 and all(len(res[1 + i]) == 4 for i in range(8))
    # after the deep request retires, chunks must have run at a window
    # smaller than its depth: total rows < chunks * 64 AND at least one
    # chunk at the smallest bucket that covers the shallow stream
    assert eng.stats["kv_rows_read"] < eng.stats["chunks"] * 64, eng.stats


def test_engine_int8_kv_with_read_buckets_match_full_read(tiny):
    """The deep-pool production config composes BOTH serving KV levers:
    int8 KV (capacity — the bf16 pool at max_seq 2048 x 16 slots is 10.7 GB
    and cannot be buffer-assigned next to the W8 weights on a 16 GB chip)
    and read-window bucketing (throughput — decode reads track actual
    depth). The composition must stay invisible in the tokens: int8+buckets
    == int8 full-read, and the scales ("ks"/"vs") window with the cache."""
    params, cfg = tiny
    rng = np.random.RandomState(29)
    reqs = [ServeRequest(uid=i,
                         prompt=rng.randint(2, 120,
                                            size=int(rng.randint(3, 20))
                                            ).tolist(),
                         max_new_tokens=int(rng.randint(2, 14)))
            for i in range(9)]
    kw = dict(slots=3, max_seq=64, chunk=4, prefill_buckets=(8, 16, 32),
              unroll_layers=False, kv_dtype=jnp.int8)
    full = DecodeEngine(params, cfg, kv_read_buckets=None, **kw)
    bkt = DecodeEngine(params, cfg, kv_read_buckets=(16, 32, 48), **kw)
    want = full.run_pipelined(list(reqs))
    got = bkt.run_pipelined(list(reqs))
    assert got == want
    assert bkt.stats["kv_rows_read"] < bkt.stats["chunks"] * bkt.max_seq, \
        bkt.stats


def _reference_greedy_kv8(params, cfg, prompt, n_new):
    """Single-request KV-cached greedy decode on an int8 cache — the
    quantization-matched counterfactual for the int8 engine test."""
    cache = opt_mod.init_cache(cfg, 1, 256, kv_int8=True)
    emb = opt_mod.embed_tokens(params, jnp.asarray([prompt], jnp.int32))
    out = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=0)
    tok = int(jnp.argmax(out["logits"][0, len(prompt) - 1]))
    cache = out["cache"]
    gen = [tok]
    pos = len(prompt)
    for _ in range(n_new - 1):
        emb = opt_mod.embed_tokens(params, jnp.asarray([[tok]], jnp.int32))
        out = opt_mod.forward(params, cfg, emb, cache=cache,
                              cache_pos=jnp.asarray(pos))
        cache = out["cache"]
        tok = int(jnp.argmax(out["logits"][0, -1]))
        gen.append(tok)
        pos += 1
    return gen


def test_engine_int8_kv_quality_gate(tiny):
    """int8 KV serving (kv_dtype=int8: per-token-per-head scales ride as
    "ks"/"vs" cache arrays) is a CAPACITY mode — pool bytes ~halve. Gate
    1: the engine's packing/refill machinery must be invisible — tokens
    identical to a single-request int8 decode on a mixed trace hitting
    both the bucketed prefill and the deferred-write decode quantization.
    Gate 2: teacher-forced logit drift vs the fp32 cache stays small (the
    perplexity-style quality guard; exact token parity across precisions
    is not meaningful on a tiny random model where argmax gaps are ~0).
    Prefix caching has no int8 path and must be refused."""
    params, cfg = tiny
    rng = np.random.RandomState(21)
    reqs = [ServeRequest(uid=i,
                         prompt=rng.randint(2, 120,
                                            size=int(rng.randint(3, 20))
                                            ).tolist(),
                         max_new_tokens=int(rng.randint(2, 12)))
            for i in range(7)]

    q_eng = DecodeEngine(params, cfg, slots=3, max_seq=64, chunk=4,
                         prefill_buckets=(8, 32), unroll_layers=False,
                         kv_dtype=jnp.int8)
    got = q_eng.run([ServeRequest(uid=r.uid, prompt=r.prompt,
                                  max_new_tokens=r.max_new_tokens)
                     for r in reqs])
    assert set(q_eng.cache) == {"k", "v", "ks", "vs"}
    assert q_eng.cache["k"].dtype == jnp.int8
    # pool bytes: int8/bf16 ratio = (1 + 4/head_dim)/2 — 0.625 at this
    # tiny head_dim=16, ~0.52 at opt-2.7b/6.7b's head_dim=80/128
    bf16_bytes = 2 * q_eng.cache["k"].size * 2
    int8_bytes = (2 * q_eng.cache["k"].size
                  + 2 * q_eng.cache["ks"].size * 4)
    assert int8_bytes == pytest.approx(
        bf16_bytes * (1 + 4 / cfg.head_dim) / 2)
    for r in reqs:
        want = _reference_greedy_kv8(params, cfg, r.prompt,
                                     r.max_new_tokens)
        assert got[r.uid] == want, f"req {r.uid}"

    # gate 2: teacher-forced decode logits, fp32 cache vs int8 cache
    prompt = reqs[0].prompt
    forced = got[reqs[0].uid]
    drifts = []
    for kv8 in (False, True):
        cache = opt_mod.init_cache(cfg, 1, 64, dtype=jnp.float32,
                                   kv_int8=kv8)
        emb = opt_mod.embed_tokens(params, jnp.asarray([prompt], jnp.int32))
        out = opt_mod.forward(params, cfg, emb, cache=cache, cache_pos=0)
        logits = [out["logits"][0, len(prompt) - 1]]
        cache, pos = out["cache"], len(prompt)
        for tok in forced[:-1]:
            emb = opt_mod.embed_tokens(params,
                                       jnp.asarray([[tok]], jnp.int32))
            out = opt_mod.forward(params, cfg, emb, cache=cache,
                                  cache_pos=jnp.asarray(pos))
            cache, pos = out["cache"], pos + 1
            logits.append(out["logits"][0, -1])
        drifts.append(jnp.stack(logits))
    rel = float(jnp.linalg.norm(drifts[1] - drifts[0])
                / jnp.linalg.norm(drifts[0]))
    assert rel < 0.02, rel

    with pytest.raises(ValueError, match="bf16 KV"):
        q_eng.register_prefix([5, 6, 7])
