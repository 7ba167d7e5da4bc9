"""GILL serving engine (gill_tpu/serve/gill_engine.py): slot-pooled
continuous batching of the FULL GILL decode must be invisible — tokens and
[IMG]-run hidden states identical to GILLCore.generate (the reference
semantics path, gill/models.py:443-532) for every request, regardless of
how requests pack into slots or chunks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gill_tpu.serve.gill_engine import GillDecodeEngine, GillServeRequest

from test_gill_forward import make_core, IMG_START, NUM_TOKENS


@pytest.fixture(scope="module")
def core_params():
    core = make_core()
    params = core.init_params(jax.random.PRNGKey(3))
    return core, params


def _core_generate(core, params, embs, nw, mw=0, scale=1.0, runs=1):
    out = core.generate(params, embs[None], num_words=nw,
                        min_word_tokens=mw, ret_scale_factor=scale,
                        max_img_runs=runs, temperature=0.0,
                        unroll_layers=False)
    toks = np.asarray(out["tokens"][0])
    val = np.asarray(out["valid"][0])
    hid = np.asarray(out["hidden"][0])
    return toks[val].tolist(), hid


def _mk_embs(rng, p, dim):
    return rng.randn(p, dim).astype(np.float32) * 0.02


def _first_run(tokens, nt):
    for i in range(len(tokens) - nt + 1):
        if tokens[i: i + nt] == list(range(IMG_START, IMG_START + nt)):
            return i
    return None


def test_gill_engine_matches_core_generate(core_params):
    core, params = core_params
    nt = NUM_TOKENS
    rng = np.random.RandomState(0)
    # mixed workload: plain text, [IMG]-boosted, min-word-gated
    cases = []
    for uid in range(7):
        embs = _mk_embs(rng, int(rng.randint(3, 14)), core.lm_dim)
        nw = int(rng.randint(2, 9))
        mw = int(rng.randint(0, 3)) if uid % 2 else 0
        scale = 100.0 if uid % 3 == 0 else 1.0
        cases.append((uid, embs, nw, mw, scale))

    eng = GillDecodeEngine(core, params, slots=3, max_seq=64, chunk=3,
                           prefill_buckets=(8, 16), unroll_layers=False,
                           kv_dtype=jnp.float32)
    results = eng.run([GillServeRequest(uid=u, embs=e, num_words=nw,
                                        min_word_tokens=mw, img_scale=sc)
                       for u, e, nw, mw, sc in cases])
    assert set(results) == {u for u, *_ in cases}

    any_img = False
    for u, embs, nw, mw, sc in cases:
        ref_toks, ref_hid = _core_generate(core, params, embs, nw, mw, sc)
        got = results[u]
        assert got["tokens"] == ref_toks, f"uid {u}"
        i = _first_run(ref_toks, nt)
        if i is not None:
            any_img = True
            np.testing.assert_allclose(
                got["img_hidden"], ref_hid[i: i + nt], atol=2e-4,
                err_msg=f"uid {u}")
    assert any_img, "test must exercise at least one [IMG] run"


def test_gill_engine_min_word_gate_blocks_early_img(core_params):
    """With a huge [IMG0] boost but min_word_tokens > 0, the run must not
    start before the gate lifts (reference models.py:484-489)."""
    core, params = core_params
    rng = np.random.RandomState(1)
    embs = _mk_embs(rng, 5, core.lm_dim)
    eng = GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=4,
                           prefill_buckets=(8,), unroll_layers=False,
                           kv_dtype=jnp.float32)
    out = eng.run([GillServeRequest(uid=0, embs=embs, num_words=6,
                                    min_word_tokens=3, img_scale=1e6)])
    toks = out[0]["tokens"]
    ref, _ = _core_generate(core, params, embs, 6, 3, 1e6)
    assert toks == ref
    i = _first_run(toks, NUM_TOKENS)
    assert i is not None and i >= 3


def test_gill_engine_tp_mesh_matches_single_device(core_params):
    """mesh=: Megatron-TP sharded GILL serving produces the same tokens
    and [IMG]-run hiddens as the single-device engine."""
    from gill_tpu.parallel import create_mesh

    core, params = core_params
    rng = np.random.RandomState(5)
    reqs = [GillServeRequest(
        uid=i, embs=_mk_embs(rng, int(rng.randint(3, 12)), core.lm_dim),
        num_words=int(rng.randint(2, 7)),
        img_scale=100.0 if i % 2 else 1.0) for i in range(5)]

    kw = dict(slots=2, max_seq=64, chunk=3, prefill_buckets=(8, 16),
              unroll_layers=False, kv_dtype=jnp.float32)
    single = GillDecodeEngine(core, params, **kw).run(reqs)
    mesh = create_mesh(dp_size=4, tp_size=2)   # 2 heads -> TP=2
    sharded = GillDecodeEngine(core, params, mesh=mesh, **kw).run(reqs)
    for r in reqs:
        assert single[r.uid]["tokens"] == sharded[r.uid]["tokens"], r.uid
        np.testing.assert_allclose(single[r.uid]["img_hidden"],
                                   sharded[r.uid]["img_hidden"], atol=2e-4)


def test_gill_engine_sampling(core_params):
    """Per-slot sampled decode: greedy requests are unchanged in a
    sampling engine; sampled requests are reproducible and INDEPENDENT of
    slot packing (stateless per-(seed, position) keys); different seeds
    give different streams; [IMG] force-commit still fires under
    sampling."""
    core, params = core_params
    rng = np.random.RandomState(9)

    def mk(slots):
        return GillDecodeEngine(core, params, slots=slots, max_seq=64,
                                chunk=3, prefill_buckets=(8, 16),
                                unroll_layers=False, kv_dtype=jnp.float32,
                                sampling=True)

    embs = [_mk_embs(rng, int(rng.randint(4, 10)), core.lm_dim)
            for _ in range(5)]
    reqs = [
        GillServeRequest(uid=0, embs=embs[0], num_words=6),  # greedy row
        GillServeRequest(uid=1, embs=embs[1], num_words=6,
                         temperature=1.0, top_p=0.9, seed=11),
        GillServeRequest(uid=2, embs=embs[2], num_words=6,
                         temperature=1.0, top_p=0.9, seed=12),
        GillServeRequest(uid=3, embs=embs[3], num_words=6,
                         temperature=5.0, top_p=1.0, seed=13),
        GillServeRequest(uid=4, embs=embs[4], num_words=5,
                         temperature=0.7, top_p=0.95, seed=14,
                         img_scale=1e8),                     # forced [IMG]
    ]
    out2 = mk(2).run(reqs)
    out3 = mk(3).run(reqs)
    # packing-independence: same tokens whichever slot pool served them
    for r in reqs:
        assert out2[r.uid]["tokens"] == out3[r.uid]["tokens"], r.uid

    # greedy row matches a greedy-only engine exactly
    greedy_ref, _ = _core_generate(core, params, embs[0], 6)
    assert out2[0]["tokens"] == greedy_ref

    # different seeds on identical settings -> different streams
    same_prompt = [
        GillServeRequest(uid=0, embs=embs[1], num_words=8,
                         temperature=5.0, top_p=1.0, seed=1),
        GillServeRequest(uid=1, embs=embs[1], num_words=8,
                         temperature=5.0, top_p=1.0, seed=2),
    ]
    o = mk(2).run(same_prompt)
    assert o[0]["tokens"] != o[1]["tokens"]

    # boosted [IMG0] still force-commits the full run when sampled
    toks = out2[4]["tokens"]
    assert _first_run(toks, NUM_TOKENS) is not None

    # temperature on a greedy-only engine is rejected
    eng = GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=3,
                           prefill_buckets=(8,), unroll_layers=False,
                           kv_dtype=jnp.float32)
    with pytest.raises(ValueError):
        eng.run([GillServeRequest(uid=0, embs=embs[0], num_words=4,
                                  temperature=1.0)])


def test_gill_engine_tap_at_chunk_boundary(core_params):
    """Regression: when budget == K*chunk + 1 and the [IMG] run ends on
    the FINAL output, the last tap row is captured one fed-step after the
    block whose rows reach the budget — finishing on that earlier block
    delivered a zero row. budget = num_words 2 + (nt-1) 3 = 5 = 1*4 + 1."""
    core, params = core_params
    rng = np.random.RandomState(11)
    embs = _mk_embs(rng, 5, core.lm_dim)
    eng = GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=4,
                           prefill_buckets=(8,), unroll_layers=False,
                           kv_dtype=jnp.float32)
    out = eng.run([GillServeRequest(uid=0, embs=embs, num_words=2,
                                    min_word_tokens=1, img_scale=1e8)])
    ref_toks, ref_hid = _core_generate(core, params, embs, 2, 1, 1e8)
    assert out[0]["tokens"] == ref_toks
    i = _first_run(ref_toks, NUM_TOKENS)
    assert i is not None and i + NUM_TOKENS == len(ref_toks), \
        "test must place the [IMG] run at the very end"
    np.testing.assert_allclose(out[0]["img_hidden"],
                               ref_hid[i: i + NUM_TOKENS], atol=2e-4)


def _run_starts(tokens, nt):
    return [i for i in range(len(tokens) - nt + 1)
            if tokens[i: i + nt] == list(range(IMG_START, IMG_START + nt))]


def test_gill_engine_multi_run_taps(core_params):
    """max_img_runs > 1: the tap ring captures EACH [IMG] run's hidden
    states (run k in ring row k), matching GILLCore.generate's full
    hidden trace — the api's max_num_rets>1 path (reference
    models.py:651 takes up to max_num_rets runs)."""
    core, params = core_params
    nt = NUM_TOKENS
    rng = np.random.RandomState(21)
    embs = _mk_embs(rng, 6, core.lm_dim)
    # huge boost: [IMG0] re-fires right after each run completes
    nw, runs = 4, 3
    eng = GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=5,
                           prefill_buckets=(8,), unroll_layers=False,
                           kv_dtype=jnp.float32, max_img_runs=runs)
    out = eng.run([GillServeRequest(uid=0, embs=embs, num_words=nw,
                                    img_scale=1e8, max_img_runs=runs)])
    ref_toks, ref_hid = _core_generate(core, params, embs, nw,
                                       scale=1e8, runs=runs)
    assert out[0]["tokens"] == ref_toks
    starts = _run_starts(ref_toks, nt)
    assert len(starts) >= 2, "test must produce at least two [IMG] runs"
    ring = out[0]["img_runs"]
    assert ring.shape == (runs, nt, core.lm_dim)
    for k, i in enumerate(starts[:runs]):
        np.testing.assert_allclose(ring[k], ref_hid[i: i + nt], atol=2e-4,
                                   err_msg=f"run {k}")
    # legacy first-run field == ring row 0
    np.testing.assert_array_equal(out[0]["img_hidden"], ring[0])
    # a second run's hiddens must differ from the first (distinct context)
    assert not np.allclose(ring[0], ring[1])

    # a request demanding more runs than the ring is rejected up front
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.run([GillServeRequest(uid=1, embs=embs, num_words=2,
                                  max_img_runs=runs + 1)])


def test_gill_engine_long_prompt_finds_bucket(core_params):
    """Default buckets must cover max_seq: a prompt longer than the last
    configured bucket previously crashed _refill mid-batch."""
    core, params = core_params
    rng = np.random.RandomState(12)
    eng = GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=4,
                           prefill_buckets=(8, 16), unroll_layers=False,
                           kv_dtype=jnp.float32)
    assert eng.buckets[-1] == 64
    embs = _mk_embs(rng, 40, core.lm_dim)      # > 16, <= 64
    out = eng.run([GillServeRequest(uid=0, embs=embs, num_words=3)])
    ref, _ = _core_generate(core, params, embs, 3)
    assert out[0]["tokens"] == ref


def test_gill_engine_rejects_oversized_request(core_params):
    core, params = core_params
    eng = GillDecodeEngine(core, params, slots=2, max_seq=32, chunk=4,
                           prefill_buckets=(8, 16, 32),
                           unroll_layers=False, kv_dtype=jnp.float32)
    with pytest.raises(ValueError):
        eng.run([GillServeRequest(
            uid=0, embs=np.zeros((20, core.lm_dim), np.float32),
            num_words=20)])


def test_gill_engine_prefix_caching_matches_full_prefill(core_params):
    """Requests carrying a registered EMBEDDING prefix + suffix-only embs
    must produce the tokens/taps of a full-prompt prefill — the cached
    prefix KV + static-offset suffix prefill is a pure optimization."""
    core, params = core_params
    nt = NUM_TOKENS
    rng = np.random.RandomState(21)
    prefix = _mk_embs(rng, 11, core.lm_dim)
    cases = []
    for uid in range(6):
        sfx = _mk_embs(rng, int(rng.randint(1, 9)), core.lm_dim)
        nw = int(rng.randint(2, 8))
        scale = 100.0 if uid % 2 == 0 else 1.0
        cases.append((uid, sfx, nw, scale))

    plain = GillDecodeEngine(core, params, slots=3, max_seq=64, chunk=3,
                             prefill_buckets=(8, 32), unroll_layers=False,
                             kv_dtype=jnp.float32)
    full = plain.run([GillServeRequest(
        uid=u, embs=np.concatenate([prefix, sfx]), num_words=nw,
        img_scale=sc) for u, sfx, nw, sc in cases])

    eng = GillDecodeEngine(core, params, slots=3, max_seq=64, chunk=3,
                           prefill_buckets=(8, 32), unroll_layers=False,
                           kv_dtype=jnp.float32)
    pid = eng.register_prefix(prefix)
    cached = eng.run([GillServeRequest(
        uid=u, embs=sfx, num_words=nw, img_scale=sc, prefix_id=pid)
        for u, sfx, nw, sc in cases])

    assert set(cached) == set(full)
    any_img = False
    for u in full:
        assert cached[u]["tokens"] == full[u]["tokens"], f"uid {u}"
        np.testing.assert_allclose(cached[u]["img_hidden"],
                                   full[u]["img_hidden"], atol=2e-4,
                                   err_msg=f"uid {u}")
        if _first_run(full[u]["tokens"], nt) is not None:
            any_img = True
    assert any_img, "test must exercise at least one [IMG] run"
    assert eng.stats["prefix_hits"] == len(cases)
    assert eng.stats["prefix_tokens_saved"] == 11 * len(cases)


def test_gill_engine_prefix_validation(core_params):
    core, params = core_params
    eng = GillDecodeEngine(core, params, slots=2, max_seq=32, chunk=2,
                           prefill_buckets=(8,), unroll_layers=False,
                           kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="prefix embs must be"):
        eng.register_prefix(np.zeros((4,), np.float32))
    with pytest.raises(ValueError, match="prefix length"):
        eng.register_prefix(np.zeros((40, core.lm_dim), np.float32))
    pid = eng.register_prefix(np.zeros((6, core.lm_dim), np.float32))
    sfx = np.zeros((2, core.lm_dim), np.float32)
    with pytest.raises(ValueError, match="unknown prefix_id"):
        eng.run([GillServeRequest(uid=0, embs=sfx, num_words=2,
                                  prefix_id=pid + 1)])
    with pytest.raises(ValueError, match="suffix embedding row"):
        eng.run([GillServeRequest(uid=0, embs=sfx[:0], num_words=2,
                                  prefix_id=pid)])
    # prefix counts against max_seq: 6 + 20 + budget exceeds 32
    with pytest.raises(ValueError, match="exceeds max_seq"):
        eng.run([GillServeRequest(
            uid=0, embs=np.zeros((20, core.lm_dim), np.float32),
            num_words=8, prefix_id=pid)])


def test_gill_engine_extend_prefix_matches_fresh_registration(core_params):
    """Embedding-level extend_prefix: an incremental chat session
    (register turn 1, extend with turn 2) must match registering the
    full history at once."""
    core, params = core_params
    rng = np.random.RandomState(33)
    base = _mk_embs(rng, 7, core.lm_dim)
    turn = _mk_embs(rng, 5, core.lm_dim)
    sfx = _mk_embs(rng, 3, core.lm_dim)

    eng = GillDecodeEngine(core, params, slots=2, max_seq=64, chunk=3,
                           prefill_buckets=(8, 16), unroll_layers=False,
                           kv_dtype=jnp.float32)
    pid_full = eng.register_prefix(np.concatenate([base, turn]))
    want = eng.run([GillServeRequest(uid=0, embs=sfx, num_words=5,
                                     img_scale=100.0, prefix_id=pid_full)])

    pid0 = eng.register_prefix(base)
    pid1 = eng.extend_prefix(pid0, turn)
    got = eng.run([GillServeRequest(uid=0, embs=sfx, num_words=5,
                                    img_scale=100.0, prefix_id=pid1)])
    assert got[0]["tokens"] == want[0]["tokens"]
    np.testing.assert_allclose(got[0]["img_hidden"], want[0]["img_hidden"],
                               atol=2e-4)

    eng.drop_prefix(pid0)
    with pytest.raises(ValueError, match="unknown prefix_id"):
        eng.extend_prefix(pid0, turn)
    with pytest.raises(ValueError, match="extension embs must be"):
        eng.extend_prefix(pid1, np.zeros((3,), np.float32))


def test_gill_engine_kv_read_buckets_match_full_read(core_params):
    """KV read-window bucketing on the GILL engine: tokens AND [IMG]-run
    hidden taps must be identical to the full-read engine; the narrow
    windows must actually be dispatched (kv_rows_read < chunks*max_seq)."""
    core, params = core_params
    rng = np.random.RandomState(29)
    cases = []
    for uid in range(6):
        embs = _mk_embs(rng, int(rng.randint(3, 14)), core.lm_dim)
        nw = int(rng.randint(2, 9))
        scale = 100.0 if uid % 2 == 0 else 1.0
        cases.append((uid, embs, nw, scale))
    reqs = [GillServeRequest(uid=u, embs=e, num_words=nw, img_scale=sc)
            for u, e, nw, sc in cases]

    kw = dict(slots=3, max_seq=64, chunk=3, prefill_buckets=(8, 16),
              unroll_layers=False, kv_dtype=jnp.float32)
    full = GillDecodeEngine(core, params, kv_read_buckets=None, **kw)
    bkt = GillDecodeEngine(core, params, kv_read_buckets=(16, 32, 48), **kw)
    assert full.kv_buckets == (64,)
    assert bkt.kv_buckets == (16, 32, 48, 64)

    want = full.run([GillServeRequest(uid=r.uid, embs=r.embs,
                                      num_words=r.num_words,
                                      img_scale=r.img_scale) for r in reqs])
    got = bkt.run(reqs)
    assert set(got) == set(want)
    any_img = False
    for u in want:
        assert got[u]["tokens"] == want[u]["tokens"], f"uid {u}"
        np.testing.assert_allclose(got[u]["img_hidden"],
                                   want[u]["img_hidden"], atol=2e-4,
                                   err_msg=f"uid {u}")
        if _first_run(want[u]["tokens"], NUM_TOKENS) is not None:
            any_img = True
    assert any_img, "test must exercise at least one [IMG] run"
    assert bkt.stats["kv_rows_read"] < bkt.stats["chunks"] * bkt.max_seq, \
        bkt.stats

