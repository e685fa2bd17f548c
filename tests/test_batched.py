"""Batched engine: per-slot outputs must be token-identical to the
single-request engine (greedy), and continuous batching must drain an
arbitrary prompt queue in input order."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sequoia_tpu.core.config import get_config
from sequoia_tpu.core.init import random_params
from sequoia_tpu.engine.batched import BatchedSpecEngine
from sequoia_tpu.engine.engine import SpecEngine
from sequoia_tpu.trees.growmap import uniform_tree


@pytest.fixture(scope="module")
def models():
    cfg = get_config("test-tiny")
    draft = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    target = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    return cfg, draft, target


PROMPTS = [
    np.array([11, 23, 5, 99, 42, 7]),
    np.array([3, 1, 4, 1, 5, 9, 2, 6]),
    np.array([100, 50]),
    np.array([7, 7, 7, 7, 7, 7, 7]),
    np.array([42]),
    np.array([88, 13, 21, 34]),
]


def test_batch_matches_single_greedy(models):
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="greedy", max_length=96, prefill_chunk=16)
    prompts = PROMPTS[:3]

    single = SpecEngine(draft, cfg, target, cfg, gm, **kw)
    expected = [
        single.generate(p, max_new_tokens=20, seed=i) for i, p in enumerate(prompts)
    ]
    batched = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=3, **kw)
    got = batched.generate_batch(prompts, max_new_tokens=20, seed=0)
    for e, g in zip(expected, got):
        n = min(len(e), len(g))
        np.testing.assert_array_equal(e[:n], g[:n])


def test_batch_fast_matches_host_loop(models):
    """Device-side batched while_loop == host-driven batched loop (greedy is
    fully deterministic, so token-exact equality is required)."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="greedy", max_length=96, prefill_chunk=16)
    prompts = PROMPTS[:3]
    host = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=3, **kw)
    expected = host.generate_batch(prompts, max_new_tokens=20, seed=0)
    fast = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=3, **kw)
    got = fast.generate_batch_fast(prompts, max_new_tokens=20, seed=0)
    assert fast.num_large_model_steps == host.num_large_model_steps
    assert fast.num_decoding_steps == host.num_decoding_steps
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_batch_fast_stochastic_runs(models):
    cfg, draft, target = models
    gm = uniform_tree(2, 3)
    eng = BatchedSpecEngine(
        draft, cfg, target, cfg, gm, batch_size=2, algorithm="sequoia",
        max_length=96, temperature=0.8, top_p=0.9, prefill_chunk=16,
    )
    outs = eng.generate_batch_fast(PROMPTS[:2], max_new_tokens=16, seed=0)
    assert all(len(o) > len(p) for o, p in zip(outs, PROMPTS[:2]))
    assert eng.num_large_model_steps > 0


def test_batch_stochastic_runs(models):
    cfg, draft, target = models
    gm = uniform_tree(2, 3)
    eng = BatchedSpecEngine(
        draft, cfg, target, cfg, gm, batch_size=2, algorithm="sequoia",
        max_length=96, temperature=0.8, top_p=0.9, prefill_chunk=16,
    )
    outs = eng.generate_batch(PROMPTS[:2], max_new_tokens=16, seed=0)
    assert all(len(o) > len(p) for o, p in zip(outs, PROMPTS[:2]))
    assert eng.num_large_model_steps > 0
    # Batched throughput accounting: tokens summed over slots.
    assert eng.num_decoding_steps >= 2


def test_continuous_batching_drains_queue(models):
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    eng = BatchedSpecEngine(
        draft, cfg, target, cfg, gm, batch_size=2, algorithm="greedy",
        max_length=96, prefill_chunk=16,
    )
    single = SpecEngine(draft, cfg, target, cfg, gm, algorithm="greedy",
                        max_length=96, prefill_chunk=16)
    results = eng.serve(PROMPTS, max_new_tokens=12, seed=0)
    assert len(results) == len(PROMPTS)
    for i, (p, out) in enumerate(zip(PROMPTS, results)):
        np.testing.assert_array_equal(out[: len(p)], p)
        exp = single.generate(p, max_new_tokens=12, seed=i)
        n = min(len(exp), len(out))
        np.testing.assert_array_equal(exp[:n], out[:n])


def test_serve_fast_matches_serve(models):
    """Device-loop continuous batching == host-loop continuous batching
    (greedy): identical outputs in input order."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="greedy", max_length=96, prefill_chunk=16)
    host = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2, **kw)
    expected = host.serve(PROMPTS, max_new_tokens=12, seed=0)
    fast = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2, **kw)
    got = fast.serve_fast(PROMPTS, max_new_tokens=12, seed=0)
    assert len(got) == len(expected)
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_serve_fast_fewer_prompts_than_slots(models):
    cfg, draft, target = models
    gm = uniform_tree(2, 2)
    eng = BatchedSpecEngine(
        draft, cfg, target, cfg, gm, batch_size=4, algorithm="greedy",
        max_length=64, prefill_chunk=16,
    )
    results = eng.serve_fast(PROMPTS[:2], max_new_tokens=8, seed=0)
    assert len(results) == 2
    for p, out in zip(PROMPTS[:2], results):
        assert len(out) > len(p)
        np.testing.assert_array_equal(out[: len(p)], p)


def test_serve_fewer_prompts_than_slots(models):
    cfg, draft, target = models
    gm = uniform_tree(2, 2)
    eng = BatchedSpecEngine(
        draft, cfg, target, cfg, gm, batch_size=4, algorithm="greedy",
        max_length=64, prefill_chunk=16,
    )
    results = eng.serve(PROMPTS[:2], max_new_tokens=8, seed=0)
    assert len(results) == 2
    for p, out in zip(PROMPTS[:2], results):
        assert len(out) > len(p)


def test_choose_serving_mode():
    from sequoia_tpu.engine.batched import choose_serving_mode

    # spec: 3 accepted per 12ms iteration = 250 tok/s/slot;
    # ar: 10ms/step = 100 tok/s/slot -> spec wins
    assert choose_serving_mode(0.012, 3.0, 0.010) == "spec"
    # deep batch: ar step amortizes to 2ms while spec iteration bloats
    assert choose_serving_mode(0.020, 3.0, 0.002) == "ar"
    # tie breaks to ar (simpler engine, exact-latency per token)
    assert choose_serving_mode(0.010, 1.0, 0.010) == "ar"


def test_batched_ar_matches_single_greedy(models):
    from sequoia_tpu.engine.baseline import ARBaseline
    from sequoia_tpu.engine.batched import BatchedAREngine

    cfg, _, target = models
    single = ARBaseline(target, cfg, max_length=96, greedy=True,
                        prefill_chunk=16)
    batched = BatchedAREngine(target, cfg, batch_size=4, max_length=96,
                              greedy=True, prefill_chunk=16)
    outs = batched.generate_batch_fast(PROMPTS[:4], max_new_tokens=12)
    for p, got in zip(PROMPTS[:4], outs):
        exp = single.generate_fast(p, max_new_tokens=12)
        n = min(len(exp), len(got))
        assert np.array_equal(exp[:n], got[:n]), (exp, got)


def test_batched_ar_serve_fast_drains_queue(models):
    from sequoia_tpu.engine.batched import BatchedAREngine

    cfg, _, target = models
    eng = BatchedAREngine(target, cfg, batch_size=2, max_length=96,
                          greedy=True, prefill_chunk=16)
    outs = eng.serve_fast(PROMPTS, max_new_tokens=8)
    assert len(outs) == len(PROMPTS)
    for p, o in zip(PROMPTS, outs):
        assert len(o) > len(p)
        assert np.array_equal(o[: len(p)], p)


def test_serve_device_tail_reserve_budget(models):
    """serve_device reserves the tail `prefill_chunk` rows as the masked-
    prefill scratch zone, so a buffer-limited request stops up to ~C tokens
    earlier than via serve_fast (advisor finding, round 2). Greedy decoding
    is deterministic, so the exact produced lengths of BOTH paths are
    predicted by replaying the single-request iteration stream against each
    path's finish bound and pinned to the prediction."""
    cfg, draft, target = models
    gm = uniform_tree(2, 2)  # size 7, depth 2
    M, C = 64, 16
    kw = dict(algorithm="greedy", max_length=M, prefill_chunk=C)
    prompt = PROMPTS[0]
    big = 1000  # never binds: the buffer bound is what stops the request

    single = SpecEngine(draft, cfg, target, cfg, gm, **kw)
    emitted = [len(d) for d in single.stream(prompt, max_new_tokens=big)]
    md = int(gm.depth.max())

    def predict(bound):
        gtl, produced = len(prompt), 0
        for e in emitted:
            gtl += e
            produced += e
            if (produced >= big or gtl - 1 + gm.size > bound
                    or gtl + md + 1 > bound):
                break
        return produced

    exp_fast, exp_dev = predict(M), predict(M - C)
    assert exp_dev < exp_fast  # the tighter budget must actually bind

    sf = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=1, **kw)
    out_f = sf.serve_fast([prompt], max_new_tokens=big)[0]
    sd = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=1, **kw)
    out_d = sd.serve_device([prompt], max_new_tokens=big)[0]
    assert len(out_f) - len(prompt) == exp_fast
    assert len(out_d) - len(prompt) == exp_dev
    np.testing.assert_array_equal(out_d, out_f[: len(out_d)])


def test_serve_auto_policy_switch(models):
    """serve_auto must actually switch engines based on the measured costs
    and produce a full result set either way."""
    cfg, draft, target = models
    eng = BatchedSpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                            algorithm="greedy", max_length=96,
                            prefill_chunk=16, batch_size=2)
    outs = eng.serve_auto(PROMPTS[:3], spec_iter_s=0.012, ar_step_s=0.010,
                          expected_accepted=3.0, max_new_tokens=6)
    assert eng.serving_mode == "spec"
    assert all(len(o) > 0 for o in outs)
    outs = eng.serve_auto(PROMPTS[:3], spec_iter_s=0.020, ar_step_s=0.002,
                          expected_accepted=3.0, max_new_tokens=6)
    assert eng.serving_mode == "ar"
    assert len(outs) == 3
    for p, o in zip(PROMPTS[:3], outs):
        assert np.array_equal(o[: len(p)], p)


def test_serve_auto_device_loop_routing(models, monkeypatch):
    """The spec branch routes to the one-dispatch device loop whenever
    every prompt clears the tail-reserve budget (with narrow admission the
    device loop measured faster than host scheduling at every cell,
    SERVE_DEVICE_r05.json); over-long prompts fall back host-scheduled."""
    cfg, draft, target = models
    kw = dict(algorithm="greedy", max_length=96, prefill_chunk=16)
    spec_costs = dict(spec_iter_s=0.012, ar_step_s=0.010,
                      expected_accepted=3.0, max_new_tokens=4)

    def tagged(eng):
        calls = []
        for name in ("serve_device", "serve_fast"):
            orig = getattr(eng, name)
            monkeypatch.setattr(
                eng, name,
                lambda *a, _n=name, _o=orig, **k: calls.append(_n) or _o(*a, **k))
        return calls

    # Large batch + mixed lengths -> device loop (narrow admission).
    big = BatchedSpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                            batch_size=17, **kw)
    calls = tagged(big)
    big.serve_auto(PROMPTS[:3], **spec_costs)
    assert big.serving_mode == "spec" and calls[0] == "serve_device"

    # A prompt over the tail-reserve limit -> host-scheduled fallback.
    limit = big.max_length - big.prefill_chunk - big.tree_size
    long_prompt = np.arange(limit + 1) % 50 + 1
    calls = tagged(big)
    big.serve_auto([long_prompt] + list(PROMPTS[:2]), **spec_costs)
    assert calls == ["serve_fast"]

    # Small batch + mixed lengths -> device loop.
    small = BatchedSpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                              batch_size=2, **kw)
    calls = tagged(small)
    small.serve_auto(PROMPTS[:3], **spec_costs)
    assert calls[0] == "serve_device"


def test_serve_device_program_is_cond_free(models):
    """Regression pin for the serving defensive-copy tax
    (SERVE_DEVICE_r05.json): `lax.cond` in the serving while-loop body
    broke XLA's carry aliasing and re-copied the full batched KV cache
    every iteration (+16.6 ms/step measured on TPU). The lowered serving
    program must contain while loops but ZERO conditional ops."""
    import re

    from sequoia_tpu.utils import prng_key

    cfg, draft, target = models
    eng = BatchedSpecEngine(draft, cfg, target, cfg, uniform_tree(2, 2),
                            algorithm="greedy", max_length=64,
                            prefill_chunk=16, batch_size=2)
    bk = prng_key(0)
    fresh = eng._fresh_state(bk, eng.target_params.embed.dtype)
    bstate = eng._stack_states([fresh] * 2)
    txt = jax.jit(eng._serve_device_impl).lower(
        eng.draft_params, eng.target_params, bstate,
        jnp.zeros((3, 16), jnp.int32), jnp.asarray([5, 6, 4], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([True, True]),
        jnp.asarray(8, jnp.int32), bk,
    ).as_text()
    assert re.search(r"stablehlo\.while", txt)
    assert not re.search(r"stablehlo\.(if|case)", txt)


def test_serve_device_harvest_batch_output_invariant(models):
    """Completion batching (harvest_batch K>1) is a pure scheduling knob:
    per-request outputs depend only on (seed, request id), so any K must
    produce token-identical results — stochastic algorithm included."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="sequoia", max_length=96, prefill_chunk=16,
              temperature=0.8, top_p=0.9)
    base = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2, **kw)
    expected = base.serve_device(PROMPTS, max_new_tokens=9, seed=3)
    kbig = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2,
                             harvest_batch=2, **kw)
    got = kbig.serve_device(PROMPTS, max_new_tokens=9, seed=3)
    assert len(got) == len(expected)
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)
    # Re-jit on knob change must actually take effect (trace is keyed).
    kbig.harvest_batch = 1
    got1 = kbig.serve_device(PROMPTS, max_new_tokens=9, seed=3)
    for e, g in zip(expected, got1):
        np.testing.assert_array_equal(e, g)


def test_serve_device_admit_width_output_invariant(models):
    """Narrow admission (admit_width < B) is a pure scheduling knob: the
    chunk forwards are gathered into a width-W sub-batch and scattered
    back, but a slot's prefill content and iterate sequence are its own,
    so any W must produce token-identical results — including W=1 (one
    slot per admission step) and the multi-admit initial fill where the
    pf loop drains B slots W at a time."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="sequoia", max_length=96, prefill_chunk=16,
              temperature=0.8, top_p=0.9)
    full = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=3,
                             admit_width=3, **kw)
    expected = full.serve_device(PROMPTS, max_new_tokens=9, seed=3)
    for w in (1, 2):
        narrow = BatchedSpecEngine(draft, cfg, target, cfg, gm,
                                   batch_size=3, admit_width=w, **kw)
        got = narrow.serve_device(PROMPTS, max_new_tokens=9, seed=3)
        assert len(got) == len(expected)
        for e, g in zip(expected, got):
            np.testing.assert_array_equal(e, g)


def test_serve_device_matches_serve_fast(models):
    """One-dispatch device-resident serving == host-scheduled continuous
    batching (greedy is deterministic and key-independent, so outputs must
    be token-identical, in input order)."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="greedy", max_length=96, prefill_chunk=16)
    host = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2, **kw)
    expected = host.serve_fast(PROMPTS, max_new_tokens=12, seed=0)
    dev = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2, **kw)
    got = dev.serve_device(PROMPTS, max_new_tokens=12, seed=0)
    assert len(got) == len(expected)
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)
    assert dev.num_decoding_steps == host.num_decoding_steps


def test_serve_device_fewer_prompts_than_slots(models):
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="greedy", max_length=96, prefill_chunk=16)
    host = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=4, **kw)
    expected = host.serve_fast(PROMPTS[:2], max_new_tokens=10, seed=0)
    dev = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=4, **kw)
    got = dev.serve_device(PROMPTS[:2], max_new_tokens=10, seed=0)
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_serve_device_stochastic_runs(models):
    """Sequoia verification through serve_device: right count, right prompt
    prefixes, produced lengths within bounds."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    kw = dict(algorithm="sequoia", max_length=96, prefill_chunk=16,
              temperature=0.8, top_p=0.9)
    eng = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=3, **kw)
    outs = eng.serve_device(PROMPTS, max_new_tokens=9, seed=3)
    assert len(outs) == len(PROMPTS)
    for p, o in zip(PROMPTS, outs):
        np.testing.assert_array_equal(o[: len(p)], p)
        assert len(p) <= len(o) <= len(p) + 9


def test_serve_device_int8_kv(models):
    """serve_device with the quantized KV cache (the bench's batched
    serving config): right count, right prefixes, bounded lengths."""
    cfg, draft, target = models
    gm = uniform_tree(3, 2)
    eng = BatchedSpecEngine(draft, cfg, target, cfg, gm, batch_size=2,
                            algorithm="sequoia", max_length=96,
                            prefill_chunk=16, kv_quant="int8",
                            temperature=0.7, top_p=0.9)
    prompts = PROMPTS[:4]
    outs = eng.serve_device(prompts, max_new_tokens=8, seed=2)
    assert len(outs) == len(prompts)
    for p, o in zip(prompts, outs):
        np.testing.assert_array_equal(o[: len(p)], p)
        assert len(p) <= len(o) <= len(p) + 8


def test_fused_prefill_batch_matches_per_slot():
    """`prefill_batch(fused=True)` (one vmapped weight stream per chunk for
    all slots) must produce the same committed tokens / gtl / root logits /
    committed-range KV as the per-slot path, including MIXED prompt lengths
    (padded positions' garbage rows are invisible by the stale-tail
    invariant)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sequoia_tpu.core.config import get_config
    from sequoia_tpu.core.init import random_params
    from sequoia_tpu.engine.batched import BatchedSpecEngine
    from sequoia_tpu.trees.growmap import uniform_tree

    cfg = get_config("test-tiny")
    d = random_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    t = random_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    eng = BatchedSpecEngine(d, cfg, t, cfg, uniform_tree(2, 2),
                            algorithm="sequoia", max_length=64,
                            temperature=0.7, top_p=0.9, prefill_chunk=8,
                            batch_size=3)
    rng = np.random.default_rng(0)
    lens = (5, 11, 17)
    prompts = [rng.integers(5, cfg.vocab_size, size=n) for n in lens]
    sf = eng.prefill_batch(prompts, seed=3, fused=True)
    ss = eng.prefill_batch(prompts, seed=3, fused=False)
    np.testing.assert_array_equal(np.asarray(sf.gtl), np.asarray(ss.gtl))
    for i, n in enumerate(lens):
        np.testing.assert_array_equal(np.asarray(sf.tokens)[i, :n],
                                      np.asarray(ss.tokens)[i, :n])
        np.testing.assert_allclose(
            np.asarray(sf.root_draft_logits)[i],
            np.asarray(ss.root_draft_logits)[i], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(sf.target_kv.k)[:, i, :n],
            np.asarray(ss.target_kv.k)[:, i, :n], rtol=1e-4, atol=1e-4)
