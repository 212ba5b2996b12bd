"""Continuous-batching slot engine tests (VERDICT r2 item 3).

The contract: token-level scheduling must change *when* work happens, never
*what* is computed — greedy+penalty outputs are token-exact vs the monolithic
``engine.generate``, while a request arriving mid-decode is admitted into a
free slot within one decode chunk instead of waiting for the running batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggt_qwen3_tpu.config import QWEN3_TINY
from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
from vggt_qwen3_tpu.inference.slots import SlotEngine
from vggt_qwen3_tpu.models import qwen3


@pytest.fixture(scope="module")
def setup():
    cfg = QWEN3_TINY
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype="float32")
    return cfg, params


def _prompt(cfg, seed, S=12, bucket=16):
    """Left-padded prompt embeds + mask, padded to the serving bucket."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.vocab_size, (1, S))
    pad = bucket - S
    full = np.concatenate([np.zeros((1, pad), np.int64), ids], axis=1)
    mask = np.concatenate([np.zeros((1, pad), np.int32), np.ones((1, S), np.int32)], axis=1)
    return full, mask


def _ref_generate(params, cfg, gen_cfg, ids, mask):
    embeds = qwen3.embed_tokens(params, jnp.asarray(ids))
    toks, lengths = generate(
        params, cfg, gen_cfg, inputs_embeds=embeds, attention_mask=jnp.asarray(mask)
    )
    return np.asarray(toks)[0], int(np.asarray(lengths)[0])


def test_token_exact_vs_engine(setup):
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=3, max_len=48, decode_chunk=2)

    futs, refs = [], []
    for seed in range(3):
        ids, mask = _prompt(cfg, seed, S=8 + seed, bucket=16)
        embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        futs.append(eng.submit_embeds(embeds, mask))
        refs.append(_ref_generate(params, cfg, gen_cfg, ids, mask))
    eng.run_until_idle()
    for fut, (ref_toks, _) in zip(futs, refs):
        toks, n = fut.result(timeout=1)
        assert n == 10
        np.testing.assert_array_equal(toks, ref_toks[:n])


def test_mid_decode_admission(setup):
    """A request submitted while another is decoding is admitted into a free
    slot within one chunk and finishes without waiting for the first."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=24, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=64, decode_chunk=2)

    ids_a, mask_a = _prompt(cfg, 10, S=10, bucket=16)
    emb_a = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids_a)))
    fut_a = eng.submit_embeds(emb_a, mask_a)

    # run a few chunks of A alone
    for _ in range(3):
        assert eng.step_once()
    assert not fut_a.done()

    ids_b, mask_b = _prompt(cfg, 11, S=9, bucket=16)
    emb_b = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids_b)))
    fut_b = eng.submit_embeds(emb_b, mask_b)
    eng.run_until_idle()

    assert eng.stats.admitted_mid_decode == 1
    # B was admitted at a later chunk than A, while A was still running
    chunks = dict()
    for chunk_idx, slot in eng.stats.admission_log:
        chunks.setdefault(slot, chunk_idx)
    assert len(eng.stats.admission_log) == 2
    first_chunk, second_chunk = [c for c, _ in eng.stats.admission_log]
    assert second_chunk >= 3  # admitted after A had decoded ≥3 chunks

    # both outputs token-exact vs solo runs — scheduling never changed content
    toks_a, n_a = fut_a.result(timeout=1)
    toks_b, n_b = fut_b.result(timeout=1)
    ref_a, _ = _ref_generate(params, cfg, gen_cfg, ids_a, mask_a)
    ref_b, _ = _ref_generate(params, cfg, gen_cfg, ids_b, mask_b)
    np.testing.assert_array_equal(toks_a, ref_a[:n_a])
    np.testing.assert_array_equal(toks_b, ref_b[:n_b])


def test_eos_frees_slot_and_reuse(setup):
    """More requests than slots: EOS/budget finishes recycle slots; every
    request completes and matches its solo output."""
    cfg, params = setup
    # pick the eos id each row would emit at step 3 for one prompt so the
    # early-stop path actually runs: generate the solo output first
    gen_probe = GenerationConfig(max_new_tokens=6, eos_token_id=None, pad_token_id=0)
    ids0, mask0 = _prompt(cfg, 20, S=7, bucket=16)
    probe_toks, _ = _ref_generate(params, cfg, gen_probe, ids0, mask0)
    eos = int(probe_toks[3])

    gen_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=eos, pad_token_id=0)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=32, decode_chunk=2)
    futs, refs = [], []
    for seed in (20, 21, 22, 23, 24):
        ids, mask = _prompt(cfg, seed, S=7, bucket=16)
        emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        futs.append(eng.submit_embeds(emb, mask))
        refs.append(_ref_generate(params, cfg, gen_cfg, ids, mask))
    eng.run_until_idle()
    assert eng.stats.requests == 5
    for fut, (ref_toks, ref_len) in zip(futs, refs):
        toks, n = fut.result(timeout=1)
        # engine lengths count EOS; slot engine also counts the EOS token
        np.testing.assert_array_equal(toks[:ref_len], ref_toks[:ref_len])


def test_per_request_budget(setup):
    """Requests carry their own max_new_tokens (≤ engine max): each stops at
    its budget with a token-exact prefix of the solo run, staggered finishes
    recycle slots mid-decode, and an out-of-range budget is rejected."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=16, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=48, decode_chunk=2)

    budgets = [4, 16, 7, 10]
    futs, refs = [], []
    for seed, b in enumerate(budgets):
        ids, mask = _prompt(cfg, 30 + seed, S=8, bucket=16)
        emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        futs.append(eng.submit_embeds(emb, mask, max_new_tokens=b))
        refs.append(_ref_generate(params, cfg, gen_cfg, ids, mask))
    eng.run_until_idle()
    for fut, b, (ref_toks, _) in zip(futs, budgets, refs):
        toks, n = fut.result(timeout=1)
        assert n == b
        np.testing.assert_array_equal(toks, ref_toks[:b])
    # budgets 4 vs 16 on the first two slots: slot 0 frees while slot 1 is
    # still decoding, so at least one later request was admitted mid-decode
    assert eng.stats.admitted_mid_decode >= 1

    bad = eng.submit_embeds(
        np.zeros((1, 16, cfg.hidden_size), np.float32), np.ones((1, 16), np.int32),
        max_new_tokens=17,
    )
    with pytest.raises(ValueError):
        bad.result(timeout=1)


def test_lagged_snapshot_never_misdelivers_reused_slot(setup):
    """Delivery runs one chunk behind the device (latency-hiding pipeline).
    A slot that finishes, is delivered, and is immediately re-admitted must
    NOT have its new future resolved from the previous occupant's lagged
    done-flag — budgets shorter than one chunk make every admission finish
    within its first chunk, the worst case for staleness."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=1, max_len=32, decode_chunk=4)
    futs, refs = [], []
    for seed in range(4):
        ids, mask = _prompt(cfg, 50 + seed, S=6, bucket=8)
        emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        futs.append(eng.submit_embeds(emb, mask, max_new_tokens=2))
        refs.append(_ref_generate(params, cfg, gen_cfg, ids, mask))
    eng.run_until_idle()
    for fut, (ref_toks, _) in zip(futs, refs):
        toks, n = fut.result(timeout=1)
        assert n == 2
        np.testing.assert_array_equal(toks, ref_toks[:2])


def test_prefix_cache_token_exact(setup):
    """Shared-prefix KV reuse (system-prompt caching): registering a dense
    prefix and submitting only the suffix yields tokens identical to
    submitting the full prompt — including a left-padded suffix, and across
    multiple requests reusing the same stashed prefix row."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=48, decode_chunk=2)

    rng = np.random.default_rng(7)
    prefix_ids = rng.integers(1, cfg.vocab_size, (1, 6))
    pid = eng.register_prefix(
        np.asarray(qwen3.embed_tokens(params, jnp.asarray(prefix_ids))))

    futs, refs = [], []
    for seed, pad in ((0, 0), (1, 3)):  # dense suffix and left-padded suffix
        suf_ids = np.random.default_rng(40 + seed).integers(1, cfg.vocab_size, (1, 7))
        suf_full = np.concatenate([np.zeros((1, pad), np.int64), suf_ids], axis=1)
        suf_mask = np.concatenate(
            [np.zeros((1, pad), np.int32), np.ones((1, 7), np.int32)], axis=1)
        emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(suf_full)))
        futs.append(eng.submit_embeds(emb, suf_mask, prefix_id=pid))
        # reference: the full prompt through the monolithic engine, with the
        # same mask layout (prefix dense, suffix possibly left-padded)
        full_ids = np.concatenate([prefix_ids, suf_full], axis=1)
        full_mask = np.concatenate([np.ones((1, 6), np.int32), suf_mask], axis=1)
        refs.append(_ref_generate(params, cfg, gen_cfg, full_ids, full_mask))
    eng.run_until_idle()
    for fut, (ref_toks, _) in zip(futs, refs):
        toks, n = fut.result(timeout=1)
        assert n == 8
        np.testing.assert_array_equal(toks, ref_toks[:n])

    bad = eng.submit_embeds(np.zeros((1, 4, cfg.hidden_size), np.float32),
                            np.ones((1, 4), np.int32), prefix_id=999)
    with pytest.raises(ValueError):
        bad.result(timeout=1)
    with pytest.raises(ValueError):
        eng.register_prefix(np.zeros((1, 48, cfg.hidden_size), np.float32))


def test_oversized_prompt_rejected(setup):
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, pad_token_id=0)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=1, max_len=16, decode_chunk=2)
    ids, mask = _prompt(cfg, 0, S=12, bucket=12)
    emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
    fut = eng.submit_embeds(emb, mask)
    eng.run_until_idle()
    with pytest.raises(ValueError):
        fut.result(timeout=1)


# ---------------------------------------------------------------------------
# Speculative continuous batching (prompt-lookup verify blocks)
# ---------------------------------------------------------------------------


def test_speculative_slots_token_exact(setup):
    """speculative=True changes only the schedule (1..k+1 tokens per weight
    read); outputs are token-exact vs engine.generate, including mixed
    prompts, per-request budgets, and lookup-seeded drafting."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=12, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=3, max_len=48,
                     speculative=True, draft_k=4, ngram=3)

    futs, refs = [], []
    for seed in range(3):
        ids, mask = _prompt(cfg, seed + 10, S=8 + seed, bucket=16)
        embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        budget = 12 if seed != 1 else 5
        futs.append(eng.submit_embeds(embeds, mask, max_new_tokens=budget,
                                      lookup_ids=ids.astype(np.int64)))
        ref_toks, _ = _ref_generate(params, cfg, gen_cfg, ids, mask)
        refs.append((ref_toks, budget))
    eng.run_until_idle()
    for fut, (ref_toks, budget) in zip(futs, refs):
        toks, n = fut.result(timeout=60)
        assert n == budget
        assert toks.tolist() == ref_toks[:budget].tolist()


def test_speculative_slots_accept_blocks(setup):
    """A looping generation (forced by seeding the lookup with the prompt's
    own repetition) finishes in fewer weight reads than tokens — the whole
    point of speculative serving. Uses EOS-free fixed budgets so the block
    count is deterministic given the model."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=16, eos_token_id=None, pad_token_id=0)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=64,
                     speculative=True, draft_k=4, ngram=3)

    # free-running tiny random models settle into short cycles — exactly the
    # structure prompt-lookup exploits. Verify exactness AND block economy.
    ids, mask = _prompt(cfg, 21, S=10, bucket=16)
    embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
    fut = eng.submit_embeds(embeds, mask, lookup_ids=ids.astype(np.int64))
    eng.run_until_idle()
    toks, n = fut.result(timeout=60)
    ref_toks, _ = _ref_generate(params, cfg, gen_cfg, ids, mask)
    assert toks.tolist() == ref_toks[:n].tolist()
    assert n == 16
    # 16 tokens; blocks (= weight reads = chunks stat) must be at most 16,
    # and strictly fewer when any draft was accepted — assert the engine at
    # least ran blocks, not per-token chunks of the classic path
    assert 1 <= eng.stats.chunks <= 16


def test_speculative_slots_eos_and_reuse(setup):
    """EOS finishing inside an accepted block frees the slot; a queued
    request reuses it and completes token-exact."""
    cfg, params = setup
    # discover a token the model emits early, declare it EOS
    ids, mask = _prompt(cfg, 31, S=9, bucket=16)
    free = GenerationConfig(max_new_tokens=12, eos_token_id=None, pad_token_id=0)
    free_toks, _ = _ref_generate(params, cfg, free, ids, mask)
    eos = int(free_toks[3])

    gen_cfg = GenerationConfig(max_new_tokens=12, eos_token_id=eos, pad_token_id=0)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=1, max_len=48,
                     speculative=True, draft_k=4, ngram=3)
    e1 = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
    ids2, mask2 = _prompt(cfg, 32, S=9, bucket=16)
    e2 = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids2)))
    f1 = eng.submit_embeds(e1, mask, lookup_ids=ids.astype(np.int64))
    f2 = eng.submit_embeds(e2, mask2, lookup_ids=ids2.astype(np.int64))
    eng.run_until_idle()
    r1, n1 = f1.result(timeout=60)
    r2, n2 = f2.result(timeout=60)
    ref1, l1 = _ref_generate(params, cfg, gen_cfg, ids, mask)
    ref2, l2 = _ref_generate(params, cfg, gen_cfg, ids2, mask2)
    assert n1 == l1 and r1.tolist() == ref1[:l1].tolist()
    assert n2 == l2 and r2.tolist() == ref2[:l2].tolist()


def test_constrained_slots_token_exact_and_spec_blocks(setup):
    """Engine-wide schema FSM: both chunk paths match engine.generate under
    the same constraint, and the speculative path finishes a forced cyclic
    output in far fewer weight reads than tokens (deterministic acceptance)."""
    cfg, params = setup
    cycle = [7, 23, 5, 41]
    table = np.full((len(cycle), cfg.vocab_size), -1, np.int32)
    for s, t in enumerate(cycle):
        table[s, t] = (s + 1) % len(cycle)
    constraint = jnp.asarray(table)

    gen_cfg = GenerationConfig(max_new_tokens=20, eos_token_id=None, pad_token_id=0)
    ids, mask = _prompt(cfg, 41, S=10, bucket=16)
    embeds_np = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
    ref, _ = generate(
        params, cfg, gen_cfg,
        inputs_embeds=qwen3.embed_tokens(params, jnp.asarray(ids)),
        attention_mask=jnp.asarray(mask), constraint=constraint,
    )
    ref = np.asarray(ref)[0]

    for spec in (False, True):
        eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=64,
                         decode_chunk=4, speculative=spec, draft_k=4, ngram=3,
                         constraint=constraint)
        fut = eng.submit_embeds(embeds_np, mask, lookup_ids=ids.astype(np.int64))
        eng.run_until_idle()
        toks, n = fut.result(timeout=60)
        assert n == 20
        assert toks.tolist() == ref.tolist(), f"spec={spec}"
        if spec:
            # forced 4-cycle: after ~6 warmup blocks the lookup predicts
            # everything → ≤ 11 weight reads for 20 tokens (vs 20)
            assert eng.stats.chunks <= 11, eng.stats.chunks


def test_spec_chunk_blocks_amortize_dispatches(setup):
    """``spec_chunk`` scans several verify blocks into ONE dispatch (the
    round-4 fix for structured+spec serving measuring SLOWER than classic
    chunks at 60% acceptance — per-dispatch host overhead dominated a
    single ~2-token block). Tokens must be identical across spec_chunk
    settings; the dispatch (chunk) count must shrink."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=16, eos_token_id=None, pad_token_id=0)
    ids, mask = _prompt(cfg, 21, S=10, bucket=16)
    ref_toks, _ = _ref_generate(params, cfg, gen_cfg, ids, mask)
    seed = np.concatenate([ids, ref_toks[None, :].astype(ids.dtype)], axis=1)
    embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))

    chunks = {}
    for blocks in (1, 4):
        eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=64,
                         speculative=True, draft_k=4, ngram=3,
                         spec_chunk=blocks)
        fut = eng.submit_embeds(embeds, mask, lookup_ids=seed.astype(np.int64))
        eng.run_until_idle()
        toks, n = fut.result(timeout=60)
        assert toks.tolist() == ref_toks[:n].tolist(), f"spec_chunk={blocks}"
        chunks[blocks] = eng.stats.chunks
    assert chunks[4] < chunks[1], chunks


def test_prefix_cache_with_speculative_token_exact(setup):
    """Shared-prefix KV reuse composes with speculative mode: suffix-only
    admission on a stashed prefix row + verify-block decode is token-exact
    vs the monolithic engine on the full prompt."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=48,
                     speculative=True, draft_k=4, ngram=3)

    rng = np.random.default_rng(8)
    prefix_ids = rng.integers(1, cfg.vocab_size, (1, 6))
    pid = eng.register_prefix(
        np.asarray(qwen3.embed_tokens(params, jnp.asarray(prefix_ids))))

    suf_ids = np.random.default_rng(51).integers(1, cfg.vocab_size, (1, 7))
    suf_mask = np.ones((1, 7), np.int32)
    emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(suf_ids)))
    fut = eng.submit_embeds(emb, suf_mask, prefix_id=pid,
                            lookup_ids=suf_ids.astype(np.int64))
    eng.run_until_idle()
    toks, n = fut.result(timeout=60)

    full_ids = np.concatenate([prefix_ids, suf_ids], axis=1)
    full_mask = np.ones((1, 13), np.int32)
    ref_toks, _ = _ref_generate(params, cfg, gen_cfg, full_ids, full_mask)
    assert n == 10
    np.testing.assert_array_equal(toks, ref_toks[:n])


def test_spec_guard_trips_on_zero_acceptance_and_stays_token_exact(setup):
    """VERDICT r3 item 6: free-text speculative serving measured 12.3 vs
    34.2 req/s at zero acceptance — the guard must auto-disable verify
    blocks when rolling per-block gain collapses, WITHOUT changing tokens."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=24, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.3, no_repeat_ngram=2)
    # rep 1.3 + ngram 2 kill the tiny model's short cycles → ~zero acceptance;
    # window 3 so the guard can trip inside one 24-token request
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=64,
                     speculative=True, draft_k=4, ngram=3,
                     spec_min_gain=1.35, spec_guard_window=3)
    ids, mask = _prompt(cfg, 31, S=10, bucket=16)
    embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
    fut = eng.submit_embeds(embeds, mask)
    eng.run_until_idle()
    toks, n = fut.result(timeout=60)

    assert eng.stats.spec_disabled_at is not None, (
        "guard should trip on a zero-acceptance workload "
        f"(spec blocks {eng.stats.spec_blocks}, accepted {eng.stats.spec_accepted})"
    )
    assert not eng.speculative  # fell back to classic chunked decode
    ref_toks, _ = _ref_generate(params, cfg, gen_cfg, ids, mask)
    assert toks.tolist() == ref_toks[:n].tolist()  # schedule change only

    # a request submitted AFTER the fallback still serves correctly
    ids2, mask2 = _prompt(cfg, 32, S=9, bucket=16)
    emb2 = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids2)))
    fut2 = eng.submit_embeds(emb2, mask2)
    eng.run_until_idle()
    toks2, n2 = fut2.result(timeout=60)
    ref2, _ = _ref_generate(params, cfg, gen_cfg, ids2, mask2)
    assert toks2.tolist() == ref2[:n2].tolist()


def test_spec_guard_keeps_speculative_on_draftable_workload(setup):
    """High-acceptance generation must NOT trip the guard. The lookup memory
    is seeded with prompt + the oracle continuation (the structured-output
    situation the speculative mode exists for: the answer's shape is in the
    prompt), so drafts hit from the first blocks."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=16, eos_token_id=None, pad_token_id=0)
    ids, mask = _prompt(cfg, 21, S=10, bucket=16)
    ref_toks, _ = _ref_generate(params, cfg, gen_cfg, ids, mask)
    seed = np.concatenate([ids, ref_toks[None, :].astype(ids.dtype)], axis=1)

    eng = SlotEngine(params, cfg, gen_cfg, num_slots=2, max_len=64,
                     speculative=True, draft_k=4, ngram=3,
                     spec_min_gain=1.35, spec_guard_window=3)
    embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
    fut = eng.submit_embeds(embeds, mask, lookup_ids=seed.astype(np.int64))
    eng.run_until_idle()
    toks, n = fut.result(timeout=60)
    assert eng.stats.spec_disabled_at is None
    assert eng.speculative
    assert eng.stats.spec_accepted > eng.stats.spec_blocks  # drafts accepted
    assert toks.tolist() == ref_toks[:n].tolist()


def test_kv_occupancy_measurement(setup):
    """The paged-KV deviation measurement (BASELINE.md "why slots, not
    pages"): the engine integrates live-vs-reserved KV tokens per chunk; the
    numbers must be sane (0 < occupancy ≤ 1) and reflect the workload."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_id=None, pad_token_id=0)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=4, max_len=32, decode_chunk=2)
    for seed in range(4):
        ids, mask = _prompt(cfg, 40 + seed, S=8, bucket=16)
        emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        eng.submit_embeds(emb, mask, max_new_tokens=4 + seed)
    eng.run_until_idle()
    u = eng.stats.kv_utilization
    assert 0.0 < u <= 1.0
    assert eng.stats.kv_reserved_token_chunks > 0
    # 4 slots × 32-row reserve vs ~8-12 live tokens each → well under half
    assert u < 0.6


def test_batched_admission_token_exact_and_fewer_dispatches(setup):
    """VERDICT r4 item 3: a burst of same-bucket arrivals admits in batched
    dispatches (power-of-two chunks), token-exact vs the per-request B=1
    admission path and vs engine.generate."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_id=None, pad_token_id=0,
                               repetition_penalty=1.1)
    burst = []
    for seed in range(7):  # mixed lengths, same bucket
        ids, mask = _prompt(cfg, 100 + seed, S=7 + (seed % 4), bucket=16)
        embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        burst.append((ids, mask, embeds))

    outs = {}
    for batch_max in (1, 4):
        eng = SlotEngine(params, cfg, gen_cfg, num_slots=8, max_len=48,
                         decode_chunk=2, admit_batch_max=batch_max)
        futs = [eng.submit_embeds(e, m, max_new_tokens=5 + i % 3)
                for i, (_, m, e) in enumerate(burst)]
        eng.run_until_idle()
        outs[batch_max] = [f.result(timeout=1) for f in futs]
        if batch_max == 1:
            assert eng.stats.admit_dispatches == 7
        else:
            # 7 same-bucket requests → chunks of 4 + 2 + 1 = 3 dispatches
            assert eng.stats.admit_dispatches == 3
        assert eng.stats.admission_wait_s >= 0.0

    for (toks_b, n_b), (toks_1, n_1) in zip(outs[4], outs[1]):
        assert n_b == n_1
        np.testing.assert_array_equal(toks_b, toks_1)
    # and vs the monolithic engine (budget-truncated)
    for i, (ids, mask, _) in enumerate(burst):
        ref_toks, _ = _ref_generate(params, cfg, gen_cfg, ids, mask)
        n = 5 + i % 3
        np.testing.assert_array_equal(outs[4][i][0], ref_toks[:n])


def test_batched_admission_mixed_buckets_and_spec(setup):
    """Buckets group independently (one batched dispatch per (S, L) bucket);
    speculative mode threads lookup_ids through the batched path."""
    cfg, params = setup
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_id=None, pad_token_id=0)
    reqs = []
    for seed in range(6):
        bucket = 16 if seed % 2 == 0 else 24
        ids, mask = _prompt(cfg, 200 + seed, S=6 + seed % 3, bucket=bucket)
        embeds = np.asarray(qwen3.embed_tokens(params, jnp.asarray(ids)))
        reqs.append((ids, mask, embeds))

    outs = {}
    for batch_max in (1, 8):
        eng = SlotEngine(params, cfg, gen_cfg, num_slots=6, max_len=64,
                         decode_chunk=2, speculative=True, draft_k=3, ngram=2,
                         spec_chunk=2, spec_min_gain=0.0,
                         admit_batch_max=batch_max)
        futs = [eng.submit_embeds(e, m, lookup_ids=ids.astype(np.int32))
                for ids, m, e in reqs]
        eng.run_until_idle()
        outs[batch_max] = [f.result(timeout=1) for f in futs]
        if batch_max == 8:
            # two buckets of 3 → (2+1) + (2+1) = 4 dispatches
            assert eng.stats.admit_dispatches == 4

    for (toks_b, n_b), (toks_1, n_1) in zip(outs[8], outs[1]):
        assert n_b == n_1
        np.testing.assert_array_equal(toks_b, toks_1)
