"""Prompt-lookup speculative decoding — token-exactness vs ``generate``.

Speculation only changes how many tokens each forward pass yields; every
emitted token must equal what ``engine.generate`` (itself HF-parity-locked,
``tests/test_generation_parity.py``) produces — including HF processor
semantics, EOS/pad fill, per-row budgets, and the constrained-decoding FSM.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import Qwen3Config
from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
from vggt_qwen3_tpu.inference.speculative import generate_speculative
from vggt_qwen3_tpu.models import qwen3

CFG = Qwen3Config(
    vocab_size=160,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    rope_theta=10_000.0,
    dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return qwen3.init_params(jax.random.PRNGKey(3), CFG, dtype="float32")


def _prompt(seed, B=2, S=9, left_pad=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, CFG.vocab_size, size=(B, S))
    mask = np.ones((B, S), np.int32)
    if left_pad:
        ids[0, :left_pad] = 0
        mask[0, :left_pad] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def _both(params, gen_cfg, ids, mask, **spec_kw):
    emb = qwen3.embed_tokens(params, ids)
    ref_t, ref_l = generate(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask, prompt_ids=ids
    )
    toks, lens, iters = generate_speculative(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask,
        prompt_ids=ids, **spec_kw,
    )
    return np.asarray(ref_t), np.asarray(ref_l), np.asarray(toks), np.asarray(lens), iters


@pytest.mark.parametrize("mode", ["fused", "host"])
def test_exact_no_processors(params, mode):
    ids, mask = _prompt(0, left_pad=3)
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=0)
    rt, rl, st, sl, iters = _both(params, gen_cfg, ids, mask, mode=mode)
    assert st.tolist() == rt.tolist()
    assert sl.tolist() == rl.tolist()
    assert 1 <= iters <= 16


@pytest.mark.parametrize("mode", ["fused", "host"])
def test_exact_with_processors(params, mode):
    ids, mask = _prompt(1)
    gen_cfg = GenerationConfig(
        max_new_tokens=18, repetition_penalty=1.1, no_repeat_ngram=3,
        pad_token_id=0, penalize_prompt=True,
    )
    rt, rl, st, sl, _ = _both(params, gen_cfg, ids, mask, mode=mode)
    assert st.tolist() == rt.tolist()
    assert sl.tolist() == rl.tolist()


@pytest.mark.parametrize("mode", ["fused", "host"])
def test_exact_with_eos(params, mode):
    ids, mask = _prompt(2, B=1)
    free = GenerationConfig(max_new_tokens=20, pad_token_id=0)
    emb = qwen3.embed_tokens(params, ids)
    toks, _ = generate(params, CFG, free, inputs_embeds=emb, attention_mask=mask)
    eos = int(np.asarray(toks)[0, 5])
    gen_cfg = GenerationConfig(max_new_tokens=20, eos_token_id=eos, pad_token_id=0)
    rt, rl, st, sl, _ = _both(params, gen_cfg, ids, mask, mode=mode)
    assert st.tolist() == rt.tolist()
    assert sl.tolist() == rl.tolist()


def test_exact_per_row_budget(params):
    ids, mask = _prompt(4)
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=0)
    emb = qwen3.embed_tokens(params, ids)
    ref_t, _ = generate(params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask)
    ref_t = np.asarray(ref_t)
    toks, lens, _ = generate_speculative(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask,
        prompt_ids=ids, budget=np.array([6, 3]),
    )
    toks = np.asarray(toks)
    assert toks[0, :6].tolist() == ref_t[0, :6].tolist()
    assert toks[1, :3].tolist() == ref_t[1, :3].tolist()
    assert (toks[0, 6:] == 0).all() and (toks[1, 3:] == 0).all()
    assert np.asarray(lens).tolist() == [6, 3]


def test_exact_under_constraint_and_acceptance_speeds_it_up(params):
    """A single-token-per-state cyclic FSM forces a deterministic repeating
    output, so (a) speculative tokens must equal generate's, and (b) after
    one cycle the n-gram lookup predicts everything — iterations must be
    far fewer than tokens."""
    cycle = [7, 23, 5, 41]
    m = len(cycle)
    table = np.full((m, CFG.vocab_size), -1, np.int32)
    for s, tok in enumerate(cycle):
        table[s, tok] = (s + 1) % m
    constraint = jnp.asarray(table)

    ids, mask = _prompt(5, B=2, S=6)
    gen_cfg = GenerationConfig(max_new_tokens=24, pad_token_id=0)
    emb = qwen3.embed_tokens(params, ids)
    ref_t, ref_l = generate(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask,
        constraint=constraint,
    )
    toks, lens, iters = generate_speculative(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask,
        prompt_ids=ids, constraint=constraint, draft_k=4, ngram=3,
    )
    assert np.asarray(toks).tolist() == np.asarray(ref_t).tolist()
    assert np.asarray(lens).tolist() == np.asarray(ref_l).tolist()
    # 24 tokens: the 4-cycle must occur twice before the ngram-3 lookup can
    # fire (~6 warmup iterations of 1 token), then 5/iteration steady state
    # (k=4 accepted + the guaranteed token) — ≥2× fewer forwards than tokens
    assert iters <= 12, iters


def test_prompt_echo_acceptance(params):
    """When the true continuation literally appears in the prompt (the
    prompt-lookup sweet spot), drafts come from the prompt occurrence.
    Build it by constraining generation to a sequence embedded in the
    prompt."""
    seq = [11, 12, 13, 14, 15, 16, 17, 18]
    table = np.full((len(seq), CFG.vocab_size), -1, np.int32)
    for s, tok in enumerate(seq):
        table[s, tok] = min(s + 1, len(seq) - 1)
    table[len(seq) - 1, seq[-1]] = len(seq) - 1  # absorb: repeat last token
    constraint = jnp.asarray(table)

    B, S = 1, 12
    ids = np.zeros((B, S), np.int64)
    ids[0, : len(seq)] = seq  # the continuation is IN the prompt
    ids[0, len(seq):] = [3, 4, 11, 12]  # ends with the seq's first two tokens
    ids = jnp.asarray(ids)
    mask = jnp.ones((B, S), jnp.int32)
    gen_cfg = GenerationConfig(max_new_tokens=7, pad_token_id=0)
    emb = qwen3.embed_tokens(params, ids)
    ref_t, _ = generate(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask,
        constraint=constraint,
    )
    toks, _, iters = generate_speculative(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask,
        prompt_ids=ids, constraint=constraint, draft_k=4, ngram=3,
    )
    assert np.asarray(toks).tolist() == np.asarray(ref_t).tolist()
    # emits 11,12 (no 3-gram context yet), then the prompt echo drives full
    # k+1 blocks: 3 dispatches + ≤1 pipelined-flag overshoot ≪ 7 steps
    assert iters <= 5, iters


def test_int8_kv_cache_path(params):
    ids, mask = _prompt(6)
    gen_cfg = GenerationConfig(max_new_tokens=12, pad_token_id=0, kv_dtype="int8")
    rt, rl, st, sl, _ = _both(params, gen_cfg, ids, mask)
    assert st.tolist() == rt.tolist()
    assert sl.tolist() == rl.tolist()
