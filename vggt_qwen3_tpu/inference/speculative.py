"""Speculative decoding with prompt-lookup (n-gram) drafting — token-exact.

Decode on a TPU chip is HBM-bandwidth-bound: every generated token pays one
full read of the (quantized) weights, so ``generate``'s one-token-per-forward
scan sits at a hard floor (~5–6 ms/step for the 4B model — BASELINE.md). The
one technique that breaks a bandwidth floor is verifying SEVERAL tokens per
weight read: draft k candidate continuations cheaply, run ONE forward over
the ``k+1``-token block (reading the weights once), and keep the longest
prefix the model itself would have produced. Greedy outputs are **identical
to ``generate``** — acceptance compares the drafted token against the exact
processed-argmax token at every position, including HF repetition-penalty /
no-repeat-ngram semantics and the constrained-decoding FSM — so this changes
*how fast* tokens appear, never *which* tokens (``tests/test_speculative.py``).

The draft source is prompt-lookup / n-gram reuse (no draft model — none
exists for this stack, and the reference deployment's workloads don't need
one): find the most recent prior occurrence of the last ``ngram`` tokens in
the (prompt + generated) history and propose the tokens that followed it.
The target workloads are exactly where this shines — ARKit action JSON
(``arkit_inference.py:166-179``'s schema makes output structure highly
repetitive) and QA answers that echo prompt spans. On non-repetitive text
acceptance degrades to ~0 and each iteration emits 1 token at a slightly
higher per-step cost (the S=k+1 verify reads marginally more KV), so the
mode is opt-in per call.

TPU-native mechanics:

- the whole generation (prefill → while_loop of [select token 0 → n-gram
  match → draft gather → block verify forward → unrolled acceptance] → pack)
  is ONE jitted program with static shapes by default — one dispatch + one
  fetch per query (a host-driven per-block mode exists for streaming),
- rows accept different counts, so sequences desync: the verify forward uses
  ``forward_hidden``'s per-row block path ([B] cache offsets with S=k+1
  scatter writes and a [B, S, T] per-query frontier mask). Rejected drafts
  leave garbage KV entries beyond each row's frontier; the mask hides them
  and the next block overwrites them,
- the all-done flag is fetched one iteration late so the host round-trip
  overlaps the in-flight iteration (the pipelined-delivery trick shared with
  ``generate_early_exit`` / the slot engine).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen3Config
from ..models import qwen3
from .engine import GenerationConfig, _processors, constrained_greedy, unpack_lengths


def draft_lookup(ids_buf, ids_start, ids_len, tok0, k: int, ngram: int):
    """Prompt-lookup drafting over a per-row token history (the shared core
    of :func:`_iteration_body` and the slot engine's ``_spec_chunk``).

    The key is the last ``ngram-1`` history tokens plus the just-selected
    ``tok0``; among prior occurrences in ``[ids_start, ids_len)`` we prefer
    the one with the most continuation tokens available (capped at ``k``,
    most recent among ties) — a short loop's most recent occurrence sits
    right behind the frontier with <k tokens after it, while one period
    earlier yields the full k drafts.

    Returns ``drafts [B, k]`` int32 (0-filled where no match / short
    continuation — unmatched drafts simply get rejected by verification).
    """
    B, C = ids_buf.shape
    rows = jnp.arange(B)
    n1 = max(ngram - 1, 0)
    key_pos = ids_len[:, None] - n1 + jnp.arange(n1)[None, :]
    key_prev = ids_buf[rows[:, None], jnp.clip(key_pos, 0, C - 1)]
    key = jnp.concatenate([key_prev, tok0[:, None]], axis=1)  # [B, ngram]
    jj = jnp.arange(C)
    win_idx = jj[:, None] + jnp.arange(ngram)[None, :]  # [C, ngram]
    windows = ids_buf[:, jnp.clip(win_idx, 0, C - 1)]  # [B, C, ngram]
    match = jnp.all(windows == key[:, None, :], axis=-1)
    enough_hist = (ids_len - ids_start) >= n1  # key must be real history
    valid_j = (
        (jj[None, :] >= ids_start[:, None])
        # the window's ids-buffer part must end before ids_len (tok0 itself
        # is not yet written), with ≥1 continuation token after it
        & (jj[None, :] + ngram <= ids_len[:, None])
        & enough_hist[:, None]
    )
    avail = jnp.clip(ids_len[:, None] - (jj[None, :] + ngram), 0, k)
    score = jnp.where(match & valid_j & (avail > 0), avail * C + jj[None, :], -1)
    best = score.max(axis=-1)  # [B]
    has = best >= 0
    p = jnp.where(has, best % C, 0)
    d_idx = p[:, None] + ngram + jnp.arange(k)[None, :]
    d_ok = has[:, None] & (d_idx < ids_len[:, None])
    return jnp.where(d_ok, ids_buf[rows[:, None], jnp.clip(d_idx, 0, C - 1)], 0)


def _prefill_body(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    k: int,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    lookup_ids: Optional[jnp.ndarray] = None,
    lookup_mask: Optional[jnp.ndarray] = None,
    budget: Optional[jnp.ndarray] = None,
):
    """Prompt prefill → speculative carry.

    The KV cache is sized ``S + N + k``: the last verify block may start at
    ``n_gen = N-1`` and still write ``k+1`` entries.
    """
    B, S, _ = inputs_embeds.shape
    N = gen_cfg.max_new_tokens
    # round the cache length up to the int8 sublane (32): the fused
    # block-verify kernel requires tile-aligned T, and S+N+k lands on
    # arbitrary values — a few masked scratch columns buy unconditional
    # kernel eligibility (r5; r4's raw S+N+k silently disqualified it)
    total = -(-(S + N + k) // 32) * 32

    cache = qwen3.init_cache(cfg, B, total, dtype=gen_cfg.kv_dtype or cfg.dtype)
    amask = jnp.zeros((B, total), jnp.int32).at[:, :S].set(attention_mask.astype(jnp.int32))
    positions = jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
    logits, cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=amask, positions=positions, cache=cache, cache_offset=0,
        prefill_padding="left", last_logit_only=True,
    )
    next_logits = logits[:, -1]
    next_pos = positions[:, -1] + 1

    seen_cap = (S if gen_cfg.penalize_prompt else 0) + N
    seen_ids = jnp.zeros((B, seen_cap), jnp.int32)
    if gen_cfg.penalize_prompt:
        ids = prompt_ids if prompt_ids is not None else jnp.zeros((B, S), jnp.int32)
        seen_ids = seen_ids.at[:, :S].set(ids.astype(jnp.int32))
        seen_len = attention_mask.astype(jnp.int32).sum(-1)
    else:
        seen_len = jnp.zeros((B,), jnp.int32)

    # Lookup buffer: prompt tokens (their valid run must END at the buffer's
    # prompt region edge — engine prompts are left-padded, so as-is), then
    # generated tokens appended. This is draft memory only — it need not align
    # with the (vision-expanded) embedding positions.
    if lookup_ids is None:
        lookup_ids = prompt_ids
        lookup_mask = attention_mask if prompt_ids is not None else None
    if lookup_ids is not None:
        SP = lookup_ids.shape[1]
        lm = (
            lookup_mask.astype(jnp.int32)
            if lookup_mask is not None
            else jnp.ones((B, SP), jnp.int32)
        )
        ids_buf = jnp.zeros((B, SP + N), jnp.int32).at[:, :SP].set(lookup_ids.astype(jnp.int32))
        ids_start = SP - lm.sum(-1)
        ids_len = jnp.full((B,), SP, jnp.int32)
    else:
        ids_buf = jnp.zeros((B, N), jnp.int32)
        ids_start = jnp.zeros((B,), jnp.int32)
        ids_len = jnp.zeros((B,), jnp.int32)

    done = jnp.zeros((B,), bool)
    fsm_state = jnp.zeros((B,), jnp.int32)
    n_gen = jnp.zeros((B,), jnp.int32)
    if budget is None:
        budget = jnp.full((B,), N, jnp.int32)
    budget = jnp.minimum(budget, N)
    prompt_key_mask = attention_mask.astype(jnp.int32)
    out = jnp.full((B, N), gen_cfg.pad_token_id, jnp.int32)
    return (cache, next_logits, next_pos, n_gen, done, fsm_state, seen_ids,
            seen_len, ids_buf, ids_start, ids_len, prompt_key_mask, out, budget)


_spec_prefill = partial(jax.jit, static_argnames=("cfg", "gen_cfg", "k"))(_prefill_body)


def _iteration_body(
    params,
    carry,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    k: int,
    ngram: int,
    constraint: Optional[jnp.ndarray] = None,
):
    """One speculative iteration: emit 1..k+1 tokens per alive row with ONE
    forward pass. Returns ``(carry, all_done scalar)``."""
    (cache, next_logits, next_pos, n_gen, done, fsm_state, seen_ids, seen_len,
     ids_buf, ids_start, ids_len, prompt_key_mask, out, budget) = carry
    B = next_logits.shape[0]
    S = prompt_key_mask.shape[1]
    N = out.shape[1]
    C = ids_buf.shape[1]
    T = cache["k"].shape[3]  # head-major cache [L, B, NKV, T, D]
    rows = jnp.arange(B)
    eos = gen_cfg.eos_token_id

    # ---- token 0: exactly generate()'s per-step selection -----------------
    processed0 = _processors(next_logits, seen_ids, seen_len, gen_cfg)
    tok0 = constrained_greedy(next_logits, processed0, fsm_state, constraint)

    # ---- draft k tokens by n-gram lookup (key = last ngram-1 ids + tok0) --
    drafts = draft_lookup(ids_buf, ids_start, ids_len, tok0, k, ngram)

    # ---- ONE forward over the [tok0, drafts] block ------------------------
    block = jnp.concatenate([tok0[:, None], drafts], axis=1)  # [B, k+1]
    kv_off = S + n_gen
    tpos = jnp.arange(T)[None, None, :]
    prompt_ok = jnp.pad(prompt_key_mask, ((0, 0), (0, T - S)))[:, None, :].astype(bool)
    gen_ok = (tpos - S) <= (n_gen[:, None, None] + jnp.arange(k + 1)[None, :, None])
    amask = jnp.where(tpos < S, prompt_ok, gen_ok)  # [B, k+1, T]
    positions = next_pos[:, None] + jnp.arange(k + 1)[None, :]
    logits, cache = qwen3.forward(
        params, cfg, input_ids=block, attention_mask=amask.astype(jnp.int32),
        positions=positions, cache=cache, cache_offset=kv_off,
        # amask rows are per-query frontiers ([start, kv_off + j + 1)) —
        # unlocks the fused block-verify kernel at eligible shapes
        decode_frontier=True,
    )
    logits = logits.astype(jnp.float32)  # [B, k+1, V]

    # ---- unrolled acceptance: emit tok0, then drafts while they match -----
    def record(emit, tok, seen_ids, seen_len, ids_buf, ids_len, out, out_at, fsm):
        idx = jnp.clip(seen_len, 0, seen_ids.shape[1] - 1)
        seen_ids = seen_ids.at[rows, idx].set(
            jnp.where(emit, tok, seen_ids[rows, idx])
        )
        seen_len = seen_len + emit.astype(jnp.int32)
        bidx = jnp.clip(ids_len, 0, C - 1)
        ids_buf = ids_buf.at[rows, bidx].set(jnp.where(emit, tok, ids_buf[rows, bidx]))
        ids_len = ids_len + emit.astype(jnp.int32)
        oidx = jnp.clip(out_at, 0, N - 1)
        out = out.at[rows, oidx].set(jnp.where(emit, tok, out[rows, oidx]))
        if constraint is not None:
            nxt = constraint[fsm, tok]
            fsm = jnp.where(emit, jnp.maximum(nxt, 0), fsm)
        return seen_ids, seen_len, ids_buf, ids_len, out, fsm

    can0 = (~done) & (n_gen < budget)
    seen_ids, seen_len, ids_buf, ids_len, out, fsm_state = record(
        can0, tok0, seen_ids, seen_len, ids_buf, ids_len, out, n_gen, fsm_state
    )
    a = can0.astype(jnp.int32)
    hit_eos = can0 & (tok0 == eos) if eos is not None else jnp.zeros((B,), bool)
    alive = can0 & ~hit_eos & (n_gen + a < budget)

    for j in range(1, k + 1):
        prev = logits[:, j - 1]
        processed = _processors(prev, seen_ids, seen_len, gen_cfg)
        true_j = constrained_greedy(prev, processed, fsm_state, constraint)
        accept = alive & (drafts[:, j - 1] == true_j)
        seen_ids, seen_len, ids_buf, ids_len, out, fsm_state = record(
            accept, true_j, seen_ids, seen_len, ids_buf, ids_len, out, n_gen + a,
            fsm_state,
        )
        a = a + accept.astype(jnp.int32)
        if eos is not None:
            e = accept & (true_j == eos)
            hit_eos = hit_eos | e
            alive = accept & ~e
        else:
            alive = accept
        alive = alive & (n_gen + a < budget)

    # next-token logits = model output after the LAST emitted token
    sel = jnp.clip(a - 1, 0, k)
    gathered = jnp.take_along_axis(logits, sel[:, None, None], axis=1)[:, 0]
    next_logits = jnp.where((a > 0)[:, None], gathered, next_logits)
    n_gen = n_gen + a
    next_pos = next_pos + a
    done = done | hit_eos | (n_gen >= budget)

    carry = (cache, next_logits, next_pos, n_gen, done, fsm_state, seen_ids,
             seen_len, ids_buf, ids_start, ids_len, prompt_key_mask, out, budget)
    return carry, done.all()


@partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "k", "ngram"),
    donate_argnums=(1,),
)
def _spec_iteration(
    params,
    carry,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    k: int,
    ngram: int,
    constraint: Optional[jnp.ndarray] = None,
):
    return _iteration_body(params, carry, cfg, gen_cfg, k, ngram, constraint)


@jax.jit
def _spec_pack(carry):
    """(out | n_gen) in ONE fresh buffer → single host fetch."""
    out, n_gen = carry[12], carry[3]
    return jnp.concatenate([out, n_gen[:, None]], axis=1)


def spec_generate_fused_body(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    k: int,
    ngram: int,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    lookup_ids: Optional[jnp.ndarray] = None,
    lookup_mask: Optional[jnp.ndarray] = None,
    budget: Optional[jnp.ndarray] = None,
    constraint: Optional[jnp.ndarray] = None,
):
    """The whole speculative generation as ONE compiled region: prefill,
    then a ``lax.while_loop`` over verify blocks that exits as soon as every
    row is done. One dispatch + one fetch per query — on this tunneled
    backend the host-driven loop paid ~35 ms of round-trip per block (12
    blocks × 35 ms ate the entire speedup; measured 511 ms vs 428 ms
    baseline), while the fused program pays it once.

    A traceable BODY (plain function) so callers can inline it into a larger
    jitted program (e.g. ``batching.py`` fuses vision → splice → this into
    one dispatch per action query). Returns ``(packed [B, N+1] = out |
    n_gen, iterations scalar)``."""
    carry = _prefill_body(
        params, cfg, gen_cfg, k,
        inputs_embeds=inputs_embeds, attention_mask=attention_mask,
        prompt_ids=prompt_ids, lookup_ids=lookup_ids, lookup_mask=lookup_mask,
        budget=budget,
    )
    N = gen_cfg.max_new_tokens

    def cond(state):
        carry, iters = state
        return jnp.logical_and(~carry[4].all(), iters < N)

    def body(state):
        carry, iters = state
        carry, _ = _iteration_body(params, carry, cfg, gen_cfg, k, ngram, constraint)
        return carry, iters + 1

    carry, iters = jax.lax.while_loop(cond, body, (carry, jnp.zeros((), jnp.int32)))
    out, n_gen = carry[12], carry[3]
    return jnp.concatenate([out, n_gen[:, None]], axis=1), iters


_spec_generate_fused = partial(
    jax.jit, static_argnames=("cfg", "gen_cfg", "k", "ngram")
)(spec_generate_fused_body)


def generate_speculative(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    lookup_ids: Optional[jnp.ndarray] = None,
    lookup_mask: Optional[jnp.ndarray] = None,
    constraint: Optional[jnp.ndarray] = None,
    budget: Optional[jnp.ndarray] = None,
    draft_k: int = 4,
    ngram: int = 3,
    mode: str = "fused",
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """``generate`` with prompt-lookup speculative decoding (greedy-exact).

    Args match :func:`engine.generate`, plus:
        lookup_ids/lookup_mask: optional [B, S'] token history seeding the
            draft memory (defaults to ``prompt_ids``/``attention_mask``; pass
            the pre-splice TEXT ids on the vision path, where
            ``inputs_embeds`` has no ids). Used only for drafting — never
            affects which tokens are produced.
        budget: optional [B] per-row token budgets (≤ max_new_tokens).
        draft_k: drafted tokens per iteration (block verify size k+1).
        ngram: lookup-key length (the just-selected token plus the preceding
            ``ngram-1``).
        mode: "fused" (default) runs prefill + a ``lax.while_loop`` over
            blocks as ONE program — one dispatch per query; "host" dispatches
            one program per block with a pipelined done-flag fetch (use when
            a caller streams tokens between blocks).

    Returns ``(tokens [B, max_new_tokens] pad-filled, lengths [B],
    iterations)`` — tokens/lengths bit-match :func:`engine.generate`;
    ``iterations`` counts forward passes (mean accepted tokens per weight
    read = total_tokens / iterations).
    """
    N = gen_cfg.max_new_tokens
    if budget is not None:
        budget = jnp.asarray(budget, jnp.int32)
        if not bool((budget >= 1).all()):
            raise ValueError("per-row budgets must be >= 1")
    if mode == "fused":
        packed, iters = _spec_generate_fused(
            params, cfg, gen_cfg, draft_k, ngram,
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            prompt_ids=prompt_ids, lookup_ids=lookup_ids,
            lookup_mask=lookup_mask, budget=budget, constraint=constraint,
        )
        packed = np.asarray(packed)
        iters = int(iters)
    else:
        carry = _spec_prefill(
            params, cfg, gen_cfg, draft_k,
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            prompt_ids=prompt_ids, lookup_ids=lookup_ids, lookup_mask=lookup_mask,
            budget=budget,
        )
        prev_flag = None
        iters = 0
        while iters < N:
            carry, all_done = _spec_iteration(
                params, carry, cfg, gen_cfg, draft_k, ngram, constraint
            )
            iters += 1
            # examine the PREVIOUS iteration's flag while this one computes
            # (the host round-trip overlaps the in-flight program; ≤1
            # iteration of pad-emitting overshoot — outputs unaffected, done
            # rows are frozen)
            if prev_flag is not None and bool(np.asarray(prev_flag)):
                break
            prev_flag = all_done
        packed = np.asarray(_spec_pack(carry))
    out, lengths = unpack_lengths(packed, gen_cfg)
    return jnp.asarray(out), jnp.asarray(lengths), iters
