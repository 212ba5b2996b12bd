"""Autoregressive generation engine: one jitted prefill + one jitted decode scan.

Replaces the reference's HF ``generate`` loop (``qa_inference.py:207-216``,
``arkit_inference.py:274-284``) with a fixed-shape, compile-once design:

- prefill runs the whole (possibly embedding-spliced) prompt in one forward,
- decoding is a single ``lax.scan`` of ``max_new_tokens`` steps over the KV
  cache — no per-token Python, no retracing across calls with equal shapes,
- logit processors (repetition penalty, no-repeat-ngram) reproduce HF
  semantics including the inputs_embeds subtlety (see ``ops/sampling.py``),
- finished rows emit ``pad_token_id`` (HF padding behavior after EOS).

Works with token ids or pre-spliced ``inputs_embeds`` (the vision path).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen3Config
from ..models import qwen3
from ..ops.sampling import apply_no_repeat_ngram, apply_repetition_penalty, greedy_token


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    pad_token_id: int = 0
    repetition_penalty: float = 1.0
    no_repeat_ngram: int = 0
    # When True, the prompt ids participate in the penalty/ngram sets (HF
    # text-only call). When generating from inputs_embeds, HF starts its
    # rolling input_ids empty, so this must be False for that path.
    penalize_prompt: bool = False
    # KV cache storage: None → model dtype (bf16, exact); "int8" → quantized
    # per-(token, head) — halves decode KV traffic, near-lossless greedy.
    kv_dtype: Optional[str] = None


def _processors(logits, seen_ids, seen_len, gen_cfg: GenerationConfig):
    logits = apply_repetition_penalty(logits, seen_ids, seen_len, gen_cfg.repetition_penalty)
    logits = apply_no_repeat_ngram(logits, seen_ids, seen_len, gen_cfg.no_repeat_ngram)
    return logits


def constrained_greedy(raw_logits, processed, fsm_state, constraint):
    """Greedy token under an optional schema FSM — the ONE selection rule
    every decode path uses (generate / early-exit / speculative / slots).

    Grammar masks the processed logits; rows where the processors banned
    every grammar-legal token (structural JSON tokens necessarily repeat, so
    no-repeat-ngram can ban them all) fall back to grammar-masked RAW
    logits — grammar takes precedence over processors."""
    if constraint is None:
        return greedy_token(processed)
    allowed = constraint[fsm_state] >= 0
    cand = jnp.where(allowed, processed, -jnp.inf)
    feasible = jnp.isfinite(cand).any(axis=-1, keepdims=True)
    raw_cand = jnp.where(allowed, raw_logits, -jnp.inf)
    return greedy_token(jnp.where(feasible, cand, raw_cand))


def unpack_lengths(packed: np.ndarray, gen_cfg: GenerationConfig):
    """Host-side unpack of the fused programs' ``[B, N+1] = out | n_gen``
    buffer → ``(tokens [B, N], lengths [B])``. Lengths count up to and
    including EOS (engine.generate semantics); budget-finished rows have no
    EOS, so the count clamps to the device-side emitted total (also the
    guard for pad_token_id == eos_token_id, where pads after finish would
    otherwise count as alive)."""
    N = gen_cfg.max_new_tokens
    out, n_gen = packed[:, :N], packed[:, N]
    if gen_cfg.eos_token_id is not None:
        is_eos = out == gen_cfg.eos_token_id
        seen = np.cumsum(is_eos.astype(np.int32), axis=-1) - is_eos.astype(np.int32)
        lengths = np.minimum((seen == 0).astype(np.int32).sum(-1), n_gen)
    else:
        lengths = n_gen
    return out, lengths


@partial(jax.jit, static_argnames=("cfg", "gen_cfg"))
def generate(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    constraint: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy generation.

    Args:
        inputs_embeds: [B, S, H] prompt embeddings (token embeddings already
            looked up, vision tokens possibly spliced in).
        attention_mask: [B, S] 1 = valid prompt position (left padding ok).
        prompt_ids: [B, S] ids backing the prompt; only consulted when
            ``gen_cfg.penalize_prompt`` (text-only ARKit fallback path).
        constraint: optional FSM transition table [num_states, vocab] int32
            (``inference/constrained.py``): each step masks logits to tokens
            with ``constraint[state] >= 0`` and advances the per-row state —
            grammar/schema-constrained decoding at one table lookup per token.
    Returns:
        (tokens [B, max_new_tokens] int32 — pad-filled after EOS,
         lengths [B] int32 — number of generated tokens incl. EOS)
    """
    B, S, _ = inputs_embeds.shape
    N = gen_cfg.max_new_tokens
    total = S + N

    cache = qwen3.init_cache(cfg, B, total, dtype=gen_cfg.kv_dtype or cfg.dtype)
    mask = jnp.zeros((B, total), jnp.int32)
    mask = mask.at[:, :S].set(attention_mask.astype(jnp.int32))
    positions = jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)

    # Pure-greedy fast path: with no logit processors and no grammar, the
    # only consumer of the [B, V] f32 logits is an argmax — route the head
    # through the fused head-argmax kernel (ops/decode_matmul.py) and carry
    # the next TOKEN instead of next logits. Token-identical to the slow
    # path (the kernel's dequant/scale factorization matches lm_logits
    # bit-for-bit; locked on-chip by scripts/parity_decode_kernels.py).
    if (
        constraint is None
        and gen_cfg.repetition_penalty == 1.0
        and gen_cfg.no_repeat_ngram == 0
        and qwen3.greedy_head_eligible(params, cfg, B)
    ):
        next_tok, cache = qwen3.forward_greedy(
            params, cfg, inputs_embeds=inputs_embeds,
            attention_mask=mask, positions=positions, cache=cache,
            cache_offset=0, prefill_padding="left",
        )
        next_pos = positions[:, -1] + 1
        done0 = jnp.zeros((B,), bool)

        def fast_step(carry, t):
            cache, mask, tok, next_pos, done = carry
            out_tok = jnp.where(done, gen_cfg.pad_token_id, tok)
            if gen_cfg.eos_token_id is not None:
                done = done | (tok == gen_cfg.eos_token_id)
            mask = mask.at[:, S + t].set(1)
            emb = qwen3.embed_tokens(params, out_tok[:, None])
            tok_new, cache = qwen3.forward_greedy(
                params, cfg, inputs_embeds=emb, attention_mask=mask,
                positions=(next_pos + t)[:, None], cache=cache,
                cache_offset=S + t, decode_frontier=True,
            )
            return (cache, mask, tok_new, next_pos, done), out_tok

        _, toks = jax.lax.scan(
            fast_step, (cache, mask, next_tok, next_pos, done0), jnp.arange(N)
        )
        tokens = jnp.transpose(toks, (1, 0))
        if gen_cfg.eos_token_id is not None:
            is_eos = tokens == gen_cfg.eos_token_id
            seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), -1) - is_eos.astype(jnp.int32)
            lengths = (seen_eos == 0).astype(jnp.int32).sum(-1)
        else:
            lengths = jnp.full((B,), N, jnp.int32)
        return tokens, lengths

    logits, cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=mask, positions=positions, cache=cache, cache_offset=0,
        prefill_padding="left",  # engine prompts are left-padded → flash path
        last_logit_only=True,  # full-seq fp32 logits are O(B·S·V) — see forward()
    )
    next_logits = logits[:, -1]
    next_pos = positions[:, -1] + 1

    # Visible-token buffer for the logit processors.
    seen_cap = (S if gen_cfg.penalize_prompt else 0) + N
    seen_ids = jnp.zeros((B, seen_cap), jnp.int32)
    if gen_cfg.penalize_prompt:
        ids = prompt_ids if prompt_ids is not None else jnp.zeros((B, S), jnp.int32)
        seen_ids = seen_ids.at[:, :S].set(ids.astype(jnp.int32))
        seen_len = attention_mask.astype(jnp.int32).sum(-1)
        # NOTE: with left padding the pad ids sit in the buffer but HF includes
        # everything in input_ids too (pads included); we include only valid
        # count — pads are masked out by seen_len ordering in the right-pad
        # case. For left-pad text prompts HF penalizes pad ids as well; that
        # path is not exercised by the reference (batch=1), so we keep the
        # cleaner semantics.
        write_at = seen_len
    else:
        seen_len = jnp.zeros((B,), jnp.int32)
        write_at = seen_len

    done = jnp.zeros((B,), bool)
    fsm_state = jnp.zeros((B,), jnp.int32)  # carried only when constrained

    def step(carry, t):
        cache, mask, next_logits, next_pos, seen_ids, seen_len, done, fsm_state = carry
        logits = _processors(next_logits, seen_ids, seen_len, gen_cfg)
        tok = constrained_greedy(next_logits, logits, fsm_state, constraint)
        if constraint is not None:
            nxt = constraint[fsm_state, tok]
            fsm_state = jnp.where(done, fsm_state, jnp.maximum(nxt, 0))
        out_tok = jnp.where(done, gen_cfg.pad_token_id, tok)
        if gen_cfg.eos_token_id is not None:
            done_next = done | (tok == gen_cfg.eos_token_id)
        else:
            done_next = done
        # record into seen buffer (even pads for finished rows — harmless,
        # outputs are forced to pad and finished rows' logits are ignored)
        seen_ids = seen_ids.at[jnp.arange(B), write_at + t].set(out_tok)
        seen_len = seen_len + 1

        mask = mask.at[:, S + t].set(1)
        emb = qwen3.embed_tokens(params, out_tok[:, None])
        logits_new, cache = qwen3.forward(
            params, cfg, inputs_embeds=emb, attention_mask=mask,
            positions=(next_pos + t)[:, None], cache=cache, cache_offset=S + t,
            decode_frontier=True,
        )
        carry = (cache, mask, logits_new[:, 0], next_pos, seen_ids, seen_len, done_next, fsm_state)
        return carry, out_tok

    carry = (cache, mask, next_logits, next_pos, seen_ids, seen_len, done, fsm_state)
    _, toks = jax.lax.scan(step, carry, jnp.arange(N))
    tokens = jnp.transpose(toks, (1, 0))  # [B, N]

    if gen_cfg.eos_token_id is not None:
        is_eos = tokens == gen_cfg.eos_token_id
        seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=-1) - is_eos.astype(jnp.int32)
        alive = seen_eos == 0
        lengths = alive.astype(jnp.int32).sum(-1)
    else:
        lengths = jnp.full((B,), N, jnp.int32)
    return tokens, lengths


# ---------------------------------------------------------------------------
# Chunked early-exit generation
# ---------------------------------------------------------------------------
#
# ``generate`` always runs ``max_new_tokens`` decode steps — the right shape
# for throughput benches, but a latency waste for real queries: the reference
# deployment's answers are 1-2 words median (ground-truth references in
# ``outputs/qa/baseline_eval/*.jsonl``), and the HF loop it replaces
# (``qa_inference.py:207-216``) stops at EOS. The chunked path decodes in
# fixed-size compiled chunks and stops ~one chunk after every row finishes
# (EOS or per-row budget), with the all-done flag fetched one chunk LATE so
# the host round-trip overlaps the next chunk's compute (the slot engine's
# pipelined-delivery trick, ``inference/slots.py``). Token outputs are
# bit-identical to ``generate`` — scheduling changes when work happens, not
# what is computed (locked by ``tests/test_generation_parity.py``).


def _prefill_carry_body(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    budget: Optional[jnp.ndarray] = None,
):
    """Prompt prefill → decode carry (same state ``generate`` scans over,
    plus per-row ``n_gen``/``budget`` so rows can finish early)."""
    B, S, _ = inputs_embeds.shape
    N = gen_cfg.max_new_tokens
    total = S + N

    cache = qwen3.init_cache(cfg, B, total, dtype=gen_cfg.kv_dtype or cfg.dtype)
    mask = jnp.zeros((B, total), jnp.int32)
    mask = mask.at[:, :S].set(attention_mask.astype(jnp.int32))
    positions = jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)

    logits, cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=mask, positions=positions, cache=cache, cache_offset=0,
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

    done = jnp.zeros((B,), bool)
    fsm_state = jnp.zeros((B,), jnp.int32)
    n_gen = jnp.zeros((B,), jnp.int32)
    if budget is None:
        budget = jnp.full((B,), N, jnp.int32)
    # pad-fill so never-decoded columns (early exit) match generate's padding
    out = jnp.full((B, N), gen_cfg.pad_token_id, jnp.int32)
    return (cache, mask, next_logits, next_pos, seen_ids, seen_len, done,
            fsm_state, n_gen, budget, out)


_prefill_carry = partial(jax.jit, static_argnames=("cfg", "gen_cfg"))(_prefill_carry_body)


def _ee_step(params, cfg, gen_cfg, constraint, S, carry, t):
    """One early-exit decode step at global step ``t`` — ``generate``'s step
    body plus per-row budget exhaustion folding into ``done``."""
    (cache, mask, next_logits, next_pos, seen_ids, seen_len, done,
     fsm_state, n_gen, budget, out) = carry
    B = next_logits.shape[0]
    logits = _processors(next_logits, seen_ids, seen_len, gen_cfg)
    tok = constrained_greedy(next_logits, logits, fsm_state, constraint)
    if constraint is not None:
        nxt = constraint[fsm_state, tok]
        fsm_state = jnp.where(done, fsm_state, jnp.maximum(nxt, 0))
    out_tok = jnp.where(done, gen_cfg.pad_token_id, tok)
    n_gen = jnp.where(done, n_gen, n_gen + 1)
    if gen_cfg.eos_token_id is not None:
        done_next = done | (tok == gen_cfg.eos_token_id)
    else:
        done_next = done
    done_next = done_next | (n_gen >= budget)

    seen_ids = seen_ids.at[jnp.arange(B), jnp.clip(seen_len, 0, seen_ids.shape[1] - 1)].set(out_tok)
    seen_len = seen_len + 1
    out = out.at[:, t].set(out_tok)

    mask = mask.at[:, S + t].set(1)
    emb = qwen3.embed_tokens(params, out_tok[:, None])
    logits_new, cache = qwen3.forward(
        params, cfg, inputs_embeds=emb, attention_mask=mask,
        positions=(next_pos + t)[:, None], cache=cache, cache_offset=S + t,
        decode_frontier=True,
    )
    return (cache, mask, logits_new[:, 0], next_pos, seen_ids, seen_len,
            done_next, fsm_state, n_gen, budget, out)


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "chunk"), donate_argnums=(1,))
def _early_exit_chunk(
    params,
    carry,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    chunk: int,
    t0: jnp.ndarray,
    constraint: Optional[jnp.ndarray] = None,
):
    """Advance the decode carry ``chunk`` steps starting at global step ``t0``.

    Returns ``(carry, all_done scalar)``. Tokens accumulate in the carry's
    device-side ``out`` buffer — fetched ONCE by ``_early_exit_pack`` at the
    end, because on a tunneled backend every separate host fetch costs a full
    round-trip (~40 ms here; per-chunk token fetches measured +160 ms on a
    4-chunk query)."""
    N = gen_cfg.max_new_tokens
    S = carry[1].shape[1] - N  # mask width is S + N

    def step(carry, t):
        return _ee_step(params, cfg, gen_cfg, constraint, S, carry, t), None

    carry, _ = jax.lax.scan(step, carry, t0 + jnp.arange(chunk))
    # all_done is a fresh scalar (never aliases the donated carry) the host
    # fetches one chunk late — see generate_early_exit
    return carry, carry[6].all()


def early_exit_fused_body(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    budget: Optional[jnp.ndarray] = None,
    constraint: Optional[jnp.ndarray] = None,
):
    """Prefill + EOS/budget-exiting decode as ONE compiled region: a
    ``lax.while_loop`` over single-token steps that stops the moment every
    row is done. One dispatch + one fetch per query — on the tunneled
    backend the chunked host loop pays ~35 ms per chunk, which dominates the
    short-answer latencies this path exists for.

    This is the traceable BODY (plain function) so callers can inline it
    into a larger jitted program — e.g. ``batching.py`` fuses vision →
    splice → this into one dispatch per query. Returns
    ``(packed [B, N+1] = out | n_gen, steps scalar)``."""
    N = gen_cfg.max_new_tokens
    S = inputs_embeds.shape[1]
    carry = _prefill_carry_body(
        params, cfg, gen_cfg, inputs_embeds=inputs_embeds,
        attention_mask=attention_mask, prompt_ids=prompt_ids, budget=budget,
    )

    def cond(state):
        carry, t = state
        return jnp.logical_and(~carry[6].all(), t < N)

    def body(state):
        carry, t = state
        return _ee_step(params, cfg, gen_cfg, constraint, S, carry, t), t + 1

    carry, steps = jax.lax.while_loop(cond, body, (carry, jnp.zeros((), jnp.int32)))
    out, n_gen = carry[10], carry[8]
    return jnp.concatenate([out, n_gen[:, None]], axis=1), steps


_early_exit_fused = partial(jax.jit, static_argnames=("cfg", "gen_cfg"))(
    early_exit_fused_body
)


@jax.jit
def _early_exit_pack(carry):
    """Pack (out | n_gen) into ONE fresh buffer for a single host fetch."""
    out, n_gen = carry[10], carry[8]
    return jnp.concatenate([out, n_gen[:, None]], axis=1)


def generate_early_exit(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    *,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    prompt_ids: Optional[jnp.ndarray] = None,
    constraint: Optional[jnp.ndarray] = None,
    budget: Optional[jnp.ndarray] = None,
    chunk: int = 8,
    mode: str = "fused",
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """``generate`` with EOS/budget early exit.

    Args match :func:`generate`, plus:
        budget: optional [B] int32 per-row token budgets (≤ max_new_tokens);
            a row finishes after emitting its budget, like the slot engine's
            per-request budgets.
        chunk: (mode="chunked") decode steps per compiled chunk. Latency for
            a query whose rows all finish by step k ≈ prefill +
            ceil(k/chunk)+1 chunks (the +1 is the pipelining lag hiding the
            flag-fetch round-trip).
        mode: "fused" (default) — prefill + while_loop decode + pack as ONE
            program, one dispatch/fetch per query; "chunked" — one program
            per chunk with a pipelined done-flag fetch (for callers that
            stream between chunks).

    Returns ``(tokens [B, max_new_tokens] — pad-filled after finish,
    lengths [B], n)`` where ``n`` counts decode steps executed (fused) or
    chunks dispatched (chunked). Tokens/lengths are bit-identical to
    ``generate`` when budgets are full.
    """
    N = gen_cfg.max_new_tokens
    if budget is not None:
        budget = jnp.asarray(budget, jnp.int32)
        # a 0-budget row would still emit one token before the exhaustion
        # check folds into done (the slot engine rejects these too)
        if not bool((budget >= 1).all()):
            raise ValueError("per-row budgets must be >= 1")
    if mode == "fused":
        packed, steps = _early_exit_fused(
            params, cfg, gen_cfg, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, prompt_ids=prompt_ids,
            budget=budget, constraint=constraint,
        )
        packed = np.asarray(packed)
        dispatched = int(steps)
    else:
        carry = _prefill_carry(
            params, cfg, gen_cfg, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, prompt_ids=prompt_ids,
            budget=budget,
        )
        prev_flag = None
        dispatched = 0
        t = 0
        while t < N:
            size = min(chunk, N - t)
            carry, all_done = _early_exit_chunk(
                params, carry, cfg, gen_cfg, size, jnp.int32(t), constraint
            )
            dispatched += 1
            t += size
            # check the PREVIOUS chunk's flag while this one computes: the
            # fetch blocks only until that chunk finished, so the round-trip
            # overlaps the in-flight chunk instead of serializing on it. One
            # chunk of (pad-emitting) overshoot when it fires — outputs
            # unaffected.
            if prev_flag is not None and bool(np.asarray(prev_flag)):
                break
            prev_flag = all_done
        packed = np.asarray(_early_exit_pack(carry))  # the ONLY bulk fetch
    out, lengths = unpack_lengths(packed, gen_cfg)
    return jnp.asarray(out), jnp.asarray(lengths), dispatched


def generate_text(
    params,
    cfg: Qwen3Config,
    gen_cfg: GenerationConfig,
    *,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    constraint: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Text-only convenience wrapper (embeds looked up from ids)."""
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    embeds = qwen3.embed_tokens(params, input_ids)
    return generate(
        params, cfg, gen_cfg,
        inputs_embeds=embeds, attention_mask=attention_mask, prompt_ids=input_ids,
        constraint=constraint,
    )
