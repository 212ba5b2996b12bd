"""Token-level continuous batching: per-sequence KV slots with mid-decode
admission (VERDICT r2 item 3; north-star serving capability beyond the
reference's serial HF-generate loop, ``qa_inference.py:207-216``).

Design — TPU-idiomatic, compile-once, fixed shapes throughout:

- One persistent KV cache of ``num_slots`` rows × ``max_len`` columns
  (``qwen3.init_cache`` layout, int8 KV supported). Each *slot* holds one
  in-flight sequence, left-aligned in its own row; slots live at different
  depths simultaneously.
- **Admission** = a B=1 prefill jit that runs the (vision-spliced) prompt and
  writes its KV into one cache row (`dynamic_update_slice` into the row) —
  compiled once per prompt bucket, independent of what other slots are doing.
- **Decode** = ONE jitted chunk advancing ALL active slots ``decode_chunk``
  tokens via ``lax.scan``; per-row cache offsets (each slot appends at its own
  depth) ride the per-row scatter path of :func:`qwen3.forward_hidden`.
  Finished/empty slots decode junk into masked columns that the next
  admission overwrites — branch-free, shape-stable.
- The host scheduler loop alternates admit → decode-chunk → deliver. A request
  arriving mid-decode waits at most one chunk (default 4 tokens), not the
  whole batch — the gap VERDICT r2 named vs the batch-boundary coalescer in
  ``inference/server.py``.
- **Pipelined delivery**: each decode chunk returns a small packed snapshot
  (done | n_gen | out) that the host fetches one chunk LATE, overlapping the
  fetch round-trip with the next chunk's compute (5.99 → 21.2 req/s on the
  tunneled v5e, BASELINE.md). Safe because finished rows freeze device-side;
  per-slot admission boundaries stop a pre-admission snapshot from
  delivering a reused slot's new occupant.
- **Per-request budgets** (``submit_embeds(..., max_new_tokens=...)``) and
  **shared-prefix KV reuse** (``register_prefix`` — system-prompt caching;
  admission then prefills only the request suffix at ``cache_offset=P``).
- **Speculative continuous batching** (``speculative=True``): each dispatch
  scans ``spec_chunk`` prompt-lookup verify blocks, each advancing every
  active slot 1..k+1 tokens per weight read (``_spec_chunk`` — the serving
  adaptation of ``inference/speculative.py``); ``submit_embeds(...,
  lookup_ids=...)`` seeds each slot's draft memory with its TEXT prompt
  ids. Token-exact vs the classic chunk path and ``engine.generate``.

Greedy + repetition-penalty semantics are identical to ``engine.generate``
(same ``ops/sampling`` processors, same seen-buffer rules for the
inputs_embeds path); ``tests/test_slot_engine.py`` locks token-exactness.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from functools import partial
from queue import Empty, Queue
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Qwen3Config
from ..models import qwen3
from ..ops.sampling import apply_no_repeat_ngram, apply_repetition_penalty, greedy_token
from .engine import GenerationConfig, constrained_greedy
from .speculative import draft_lookup


# ---------------------------------------------------------------------------
# Device-side state
# ---------------------------------------------------------------------------


def init_slot_state(cfg: Qwen3Config, gen_cfg: GenerationConfig, num_slots: int,
                    max_len: int) -> Dict[str, jnp.ndarray]:
    """All-device slot bookkeeping (one pytree, donated through the jits)."""
    B, N = num_slots, gen_cfg.max_new_tokens
    return {
        "cache": qwen3.init_cache(cfg, B, max_len, dtype=gen_cfg.kv_dtype or cfg.dtype),
        "kv_mask": jnp.zeros((B, max_len), jnp.int32),  # per-row key frontier
        "write_off": jnp.zeros((B,), jnp.int32),        # next cache column
        "rot_pos": jnp.zeros((B,), jnp.int32),          # next rotary position
        "next_logits": jnp.zeros((B, cfg.vocab_size), jnp.float32),
        "seen_ids": jnp.zeros((B, N), jnp.int32),
        "seen_len": jnp.zeros((B,), jnp.int32),
        "active": jnp.zeros((B,), bool),
        "done": jnp.ones((B,), bool),
        "out": jnp.zeros((B, N), jnp.int32),
        "n_gen": jnp.zeros((B,), jnp.int32),
        # per-slot decode budget (≤ N): requests can ask for fewer tokens
        # than the engine max, so slots free at different chunk boundaries
        "budget": jnp.full((B,), N, jnp.int32),
        # per-slot prompt-lookup draft memory (speculative mode): token ids
        # of the request's TEXT prompt then its generated tokens; [start, len)
        # is the matchable window
        "ids_buf": jnp.zeros((B, max_len), jnp.int32),
        "ids_start": jnp.zeros((B,), jnp.int32),
        "ids_len": jnp.zeros((B,), jnp.int32),
        # per-slot FSM state for schema-constrained decoding (engine-wide
        # transition table; reset to 0 at admission)
        "fsm": jnp.zeros((B,), jnp.int32),
    }


@partial(jax.jit, static_argnames=("cfg", "kv_dtype", "row_len"))
def _prefix_prefill(params, cfg: Qwen3Config, inputs_embeds: jnp.ndarray,
                    kv_dtype: Optional[str], row_len: int):
    """Prefill a DENSE (unpadded) shared prefix once into a fresh 1-row cache
    of length ``row_len``; the row is stashed on device and copied into a slot
    at every prefixed admission (system-prompt / shared-prefix KV reuse).

    Prefix K/V depend only on prefix tokens (causal), so the stashed rows are
    bit-identical to what a full prompt prefill would have written — prefixed
    admission is token-exact vs prefilling prefix+suffix together."""
    P = inputs_embeds.shape[1]
    cache = qwen3.init_cache(cfg, 1, row_len, dtype=kv_dtype)
    mask = jnp.zeros((1, row_len), jnp.int32).at[:, :P].set(1)
    _, cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds, attention_mask=mask,
        positions=jnp.arange(P)[None, :], cache=cache, cache_offset=0,
        prefill_padding="right", last_logit_only=True,
    )
    return cache, mask


def _arm_lookup(state, slot, lookup_ids):
    """Seed slot ``slot``'s draft memory with the request's TEXT prompt ids
    ([1, L] int32, LEFT-padded with zeros; an all-zero row = empty memory,
    drafting then waits for generated history). The matchable window starts
    at the FIRST nonzero id — only leading zeros are treated as padding, so
    a real id-0 token mid-prompt (Qwen's "!") costs nothing. The ids need
    not align with the spliced embeds: this is draft memory only and never
    affects which tokens are produced."""
    C = state["ids_buf"].shape[1]
    L = lookup_ids.shape[1]
    ids32 = lookup_ids[0].astype(jnp.int32)
    row = jnp.zeros((C,), jnp.int32).at[:L].set(ids32)
    nz = ids32 != 0
    start = jnp.where(nz.any(), jnp.argmax(nz).astype(jnp.int32), L)
    return dict(
        state,
        ids_buf=state["ids_buf"].at[slot].set(row),
        ids_start=state["ids_start"].at[slot].set(start),
        ids_len=state["ids_len"].at[slot].set(L),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def _admit_prefixed(params, state, cfg: Qwen3Config, slot: jnp.ndarray,
                    inputs_embeds: jnp.ndarray, attention_mask: jnp.ndarray,
                    budget: jnp.ndarray, prefix_cache, prefix_mask: jnp.ndarray,
                    prefix_len: jnp.ndarray,
                    lookup_ids: Optional[jnp.ndarray] = None):
    """Admit a left-padded suffix on top of a stashed prefix row: the slot's
    cache row starts as a copy of the prefix KV, and only the suffix is
    prefilled (``cache_offset=prefix_len``) — admission cost scales with the
    suffix, not the full prompt."""
    S = inputs_embeds.shape[1]
    row_mask = jax.lax.dynamic_update_slice(prefix_mask, attention_mask, (0, prefix_len))
    positions = prefix_len + jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    logits, row_cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds, attention_mask=row_mask,
        positions=positions, cache=prefix_cache, cache_offset=prefix_len,
        last_logit_only=True,
    )
    cache = jax.tree.map(
        lambda full, row: jax.lax.dynamic_update_slice_in_dim(full, row, slot, axis=1),
        state["cache"], row_cache,
    )
    n_valid = prefix_len + attention_mask.sum()
    state = dict(
        state,
        cache=cache,
        kv_mask=jax.lax.dynamic_update_slice_in_dim(state["kv_mask"], row_mask, slot, axis=0),
        write_off=state["write_off"].at[slot].set(prefix_len + S),
        rot_pos=state["rot_pos"].at[slot].set(n_valid),
        next_logits=state["next_logits"].at[slot].set(logits[0, -1]),
        seen_ids=state["seen_ids"].at[slot].set(0),
        seen_len=state["seen_len"].at[slot].set(0),
        active=state["active"].at[slot].set(True),
        done=state["done"].at[slot].set(False),
        out=state["out"].at[slot].set(0),
        n_gen=state["n_gen"].at[slot].set(0),
        budget=state["budget"].at[slot].set(budget),
        fsm=state["fsm"].at[slot].set(0),
    )
    if lookup_ids is None:
        lookup_ids = jnp.zeros((1, 1), jnp.int32)
    state = _arm_lookup(state, slot, lookup_ids)
    return state


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def _admit_batch(params, state, cfg: Qwen3Config, slots: jnp.ndarray,
                 inputs_embeds: jnp.ndarray, attention_mask: jnp.ndarray,
                 budgets: jnp.ndarray, lookup_ids: jnp.ndarray):
    """Admit ``A`` same-bucket prompts in ONE dispatch (VERDICT r4 item 3).

    A burst of arrivals used to pay one serialized B=1 prefill dispatch per
    request — ~90 ms of host round-trip + scheduling EACH through the
    tunneled backend before any of them could decode. Here the A prompts
    prefill as one batched forward over A gathered cache rows, and every
    slot-bookkeeping update is one scatter. Token-exact vs A sequential
    :func:`_admit` calls: prefill attention is per-row (left-padded masks,
    per-row positions), so batching the rows changes no math.

    Args: ``slots`` [A] int32 (distinct), ``inputs_embeds`` [A, S, H],
    ``attention_mask`` [A, S], ``budgets`` [A], ``lookup_ids`` [A, L].
    """
    A, S = attention_mask.shape
    T = state["kv_mask"].shape[1]
    row_cache = jax.tree.map(lambda a: jnp.take(a, slots, axis=1), state["cache"])
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    row_mask = jnp.zeros((A, T), jnp.int32).at[:, :S].set(attention_mask)
    logits, row_cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds, attention_mask=row_mask,
        positions=positions, cache=row_cache, cache_offset=0,
        prefill_padding="left", last_logit_only=True,
    )
    cache = jax.tree.map(
        lambda full, row: full.at[:, slots].set(row.astype(full.dtype)),
        state["cache"], row_cache,
    )
    # vectorized _arm_lookup: matchable window starts at the first nonzero id
    C = state["ids_buf"].shape[1]
    L = lookup_ids.shape[1]
    ids32 = lookup_ids.astype(jnp.int32)
    ids_rows = jnp.zeros((A, C), jnp.int32).at[:, :L].set(ids32)
    nz = ids32 != 0
    starts = jnp.where(nz.any(axis=1), jnp.argmax(nz, axis=1).astype(jnp.int32), L)
    zA = jnp.zeros((A,), jnp.int32)
    return dict(
        state,
        cache=cache,
        kv_mask=state["kv_mask"].at[slots].set(row_mask),
        write_off=state["write_off"].at[slots].set(S),
        rot_pos=state["rot_pos"].at[slots].set(attention_mask.sum(-1)),
        next_logits=state["next_logits"].at[slots].set(logits[:, -1]),
        seen_ids=state["seen_ids"].at[slots].set(0),
        seen_len=state["seen_len"].at[slots].set(zA),
        active=state["active"].at[slots].set(True),
        done=state["done"].at[slots].set(False),
        out=state["out"].at[slots].set(0),
        n_gen=state["n_gen"].at[slots].set(zA),
        budget=state["budget"].at[slots].set(budgets),
        fsm=state["fsm"].at[slots].set(zA),
        ids_buf=state["ids_buf"].at[slots].set(ids_rows),
        ids_start=state["ids_start"].at[slots].set(starts),
        ids_len=state["ids_len"].at[slots].set(jnp.full((A,), L, jnp.int32)),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def _admit(params, state, cfg: Qwen3Config, slot: jnp.ndarray,
           inputs_embeds: jnp.ndarray, attention_mask: jnp.ndarray,
           budget: jnp.ndarray, lookup_ids: Optional[jnp.ndarray] = None):
    """Prefill one prompt ([1, S, H], left-padded mask [1, S]) into cache row
    ``slot`` and arm the slot. Other slots' rows are untouched (the row slice
    is copied out, filled, and written back — ~12 MB for the 4B cache row)."""
    S = inputs_embeds.shape[1]
    row_cache = jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1), state["cache"]
    )
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    # pad the key mask out to the row length so decode columns are visible
    T = state["kv_mask"].shape[1]
    row_mask = jnp.zeros((1, T), jnp.int32).at[:, :S].set(attention_mask)
    logits, row_cache = qwen3.forward(
        params, cfg, inputs_embeds=inputs_embeds,
        attention_mask=row_mask, positions=positions,
        cache=row_cache, cache_offset=0, prefill_padding="left",
        last_logit_only=True,
    )
    cache = jax.tree.map(
        lambda full, row: jax.lax.dynamic_update_slice_in_dim(full, row, slot, axis=1),
        state["cache"], row_cache,
    )
    n_valid = attention_mask.sum()
    state = dict(
        state,
        cache=cache,
        kv_mask=jax.lax.dynamic_update_slice_in_dim(state["kv_mask"], row_mask, slot, axis=0),
        write_off=state["write_off"].at[slot].set(S),
        rot_pos=state["rot_pos"].at[slot].set(n_valid),
        next_logits=state["next_logits"].at[slot].set(logits[0, -1]),
        seen_ids=state["seen_ids"].at[slot].set(0),
        seen_len=state["seen_len"].at[slot].set(0),
        active=state["active"].at[slot].set(True),
        done=state["done"].at[slot].set(False),
        out=state["out"].at[slot].set(0),
        n_gen=state["n_gen"].at[slot].set(0),
        budget=state["budget"].at[slot].set(budget),
        fsm=state["fsm"].at[slot].set(0),
    )
    if lookup_ids is None:
        lookup_ids = jnp.zeros((1, 1), jnp.int32)
    state = _arm_lookup(state, slot, lookup_ids)
    return state


@partial(
    jax.jit, static_argnames=("cfg", "gen_cfg", "chunk", "frontier"), donate_argnums=(1,)
)
def _decode_chunk(params, state, cfg: Qwen3Config, gen_cfg: GenerationConfig, chunk: int,
                  constraint: Optional[jnp.ndarray] = None, frontier: bool = False):
    """Advance every active slot ``chunk`` tokens (one compiled scan).

    ``frontier``: every kv_mask row is one contiguous run (true until a
    prefix-admitted row exists — those interleave prefix ones with suffix
    left-pad zeros), unlocking the fused decode-attention kernel on TPU."""
    B = state["active"].shape[0]
    N = gen_cfg.max_new_tokens
    rows = jnp.arange(B)

    def step(state, _):
        logits = apply_repetition_penalty(
            state["next_logits"], state["seen_ids"], state["seen_len"],
            gen_cfg.repetition_penalty,
        )
        logits = apply_no_repeat_ngram(
            logits, state["seen_ids"], state["seen_len"], gen_cfg.no_repeat_ngram
        )
        tok = constrained_greedy(state["next_logits"], logits, state["fsm"], constraint)
        stopped = state["done"] | ~state["active"]
        if constraint is not None:
            nxt = constraint[state["fsm"], tok]
            state = dict(state, fsm=jnp.where(stopped, state["fsm"], jnp.maximum(nxt, 0)))
        out_tok = jnp.where(stopped, gen_cfg.pad_token_id, tok)
        if gen_cfg.eos_token_id is not None:
            done = state["done"] | (tok == gen_cfg.eos_token_id)
        else:
            done = state["done"]
        # budget exhaustion also finishes the slot (per-slot budget ≤ N)
        n_gen = jnp.where(stopped, state["n_gen"], state["n_gen"] + 1)
        done = done | (n_gen >= jnp.minimum(state["budget"], N))

        write_idx = jnp.clip(state["n_gen"], 0, N - 1)
        out = jnp.where(
            stopped[:, None], state["out"],
            state["out"].at[rows, write_idx].set(out_tok),
        )
        seen_ids = state["seen_ids"].at[rows, jnp.clip(state["seen_len"], 0, N - 1)].set(out_tok)
        seen_len = jnp.where(stopped, state["seen_len"], state["seen_len"] + 1)

        # advance the model for every slot (finished slots produce junk into
        # columns the next admission overwrites; branch-free & shape-stable)
        off = jnp.clip(state["write_off"], 0, state["kv_mask"].shape[1] - 1)
        kv_mask = state["kv_mask"].at[rows, off].set(1)
        emb = qwen3.embed_tokens(params, out_tok[:, None])
        logits_new, cache = qwen3.forward(
            params, cfg, inputs_embeds=emb, attention_mask=kv_mask,
            positions=state["rot_pos"][:, None], cache=state["cache"],
            cache_offset=off, decode_frontier=frontier,
        )
        state = dict(
            state,
            cache=cache,
            kv_mask=kv_mask,
            write_off=off + 1,
            rot_pos=state["rot_pos"] + 1,
            next_logits=logits_new[:, 0],
            seen_ids=seen_ids,
            seen_len=seen_len,
            done=done,
            out=out,
            n_gen=n_gen,
        )
        return state, None

    state, _ = jax.lax.scan(step, state, None, length=chunk)
    # snapshot for the host scheduler, packed into ONE fresh [B, N+2] buffer
    # (done | n_gen | out) so it never aliases donated state buffers — the
    # host fetches it one chunk LATE, overlapping the fetch round-trip with
    # the next chunk's compute instead of serializing on it
    snap = jnp.concatenate(
        [state["done"].astype(jnp.int32)[:, None], state["n_gen"][:, None],
         state["out"]], axis=1,
    )
    return state, snap


@partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "k", "ngram", "frontier", "blocks"),
    donate_argnums=(1,),
)
def _spec_chunk(params, state, cfg: Qwen3Config, gen_cfg: GenerationConfig,
                k: int, ngram: int, constraint: Optional[jnp.ndarray] = None,
                frontier: bool = False, blocks: int = 1):
    """Speculative continuous batching: ``blocks`` verify blocks per dispatch,
    each advancing every active slot 1..k+1 tokens per weight read
    (prompt-lookup drafting — the slots adaptation of
    ``speculative._iteration_body``; same token semantics as
    ``_decode_chunk``, different schedule). Scanning several blocks into one
    compiled program matters on a remote/tunneled backend: the measured
    per-dispatch overhead (~90 ms host round-trip + scheduling) otherwise
    dominates a single ~2-token-gain block, which is exactly why one-block
    structured+spec serving measured SLOWER (18.5 req/s) than classic
    4-step chunks (21.0) despite 60% draft acceptance. Returns
    ``(state, snap, accepted)`` with the same packed snapshot contract;
    ``accepted`` is ``[blocks, B]`` per-block per-slot emission counts."""
    B = state["active"].shape[0]
    N = gen_cfg.max_new_tokens
    T = state["kv_mask"].shape[1]
    C = state["ids_buf"].shape[1]
    rows = jnp.arange(B)
    eos = gen_cfg.eos_token_id

    def verify_block(state, _):
        seen_ids, seen_len = state["seen_ids"], state["seen_len"]
        ids_buf, ids_start, ids_len = (
            state["ids_buf"], state["ids_start"], state["ids_len"])
        out, n_gen = state["out"], state["n_gen"]
        fsm = state["fsm"]
        budget_eff = jnp.minimum(state["budget"], N)
        stopped = state["done"] | ~state["active"]

        def processors(logits):
            l = apply_repetition_penalty(
                logits, seen_ids, seen_len, gen_cfg.repetition_penalty)
            return apply_no_repeat_ngram(
                l, seen_ids, seen_len, gen_cfg.no_repeat_ngram)

        raw0 = state["next_logits"]
        tok0 = constrained_greedy(raw0, processors(raw0), fsm, constraint)

        # ---- prompt-lookup drafting over the per-slot id history ----------
        drafts = draft_lookup(ids_buf, ids_start, ids_len, tok0, k, ngram)

        # ---- ONE forward over [tok0, drafts] at each slot's own depth -----
        block = jnp.concatenate([tok0[:, None], drafts], axis=1)  # [B, k+1]
        off = jnp.clip(state["write_off"], 0, T - (k + 1))
        tpos = jnp.arange(T)[None, None, :]
        base = state["kv_mask"].astype(bool)[:, None, :]
        inblock = (tpos >= off[:, None, None]) & (
            (tpos - off[:, None, None]) <= jnp.arange(k + 1)[None, :, None]
        )
        amask = base | inblock  # [B, k+1, T]
        positions = state["rot_pos"][:, None] + jnp.arange(k + 1)[None, :]
        logits, cache = qwen3.forward(
            params, cfg, input_ids=block, attention_mask=amask.astype(jnp.int32),
            positions=positions, cache=state["cache"], cache_offset=off,
            decode_frontier=frontier,  # contiguous rows until a prefix admission
        )
        logits = logits.astype(jnp.float32)

        # ---- acceptance: emit tok0, then drafts while they match ----------
        def record(emit, tok, seen_ids, seen_len, ids_buf, ids_len, out, out_at, fsm):
            sidx = jnp.clip(seen_len, 0, N - 1)
            seen_ids = seen_ids.at[rows, sidx].set(
                jnp.where(emit, tok, seen_ids[rows, sidx]))
            seen_len = seen_len + emit.astype(jnp.int32)
            bidx = jnp.clip(ids_len, 0, C - 1)
            ids_buf = ids_buf.at[rows, bidx].set(
                jnp.where(emit, tok, ids_buf[rows, bidx]))
            ids_len = ids_len + emit.astype(jnp.int32)
            oidx = jnp.clip(out_at, 0, N - 1)
            out = out.at[rows, oidx].set(jnp.where(emit, tok, out[rows, oidx]))
            if constraint is not None:
                nxt = constraint[fsm, tok]
                fsm = jnp.where(emit, jnp.maximum(nxt, 0), fsm)
            return seen_ids, seen_len, ids_buf, ids_len, out, fsm

        can0 = ~stopped & (n_gen < budget_eff)
        seen_ids, seen_len, ids_buf, ids_len, out, fsm = record(
            can0, tok0, seen_ids, seen_len, ids_buf, ids_len, out, n_gen, fsm)
        a = can0.astype(jnp.int32)
        hit_eos = can0 & (tok0 == eos) if eos is not None else jnp.zeros((B,), bool)
        alive = can0 & ~hit_eos & (n_gen + a < budget_eff)

        for j in range(1, k + 1):
            lprev = logits[:, j - 1]
            lpen = apply_repetition_penalty(
                lprev, seen_ids, seen_len, gen_cfg.repetition_penalty)
            lpen = apply_no_repeat_ngram(
                lpen, seen_ids, seen_len, gen_cfg.no_repeat_ngram)
            true_j = constrained_greedy(lprev, lpen, fsm, constraint)
            accept = alive & (drafts[:, j - 1] == true_j)
            seen_ids, seen_len, ids_buf, ids_len, out, fsm = record(
                accept, true_j, seen_ids, seen_len, ids_buf, ids_len, out,
                n_gen + a, fsm)
            a = a + accept.astype(jnp.int32)
            if eos is not None:
                e = accept & (true_j == eos)
                hit_eos = hit_eos | e
                alive = accept & ~e
            else:
                alive = accept
            alive = alive & (n_gen + a < budget_eff)

        sel = jnp.clip(a - 1, 0, k)
        gathered = jnp.take_along_axis(logits, sel[:, None, None], axis=1)[:, 0]
        next_logits = jnp.where((a > 0)[:, None], gathered, state["next_logits"])
        # mark only the ACCEPTED block columns as valid keys; rejected columns
        # stay masked (garbage KV) and the next block overwrites them
        cols = off[:, None] + jnp.arange(k + 1)[None, :]
        accept_cols = (jnp.arange(k + 1)[None, :] < a[:, None]) & (cols < T)
        kv_mask = state["kv_mask"].at[rows[:, None], jnp.clip(cols, 0, T - 1)].max(
            accept_cols.astype(jnp.int32))
        n_gen = n_gen + a
        done = state["done"] | hit_eos | (n_gen >= budget_eff)

        state = dict(
            state, cache=cache, kv_mask=kv_mask, write_off=off + a,
            rot_pos=state["rot_pos"] + a, next_logits=next_logits,
            seen_ids=seen_ids, seen_len=seen_len, done=done, out=out, n_gen=n_gen,
            ids_buf=ids_buf, ids_start=ids_start, ids_len=ids_len, fsm=fsm,
        )
        return state, a

    state, accepted = jax.lax.scan(verify_block, state, None, length=blocks)
    snap = jnp.concatenate(
        [state["done"].astype(jnp.int32)[:, None], state["n_gen"][:, None],
         state["out"]], axis=1)
    # per-block per-slot accepted counts (incl. tok0; 0 = slot idle that
    # block) — the host's acceptance guard reads these with the LAGGED
    # snapshot fetch, so they never add a blocking round-trip
    return state, snap, accepted


# ---------------------------------------------------------------------------
# Host scheduler
# ---------------------------------------------------------------------------


@dataclass
class _Pending:
    inputs_embeds: np.ndarray     # [1, S, H]
    attention_mask: np.ndarray    # [1, S]
    future: object                # concurrent.futures.Future
    submitted_at: float = 0.0
    max_new_tokens: Optional[int] = None  # per-request budget (≤ engine max)
    prefix_id: Optional[int] = None       # registered shared-prefix handle
    lookup_ids: Optional[np.ndarray] = None  # [1, S] TEXT ids seeding drafts


@dataclass
class SlotStats:
    requests: int = 0
    chunks: int = 0
    admitted_mid_decode: int = 0
    tokens: int = 0
    admit_dispatches: int = 0     # admission programs dispatched (≤ requests
    # with batched admission; == non-rejected requests without it)
    admission_wait_s: float = 0.0  # Σ (admit time − submit time) over requests
    admission_log: List[Tuple[int, int]] = field(default_factory=list)  # (chunk_idx, slot)
    spec_blocks: int = 0          # speculative verify blocks executed
    spec_accepted: int = 0        # tokens emitted by those blocks (incl. tok0)
    spec_disabled_at: Optional[int] = None  # chunk idx the guard tripped, if any
    # KV-cache occupancy, integrated over chunks (the paged-KV deviation
    # measurement — BASELINE.md "why slots, not pages"): per observed chunk,
    # used = live tokens (valid prompt + generated so far) over every
    # occupied slot; reserved = num_slots × row_len.
    kv_used_token_chunks: int = 0
    kv_reserved_token_chunks: int = 0

    @property
    def kv_utilization(self) -> float:
        return self.kv_used_token_chunks / max(self.kv_reserved_token_chunks, 1)


class SlotEngine:
    """Host scheduler over the jitted admit/decode-chunk programs.

    ``submit_embeds`` enqueues a prepared (spliced, left-padded to the prompt
    bucket) prompt; the caller receives a Future resolving to
    ``(tokens [n_gen], n_gen)``. ``run_until_idle`` drives the loop inline
    (tests, batch jobs); ``start``/``stop`` run it on a thread (serving).
    """

    def __init__(self, params, cfg: Qwen3Config, gen_cfg: GenerationConfig, *,
                 num_slots: int, max_len: int, decode_chunk: int = 4,
                 speculative: bool = False, draft_k: int = 6,
                 ngram: int = 3, spec_chunk: int = 4, constraint=None,
                 spec_min_gain: float = 1.35,
                 spec_guard_window: int = 8,
                 admit_batch_max: int = 8,
                 track_metrics: bool = False) -> None:
        self.params = params
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        if gen_cfg.penalize_prompt:
            raise ValueError(
                "SlotEngine decodes from pre-spliced embeds; prompt ids are "
                "not tracked, so penalize_prompt=True cannot reproduce "
                "engine.generate semantics here (HF's inputs_embeds path "
                "starts the penalty set empty — use penalize_prompt=False)")
        self.num_slots = num_slots
        self.max_len = max_len
        self.decode_chunk = decode_chunk
        self.speculative = speculative
        self.draft_k = draft_k
        self.ngram = ngram
        # verify blocks scanned into ONE dispatch — same amortization as
        # decode_chunk: per-dispatch host overhead (~90 ms measured through
        # the tunneled backend) must spread over several weight reads, or a
        # ~2-token-gain block loses to classic 4-step chunks outright
        self.spec_chunk = spec_chunk
        # Acceptance guard: a verify block (one [B, k+1] forward) only pays
        # for itself when active slots average > ~1 emitted token per block;
        # measured worst case is 12.3 vs 34.2 req/s on zero-acceptance free
        # text (BASELINE.md). When the rolling mean gain over
        # ``spec_guard_window`` blocks drops under ``spec_min_gain``, the
        # engine auto-falls back to classic chunked decode (token semantics
        # identical — only the schedule changes). ``spec_min_gain=0``
        # disables the guard.
        self.spec_min_gain = spec_min_gain
        self.spec_guard_window = spec_guard_window
        # largest batched-admission dispatch (power-of-two chunking; 1
        # disables batching and restores the per-request B=1 admit path)
        self.admit_batch_max = max(1, admit_batch_max)
        # opt-in per-request latency metrics (SLA benchmarking): future →
        # {"submit", "admit", "first_tok", "done", "n"} wall times. first_tok
        # is observed at CHUNK granularity from the lagged snapshots (the
        # engine delivers whole responses; a streaming API would tighten it
        # by up to one chunk). Caller pops entries via ``req_meta.pop(fut)``.
        self.track_metrics = track_metrics
        self.req_meta: Dict[object, Dict[str, float]] = {}
        self._spec_gain_window: List[float] = []
        # engine-wide schema FSM ([num_states, vocab] int32 — see
        # inference/constrained.py); every request decodes under it
        self.constraint = None if constraint is None else jnp.asarray(constraint)
        # speculative blocks scatter k+1 KV entries from each slot's frontier;
        # the rejected tail beyond a row's budget needs scratch columns. The
        # row length rounds UP to the int8 sublane (32) so the fused decode/
        # verify kernels' tile-aligned-T gate never hinges on the caller's
        # max_len arithmetic (r5; extra columns stay masked)
        raw_len = max_len + (draft_k + 1 if speculative else 0)
        self._row_len = -(-raw_len // 32) * 32
        self.state = init_slot_state(cfg, gen_cfg, num_slots, self._row_len)
        self.prefixes: Dict[int, Tuple[object, jnp.ndarray, int]] = {}
        self._next_prefix_id = 0
        self.queue: "Queue[_Pending]" = Queue()
        self.slot_futures: List[Optional[object]] = [None] * num_slots
        self.stats = SlotStats()
        self._chunk_idx = 0
        self._pending_snap = None  # 1-deep snapshot pipeline (see step_once)
        # first chunk that can report on each slot's CURRENT occupant — a
        # lagged snapshot older than this carries the previous occupant's
        # done flag and must not deliver the new future
        self._slot_admit_boundary = [0] * num_slots
        # live prompt tokens per occupant (valid prompt + prefix), host-side
        # bookkeeping for the KV-occupancy measurement
        self._slot_prompt_tokens = [0] * num_slots
        # every kv_mask row is one contiguous run until a prefix-admitted row
        # exists (prefix ones + suffix left-pad zeros interleave) — while
        # true, the decode chunks may use the fused frontier kernel; flips
        # False permanently on the first prefix admission (one recompile)
        self._frontier_ok = True
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    # -- submission ---------------------------------------------------------

    def register_prefix(self, inputs_embeds: np.ndarray) -> int:
        """Prefill a DENSE shared prefix ([1, P, H] embeds, no padding) once
        and stash its KV row; returns a handle for ``submit_embeds``'s
        ``prefix_id``. Typical use: a system hint shared by every request
        (ARKit RoomPlan) — per-request admission then prefills only the
        user-specific suffix."""
        P = inputs_embeds.shape[1]
        if P >= self.max_len - self.gen_cfg.max_new_tokens:
            raise ValueError(f"prefix length {P} leaves no room in the "
                             f"{self.max_len}-token slot row")
        cache, mask = _prefix_prefill(
            self.params, self.cfg, jnp.asarray(inputs_embeds),
            self.gen_cfg.kv_dtype or self.cfg.dtype, self._row_len,
        )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self.prefixes[pid] = (cache, mask, P)
        return pid

    def submit_embeds(self, inputs_embeds: np.ndarray, attention_mask: np.ndarray,
                      max_new_tokens: Optional[int] = None,
                      prefix_id: Optional[int] = None,
                      lookup_ids: Optional[np.ndarray] = None):
        """``lookup_ids``: optional [1, L] TEXT token ids, LEFT-padded with
        zeros (id 0 = padding) — seeds the speculative draft memory, so
        schema text in the prompt becomes immediately draftable. They need
        not align with the (vision-spliced) embeds; ignored in
        non-speculative mode and never affect which tokens are produced."""
        from concurrent.futures import Future

        fut: Future = Future()
        if max_new_tokens is not None and not (
            0 < max_new_tokens <= self.gen_cfg.max_new_tokens
        ):
            fut.set_exception(ValueError(
                f"max_new_tokens {max_new_tokens} outside (0, "
                f"{self.gen_cfg.max_new_tokens}] engine budget"))
            return fut
        if prefix_id is not None and prefix_id not in self.prefixes:
            fut.set_exception(ValueError(f"unknown prefix_id {prefix_id}"))
            return fut
        if lookup_ids is not None and (
            lookup_ids.ndim != 2
            or lookup_ids.shape[0] != 1
            or lookup_ids.shape[1] > self._row_len - self.gen_cfg.max_new_tokens
        ):
            fut.set_exception(ValueError(
                f"lookup_ids must be [1, L] with L ≤ "
                f"{self._row_len - self.gen_cfg.max_new_tokens}; got "
                f"{lookup_ids.shape}"))
            return fut
        self.queue.put(
            _Pending(inputs_embeds, attention_mask, fut, time.time(),
                     max_new_tokens, prefix_id, lookup_ids)
        )
        return fut

    # -- scheduler core -----------------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i, f in enumerate(self.slot_futures) if f is None]

    def _any_active(self) -> bool:
        return any(f is not None for f in self.slot_futures)

    def _admit_pending(self) -> None:
        was_decoding = self._any_active()
        # pop up to len(free slots) requests, validate, pair each with a slot
        free = self._free_slots()
        paired: List[Tuple[int, _Pending]] = []
        fi = 0
        while fi < len(free):
            try:
                req = self.queue.get_nowait()
            except Empty:
                break
            S = req.inputs_embeds.shape[1]
            P = 0 if req.prefix_id is None else self.prefixes[req.prefix_id][2]
            if P + S > self.max_len - self.gen_cfg.max_new_tokens:
                req.future.set_exception(
                    ValueError(f"prompt length {P}+{S} exceeds slot budget "
                               f"{self.max_len - self.gen_cfg.max_new_tokens}")
                )
                continue  # rejected request consumes no slot
            paired.append((free[fi], req))
            fi += 1
        if not paired:
            return

        now = time.time()
        # group same-shape plain admissions into ONE batched dispatch each
        # (VERDICT r4 item 3 — a burst no longer pays per-request dispatches);
        # prefixed admissions keep the B=1 path (each carries its own stashed
        # prefix row). Group key = (prompt bucket, lookup bucket).
        groups: Dict[Tuple[int, int], List[Tuple[int, _Pending]]] = {}
        singles: List[Tuple[int, _Pending]] = []
        for slot, req in paired:
            if req.prefix_id is not None:
                singles.append((slot, req))
                continue
            lkL = (req.lookup_ids.shape[1] if req.lookup_ids is not None
                   else req.attention_mask.shape[1])
            groups.setdefault(
                (req.inputs_embeds.shape[1], lkL), []
            ).append((slot, req))

        def lids_of(req) -> np.ndarray:
            return (req.lookup_ids if req.lookup_ids is not None
                    else np.zeros_like(req.attention_mask))

        for (S, lkL), members in groups.items():
            i = 0
            while i < len(members):
                # largest power-of-two chunk ≤ remaining: few trace shapes
                # per bucket (A ∈ {1, 2, 4, 8, ...}), no padded prefill work
                rem = len(members) - i
                A = 1
                while A * 2 <= rem and A * 2 <= self.admit_batch_max:
                    A *= 2
                chunk = members[i : i + A]
                i += A
                if A == 1:
                    slot, req = chunk[0]
                    self.state = _admit(
                        self.params, self.state, self.cfg, jnp.int32(slot),
                        jnp.asarray(req.inputs_embeds),
                        jnp.asarray(req.attention_mask, jnp.int32),
                        jnp.int32(req.max_new_tokens or self.gen_cfg.max_new_tokens),
                        jnp.asarray(lids_of(req), jnp.int32),
                    )
                else:
                    self.state = _admit_batch(
                        self.params, self.state, self.cfg,
                        jnp.asarray([s for s, _ in chunk], jnp.int32),
                        jnp.asarray(np.concatenate(
                            [r.inputs_embeds for _, r in chunk], axis=0)),
                        jnp.asarray(np.concatenate(
                            [r.attention_mask for _, r in chunk], axis=0), jnp.int32),
                        jnp.asarray(
                            [r.max_new_tokens or self.gen_cfg.max_new_tokens
                             for _, r in chunk], jnp.int32),
                        jnp.asarray(np.concatenate(
                            [lids_of(r) for _, r in chunk], axis=0), jnp.int32),
                    )
                self.stats.admit_dispatches += 1
                self._post_admit(chunk, was_decoding, now)

        for slot, req in singles:
            P = self.prefixes[req.prefix_id][2]
            self._frontier_ok = False  # holed row lives in the cache now
            cache, mask, _ = self.prefixes[req.prefix_id]
            self.state = _admit_prefixed(
                self.params, self.state, self.cfg, jnp.int32(slot),
                jnp.asarray(req.inputs_embeds),
                jnp.asarray(req.attention_mask, jnp.int32),
                jnp.int32(req.max_new_tokens or self.gen_cfg.max_new_tokens),
                cache, mask, jnp.int32(P),
                jnp.asarray(lids_of(req), jnp.int32),
            )
            self.stats.admit_dispatches += 1
            self._post_admit([(slot, req)], was_decoding, now)

    def _post_admit(self, chunk: List[Tuple[int, "_Pending"]],
                    was_decoding: bool, now: float) -> None:
        for slot, req in chunk:
            P = 0 if req.prefix_id is None else self.prefixes[req.prefix_id][2]
            self.slot_futures[slot] = req.future
            self._slot_admit_boundary[slot] = self._chunk_idx + 1
            self._slot_prompt_tokens[slot] = P + int(
                np.asarray(req.attention_mask).sum()
            )
            self.stats.requests += 1
            if req.submitted_at:
                self.stats.admission_wait_s += now - req.submitted_at
            if self.track_metrics:
                self.req_meta[req.future] = {
                    "submit": req.submitted_at or now, "admit": now}
            # diagnostics only — cap so a long-running daemon can't leak
            if len(self.stats.admission_log) < 4096:
                self.stats.admission_log.append((self._chunk_idx, slot))
            if was_decoding:
                self.stats.admitted_mid_decode += 1

    def _deliver_from(self, snap_idx: int, snap) -> None:
        """Deliver finished requests from the chunk-``snap_idx`` snapshot
        (packed [B, N+2] int32: done | n_gen | out). The snapshot is one
        chunk old: finished rows freeze device-side, so lagged flags are
        valid for a slot's current occupant — but a snapshot OLDER than the
        occupant's admission carries the previous occupant's done flag, so
        those slots are skipped (``_slot_admit_boundary``)."""
        snap = np.asarray(snap)  # blocks only until ITS chunk finished; the
        # next chunk is already dispatched, so the fetch overlaps its compute
        done, n_gen, out = snap[:, 0] > 0, snap[:, 1], snap[:, 2:]
        # KV-occupancy sample at this chunk (paged-KV deviation measurement):
        # live tokens = prompt + generated for every occupied slot; occupancy
        # of the left-pad bucket slack and the unreached budget tail is the
        # waste a paged cache would reclaim
        used = sum(
            self._slot_prompt_tokens[i] + int(n_gen[i])
            for i, f in enumerate(self.slot_futures)
            if f is not None and self._slot_admit_boundary[i] <= snap_idx
        )
        self.stats.kv_used_token_chunks += used
        self.stats.kv_reserved_token_chunks += self.num_slots * self._row_len
        if self.track_metrics:
            now = time.time()
            for i, fut in enumerate(self.slot_futures):
                if (fut is None or self._slot_admit_boundary[i] > snap_idx
                        or int(n_gen[i]) <= 0):
                    continue
                meta = self.req_meta.get(fut)
                if meta is not None and "first_tok" not in meta:
                    meta["first_tok"] = now
        for i, fut in enumerate(self.slot_futures):
            if fut is None or not done[i] or self._slot_admit_boundary[i] > snap_idx:
                continue
            n = int(n_gen[i])
            toks = out[i, :n]
            # n and stats.tokens INCLUDE the trailing EOS, matching
            # engine.generate's lengths semantics; decode(skip_special_tokens)
            # hides it from the visible text
            self.stats.tokens += n
            if self.track_metrics:
                meta = self.req_meta.get(fut)
                if meta is not None:
                    meta.setdefault("first_tok", time.time())
                    meta["done"] = time.time()
                    meta["n"] = n
            fut.set_result((toks.copy(), n))
            self.slot_futures[i] = None
            self.state = dict(
                self.state, active=self.state["active"].at[i].set(False)
            )

    def step_once(self) -> bool:
        """One scheduler iteration. Returns True if any work remains."""
        with self._lock:
            self._admit_pending()
            if self._any_active():
                accepted = None
                if self.speculative:
                    self.state, snap, accepted = _spec_chunk(
                        self.params, self.state, self.cfg, self.gen_cfg,
                        self.draft_k, self.ngram, self.constraint,
                        frontier=self._frontier_ok, blocks=self.spec_chunk,
                    )
                else:
                    self.state, snap = _decode_chunk(
                        self.params, self.state, self.cfg, self.gen_cfg,
                        self.decode_chunk, self.constraint,
                        frontier=self._frontier_ok,
                    )
                self._chunk_idx += 1
                self.stats.chunks += 1
                # pipeline: examine the PREVIOUS chunk's snapshot while this
                # one computes (1-chunk delivery lag, ~RTT hidden per chunk)
                prev, self._pending_snap = (
                    self._pending_snap, (self._chunk_idx, snap, accepted)
                )
                if prev is not None:
                    self._deliver_from(*prev[:2])
                    self._update_spec_guard(prev[2])
                return True
            if self._pending_snap is not None:  # drain the trailing snapshot
                prev, self._pending_snap = self._pending_snap, None
                self._deliver_from(*prev[:2])
                self._update_spec_guard(prev[2])
                return True
            return not self.queue.empty()

    def _update_spec_guard(self, accepted) -> None:
        """Feed one lagged verify-block acceptance vector into the rolling
        guard; auto-disable speculative scheduling when the mean per-active-
        slot gain under-runs ``spec_min_gain`` over the window."""
        if accepted is None or not self.spec_min_gain:
            return
        blocks = np.atleast_2d(np.asarray(accepted))  # [blocks, B]
        w = self._spec_gain_window
        for a in blocks:
            active = a > 0
            if not active.any():
                continue
            gain = float(a[active].mean())
            self.stats.spec_blocks += 1
            self.stats.spec_accepted += int(a.sum())
            w.append(gain)
        if len(w) > self.spec_guard_window:
            del w[: len(w) - self.spec_guard_window]
        if (
            self.speculative
            and len(w) == self.spec_guard_window
            and sum(w) / len(w) < self.spec_min_gain
        ):
            self.speculative = False
            self.stats.spec_disabled_at = self._chunk_idx
            print(
                f"slots: speculative auto-disabled at chunk {self._chunk_idx} "
                f"(rolling gain {sum(w) / len(w):.2f} tok/block < "
                f"{self.spec_min_gain}) — falling back to classic decode",
                flush=True,
            )

    def run_until_idle(self) -> None:
        while self.step_once():
            pass

    # -- threaded serving ---------------------------------------------------

    def start(self) -> None:
        def loop():
            while not self._stop.is_set():
                if not self.step_once() and self.queue.empty():
                    time.sleep(0.002)  # idle; requests arrive via submit_embeds

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
