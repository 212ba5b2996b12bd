"""Sampling / logit-processor ops, jit-compatible (static buffer + length).

Reproduces the HF processors the reference relies on for its published
numbers (SURVEY.md §2.6, §7.3 item 2):

- greedy argmax (``do_sample=False, num_beams=1`` — ``qa_inference.py:207-216``),
- repetition penalty 1.1 with HF's sign-dependent multiply/divide rule over
  *seen* tokens,
- no-repeat-ngram banning (ARKit path, n=4 — ``arkit_inference.py:274-284``).

HF subtlety preserved: when ``generate`` is called with ``inputs_embeds`` only
(the reference's vision-spliced path), its rolling ``input_ids`` start empty, so
the penalty/ngram sets cover **generated tokens only**, not the prompt. The
engine therefore feeds these ops a "visible ids" buffer whose initial content
is configurable (empty for spliced prompts, the prompt ids for text-only calls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_repetition_penalty(
    logits: jnp.ndarray,
    seen_ids: jnp.ndarray,
    seen_len: jnp.ndarray,
    penalty: float,
) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor.

    Args:
        logits: [B, V] float32.
        seen_ids: [B, T] int32 buffer of visible tokens (prompt and/or generated).
        seen_len: [B] or scalar — number of valid entries per row.
        penalty: >1.0 discourages repetition; 1.0 is a no-op.
    Returns:
        [B, V] adjusted logits: for each seen token v, logit/penalty when
        positive else logit*penalty.
    """
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    T = seen_ids.shape[1]
    valid = jnp.arange(T)[None, :] < jnp.broadcast_to(jnp.asarray(seen_len)[..., None], (B, T))
    # scatter "seen" into a [B, V] boolean table
    seen = jnp.zeros((B, V), dtype=bool)
    seen = seen.at[jnp.arange(B)[:, None], seen_ids].max(valid)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_no_repeat_ngram(
    logits: jnp.ndarray,
    seen_ids: jnp.ndarray,
    seen_len: jnp.ndarray,
    ngram: int,
) -> jnp.ndarray:
    """HF NoRepeatNGramLogitsProcessor (static-shape formulation).

    Bans any token x such that the n-gram ``(last n-1 seen tokens, x)`` already
    occurs in ``seen_ids[:seen_len]``. No-op while fewer than n-1 tokens seen.
    """
    if ngram <= 0:
        return logits
    B, V = logits.shape
    T = seen_ids.shape[1]
    n1 = ngram - 1
    seen_len = jnp.broadcast_to(jnp.asarray(seen_len), (B,))

    # last (n-1) tokens per row: gather at positions seen_len-n1 .. seen_len-1
    tail_pos = seen_len[:, None] - n1 + jnp.arange(n1)[None, :]  # [B, n1]
    tail = seen_ids[jnp.arange(B)[:, None], jnp.clip(tail_pos, 0, T - 1)]

    # candidate n-gram starts i: prefix seen_ids[i:i+n1] must match tail and
    # the banned token is seen_ids[i+n1]; require i+n1 < seen_len.
    def row_banned(ids, length, tl):
        idx = jnp.arange(T)[:, None] + jnp.arange(n1)[None, :]  # [T, n1]
        windows = ids[jnp.clip(idx, 0, T - 1)]  # [T, n1]
        match = jnp.all(windows == tl[None, :], axis=-1)
        next_pos = jnp.arange(T) + n1
        in_range = next_pos < length
        hit = match & in_range
        banned_tok = ids[jnp.clip(next_pos, 0, T - 1)]
        table = jnp.zeros((V,), dtype=bool).at[banned_tok].max(hit)
        return table

    banned = jax.vmap(row_banned)(seen_ids, seen_len, tail)  # [B, V]
    active = seen_len >= n1
    banned = banned & active[:, None]
    return jnp.where(banned, -jnp.inf, logits)  # HF bans with -inf


def greedy_token(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax over the vocab — [B, V] → [B] int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
