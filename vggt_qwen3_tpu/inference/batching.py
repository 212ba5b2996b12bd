"""Shared batch preparation for the inference CLIs.

One implementation of the prompt-encode → left-pad → view-pad → encode_images
→ splice → generate pipeline serving both the QA and ARKit CLIs, with
**fixed-shape bucketing**: prompts pad to a caller-chosen length and short
final chunks pad to the full batch (rows repeated, outputs trimmed), so the
jitted ``generate`` compiles once per run instead of once per ragged chunk —
compile time would otherwise dominate the 7k-sample eval.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StageConfig
from ..data.tokenizer import IMAGE_TOKEN, pad_and_mask
from ..models import qwen3, vlm
from ..ops.preprocess import preprocess_views
from .engine import GenerationConfig, generate


def encode_prompts(tokenizer, prompts: List[str], *, pad_to_len: int) -> Tuple[np.ndarray, np.ndarray]:
    encoded = [tokenizer(p, add_special_tokens=False)["input_ids"] for p in prompts]
    padded = pad_and_mask(encoded, tokenizer.pad_token_id, min_length=pad_to_len, side="left")
    return np.asarray(padded["input_ids"], np.int32), np.asarray(padded["attention_mask"], np.int32)


def max_prompt_len(tokenizer, prompts: List[str]) -> int:
    return max(len(tokenizer(p, add_special_tokens=False)["input_ids"]) for p in prompts)


def stack_views(samples: List[Dict], image_size: int) -> jnp.ndarray:
    """Preprocess each sample's views; ragged view counts pad by repeating the
    last view (matches the prior per-CLI behavior)."""
    views = [preprocess_views(s["images"], image_size) for s in samples]
    v_max = max(v.shape[0] for v in views)
    views = [
        jnp.concatenate([v] + [v[-1:]] * (v_max - v.shape[0]), axis=0) if v.shape[0] < v_max else v
        for v in views
    ]
    return jnp.stack(views, axis=0)


@partial(jax.jit, static_argnames=("model_cfg", "gen_cfg", "image_token_id"))
def _vision_splice_generate(
    params, model_cfg, gen_cfg, image_token_id, images, ids, mask, constraint=None
):
    """The full query as ONE compiled program: VGGT → Perceiver → embed →
    splice → prefill → scan decode. Fusing these (instead of dispatching
    encode_images / embed / splice eagerly, as round 1 did) removes ~4 host
    round-trips per batch — material on this backend's ~2.3 ms dispatch —
    and lets XLA overlap the vision epilogue with prefill setup."""
    vis = vlm.encode_images(params, model_cfg, images)
    embeds = qwen3.embed_tokens(params["text"], ids)
    embeds, mask2 = vlm.splice_expand(embeds, mask, ids, vis, image_token_id)
    return generate(
        params["text"], model_cfg.text, gen_cfg,
        inputs_embeds=embeds, attention_mask=mask2, constraint=constraint,
    )


@partial(jax.jit, static_argnames=("model_cfg", "gen_cfg", "image_token_id", "draft_k", "ngram"))
def _vision_splice_speculative(
    params, model_cfg, gen_cfg, image_token_id, draft_k, ngram,
    images, ids, mask, budget=None, constraint=None,
):
    """The full query with prompt-lookup speculative decode as ONE compiled
    program (vision → splice → prefill → while_loop over verify blocks →
    pack). The TEXT prompt ids (pre-splice) seed the draft memory, so schema
    text in the system hint is immediately draftable. Returns
    (packed [B, N+1] = tokens | n_gen, iterations)."""
    from .speculative import spec_generate_fused_body

    vis = vlm.encode_images(params, model_cfg, images)
    embeds = qwen3.embed_tokens(params["text"], ids)
    embeds, mask2 = vlm.splice_expand(embeds, mask, ids, vis, image_token_id)
    return spec_generate_fused_body(
        params["text"], model_cfg.text, gen_cfg, draft_k, ngram,
        inputs_embeds=embeds, attention_mask=mask2,
        lookup_ids=ids, lookup_mask=mask, budget=budget, constraint=constraint,
    )


@partial(jax.jit, static_argnames=("model_cfg", "gen_cfg", "image_token_id"))
def _vision_splice_early_exit(
    params, model_cfg, gen_cfg, image_token_id, images, ids, mask,
    budget=None, constraint=None,
):
    """The full query with EOS/budget early exit as ONE compiled program:
    VGGT → Perceiver → embed → splice → prefill → while_loop decode → pack.
    One dispatch + one fetch per query — a query whose answer is k tokens
    pays prefill + k decode steps, nothing else (the deployment's answers
    are 1-2 words median). Returns (packed [B, N+1] = tokens | n_gen, steps)."""
    from .engine import early_exit_fused_body

    vis = vlm.encode_images(params, model_cfg, images)
    embeds = qwen3.embed_tokens(params["text"], ids)
    embeds, mask2 = vlm.splice_expand(embeds, mask, ids, vis, image_token_id)
    return early_exit_fused_body(
        params["text"], model_cfg.text, gen_cfg,
        inputs_embeds=embeds, attention_mask=mask2,
        budget=budget, constraint=constraint,
    )


def generate_batch(
    params,
    stage: StageConfig,
    tokenizer,
    samples: List[Dict],
    prompts: List[str],
    gen_cfg: GenerationConfig,
    *,
    pad_to_len: int,
    pad_to_batch: Optional[int] = None,
    constraint: Optional[jnp.ndarray] = None,
    speculative: bool = False,
    draft_k: int = 6,
    ngram: int = 3,
    early_exit: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run one spliced-prompt generation batch.

    Returns (tokens [n, max_new], lengths [n]) for the n REAL samples —
    batch-padding rows are trimmed before returning. ``constraint``: optional
    FSM table for schema-constrained decode (``inference/constrained.py``).
    ``speculative``: decode via prompt-lookup speculative blocks
    (``inference/speculative.py`` — token-exact; the TEXT prompt ids seed the
    draft memory, so schema text in the system hint is draftable).
    ``early_exit``: stop decoding the moment every row hit EOS (fused
    while_loop — token-exact, ``engine.generate_early_exit``); wins when
    answers are much shorter than ``max_new_tokens``.
    """
    n = len(samples)
    if pad_to_batch and n < pad_to_batch:
        samples = samples + [samples[-1]] * (pad_to_batch - n)
        prompts = prompts + [prompts[-1]] * (pad_to_batch - n)

    ids_np, mask_np = encode_prompts(tokenizer, prompts, pad_to_len=pad_to_len)
    ids = jnp.asarray(ids_np)
    mask = jnp.asarray(mask_np)
    images = stack_views(samples, stage.data.image_size)

    image_token_id = tokenizer.convert_tokens_to_ids(IMAGE_TOKEN)
    if speculative or early_exit:
        if speculative:
            packed, _ = _vision_splice_speculative(
                params, stage.model, gen_cfg, image_token_id, draft_k, ngram,
                images, ids, mask, constraint=constraint,
            )
        else:
            packed, _ = _vision_splice_early_exit(
                params, stage.model, gen_cfg, image_token_id, images, ids, mask,
                constraint=constraint,
            )
        from .engine import unpack_lengths

        tokens, lengths = unpack_lengths(np.asarray(packed), gen_cfg)
    else:
        tokens, lengths = _vision_splice_generate(
            params, stage.model, gen_cfg, image_token_id, images, ids, mask, constraint
        )
    return np.asarray(tokens)[:n], np.asarray(lengths)[:n]
