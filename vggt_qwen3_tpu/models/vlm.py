"""Composed vision-language model: VGGT → Perceiver → [geom] → Qwen3.

Re-architects ``VGGTQwen3VLM`` (``src/models/vggt_qwen3_vlm.py:26-201``) as
pure functions over one param tree:

- :func:`encode_images` — frozen VGGT aggregator → take first
  ``num_vis_tokens`` of the flattened last-layer tokens → Perceiver
  (``vggt_qwen3_vlm.py:128-162``). The mock backend emits zero tokens of dim
  ``mock_vision_dim`` while honoring the *current* ``(tokens_list,
  patch_start_idx)`` tuple contract — fixing the stale reference mock
  (SURVEY.md §2.3).
- :func:`encode_geom` — 37-dim features → MLP → broadcast to ``geom_tokens``
  (``vggt_qwen3_vlm.py:164-177``).
- :func:`splice_overwrite` — the reference **training** splice: embeddings at
  ``pos : pos+F`` after the first ``<image>`` are overwritten in place, the
  sequence does not grow (``vggt_qwen3_vlm.py:190-195``). Known reference
  quirk: with prompt ``{q}\\n<image>\\n{answer}`` this clobbers answer-token
  embeddings whose labels stay supervised; we reproduce it for training parity
  and keep the inference semantics separate (SURVEY.md §7.3 item 5).
- :func:`splice_expand` — the reference **inference** splice: the first
  ``<image>`` token is replaced by the full F-token span, expanding sequence
  and mask (``qa_inference.py:119-145``). EM@1 parity is measured through
  this path.
- :func:`train_forward` — loss with HF causal-LM shift and −100 masking.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VLMConfig
from . import geom as geom_mod
from . import perceiver, qwen3, vggt

Params = Dict[str, object]


# ---------------------------------------------------------------------------
# Init / assembly
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: VLMConfig, dtype: Optional[str] = None) -> Params:
    dt = dtype or cfg.dtype
    k_text, k_vis, k_proj, k_geom = jax.random.split(rng, 4)
    params: Params = {
        "text": qwen3.init_params(k_text, cfg.text, dtype=dt),
        "projector": perceiver.init_params(
            k_proj, cfg.projector, in_dim=cfg.vision_out_dim,
            out_dim=cfg.text.hidden_size, dtype=dt,
        ),
        "geom": geom_mod.init_params(k_geom, cfg.text.hidden_size, dtype=dt),
    }
    if cfg.vision_backbone != "mock" and cfg.vision is not None:
        params["vision"] = vggt.init_params(k_vis, cfg.vision, dtype=dt)
    return params


VISION_BLOCK_QUANT_KEYS = ("qkv_w", "proj_w", "mlp_w1", "mlp_w2")


def quantize_vision(params: Params, *, mode: str = "w8", donate: bool = True) -> Params:
    """Quantize the frozen VGGT tower's block matmuls for serving.

    ``w8``: per-output-channel int8 weights (near-lossless; tower is frozen,
    so this is pure inference-side compression). ``w8a8``: additionally run
    the dots as int8×int8 on the MXU (2× bf16 rate — the vision forward at
    batch is compute-bound). Patch-embed conv, norms, LayerScale, tokens and
    the Perceiver/geom heads stay bf16. Gate on real weights with the vision
    drift test protocol (``tests/test_vision_quant.py``).
    """
    from ..ops.quant import mark_act_quant, quantize_per_channel

    assert mode in ("w8", "w8a8"), mode
    if "vision" not in params:
        return params
    donate_args = (0,) if donate else ()
    quantize = jax.jit(quantize_per_channel, donate_argnums=donate_args)

    def quantize_blocks(blocks):
        out = dict(blocks)
        for key in VISION_BLOCK_QUANT_KEYS:
            out[key] = quantize(blocks[key])
            if mode == "w8a8":
                out[key] = mark_act_quant(out[key])
        return out

    vis = dict(params["vision"])
    vis["patch"] = dict(vis["patch"], blocks=quantize_blocks(vis["patch"]["blocks"]))
    vis["frame_blocks"] = quantize_blocks(vis["frame_blocks"])
    vis["global_blocks"] = quantize_blocks(vis["global_blocks"])
    out = dict(params)
    out["vision"] = vis
    return out


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def mock_aggregator(cfg: VLMConfig, images: jnp.ndarray) -> Tuple[list, int]:
    """Zero-token stand-in honoring the real tuple contract."""
    B, S = images.shape[:2]
    tokens = jnp.zeros((B, S, cfg.num_vis_tokens, cfg.mock_vision_dim), images.dtype)
    return [tokens], 5


def encode_images(
    params: Params, cfg: VLMConfig, images: jnp.ndarray, *, rng: Optional[jax.Array] = None,
    act_constraint=None, ring_mesh=None, ring_axis: Optional[str] = None,
) -> jnp.ndarray:
    """[B, V, 3, H, W] in [0,1] → [B, num_vis_tokens, text_hidden].

    The vision tower is frozen (``freeze_vision`` default true); training wraps
    it in ``stop_gradient`` (reference uses ``@torch.no_grad`` —
    ``vggt_qwen3_vlm.py:128``). ``act_constraint`` propagates the batch
    sharding through the projector (see :func:`perceiver.apply`).
    ``ring_mesh``/``ring_axis`` shard the VGGT global (cross-view) attention
    sequence over that mesh axis as ring attention — the >16-view scale-out
    path (SURVEY §5.7); V·T must be divisible by the axis size.
    """
    B = images.shape[0]
    if cfg.vision_backbone == "mock":
        tokens_list, _ = mock_aggregator(cfg, images)
    else:
        tokens_list, _ = vggt.aggregator(
            params["vision"], cfg.vision, images,
            ring_mesh=ring_mesh, ring_axis=ring_axis,
        )
    agg = tokens_list[-1]  # [B, S, T, D]
    agg = agg.reshape(B, -1, agg.shape[-1])[:, : cfg.num_vis_tokens, :]
    if cfg.freeze_vision:
        agg = jax.lax.stop_gradient(agg)
    return perceiver.apply(
        params["projector"], cfg.projector, agg, rng=rng, act_constraint=act_constraint
    )


def encode_geom(
    params: Params, cfg: VLMConfig, geom: Optional[Mapping[str, jnp.ndarray]]
) -> Optional[jnp.ndarray]:
    return geom_mod.apply(params["geom"], geom, cfg.geom_tokens)


# ---------------------------------------------------------------------------
# Splice ops
# ---------------------------------------------------------------------------


def _first_image_pos(input_ids: jnp.ndarray, image_token_id: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(pos [B], has_image [B]) of the first ``<image>`` occurrence per row."""
    is_img = input_ids == image_token_id
    has = is_img.any(axis=-1)
    pos = jnp.argmax(is_img, axis=-1)
    return pos, has


def splice_overwrite(
    inputs_embeds: jnp.ndarray,
    input_ids: jnp.ndarray,
    features: jnp.ndarray,
    image_token_id: int,
) -> jnp.ndarray:
    """Training splice: overwrite embeds[pos : pos+F] with ``features``; length
    unchanged (``vggt_qwen3_vlm.py:190-195``)."""
    B, T, H = inputs_embeds.shape
    F = features.shape[1]
    pos, has = _first_image_pos(input_ids, image_token_id)
    rel = jnp.arange(T)[None, :] - pos[:, None]  # [B, T]
    valid = (rel >= 0) & (rel < F) & has[:, None]
    gathered = jnp.take_along_axis(
        features, jnp.clip(rel, 0, F - 1)[:, :, None].astype(jnp.int32), axis=1
    )
    return jnp.where(valid[:, :, None], gathered.astype(inputs_embeds.dtype), inputs_embeds)


def splice_expand(
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    input_ids: jnp.ndarray,
    features: jnp.ndarray,
    image_token_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference splice: replace the first ``<image>`` token by the F-token
    feature span — sequence grows by F−1 (``qa_inference.py:119-145``).

    Rows without ``<image>`` are right-aligned unchanged (suffix path), so the
    no-image fallback matches the reference's early-return behavior.
    """
    B, T, H = inputs_embeds.shape
    F = features.shape[1]
    out_T = T + F - 1
    pos, has = _first_image_pos(input_ids, image_token_id)
    pos = jnp.where(has, pos, T)  # no image → all positions take prefix/suffix path

    j = jnp.arange(out_T)[None, :]  # [B, out_T]
    p = pos[:, None]
    in_prefix = j < p
    in_vis = (j >= p) & (j < p + F)
    # suffix source index: j - (F - 1)
    src_txt = jnp.where(in_prefix, j, jnp.clip(j - (F - 1), 0, T - 1)).astype(jnp.int32)
    src_vis = jnp.clip(j - p, 0, F - 1).astype(jnp.int32)

    txt = jnp.take_along_axis(inputs_embeds, src_txt[:, :, None], axis=1)
    vis = jnp.take_along_axis(features.astype(inputs_embeds.dtype), src_vis[:, :, None], axis=1)
    embeds = jnp.where(in_vis[:, :, None], vis, txt)

    mask_txt = jnp.take_along_axis(attention_mask, src_txt, axis=1)
    mask = jnp.where(in_vis, 1, mask_txt).astype(attention_mask.dtype)
    # rows without <image>: positions beyond original T are padding
    overflow = (~has[:, None]) & (j >= T)
    mask = jnp.where(overflow, 0, mask)
    return embeds, mask


# ---------------------------------------------------------------------------
# Training forward / loss
# ---------------------------------------------------------------------------


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """HF CausalLM loss: shift-by-one CE, mean over labels != −100."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != -100
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[:, :, None], axis=-1)[:, :, 0]
    total = jnp.where(valid, nll, 0.0).sum()
    count = jnp.maximum(valid.sum(), 1)
    return total / count


def causal_lm_loss_chunked(
    text_params,
    text_cfg,
    hidden: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    chunk: int = 128,
    act_constraint=None,
) -> jnp.ndarray:
    """Memory-efficient CE: LM head + softmax evaluated ``chunk`` sequence
    positions at a time inside a rematerialized ``lax.scan``.

    The naive path materializes fp32 logits [B, T, V] (plus softmax and
    cotangent copies) — at the stage-1 recipe shape (B=6, T=512, V=151,936)
    that is ~1.8 GB × 3, the allocation that pushed the single-chip train
    step out of HBM. Here the peak is one [B, chunk, V] chunk; the
    ``jax.checkpoint`` on the body recomputes each chunk's logits in the
    backward instead of storing them. Same math as :func:`causal_lm_loss`
    (fp32 accumulation; summation order differs only across chunks).

    ``hidden`` is the POST-final-norm hidden state ([B, T, H], e.g. from
    ``qwen3.forward_hidden``); the labels shift happens here.
    """
    B, T, H = hidden.shape
    hs = hidden[:, :-1]
    targets = labels[:, 1:]
    n = T - 1
    pad = (-n) % chunk
    if pad:
        hs = jnp.concatenate([hs, jnp.zeros((B, pad, H), hs.dtype)], axis=1)
        targets = jnp.concatenate(
            [targets, jnp.full((B, pad), -100, targets.dtype)], axis=1
        )
    n_chunks = (n + pad) // chunk
    hs = hs.reshape(B, n_chunks, chunk, H).transpose(1, 0, 2, 3)
    tg = targets.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    constrain = act_constraint or (lambda x: x)

    @jax.checkpoint
    def body(carry, xs):
        total, count = carry
        h_c, t_c = xs
        logits = constrain(qwen3.lm_logits(text_params, text_cfg, h_c))  # [B, c, V] f32
        valid = t_c != -100
        safe = jnp.where(valid, t_c, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, :, None], axis=-1)[:, :, 0]
        total = total + jnp.where(valid, nll, 0.0).sum()
        count = count + valid.sum()
        return (total, count), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (hs, tg)
    )
    return total / jnp.maximum(count, 1)


def train_forward(
    params: Params,
    cfg: VLMConfig,
    *,
    images: jnp.ndarray,
    geom_token: Optional[Mapping[str, jnp.ndarray]],
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    labels: jnp.ndarray,
    image_token_id: int,
    rng: Optional[jax.Array] = None,
    act_constraint=None,
    pipeline=None,
    ring_mesh=None,
    ring_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Training loss, reference semantics (``vggt_qwen3_vlm.py:179-201``):
    geom tokens (when present) are concatenated **before** visual tokens and
    the combined span overwrites embeddings at the first ``<image>``.

    ``act_constraint`` (optional ``x → x``): a sharding constraint applied to
    the batch-major activations at the model-boundary seams (spliced features,
    logits). Under pjit, ``with_sharding_constraint`` transposes onto the
    cotangents, pinning them batch-sharded so weight-grad dots contract the
    batch axis locally + all-reduce — without it the SPMD partitioner tries to
    reshard the cotangents to the TP weight layouts at a ``slice``/``pad`` and
    falls back to "involuntary full rematerialization" (replicating the tensor
    every step — the MULTICHIP_r02 warnings).

    ``pipeline`` (optional ``parallel.pipeline.PipelinePlan``): runs the text
    decoder stack as a GPipe pipeline over the mesh's ``pp`` axis.

    ``ring_mesh``/``ring_axis``: run VGGT global attention as ring attention
    with the cross-view sequence sharded over that mesh axis (the >16-view
    training path; ``--ring`` in ``train/sft.py``).
    """
    constrain = act_constraint or (lambda x: x)
    # constrain BOTH the concat inputs and its output: the concat's backward
    # splits the features cotangent, and the split outputs (the vis/geom
    # cotangents) each need their own pinned sharding or the partitioner
    # reshards them to the projector weights' TP layout via replication
    vis = constrain(encode_images(
        params, cfg, images, rng=rng, act_constraint=act_constraint,
        ring_mesh=ring_mesh, ring_axis=ring_axis,
    ))
    geom_feats = encode_geom(params, cfg, geom_token)
    if geom_feats is None:
        features = vis
    else:
        features = constrain(jnp.concatenate([constrain(geom_feats), vis], axis=1))

    embeds = qwen3.embed_tokens(params["text"], input_ids)
    embeds = splice_overwrite(embeds, input_ids, features, image_token_id)
    embeds = constrain(embeds)
    hidden, _ = qwen3.forward_hidden(
        params["text"], cfg.text, embeds, attention_mask=attention_mask,
        pipeline=pipeline,
    )
    hidden = constrain(hidden)
    # chunked CE: never materializes the [B, T, V] fp32 logits (see
    # causal_lm_loss_chunked — the stage-1 shape OOMs a 16 GB chip otherwise)
    return causal_lm_loss_chunked(
        params["text"], cfg.text, hidden, labels, act_constraint=act_constraint
    )
