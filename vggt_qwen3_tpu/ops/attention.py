"""Reference (pure-XLA) multi-head attention with GQA support.

This is the numerics oracle and fallback path; the hot paths dispatch to the
Pallas flash-attention kernels in ``ops/flash_attention.py`` when shapes allow.
Softmax statistics are computed in float32 and the probability matrix is cast
back to the value dtype before the PV matmul — the same recipe HF eager
attention uses, which keeps bf16 parity with the PyTorch reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_eligible(S: int, T: int, D: int) -> bool:
    """Dispatch gate for the Pallas flash kernel: TPU backend, sequence long
    enough to amortize kernel launch, lane-aligned head dim."""
    return (
        jax.default_backend() == "tpu"
        and S >= 128
        and T >= 128
        and D % 8 == 0
    )


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_start: Optional[jnp.ndarray] = None,
    kv_end: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Structured-mask attention: causal + contiguous per-row validity bounds.

    Routes to the Pallas flash kernel on TPU at profitable sizes, else builds
    the boolean mask and uses the XLA reference path — results match to fp32
    reassociation (tested)."""
    B, S, _, D = q.shape
    T = k.shape[1]
    if flash_eligible(S, T, D):
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, kv_start=kv_start, kv_end=kv_end)
    masks = []
    if causal:
        masks.append(make_causal_mask(S, T)[None, None])
    kv_pos = jnp.arange(T)[None, :]
    if kv_start is not None:
        masks.append((kv_pos >= kv_start[:, None])[:, None, None, :])
    if kv_end is not None:
        masks.append((kv_pos < kv_end[:, None])[:, None, None, :])
    return mha(q, k, v, mask=combine_masks(*masks))


def make_causal_mask(q_len: int, kv_len: int, *, q_offset: int = 0) -> jnp.ndarray:
    """Boolean [q_len, kv_len] mask, True = may attend. ``q_offset`` shifts the
    query positions (used when decoding with a KV cache)."""
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len)[None, :]
    return kv_pos <= q_pos


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """AND together optional boolean masks (broadcasting)."""
    present = [m for m in masks if m is not None]
    if not present:
        return None
    out = present[0]
    for m in present[1:]:
        out = jnp.logical_and(out, m)
    return out


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    kv_heads_major: bool = False,
) -> jnp.ndarray:
    """Grouped-query attention.

    Args:
        q: [B, S, NH, D]
        k, v: [B, T, NKV, D] with NH % NKV == 0 — or [B, NKV, T, D] when
            ``kv_heads_major`` (the decode-cache layout; same numerics, the
            einsum specs just read the head-major operands in place).
        mask: optional boolean, broadcastable to [B, NH, S, T]; True = attend.
        scale: defaults to D**-0.5.
    Returns:
        [B, S, NH, D] in q's dtype.
    """
    B, S, NH, D = q.shape
    NKV = k.shape[1] if kv_heads_major else k.shape[2]
    T = k.shape[2] if kv_heads_major else k.shape[1]
    assert NH % NKV == 0, (NH, NKV)
    group = NH // NKV
    if scale is None:
        scale = D**-0.5
    k_spec = "bktd" if kv_heads_major else "btkd"

    # Grouped formulation: never materialize repeated K/V (a 4x GQA repeat
    # would quadruple decode KV-cache traffic — the dominant HBM cost).
    qg = q.reshape(B, S, NKV, group, D)
    scores = jnp.einsum(
        f"bskgd,{k_spec}->bkgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        # scores layout is [B, NKV, group, S, T]; per-head masks ([B, NH, S, T])
        # split their head axis into (NKV, group), head-agnostic masks
        # ([B, 1, S, T]) broadcast via a singleton group axis.
        if mask.ndim == 4 and mask.shape[1] == NH and NH > 1:
            mask = mask.reshape(B, NKV, group, S, T)
        else:
            mask = mask[:, None] if mask.ndim == 4 else mask
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(v.dtype)
    out = jnp.einsum(f"bkgst,{k_spec}->bskgd", probs, v)
    return out.reshape(B, S, NH, D).astype(q.dtype)


def mha_quantized_kv(
    q: jnp.ndarray,
    k8: jnp.ndarray,
    ks: jnp.ndarray,
    v8: jnp.ndarray,
    vs: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    kv_heads_major: bool = False,
) -> jnp.ndarray:
    """GQA over an int8 KV cache with the scales folded OUT of the KV operands.

    ``dequant(k8) = k8 * ks[..., None]`` is scalar along the head dim, so
    ``q·k`` factors as ``(q·k8) * ks`` — the K scale moves onto the tiny
    scores tensor. Likewise ``probs @ dequant(v8) = (probs * vs) @ v8`` moves
    the V scale onto probs. The int8 operands then enter their dots through a
    PURE convert, which XLA fuses into the matmul operand read (the same
    fusion the W8 weight path gets); a ``dequant-then-mha`` formulation
    instead materializes bf16 K/V to HBM every decode step — measured ~3×
    decode-step slowdown at B=384, T=160.

    Args:
        q: [B, S, NH, D] bf16.
        k8/v8: [B, T, NKV, D] int8 — or [B, NKV, T, D] when ``kv_heads_major``
            (the decode-cache layout).
        ks/vs: [B, T, NKV] bf16 per-(token, head) scales ([B, NKV, T] when
            ``kv_heads_major``).
        mask: optional boolean, broadcastable to [B, NH, S, T].
    Returns:
        [B, S, NH, D] in q's dtype.
    """
    B, S, NH, D = q.shape
    NKV = k8.shape[1] if kv_heads_major else k8.shape[2]
    T = k8.shape[2] if kv_heads_major else k8.shape[1]
    group = NH // NKV
    if scale is None:
        scale = D**-0.5
    k_spec = "bktd" if kv_heads_major else "btkd"

    def scales_bkt(s):  # [B, NKV, T] f32, whichever layout arrived
        s = s.astype(jnp.float32)
        return s if kv_heads_major else s.transpose(0, 2, 1)

    qg = q.reshape(B, S, NKV, group, D)
    scores = jnp.einsum(
        f"bskgd,{k_spec}->bkgst", qg, k8.astype(q.dtype), preferred_element_type=jnp.float32
    )
    scores = scores * (scales_bkt(ks)[:, :, None, None, :] * scale)
    if mask is not None:
        if mask.ndim == 4 and mask.shape[1] == NH and NH > 1:
            mask = mask.reshape(B, NKV, group, S, T)
        else:
            mask = mask[:, None] if mask.ndim == 4 else mask
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = (probs * scales_bkt(vs)[:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum(f"bkgst,{k_spec}->bskgd", probs, v8.astype(q.dtype))
    return out.reshape(B, S, NH, D).astype(q.dtype)
