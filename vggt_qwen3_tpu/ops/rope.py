"""Rotary position embeddings (HF "default" convention, rotate-half form).

cos/sin are computed in float32 (HF computes the rotary tables in fp32 even for
bf16 models); application happens in the activation dtype's promoted type and is
cast back, matching ``transformers`` Qwen3 numerics closely enough for EM-level
parity (SURVEY.md §7.3 item 4).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions.

    Args:
        positions: int array [...,] (any leading shape, typically [B, S]).
        head_dim: rotary dimension (full head dim for Qwen3).
        theta: rope base.
    Returns:
        (cos, sin) float32 arrays of shape positions.shape + (head_dim,),
        with the half-frequency table duplicated (HF layout).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., d]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding.

    Args:
        x: [..., S, n_heads, head_dim] (heads axis second-to-last).
        cos/sin: [..., S, head_dim] — broadcast over the heads axis.
    """
    dtype = x.dtype
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(dtype)
