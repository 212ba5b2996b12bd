"""2D axial rotary embeddings for vision attention (VGGT-style).

VGGT's alternating-attention blocks rotate patch-token q/k with a 2D RoPE
(frequency 100): the head dim is split in halves, one rotated by the patch-row
coordinate and one by the patch-column coordinate. Camera/register tokens are
not rotated. (Reference consumes VGGT through ``model.aggregator(images)`` —
``src/models/vggt_qwen3_vlm.py:144``; block internals follow the public VGGT
architecture, to be validated against the ``vggt_1B_commercial.pt`` key map
when weights are available — SURVEY.md §7.3 item 1.)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope2d_cos_sin(
    coords: jnp.ndarray, head_dim: int, freq: float = 100.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin for 2D axial rope.

    Args:
        coords: [..., T, 2] float/int (y, x) coordinates per token.
        head_dim: per-head dim; must be divisible by 4.
    Returns:
        (cos, sin): [..., T, head_dim//2] tables for interleaved-pair rotation,
        axial: first half from y, second half from x.
    """
    assert head_dim % 4 == 0, head_dim
    quarter = head_dim // 4
    inv = 1.0 / (freq ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    y = coords[..., 0:1].astype(jnp.float32) * inv  # [..., T, quarter]
    x = coords[..., 1:2].astype(jnp.float32) * inv
    ang = jnp.concatenate([y, x], axis=-1)  # [..., T, head_dim//2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope2d(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, rot_mask: jnp.ndarray
) -> jnp.ndarray:
    """Rotate interleaved pairs of ``x`` where ``rot_mask`` is True.

    Args:
        x: [B, T, H, D].
        cos/sin: [B, T, D//2] (broadcast over heads).
        rot_mask: [B, T] bool — False rows (special tokens) pass through.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    r1 = x1 * c - x2 * s
    r2 = x1 * s + x2 * c
    rot = jnp.stack([r1, r2], axis=-1).reshape(xf.shape)
    out = jnp.where(rot_mask[:, :, None, None], rot, xf)
    return out.astype(dtype)
