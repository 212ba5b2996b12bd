"""2D axial rotary embeddings for vision attention (VGGT/croco-style).

VGGT's alternating-attention blocks rotate patch-token q/k with a 2D RoPE
(frequency 100), following croco's ``RoPE2D``: the head dim is split in
halves — the first rotated by the patch-row coordinate, the second by the
patch-column coordinate — and WITHIN each half the rotation uses the
NeoX/rotate-half pairing (dim j pairs with dim j + D/4), i.e.
``u*cos + rotate_half(u)*sin`` with ``cos = cat(freqs, freqs)`` per axis.
The pairing convention matters for real-checkpoint fidelity: weights trained
under rotate-half pairing give wrong attention if evaluated with
interleaved (GPT-J) pairing. Camera/register tokens carry position (0, 0)
(rotation by angle 0 = identity); patch coordinates are 1-based — the public
aggregator shifts the grid by +1 to reserve 0 for special tokens, and the
shift changes special↔patch relative angles, so it must match.

(Reference consumes VGGT through ``model.aggregator(images)`` —
``src/models/vggt_qwen3_vlm.py:144``; block internals follow the public VGGT
architecture; validated against a from-scratch torch oracle in
``tests/test_vggt_oracle.py`` and to be re-validated against
``vggt_1B_commercial.pt`` when weights are available — SURVEY.md §7.3.)
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
        (cos, sin): [..., T, head_dim//2] tables — first quarter = y-axis
        angles, second quarter = x-axis angles (croco inv-freq ladder:
        ``1/freq^(2i/(D/2))`` per axis).
    """
    assert head_dim % 4 == 0, head_dim
    quarter = head_dim // 4
    # croco RoPE2D: per-axis dim D/2, inv_freq over arange(0, D/2, 2)/(D/2)
    inv = 1.0 / (freq ** (jnp.arange(quarter, dtype=jnp.float32) * 2.0 / (2 * quarter)))
    y = coords[..., 0:1].astype(jnp.float32) * inv  # [..., T, quarter]
    x = coords[..., 1:2].astype(jnp.float32) * inv
    ang = jnp.concatenate([y, x], axis=-1)  # [..., T, head_dim//2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope2d(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
    rot_mask: "jnp.ndarray | None",
) -> jnp.ndarray:
    """croco-convention 2D rope: axial halves, rotate-half pairing per half.

    Computed as ``x·cosF + rothalf(x)·sinF`` with FULL-WIDTH (D-lane) tables
    instead of eight D/4-wide multiplies: the quarter-width slices are 16
    lanes at VGGT's D=64, which wastes 7/8 of every vector register — the
    train-step trace put this op at ~0.34 s of a 3.6 s micro. Bit-identical:
    ``a − b ≡ a + (−b)`` in IEEE, and the full-width tables are the same
    per-element cos/sin values.

    Args:
        x: [B, T, H, D].
        cos/sin: [B, T, D//2] (broadcast over heads) — y angles ∥ x angles.
        rot_mask: [B, T] bool — False rows (special tokens) pass through.
            Pass ``None`` when special tokens carry coordinates (0, 0): a
            rotation by angle 0 is exactly the identity (cos 1 · x + sin 0 ·
            h, both IEEE-exact), so the mask is redundant there and skipping
            it saves a full-size select.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    D = xf.shape[-1]
    q = D // 4
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    cy, cx = c[..., :q], c[..., q:]
    sy, sx = s[..., :q], s[..., q:]
    cos_full = jnp.concatenate([cy, cy, cx, cx], axis=-1)  # [B, T, 1, D]
    sin_full = jnp.concatenate([sy, sy, sx, sx], axis=-1)
    y1, y2 = xf[..., :q], xf[..., q : 2 * q]          # y half (rotate-half pair)
    x1, x2 = xf[..., 2 * q : 3 * q], xf[..., 3 * q :]  # x half
    half = jnp.concatenate([-y2, y1, -x2, x1], axis=-1)
    rot = xf * cos_full + half * sin_full
    if rot_mask is not None:
        rot = jnp.where(rot_mask[:, :, None, None], rot, xf)
    return rot.astype(dtype)
