"""Geometry-token head.

Mirrors the reference (``src/models/vggt_qwen3_vlm.py:51-56,164-177``):
37-dim features — R(9) + t(3) + K(9) + depth_hist(16) — through
``Linear(37→h) → SiLU → Linear(h→h)``; features are mean-pooled over views and
the single embedding is broadcast to ``geom_tokens`` positions. Missing keys
zero-fill (reference's ``zeros_like`` fallbacks).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

FEATURE_SPLITS = {"R": 9, "t": 3, "K": 9, "depth_hist": 16}
FEATURE_DIM = sum(FEATURE_SPLITS.values())  # 37


def init_params(rng: jax.Array, hidden: int, dtype: str = "float32") -> Params:
    dt = jnp.dtype(dtype)
    k1, k2 = jax.random.split(rng)

    def normal(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dt)

    return {
        "w1": normal(k1, (FEATURE_DIM, hidden)),
        "b1": jnp.zeros((hidden,), dt),
        "w2": normal(k2, (hidden, hidden)),
        "b2": jnp.zeros((hidden,), dt),
    }


def pack_features(geom: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
    """Concatenate R/t/K/depth_hist → [..., 37], zero-filling absent keys.

    Inputs are per-view: [B, V, k] each.
    """
    ref = next(v for k, v in geom.items() if k in FEATURE_SPLITS)
    parts = []
    for name, width in FEATURE_SPLITS.items():
        val = geom.get(name)
        if val is None:
            val = jnp.zeros(ref.shape[:-1] + (width,), ref.dtype)
        parts.append(val)
    return jnp.concatenate(parts, axis=-1)


def apply(
    params: Params, geom: Optional[Mapping[str, jnp.ndarray]], geom_tokens: int
) -> Optional[jnp.ndarray]:
    """[B, V, 37] features → [B, geom_tokens, hidden]; None when disabled."""
    if geom is None or geom_tokens == 0:
        return None
    feats = pack_features(geom)
    pooled = feats.mean(axis=1)  # mean over views (vggt_qwen3_vlm.py:176)
    h = pooled @ params["w1"] + params["b1"]
    h = jax.nn.silu(h)
    h = h @ params["w2"] + params["b2"]
    return jnp.broadcast_to(h[:, None, :], (h.shape[0], geom_tokens, h.shape[-1]))


def convert_torch_state_dict(sd, dtype: str = "float32") -> Params:
    """Convert the reference ``geom_head`` (nn.Sequential 0/2) state dict."""
    import numpy as np

    def t(x):
        return np.asarray(x.detach().float().cpu().numpy() if hasattr(x, "detach") else x)

    dt = jnp.dtype(dtype)
    return {
        "w1": jnp.asarray(t(sd["0.weight"]).T, dt),
        "b1": jnp.asarray(t(sd["0.bias"]), dt),
        "w2": jnp.asarray(t(sd["2.weight"]).T, dt),
        "b2": jnp.asarray(t(sd["2.bias"]), dt),
    }
