"""Auxiliary loss heads.

The reference declares an ``ActionJsonLoss`` ("hybrid L1 + CE", only the L1
implemented) that is **never imported by its trainer** — dead code matching
the unimplemented Stage-2 structured-action training
(``src/train/losses.py:9-18``, SURVEY.md §2.1). We supply a working
equivalent plus the language loss, wired for the stage-2 ``loss_heads:``
weights (``configs/stage2_arkit.yaml:36-39``) so structured-action training is
actually trainable here.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp

from ..models.vlm import causal_lm_loss


def action_json_loss(
    pred_fields: jnp.ndarray, target_fields: jnp.ndarray, weight: float = 1.0
) -> jnp.ndarray:
    """Weighted L1 over numeric action fields (center/normal/extent — the
    reference's declared-but-unwired loss, ``losses.py:9-18``)."""
    return weight * jnp.abs(pred_fields - target_fields).mean()


def geometry_consistency_loss(
    pred_normal: jnp.ndarray, target_normal: jnp.ndarray, weight: float = 1.0
) -> jnp.ndarray:
    """1 − cosine similarity between predicted and target plane normals."""
    pn = pred_normal / (jnp.linalg.norm(pred_normal, axis=-1, keepdims=True) + 1e-8)
    tn = target_normal / (jnp.linalg.norm(target_normal, axis=-1, keepdims=True) + 1e-8)
    return weight * (1.0 - (pn * tn).sum(-1)).mean()


def combined_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    weights: Optional[Mapping[str, float]] = None,
    action_pred: Optional[jnp.ndarray] = None,
    action_target: Optional[jnp.ndarray] = None,
    normal_pred: Optional[jnp.ndarray] = None,
    normal_target: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Stage-2 multi-head loss: ``language`` CE + optional ``action_json`` L1
    + optional ``geometry_consistency``; weights default to the stage-2 YAML
    block (language 1.0 / action_json 1.0 / geometry_consistency 0.5)."""
    w = {"language": 1.0, "action_json": 1.0, "geometry_consistency": 0.5}
    if weights:
        w.update(weights)
    losses: Dict[str, jnp.ndarray] = {
        "language": w["language"] * causal_lm_loss(logits, labels)
    }
    if action_pred is not None and action_target is not None:
        losses["action_json"] = action_json_loss(action_pred, action_target, w["action_json"])
    if normal_pred is not None and normal_target is not None:
        losses["geometry_consistency"] = geometry_consistency_loss(
            normal_pred, normal_target, w["geometry_consistency"]
        )
    losses["total"] = sum(losses.values())
    return losses
