"""Device-mesh construction.

Replaces the reference's accelerate/DeepSpeed/NCCL env zoo (SURVEY.md §2.7):
on TPU, parallelism is a mesh + sharding annotations and XLA emits the
collectives over ICI/DCN. Axes:

- ``dp``   — pure data parallel (batch),
- ``fsdp`` — ZeRO-3-equivalent: parameters/optimizer state sharded, batch also
  split here (all-gather on use, reduce-scatter on grads — inserted by XLA),
- ``tp``   — tensor parallel (attention heads / MLP columns) over ICI,
- ``pp``   — pipeline stages: the Qwen3 decoder stack splits into ``pp``
  contiguous stages, scheduled GPipe-style via ``shard_map`` + ``ppermute``
  (``parallel/pipeline.py``; the reference has no PP — SURVEY §2.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig

AXES = ("dp", "fsdp", "tp", "pp")


def build_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(dp, fsdp, tp, pp)`` mesh.

    With ``cfg=None``, all visible devices land on ``fsdp`` (the ZeRO-3-like
    default matching the reference's DeepSpeed setup, ``train_sft.py:119-121``).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(dp=1, fsdp=n, tp=1)
    if cfg.num_devices != n:
        raise ValueError(
            f"mesh {cfg.shape} needs {cfg.num_devices} devices, have {n}"
        )
    arr = np.asarray(devices).reshape(cfg.shape)
    return Mesh(arr, AXES)
