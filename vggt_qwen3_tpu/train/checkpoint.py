"""Orbax sharded checkpointing with working resume.

Replaces the reference's DeepSpeed save_state + ``zero_to_fp32`` merge + the
4-level inference fallback chain (SURVEY.md §5.4) with one mechanism: Orbax
writes each shard from its owning device; restore takes abstract shapes +
shardings and lands arrays directly on the mesh. Also fixes the reference's
README-promised-but-unwired auto-resume (``train_sft.py`` never calls
``load_state``)."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional

import jax


def save(state: Any, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def restore(path: str | Path, abstract_state: Any) -> Any:
    """Restore into the sharding/structure of ``abstract_state`` (a pytree of
    jax.ShapeDtypeStruct with shardings, e.g. from eval_shape + shardings)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)


def latest_step_dir(output_dir: str | Path) -> Optional[Path]:
    """Find the newest ``step_<n>`` checkpoint directory (reference layout:
    ``<output_dir>/step_<n>/`` — train_sft.py:250-252)."""
    output_dir = Path(output_dir)
    best, best_step = None, -1
    if not output_dir.exists():
        return None
    for child in output_dir.iterdir():
        m = re.fullmatch(r"step_(\d+)", child.name)
        if m and child.is_dir():
            step = int(m.group(1))
            if step > best_step:
                best, best_step = child, step
    return best


def abstract_like(state: Any, shardings: Any) -> Any:
    """ShapeDtypeStructs carrying shardings, for :func:`restore`."""

    def one(x, sh):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    return jax.tree.map(one, state, shardings)
