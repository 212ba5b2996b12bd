"""Debug / numerical-safety modes — the TPU analogue of the reference's
sanitizer-ish env flags (SURVEY.md §5.2: NCCL_DEBUG, find_unused_parameters,
flight recorder). Under jit, runs are deterministic by construction; the
remaining failure class is numerical (NaN/Inf), covered by:

- :func:`enable_nan_checks` — ``jax.config.debug_nans`` gated mode (raises at
  the op that produced a NaN; noticeably slower, use for triage),
- :func:`check_finite` — assert a pytree is finite (checkpoint/step guards),
- :func:`tree_stats` — per-leaf shape/mean/std/finite summary for param triage.
"""

from __future__ import annotations

from typing import Any, Dict


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def check_finite(tree: Any, name: str = "tree") -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append("".join(str(p) for p in path))
    if bad:
        raise FloatingPointError(f"{name}: non-finite values in {bad[:10]}" + ("…" if len(bad) > 10 else ""))


def tree_stats(tree: Any) -> Dict[str, Dict[str, float]]:
    import jax
    import numpy as np

    out: Dict[str, Dict[str, float]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "shape"):
            continue
        arr = np.asarray(leaf, np.float32)
        out["".join(str(p) for p in path)] = {
            "shape": tuple(arr.shape),
            "mean": float(arr.mean()) if arr.size else 0.0,
            "std": float(arr.std()) if arr.size else 0.0,
            "finite": bool(np.isfinite(arr).all()),
        }
    return out
