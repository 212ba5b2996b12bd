"""Sharding-spec registry: PartitionSpec rules for every parameter family.

The TP layout is Megatron-style expressed as pjit specs (BASELINE.json north
star: "Qwen3-4B weights and the VGGT backbone shard tensor-parallel over
ICI"): column-parallel projections (QKV, gate/up, attention qkv) split their
output dim over ``tp``; row-parallel projections (attn out, MLP down) split
their input dim over ``tp`` — XLA then inserts the single all-reduce per block
that Megatron does by hand. The complementary matrix dim shards over ``fsdp``
(ZeRO-3-equivalent storage sharding, all-gathered on use). Vectors (norms,
biases, LayerScale) replicate.

Rules match on parameter *path suffixes*, so they apply uniformly to the
stacked-layer layout ([L, in, out] — leading layer axis never sharded).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: Tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for a parameter at ``path`` (tree keys) with ``ndim``."""
    name = path[-1]
    # quantized weights: {"w8": [.., K, N], "scale": [.., 1, N]} shard by the
    # parent projection's rule (scale rows are size-1 → only N shards)
    if name in ("w8", "scale") and len(path) >= 2:
        if path[-2] == "embed":
            # quantized embedding: w8 [V, H], scale per-row [V, 1]
            return P("fsdp", "tp") if name == "w8" else P("fsdp", None)
        parent = _spec_for(path[:-1] + (path[-2],), ndim)
        if name == "scale" and ndim >= 2:
            # [.., 1, N]: never shard the singleton row dim
            dims = list(parent)
            dims = dims + [None] * (ndim - len(dims))
            if len(dims) >= 2:
                dims[-2] = None
            return P(*dims)
        return parent
    # LoRA adapters are small — replicate
    if "lora" in path:
        return P()
    top = path[0] if path else ""

    def last2(spec_in, spec_out):
        pad = (None,) * (ndim - 2)
        return P(*pad, spec_in, spec_out)

    # patch-embed conv kernel [P, P, 3, E]: only the feature dim shards
    if "patch" in path and name == "proj_w" and ndim == 4:
        return P(None, None, None, "tp")
    # --- column-parallel (output dim over tp) ---
    if name in ("wq", "wk", "wv", "gate", "up", "qkv_w", "mlp_w1", "in_proj_w"):
        return last2("fsdp", "tp")
    # --- row-parallel (input dim over tp) ---
    if name in ("wo", "down", "proj_w", "mlp_w2", "out_proj_w"):
        return last2("tp", "fsdp")
    # --- embeddings / heads ---
    if name == "embed":  # [V, H]
        return P("fsdp", "tp")
    if name == "lm_head":  # [H, V]
        return P("tp", "fsdp")
    if name == "pos":  # [N, E] vision pos-embed: shard features
        return P(None, "tp") if ndim == 2 else P()
    if name == "latents":  # perceiver latents [N, D]
        return P()
    # --- everything else (norms, biases, LayerScale, tokens) replicated ---
    del top
    return P()


def spec_with_pp(keys: Tuple[str, ...], ndim: int, pp: int) -> P:
    """Full spec for a (possibly optimizer-wrapped) parameter path: the
    suffix rule from :func:`_spec_for`, plus — when ``pp > 1`` — the TEXT
    decoder's stacked-layer leaves (``text.layers.* → [L, ...]``) shard their
    layer dim over ``pp``, so each pipeline rank stores (and its optimizer
    updates) only its own stage, matching ``parallel/pipeline.py``'s
    shard_map in_spec (stage entry is a local slice, not a reshard). The rule
    matches ``text``/``layers`` anywhere in the path so AdamW mu/nu and
    MultiSteps accumulators (which mirror param shapes under wrapper keys)
    stage-shard identically."""
    spec = _spec_for(keys, ndim)
    if pp > 1 and ndim >= 1:
        klist = list(keys)
        if "text" in klist:
            i = klist.index("text")
            if i + 1 < len(klist) and klist[i + 1] == "layers":
                dims = list(spec) + [None] * (ndim - len(spec))
                if dims and dims[0] is None:
                    spec = P("pp", *dims[1:])
    return spec


def path_keys(path) -> Tuple[str, ...]:
    """jax key-path → plain string keys (dict keys and sequence indices)."""
    return tuple(k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree mirroring ``params`` (works on shapes or arrays)."""
    pp = dict(mesh.shape).get("pp", 1)

    def one(path, leaf):
        ndim = len(leaf.shape) if hasattr(leaf, "shape") else 0
        return NamedSharding(mesh, spec_with_pp(path_keys(path), ndim, pp))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over both data axes (dp × fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a host batch with the leading dim split over (dp, fsdp)."""
    sh = batch_sharding(mesh)

    def one(x):
        return jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim >= 1 else x

    return jax.tree.map(one, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
