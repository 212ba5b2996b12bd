"""Ring attention over an ICI sequence axis (SURVEY.md §5.7 scale-out).

For >16-view VGGT global attention the token count (V·~1k) outgrows one
chip's HBM/compute; shard the SEQUENCE over a mesh axis and rotate K/V around
the ring with ``lax.ppermute`` while each device attends its local queries —
compute overlaps the neighbor-to-neighbor ICI transfer, total memory stays
B·T/n per device. This is the TPU-native construction (shard_map + XLA
collectives), not an NCCL port; the reference has no equivalent (its global
attention is single-GPU SDPA, ``third_party/vggt`` aggregator).

Each (local-q × rotated-kv) chunk runs the Pallas flash kernel with its
logsumexp; chunks combine with the standard two-pass-free softmax merge:

    lse = logsumexp_i(lse_i),  out = Σ_i exp(lse_i − lse) · out_i

Differentiable end-to-end: ``flash_attention_with_lse`` defines the lse
cotangent, and the merge is plain XLA.

Usage (non-causal, e.g. VGGT global attention): q, k, v sharded on the
sequence dim over ``axis_name`` inside ``shard_map``; see
:func:`ring_attention_sharded` for the one-call wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import NEG_INF, flash_attention_with_lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal ring attention body (call under ``shard_map``).

    Args:
        q: local shard [B, S/n, NH, D]; k, v: local shards [B, T/n, NKV, D],
            all sharded on the sequence axis over ``axis_name``.
    Returns:
        local output shard [B, S/n, NH, D].
    """
    n = jax.lax.psum(1, axis_name)
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    scale = float(scale)  # keep it a static python float through the jit
    interpret = interpret or jax.default_backend() != "tpu"  # CPU: pallas interpret
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        kc, vc = carry
        out_i, lse_i = flash_attention_with_lse(
            q, kc, vc, scale=scale, interpret=interpret
        )
        # rotate kv to the next device; XLA overlaps this with compute
        kn = jax.lax.ppermute(kc, axis_name, perm)
        vn = jax.lax.ppermute(vc, axis_name, perm)
        return (kn, vn), (out_i, lse_i)

    (_, _), (outs, lses) = jax.lax.scan(step, (k, v), None, length=n)
    # combine chunk results: outs [n, B, Sl, NH, D], lses [n, B, NH, Sl]
    lse_max = jnp.max(lses, axis=0)
    # guard fully-dead rows (every chunk NEG_INF): keep weights at 0
    w = jnp.exp(lses - jnp.where(lse_max <= NEG_INF * 0.5, 0.0, lse_max))
    denom = jnp.sum(w, axis=0)  # [B, NH, Sl]
    w = w / jnp.maximum(denom, 1e-30)
    w_bshd = jnp.moveaxis(w, (1, 2, 3), (1, 3, 2))  # [n, B, Sl, NH]
    out = jnp.sum(outs.astype(jnp.float32) * w_bshd[..., None], axis=0)
    return out.astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    *,
    axis_name: str = "fsdp",
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-call wrapper: shards the sequence dim over ``axis_name`` of
    ``mesh``, runs :func:`ring_attention` under ``shard_map``, returns the
    sequence-sharded result. Sequence length must divide the axis size."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name, None, None)
    fn = functools.partial(
        ring_attention, axis_name=axis_name, scale=scale, interpret=interpret
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)
