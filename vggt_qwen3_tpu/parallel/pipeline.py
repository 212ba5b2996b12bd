"""Pipeline parallelism for the Qwen3 decoder stack (SURVEY.md §2.7 "PP").

The reference has no pipeline parallelism (nothing in ``src/`` shards layers
across devices; its only model-scale strategy is ZeRO-3,
``train_sft.py:119-121``). This module supplies the TPU-native strategy the
reference lacks: a GPipe-style schedule expressed as a ``jax.shard_map`` over
a dedicated ``pp`` mesh axis, with stage-to-stage activation transfer via
``lax.ppermute`` over ICI — no NCCL/MPI, no send/recv threads, one SPMD
program.

Design (semi-manual shard_map — manual over ``pp`` only, the partitioner
keeps handling ``dp``/``fsdp``/``tp`` inside the body):

- The stacked layer parameters ``[L, ...]`` enter with spec ``P('pp')``:
  each pipeline rank holds a contiguous stage of ``L/pp`` layers (and, when
  the sharding registry pins the same spec on the train state, stores +
  optimizes only that stage — pipeline-sharded optimizer memory).
- The batch splits into ``M`` microbatches host-of-schedule-side; a
  ``lax.scan`` over ``M + pp - 1`` ticks runs the classic GPipe wavefront:
  rank ``r`` processes microbatch ``t - r`` at tick ``t``, then hands its
  activation to rank ``r+1`` via ``ppermute``. Bubble ticks compute on
  clamped (valid but ignored) inputs — branch-free, fully static shapes.
- The last rank's outputs are re-assembled and ``psum``-broadcast over
  ``pp`` so every rank returns the full hidden state (the final norm / LM
  head / loss run replicated across ``pp``, sharded over the other axes as
  usual).
- Differentiable end-to-end: ``ppermute``/``psum``/``where`` all have
  transposes, so ``jax.grad`` of a pipelined loss yields exact layer grads
  (locked by ``tests/test_pipeline.py`` equivalence tests). Per-layer
  ``jax.checkpoint`` inside each stage keeps backward memory at one
  ``[mb, S, H]`` residual per layer, as in the non-pipelined path.

Utilization is the standard GPipe ``M / (M + pp - 1)``; pick
``num_microbatches`` a few × ``pp`` (the trainer defaults to ``2·pp``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


@dataclass(frozen=True)
class PipelinePlan:
    """Static description of how to pipeline the decoder stack."""

    mesh: Mesh
    num_microbatches: int

    @property
    def pp(self) -> int:
        return self.mesh.shape.get("pp", 1)

    def __hash__(self):  # usable as a static jit arg
        # Hash on stable mesh contents (Mesh.__eq__ — and hence the frozen
        # dataclass __eq__ — compares by value): equal plans built around
        # distinct-but-equal Mesh objects must hash equally or jit retraces.
        m = self.mesh
        return hash(
            (
                tuple(m.axis_names),
                m.devices.shape,
                tuple(d.id for d in m.devices.flat),
                self.num_microbatches,
            )
        )


def pipeline_decoder(
    layers: Any,
    h: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    plan: PipelinePlan,
    layer_fn,
) -> jnp.ndarray:
    """Run the stacked decoder layers as a ``pp``-stage GPipe pipeline.

    Args:
        layers: stacked layer params (every leaf ``[L, ...]``, ``L % pp == 0``).
        h: [B, S, H] hidden states (``B % num_microbatches == 0``).
        cos/sin: [B, S, D] rotary tables (microbatched alongside ``h``).
        mask: optional attention mask, broadcastable to [B, 1, S, S]; it is
            materialized at that shape so each microbatch slices its rows.
        plan: mesh + microbatch count.
        layer_fn: ``(h_mb, layer_params, cos_mb, sin_mb, mask_mb) → h_mb`` —
            applies ONE layer (``qwen3._layer_step`` without cache).
    Returns:
        [B, S, H] hidden states after all ``L`` layers, replicated over ``pp``.
    """
    pp = plan.pp
    M = plan.num_microbatches
    B, S, _ = h.shape
    L = jax.tree.leaves(layers)[0].shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    if L % pp:
        raise ValueError(f"{L} layers not divisible by pp={pp}")

    if mask is None:
        mask_b = jnp.ones((B, 1, S, S), bool)
    else:
        mask_b = jnp.broadcast_to(mask, (B, 1, S, S))

    if pp == 1:
        # no pipeline axis — plain (checkpointed) scan, no shard_map
        @jax.checkpoint
        def one(hh, lp):
            return layer_fn(hh, lp, cos, sin, mask_b), None

        out, _ = jax.lax.scan(one, h, layers)
        return out

    def body(stage_layers, h, cos, sin, mask_b):
        r = jax.lax.axis_index("pp")
        mb = B // M

        def split(x):
            return x.reshape((M, mb) + x.shape[1:])

        h_mb, cos_mb, sin_mb, mask_mb = split(h), split(cos), split(sin), split(mask_b)

        def stage_apply(x, c, s, m):
            @jax.checkpoint
            def one(hh, lp):
                return layer_fn(hh, lp, c, s, m), None

            x, _ = jax.lax.scan(one, x, stage_layers)
            return x

        perm = [(i, i + 1) for i in range(pp - 1)]

        def tick(recv, t):
            # rank r works on microbatch t - r; clamp covers bubble ticks
            # (their outputs never reach the collected window below)
            i = jnp.clip(t - r, 0, M - 1)
            x = jnp.where(r == 0, h_mb[i], recv)
            y = stage_apply(x, cos_mb[i], sin_mb[i], mask_mb[i])
            return jax.lax.ppermute(y, "pp", perm), y

        # initial carry must carry the same varying-manual-axes type as the
        # ppermuted output (jax>=0.9 vma check)
        init = jax.lax.pcast(jnp.zeros_like(h_mb[0]), ("pp",), to="varying")
        _, ys = jax.lax.scan(tick, init, jnp.arange(M + pp - 1))
        # ticks pp-1 .. M+pp-2 on the LAST rank are microbatches 0..M-1
        out = ys[pp - 1 :].reshape(h.shape)
        out = jnp.where(r == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pp")

    return jax.shard_map(
        body,
        mesh=plan.mesh,
        in_specs=(P("pp"), P(), P(), P(), P()),
        out_specs=P(),
        axis_names={"pp"},
    )(layers, h, cos, sin, mask_b)
