"""Pallas TPU fused GQA decode attention over the head-major KV cache.

The one-token decode step is HBM-bandwidth-bound on the KV stream: at the
bench shape (4B model, B=368, T=160, int8 KV) each step reads the entire
~4.3 GB cache. The XLA einsum path (``ops.attention.mha_quantized_kv``)
materializes the fp32 score/prob tensors to HBM between its two einsums and
schedules the QK/PV dots as separate fusions; this kernel fuses
QK → mask → softmax → PV per batch-row so scores never leave VMEM, and reads
K/V exactly once in their native cache layout.

Design points (each answers a failure of the round-2/3 kernel attempts —
BASELINE.md "Fused decode-attention"):

- **Head-major cache** ``[L, B, NKV, T, D]`` (``qwen3.init_cache``): each
  (row, head) K/V history is a contiguous ``[T, D]`` slab, so the kernel DMAs
  whole rows without the per-head strided relayout that starved the r2
  kernel. With ``T`` tile-aligned the ``[L, B, NKV·T, D]`` flatten handed to
  the kernel is a pure view.
- **Whole stacked cache in, scalar-prefetched layer index**: the kernel is
  called once per layer inside the decoder's ``lax.scan``; its BlockSpec
  index map picks the layer via a prefetched scalar, so XLA never copies a
  per-layer cache slice to feed the custom call (the r3 sliced-operand
  variant copied ~250 MB/layer).
- **One 2-D dot per row via block-diagonal flattening**: per batch row the
  ``(NKV, T)`` axes flatten to one ``NKV·T`` key axis and ALL ``NH`` query
  heads dot against it in a single ``[NH, D] × [D, NKV·T]`` MXU op; the
  off-diagonal (query-head × foreign-kv-head) scores are masked before
  softmax, and the PV dot ``[NH, NKV·T] × [NKV·T, D]`` is exact because
  masked probabilities are zero. The ~``NKV``× FLOP overcount is noise for a
  bandwidth-bound op, and 2-D dots sidestep the Mosaic batched-``dot_general``
  "invalid vector register cast" bug that killed the r2 row-batched kernel.
- **Scales folded onto scores/probs** (int8 cache): per-(token, head) scales
  are scalar along ``D``, so they multiply the ``[NH, NKV·T]`` score/prob
  tiles and the int8 K/V enter their dots as pure converts — the same
  factorization the XLA path uses (``mha_quantized_kv``).

Masking is frontier-based: per row ``[kv_start, kv_end)`` valid slots
(left-padding start, causal frontier end) — exactly the structure of every
S=1 decode mask in the engine (``models/qwen3.py`` ``decode_frontier``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    li_ref,  # [1] int32 scalar prefetch: layer index (consumed by index maps)
    start_ref,  # [B] int32 scalar prefetch: first valid kv slot per row
    end_ref,  # [B] int32 scalar prefetch: one past last valid kv slot per row
    base_ref,  # [NH, 1] int32: (head // group)·T — see mask note below
    q_ref,  # [bb, NH, D]
    k_ref,  # [1, bb, NKVT, D] int8 | bf16 (layer-indexed block of the cache)
    v_ref,  # [1, bb, NKVT, D]
    ks_ref,  # [1, bb, NKVT] bf16 or None
    vs_ref,  # [1, bb, NKVT] bf16 or None
    out_ref,  # [bb, NH, D]
    *,
    scale: float,
    T: int,
    group: int,
):
    del li_ref  # only the BlockSpec index maps read it
    bb, NH, D = q_ref.shape
    NKVT = k_ref.shape[2]

    # Division-free block-diagonal frontier mask: on query-head h's own kv
    # block, the within-block slot is d = col − (h // group)·T, and the
    # frontier bounds 0 ≤ start ≤ d < end ≤ T reject every off-diagonal
    # column by themselves (d < 0 or d ≥ T there). base arrives as a tiny
    # host-computed operand — no vector int div/mod for Mosaic to legalize.
    col = jax.lax.broadcasted_iota(jnp.int32, (NH, NKVT), 1)
    d_slot = col - base_ref[:, :]  # [NH, NKVT]

    i = pl.program_id(0)
    for r in range(bb):  # static unroll; each row = two 2-D dots
        row = i * bb + r
        q = q_ref[r].astype(jnp.float32)  # [NH, D]
        k = k_ref[0, r].astype(jnp.float32)  # [NKVT, D]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NH, NKVT]
        if ks_ref is not None:
            s = s * (ks_ref[0, r : r + 1].astype(jnp.float32) * scale)
        else:
            s = s * scale
        valid = (d_slot >= start_ref[row]) & (d_slot < end_ref[row])
        s = jnp.where(valid, s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)  # masked cols → exp(NEG_INF - m) = 0
        l = jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0, r : r + 1].astype(jnp.float32)
        v = v_ref[0, r].astype(jnp.float32)  # [NKVT, D]
        pv = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NH, D]
        out_ref[r] = (pv / jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


def _pick_block_b(B: int, NKVT: int, D: int, itemsize: int) -> int:
    """Largest row-block dividing B whose double-buffered K+V slabs stay
    within a ~4 MB VMEM budget (scores/temps and the unroll need the rest of
    the ~16 MB)."""
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and 2 * bb * NKVT * D * itemsize <= 4 * 1024 * 1024:
            return bb
    return 1


def decode_attention_eligible(
    B: int, NH: int, NKV: int, T: int, D: int, kv_dtype
) -> bool:
    """Static gate for the fused kernel: lane-exact head dim, tile-aligned T
    (the [NKV, T] flatten must be a layout no-op), and a cache big enough for
    the kernel's fixed costs to amortize."""
    sublane = {1: 32, 2: 16, 4: 8}[jnp.dtype(kv_dtype).itemsize]
    return (
        D == 128
        and NH % NKV == 0
        and T % sublane == 0
        and (NKV * T) % 128 == 0
        and B * T >= 4096  # tiny caches: XLA path is already fine
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "block_b")
)
def gqa_decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    li,
    kv_start: jnp.ndarray,
    kv_end: jnp.ndarray,
    ks: Optional[jnp.ndarray] = None,
    vs: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
    block_b: Optional[int] = None,
) -> jnp.ndarray:
    """Fused single-token GQA decode attention over the stacked cache.

    Args:
        q: [B, NH, D] current-step queries (S=1 squeezed).
        k, v: the FULL stacked head-major cache [L, B, NKV, T, D]
            (int8 or bf16) — the layer is selected inside the kernel via
            ``li`` so no per-layer slice is ever materialized.
        li: layer index (traced scalar ok).
        kv_start, kv_end: [B] int32 valid-slot frontier per row.
        ks, vs: per-(token, head) scales [L, B, NKV, T] for the int8 cache.
    Returns:
        [B, NH, D] attention output in q's dtype.
    """
    B, NH, D = q.shape
    L, _, NKV, T, _ = k.shape
    group = NH // NKV
    NKVT = NKV * T
    if scale is None:
        scale = D**-0.5

    # Pure views when T is tile-aligned (decode_attention_eligible).
    kf = k.reshape(L, B, NKVT, D)
    vf = v.reshape(L, B, NKVT, D)
    ksf = ks.reshape(L, B, NKVT) if ks is not None else None
    vsf = vs.reshape(L, B, NKVT) if vs is not None else None

    bb = block_b or _pick_block_b(B, NKVT, D, kf.dtype.itemsize)
    grid = (B // bb,)

    # the division-free in-kernel mask relies on 0 ≤ start ≤ end ≤ T
    kv_start = jnp.clip(kv_start.astype(jnp.int32), 0, T)
    kv_end = jnp.clip(kv_end.astype(jnp.int32), 0, T)

    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    kernel = functools.partial(_decode_kernel, scale=scale, T=T, group=group)
    if ksf is None:
        kernel = functools.partial(_nq_kernel, kernel)

    cache_spec = pl.BlockSpec(
        (1, bb, NKVT, D), lambda i, li_ref, *_: (li_ref[0], i, 0, 0)
    )
    scale_spec = pl.BlockSpec(
        (1, bb, NKVT), lambda i, li_ref, *_: (li_ref[0], i, 0)
    )
    import numpy as _np

    base = jnp.asarray(_np.repeat(_np.arange(NKV) * T, group)[:, None], jnp.int32)
    in_specs = [
        pl.BlockSpec((NH, 1), lambda i, *_: (0, 0)),
        pl.BlockSpec((bb, NH, D), lambda i, *_: (i, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    operands = [base, q, kf, vf]
    if ksf is not None:
        in_specs += [scale_spec, scale_spec]
        operands += [ksf, vsf]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, NH, D), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, NH, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * NKVT * D,
            bytes_accessed=2 * B * NKVT * D * kf.dtype.itemsize + 4 * B * NH * D,
            transcendentals=B * NH * NKVT,
        ),
    )(li_arr, kv_start.astype(jnp.int32), kv_end.astype(jnp.int32), *operands)


def _nq_kernel(kernel, li_ref, start_ref, end_ref, base_ref, q_ref, k_ref, v_ref, out_ref):
    kernel(li_ref, start_ref, end_ref, base_ref, q_ref, k_ref, v_ref, None, None, out_ref)
