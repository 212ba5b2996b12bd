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
    end0_ref,  # [B] int32 scalar prefetch: query 0's one-past-last valid slot
    base_ref,  # [R, 1] int32: kv-block base (head // group)·T per score-row
    jrow_ref,  # [R, 1] int32: query index per score-row (0 for S=1 decode)
    q_ref,  # [bb, R, D] with R = S·NH score rows
    k_ref,  # [1, bb, NKVT, D] int8 | bf16 (layer-indexed block of the cache)
    v_ref,  # [1, bb, NKVT, D]
    ks_ref,  # [1, bb, NKVT] bf16 or None
    vs_ref,  # [1, bb, NKVT] bf16 or None
    out_ref,  # [bb, R, D]
    *,
    scale: float,
    pv_split: bool = False,
):
    del li_ref  # only the BlockSpec index maps read it
    bb, R, D = q_ref.shape
    NKVT = k_ref.shape[2]

    # Division-free block-diagonal frontier mask: on a score-row's own kv
    # block, the within-block slot is d = col − base, and the frontier
    # bounds 0 ≤ start ≤ d < end0 + j ≤ T reject every off-diagonal column
    # by themselves (d < 0 or d ≥ T there). ``j`` is the query index within
    # a speculative verify block — each successive query sees one more slot
    # (in-block causality); plain decode passes j = 0. base/j arrive as tiny
    # host-computed operands — no vector int div/mod for Mosaic to legalize.
    col = jax.lax.broadcasted_iota(jnp.int32, (R, NKVT), 1)
    d_slot = col - base_ref[:, :]  # [R, NKVT]

    i = pl.program_id(0)
    for r in range(bb):  # static unroll; each row = two 2-D dots
        row = i * bb + r
        q = q_ref[r]  # [R, D]
        k = k_ref[0, r]  # [NKVT, D]
        if q.dtype == jnp.bfloat16 and k.dtype == jnp.int8:
            # int8 K entries are small integers — EXACT in bf16 — and q is
            # already bf16, so a bf16×bf16 MXU dot with f32 accumulation
            # produces bit-identical scores to the f32×f32 form (whose
            # operands are these same exact values upconverted) at ~4× the
            # f32 matmul rate. The executed QK/PV FLOPs dominate this
            # kernel's compute (NKV× block-diagonal overcount), so the dot
            # precision class, not the DMA, sets its speed at bench shapes.
            k = k.astype(jnp.bfloat16)
        else:
            q = q.astype(jnp.float32)
            k = k.astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, NKVT]
        if ks_ref is not None:
            s = s * (ks_ref[0, r : r + 1].astype(jnp.float32) * scale)
        else:
            s = s * scale
        valid = (d_slot >= start_ref[row]) & (d_slot < end0_ref[row] + jrow_ref[:, :])
        s = jnp.where(valid, s, NEG_INF)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)  # masked cols → exp(NEG_INF - m) = 0
        l = jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0, r : r + 1].astype(jnp.float32)
        if pv_split and v_ref.dtype == jnp.int8:
            # Two bf16 passes instead of one f32 dot (which Mosaic runs as
            # THREE bf16 passes): V is bf16-exact, so splitting the f32
            # probabilities into a bf16 head + bf16 residual loses only the
            # residual's own rounding (~2^-16 relative) — ~1.5× faster PV.
            # Opt-in (VGGT_ATTN_PV_SPLIT): not bit-identical to the XLA
            # path, so it must clear scripts/parity_decode_kernels.py on
            # chip before it can default on.
            vb = v_ref[0, r].astype(jnp.bfloat16)  # [NKVT, D]
            p_hi = p.astype(jnp.bfloat16)
            p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                p_hi, vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p_lo, vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            v = v_ref[0, r].astype(jnp.float32)  # [NKVT, D]
            pv = jax.lax.dot_general(
                p, v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [R, D]
        out_ref[r] = (pv / jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


def _pick_block_b(B: int, NKVT: int, D: int, itemsize: int) -> Optional[int]:
    """Largest TILE-LEGAL row-block dividing B whose K+V slabs fit VMEM.

    Legality: the int8-cache scale operands are blocked ``(1, bb, NKVT)``,
    and Mosaic requires a block's last two dims to be (multiple of 8,
    multiple of 128) or equal to the array dims — so ``bb`` must be a
    multiple of 8 or the whole batch. (bb = 4 at a 16-slot serve engine with
    a 288-token budget was the round-5 crash this guards against.)

    Budget tiers: prefer K+V blocks within ~4 MB (the pipeline double-buffers
    them, and scores/temps plus the row unroll need the rest of the ~16 MB
    VMEM); marginal shapes may stretch to 5.5 MB (~11 MB double-buffered)
    before falling back to the XLA path via a ``None`` return."""
    legal = [8] if B % 8 == 0 else ([B] if B < 8 else [])
    # (B < 8: a block equal to the full array dim is always legal)
    for budget in (4, 5.5):
        for bb in legal:
            if 2 * bb * NKVT * D * itemsize <= budget * 1024 * 1024:
                return bb
    return None


def decode_attention_eligible(
    B: int, NH: int, NKV: int, T: int, D: int, kv_dtype
) -> bool:
    """Static gate for the fused kernel: lane-exact head dim, tile-aligned T
    (the [NKV, T] flatten must be a layout no-op), a cache big enough for
    the kernel's fixed costs to amortize, and a tile-legal row block that
    fits the VMEM budget (else the XLA einsum path serves the shape)."""
    itemsize = jnp.dtype(kv_dtype).itemsize
    sublane = {1: 32, 2: 16, 4: 8}[itemsize]
    return (
        D == 128
        and NH % NKV == 0
        and T % sublane == 0
        and (NKV * T) % 128 == 0
        and B * T >= 4096  # tiny caches: XLA path is already fine
        and _pick_block_b(B, NKV * T, D, itemsize) is not None
    )


def _call_kernel(
    q2,  # [B, R, D] flattened score rows
    kf, vf, ksf, vsf,  # flattened stacked cache (+ scales or None)
    li, start, end0, base, jrow,
    *, scale, interpret, block_b,
):
    B, R, D = q2.shape
    NKVT = kf.shape[2]
    bb = block_b or _pick_block_b(B, NKVT, D, kf.dtype.itemsize)
    # Mosaic tile legality for the (1, bb, NKVT) scale blocks — interpret
    # mode (CPU tests) deliberately runs smaller bbs to cover the grid loop
    if not interpret:
        assert bb is not None and B % bb == 0 and (bb % 8 == 0 or bb == B), (
            f"illegal row block bb={bb} for B={B} NKVT={NKVT} — "
            "decode_attention_eligible should have routed this shape to XLA"
        )
    if bb is None:  # interpret-mode only (no VMEM budget to respect)
        bb = B if B < 8 else 8
    grid = (B // bb,)

    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    import os as _os

    kernel = functools.partial(
        _decode_kernel, scale=scale,
        pv_split=_os.environ.get("VGGT_ATTN_PV_SPLIT", "0") == "1",
    )
    if ksf is None:
        kernel = functools.partial(_nq_kernel, kernel)

    cache_spec = pl.BlockSpec(
        (1, bb, NKVT, D), lambda i, li_ref, *_: (li_ref[0], i, 0, 0)
    )
    scale_spec = pl.BlockSpec(
        (1, bb, NKVT), lambda i, li_ref, *_: (li_ref[0], i, 0)
    )
    row_spec = pl.BlockSpec((R, 1), lambda i, *_: (0, 0))
    in_specs = [
        row_spec,  # base
        row_spec,  # jrow
        pl.BlockSpec((bb, R, D), lambda i, *_: (i, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    operands = [base, jrow, q2, kf, vf]
    if ksf is not None:
        in_specs += [scale_spec, scale_spec]
        operands += [ksf, vsf]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, R, D), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, D), q2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * R * NKVT * D,
            bytes_accessed=2 * B * NKVT * D * kf.dtype.itemsize + 4 * B * R * D,
            transcendentals=B * R * NKVT,
        ),
    )(li_arr, start.astype(jnp.int32), end0.astype(jnp.int32), *operands)


def _flatten_cache(k, v, ks, vs):
    L, B, NKV, T, D = k.shape
    kf = k.reshape(L, B, NKV * T, D)  # pure views when T is tile-aligned
    vf = v.reshape(L, B, NKV * T, D)
    ksf = ks.reshape(L, B, NKV * T) if ks is not None else None
    vsf = vs.reshape(L, B, NKV * T) if vs is not None else None
    return kf, vf, ksf, vsf


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "block_b"))
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
    import numpy as _np

    B, NH, D = q.shape
    L, _, NKV, T, _ = k.shape
    group = NH // NKV
    if scale is None:
        scale = D**-0.5
    kf, vf, ksf, vsf = _flatten_cache(k, v, ks, vs)
    # the division-free in-kernel mask relies on 0 ≤ start ≤ end ≤ T
    start = jnp.clip(kv_start.astype(jnp.int32), 0, T)
    end0 = jnp.clip(kv_end.astype(jnp.int32), 0, T)
    base = jnp.asarray(_np.repeat(_np.arange(NKV) * T, group)[:, None], jnp.int32)
    jrow = jnp.zeros((NH, 1), jnp.int32)
    return _call_kernel(
        q, kf, vf, ksf, vsf, li, start, end0, base, jrow,
        scale=scale, interpret=interpret, block_b=block_b,
    )


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "block_b"))
def gqa_block_verify_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    li,
    kv_start: jnp.ndarray,
    kv_off: jnp.ndarray,
    ks: Optional[jnp.ndarray] = None,
    vs: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
    block_b: Optional[int] = None,
) -> jnp.ndarray:
    """Fused speculative block-verify attention: S = k+1 queries per row at
    per-row depths, query j seeing ``[kv_start, kv_off + j + 1)`` — the
    in-block-causal frontier both speculative engines build
    (``inference/speculative.py`` / ``slots._spec_chunk``). The S·NH score
    rows share one QK and one PV dot per batch row (better MXU occupancy
    than S=1) and the whole cache still streams exactly once.

    Args:
        q: [B, S, NH, D] verify-block queries.
        kv_off: [B] int32 — the block's write offset per row (query 0's
            frontier end minus one).
    Returns:
        [B, S, NH, D] in q's dtype.
    """
    import numpy as _np

    B, S, NH, D = q.shape
    L, _, NKV, T, _ = k.shape
    group = NH // NKV
    if scale is None:
        scale = D**-0.5
    kf, vf, ksf, vsf = _flatten_cache(k, v, ks, vs)
    start = jnp.clip(kv_start.astype(jnp.int32), 0, T)
    # end(r, j) = off + 1 + j must stay ≤ T for every j < S
    end0 = jnp.clip(kv_off.astype(jnp.int32) + 1, 0, T - (S - 1))
    base = jnp.asarray(
        _np.tile(_np.repeat(_np.arange(NKV) * T, group), S)[:, None], jnp.int32
    )
    jrow = jnp.asarray(_np.repeat(_np.arange(S), NH)[:, None], jnp.int32)
    out = _call_kernel(
        q.reshape(B, S * NH, D), kf, vf, ksf, vsf, li, start, end0, base, jrow,
        scale=scale, interpret=interpret, block_b=block_b,
    )
    return out.reshape(B, S, NH, D)


def _nq_kernel(
    kernel, li_ref, start_ref, end0_ref, base_ref, jrow_ref, q_ref, k_ref, v_ref, out_ref
):
    kernel(
        li_ref, start_ref, end0_ref, base_ref, jrow_ref, q_ref, k_ref, v_ref,
        None, None, out_ref,
    )
