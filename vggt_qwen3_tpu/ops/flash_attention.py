"""Pallas TPU flash attention (online-softmax, fp32 accumulation).

Serves the attention families the north star names (BASELINE.json): VGGT
frame-wise attention ([B·S, ~1.4k tokens]), VGGT global cross-view attention
([B, S·1.4k tokens]) — both non-causal — and Qwen3 prefill (causal,
left-padded). Decode (S=1) stays on the XLA path: it is HBM-bandwidth-bound on
the KV stream and measured at the streaming floor.

Design: grid = (batch, q-head, q-blocks, kv-blocks) with the KV dimension
innermost; running (max, sum, acc) live in VMEM scratch across the KV sweep
and the output block is written on the last KV step. Memory is linear in
sequence length — at 16-view VGGT sizes (~16.5k tokens) XLA's materialized
softmax runs out of HBM while this kernel keeps working (measured); at 8 views
it is ~1.35× faster than the XLA path. GQA maps q-head → kv-head in the
BlockSpec index map (no K/V repetition).

Masking: ``kv_start``/``kv_end`` per batch row (left-padding start, valid
length end) plus optional causal slot ordering — slot-based causality matches
HF left-padded semantics (see ``models/qwen3.py``).

Backward: real Pallas kernels (flash-attention-2 style). The forward saves the
per-row logsumexp; ``dq`` recomputes P blockwise sweeping KV per q-block, and
``dk``/``dv`` sweep (grouped q-heads × q-blocks) per kv-block, accumulating in
VMEM — so training memory is linear in sequence length too (a 16-view VGGT
train step fits where a materialized [S,T] backward OOMs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    start_ref,  # [B] int32 (scalar prefetch)
    end_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, 1, bkv, D]
    v_ref,  # [1, 1, bkv, D]
    out_ref,  # [1, 1, bq, D]
    lse_ref,  # [1, 1, bq, 128] f32 or None (lane-broadcast logsumexp, for bwd)
    m_ref,  # scratch [bq, 1] f32
    l_ref,  # scratch [bq, 1] f32
    acc_ref,  # scratch [bq, D] f32
    *,
    scale: float,
    causal: bool,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)
    bq = q_ref.shape[2]
    bkv = k_ref.shape[2]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block_live = True
    if causal:
        # whole block in this q-block's future? skip its work entirely
        block_live = (j * bkv) <= (iq * bq + bq - 1)
    # This kernel is VPU-bound, not MXU-bound, at the vision/prefill shapes
    # (measured 36 ms vs a ~10 ms dot floor at [6, 8232, 16, 64]): the cost
    # is vector passes over the [bq, bkv] f32 score tile. Most blocks need
    # NO mask at all — the row frontier covers them entirely (vision
    # sequences are unpadded: start 0, end T, non-causal; interior blocks of
    # causal prefill likewise) — so the iota/compare/select passes (~5 of
    # the ~11 per-tile passes) run only on boundary blocks. The frontier is
    # scalar per (row, block), so full-validity is a scalar predicate.
    # Bit-identical: where(all-true, s, ·) ≡ s.
    full_rows = (j * bkv >= start_ref[b]) & ((j + 1) * bkv <= end_ref[b])
    if causal:
        # entire block strictly below the diagonal for every query row
        full_rows = full_rows & ((j + 1) * bkv - 1 <= iq * bq)

    def update(s, v):
        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    def scores():
        # QK at the NATIVE input precision with f32 accumulation: q/k are
        # bf16 in every production path and bf16-exact values gain nothing
        # from an f32 upcast; the scale folds onto the f32 scores (one f32
        # rounding instead of one per q element).
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bq, bkv]

    @pl.when(block_live & full_rows)
    def _():
        update(scores(), v_ref[0, 0])

    @pl.when(block_live & jnp.logical_not(full_rows))
    def _():
        q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        kv_pos = j * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        valid = (kv_pos >= start_ref[b]) & (kv_pos < end_ref[b])
        if causal:
            valid = valid & (kv_pos <= q_pos)
        update(jnp.where(valid, scores(), NEG_INF), v_ref[0, 0])

    @pl.when(j == num_kv - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)
        out_ref[0, 0] = out.astype(out_ref.dtype)
        if lse_ref is not None:
            # dead rows (never saw a valid kv: m still NEG_INF) keep lse at
            # NEG_INF — the backward kernels zero them explicitly
            lse = jnp.where(
                m_ref[:, :1] > NEG_INF * 0.5,
                m_ref[:, :1] + jnp.log(jnp.maximum(l_ref[:, :1], 1e-30)),
                NEG_INF,
            )  # [bq, 1]
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    **kw,
) -> jnp.ndarray:
    """Flash attention. Layouts match :func:`ops.attention.mha`:

    Args:
        q: [B, S, NH, D]; k, v: [B, T, NKV, D] with NH % NKV == 0.
        causal: slot-ordering causal mask (q slot i attends kv slots ≤ i;
            requires S == T, the prefill case).
        kv_start/kv_end: [B] int32 valid-slot bounds (left padding / length);
            default all slots valid.
    Returns:
        [B, S, NH, D] in q.dtype.
    """
    return _flash_attention_impl(q, k, v, return_lse=False, **kw)


def flash_attention_with_lse(q, k, v, **kw):
    """Like :func:`flash_attention` but also returns the per-row logsumexp
    ([B, NH, S] f32; dead rows hold ``NEG_INF``) — the combining statistic
    for chunked/ring attention. Fully differentiable: the lse cotangent
    folds into the backward's delta term."""
    return _flash_attention_impl(q, k, v, return_lse=True, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret", "return_lse"),
)
def _flash_attention_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_start: Optional[jnp.ndarray] = None,
    kv_end: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: bool = False,
    return_lse: bool = False,
):
    B, S, NH, D = q.shape
    _, T, NKV, _ = k.shape
    group = NH // NKV
    if scale is None:
        scale = D**-0.5
    if kv_start is None:
        kv_start = jnp.zeros((B,), jnp.int32)
    if kv_end is None:
        kv_end = jnp.full((B,), T, jnp.int32)

    # Auto block sizes: at short/mid sequences one full (pad-to-128) block per
    # axis wins — grid overhead dominates the tiny per-program work at the
    # vision shapes ([~1k tokens, D=64]: 0.69 ms vs 1.39 ms measured on chip
    # for 256/512 blocks); long sequences sweep 512×1024 tiles.
    def _auto(n: int, cap: int) -> int:
        full = -(-n // 128) * 128
        return full if full <= 2048 else cap

    q_explicit = block_q is not None
    kv_explicit = block_kv is not None
    if block_q is None:
        block_q = _auto(S, 512)
    if block_kv is None:
        block_kv = _auto(T, 1024)
    # cap the [bq, bkv] fp32 score/prob tile: 1152² (~5.3 MB, the measured
    # vision shape) is safe alongside q/k/v/acc tiles; independent 2048 caps
    # would allow a 16 MB tile that blows the ~16 MB VMEM budget for
    # sequences in the (1152, 2048] band. Explicitly passed blocks are the
    # caller's tuning contract (hard error); auto-selected ones shrink to fit
    # around them.
    _CAP = 1152 * 1152
    if block_q * block_kv > _CAP and q_explicit and kv_explicit:
        raise ValueError(
            f"explicit block_q={block_q} × block_kv={block_kv} exceeds the "
            f"~16 MB VMEM score-tile budget (cap {_CAP}); pass "
            "smaller blocks or omit them for auto selection"
        )
    while block_q * block_kv > _CAP:
        can_q = not q_explicit and block_q > 128
        can_kv = not kv_explicit and block_kv > 128
        if not (can_q or can_kv):
            which = f"block_q={block_q}" if q_explicit else f"block_kv={block_kv}"
            raise ValueError(
                f"explicit {which} exceeds the ~16 MB VMEM score-tile budget "
                f"(cap {_CAP}) even with the minimal 128 partner block"
            )
        if can_q and (not can_kv or block_q >= block_kv):
            block_q = max(128, block_q // 2)
        else:
            block_kv = max(128, block_kv // 2)
    # never exceed the (8-aligned) sequence itself; keeps tiny explicit test
    # blocks intact and avoids over-padding when S is just above a multiple
    block_q = max(8, min(block_q, -(-S // 8) * 8))
    block_kv = max(8, min(block_kv, -(-T // 8) * 8))

    def forward(q, k, v, kv_start, kv_end, *, with_lse: bool):
        # head-major layout for per-(b, h) programs
        qh = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)  # [B, NH, S', D]
        kh = _pad_to(k.transpose(0, 2, 1, 3), 2, block_kv)  # [B, NKV, T', D]
        vh = _pad_to(v.transpose(0, 2, 1, 3), 2, block_kv)
        Sp, Tp = qh.shape[2], kh.shape[2]
        kv_end = jnp.minimum(kv_end.astype(jnp.int32), T)

        grid = (B, NH, Sp // block_q, Tp // block_kv)
        kernel = functools.partial(_flash_kernel, scale=scale, causal=causal)
        out_shape = [jax.ShapeDtypeStruct((B, NH, Sp, D), q.dtype)]
        out_specs = [pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0))]
        if with_lse:
            # lane-broadcast [B, NH, Sp, 128] (rank-3 blocks violate the
            # Mosaic (8, 128) tiling rule; same convention as jax's own
            # pallas.ops.tpu.flash_attention MIN_BLOCK_SIZE residuals)
            out_shape.append(jax.ShapeDtypeStruct((B, NH, Sp, 128), jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j, *_: (b, h, i, 0))
            )
        else:
            kernel = functools.partial(_no_lse_kernel, kernel)
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                    pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                    pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                ],
                out_specs=out_specs if with_lse else out_specs[0],
                scratch_shapes=[
                    pltpu.VMEM((block_q, 1), jnp.float32),
                    pltpu.VMEM((block_q, 1), jnp.float32),
                    pltpu.VMEM((block_q, D), jnp.float32),
                ],
            ),
            out_shape=out_shape if with_lse else out_shape[0],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * NH * S * T * D,
                bytes_accessed=(B * NH * S * D + 2 * B * NKV * T * D) * 2,
                transcendentals=B * NH * S * T,
            ),
        )(kv_start.astype(jnp.int32), kv_end, qh, kh, vh)
        if with_lse:
            out, lse = outs
            return out[:, :, :S].transpose(0, 2, 1, 3), (out, lse)
        return outs[:, :, :S].transpose(0, 2, 1, 3)

    bwd = functools.partial(
        _flash_backward,
        scale=scale, causal=causal, group=group, S=S, T=T,
        block_q=block_q, block_kv=block_kv, interpret=interpret,
    )

    if not return_lse:

        @jax.custom_vjp
        def fa(q, k, v, kv_start, kv_end):
            return forward(q, k, v, kv_start, kv_end, with_lse=False)

        def fa_fwd(q, k, v, kv_start, kv_end):
            out, (_, lse) = forward(q, k, v, kv_start, kv_end, with_lse=True)
            # residuals keep ONE lane of lse (the kernel writes it
            # lane-broadcast to [.., 128] for Mosaic tiling, a 128× waste as
            # a saved activation) and reconstruct the padded head-major out
            # from the public output in the bwd — the live residual set stays
            # ~[B,NH,S] + inputs, linear in sequence
            return out, (q, k, v, kv_start, kv_end, out, lse[..., :1])

        def fa_bwd(res, g):
            q, k, v, kv_start, kv_end, out, lse1 = res
            out_h = _pad_to(out.transpose(0, 2, 1, 3), 2, block_q)
            lse = jnp.broadcast_to(lse1, lse1.shape[:-1] + (128,))
            dq, dk, dv = bwd(q, k, v, kv_start, kv_end, out_h, lse, g)
            return dq, dk, dv, None, None

        fa.defvjp(fa_fwd, fa_bwd)
        return fa(q, k, v, kv_start, kv_end)

    @jax.custom_vjp
    def fa2(q, k, v, kv_start, kv_end):
        out, (_, lse) = forward(q, k, v, kv_start, kv_end, with_lse=True)
        return out, lse[:, :, :S, 0]

    def fa2_fwd(q, k, v, kv_start, kv_end):
        out, (_, lse) = forward(q, k, v, kv_start, kv_end, with_lse=True)
        return (out, lse[:, :, :S, 0]), (q, k, v, kv_start, kv_end, out, lse[..., :1])

    def fa2_bwd(res, gs):
        g, g_lse = gs
        q, k, v, kv_start, kv_end, out, lse1 = res
        out_h = _pad_to(out.transpose(0, 2, 1, 3), 2, block_q)
        lse = jnp.broadcast_to(lse1, lse1.shape[:-1] + (128,))
        dq, dk, dv = bwd(q, k, v, kv_start, kv_end, out_h, lse, g, g_lse=g_lse)
        return dq, dk, dv, None, None

    fa2.defvjp(fa2_fwd, fa2_bwd)
    return fa2(q, k, v, kv_start, kv_end)


def _no_lse_kernel(kernel, start_ref, end_ref, q_ref, k_ref, v_ref, out_ref, *scratch):
    kernel(start_ref, end_ref, q_ref, k_ref, v_ref, out_ref, None, *scratch)


def _flash_bwd_dq_kernel(
    start_ref, end_ref,  # [B] int32 (scalar prefetch)
    q_ref, k_ref, v_ref, do_ref,  # [1,1,bq,D] / [1,1,bkv,D] / [1,1,bkv,D] / [1,1,bq,D]
    lse_ref, delta_ref,  # [1,1,bq,128] f32 (lane-broadcast)
    dq_ref,  # out [1,1,bq,D]
    acc_ref,  # scratch [bq,D] f32
    *, scale: float, causal: bool,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)
    bq, bkv = q_ref.shape[2], k_ref.shape[2]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block_live = (j * bkv) <= (iq * bq + bq - 1) if causal else True
    # same boundary-only masking as the forward kernel (see _flash_kernel):
    # fully-covered blocks skip the iota/compare/select passes AND the
    # dead-row guard (a row inside a fully-covered block cannot be dead)
    full_rows = (j * bkv >= start_ref[b]) & ((j + 1) * bkv <= end_ref[b])
    if causal:
        full_rows = full_rows & ((j + 1) * bkv - 1 <= iq * bq)

    def scores():
        # native-precision QK recompute — bit-matches the forward's score
        # path (dot(q, k)·scale at input precision) at the bf16 MXU rate
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    def work(p):
        # do·v at native precision; the f32 ds·k dot keeps dq's precision
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0, :, :1])
        acc_ref[:] += jax.lax.dot_general(
            ds, k_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    lse_row = lse_ref[0, 0, :, :1]  # [bq, 1]

    @pl.when(block_live & full_rows)
    def _():
        work(jnp.exp(scores() - lse_row))

    @pl.when(block_live & jnp.logical_not(full_rows))
    def _():
        q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        kv_pos = j * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        valid = (kv_pos >= start_ref[b]) & (kv_pos < end_ref[b])
        if causal:
            valid = valid & (kv_pos <= q_pos)
        s = jnp.where(valid, scores(), NEG_INF)
        p = jnp.exp(s - lse_row)  # [bq, bkv]; 0 on invalid entries
        # dead rows (no valid kv): lse stays NEG_INF and f32 absorption makes
        # exp(s - lse) = 1, not a probability — zero them out. Their true
        # cotangents are always 0 (padding rows are loss-masked).
        p = jnp.where(lse_row <= NEG_INF * 0.5, 0.0, p)
        work(p)

    @pl.when(j == num_kv - 1)
    def _():
        dq_ref[0, 0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    start_ref, end_ref,  # [B] int32 (scalar prefetch)
    q_ref, k_ref, v_ref, do_ref,  # [1,1,bq,D] / [1,1,bkv,D] ×2 / [1,1,bq,D]
    lse_ref, delta_ref,  # [1,1,bq,128] f32 (lane-broadcast)
    dk_ref, dv_ref,  # out [1,1,bkv,D]
    dk_acc, dv_acc,  # scratch [bkv,D] f32
    *, scale: float, causal: bool, num_iq: int, block_q: int,
):
    b = pl.program_id(0)
    j = pl.program_id(2)
    t = pl.program_id(3)  # combined (group, q-block) sweep
    num_t = pl.num_programs(3)
    iq = t % num_iq
    bq, bkv = q_ref.shape[2], k_ref.shape[2]

    @pl.when(t == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    block_live = (j * bkv) <= (iq * bq + bq - 1) if causal else True
    full_rows = (j * bkv >= start_ref[b]) & ((j + 1) * bkv <= end_ref[b])
    if causal:
        full_rows = full_rows & ((j + 1) * bkv - 1 <= iq * bq)

    def scores():
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    def work(p):
        # same precision scheme as the dq kernel: QK recompute and do·v at
        # native (bf16) precision, f32 dots only where an f32 operand (p/ds)
        # carries real mantissa; scale folds onto s and onto dk at the end
        do = do_ref[0, 0]
        dv_acc[:] += jax.lax.dot_general(
            p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # p^T @ do → [bkv, D]
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0, :, :1])
        dk_acc[:] += jax.lax.dot_general(
            ds, q_ref[0, 0].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds^T @ q → [bkv, D] (× scale on flush)

    lse_row = lse_ref[0, 0, :, :1]

    @pl.when(block_live & full_rows)
    def _():
        work(jnp.exp(scores() - lse_row))

    @pl.when(block_live & jnp.logical_not(full_rows))
    def _():
        q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        kv_pos = j * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        valid = (kv_pos >= start_ref[b]) & (kv_pos < end_ref[b])
        if causal:
            valid = valid & (kv_pos <= q_pos)
        s = jnp.where(valid, scores(), NEG_INF)
        p = jnp.exp(s - lse_row)  # [bq, bkv]
        p = jnp.where(lse_row <= NEG_INF * 0.5, 0.0, p)  # dead rows (see dq kernel)
        work(p)

    @pl.when(t == num_t - 1)
    def _():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, kv_start, kv_end, out_h, lse, g, g_lse=None,
    *, scale, causal, group, S, T, block_q, block_kv, interpret,
):
    """Real Pallas backward: dq via a kv-sweep per q-block, dk/dv via a
    (group × q-block)-sweep per kv-block — probabilities recomputed blockwise
    from the saved logsumexp, so memory stays linear in sequence length
    (replaces the r1 XLA-recompute VJP that materialized [S, T] attention)."""
    B, _, NH, D = q.shape
    NKV = k.shape[2]

    qh = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)  # [B, NH, Sp, D]
    kh = _pad_to(k.transpose(0, 2, 1, 3), 2, block_kv)  # [B, NKV, Tp, D]
    vh = _pad_to(v.transpose(0, 2, 1, 3), 2, block_kv)
    doh = _pad_to(g.transpose(0, 2, 1, 3), 2, block_q)  # [B, NH, Sp, D]
    Sp, Tp = qh.shape[2], kh.shape[2]
    kv_end = jnp.minimum(kv_end.astype(jnp.int32), T)
    # delta_i = rowsum(dO ⊙ O), on the padded head-major layout (padded rows
    # 0); lane-broadcast to [B, NH, Sp, 128] like lse (Mosaic tiling rule)
    delta = jnp.sum(doh.astype(jnp.float32) * out_h.astype(jnp.float32), axis=-1)
    if g_lse is not None:
        # lse cotangent: dL/ds_ij gains p_ij·g_lse_i — algebraically the same
        # as shifting delta by −g_lse (dv is independent of lse)
        delta = delta - _pad_to(g_lse.astype(jnp.float32), 2, block_q)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (128,))

    num_iq, num_jkv = Sp // block_q, Tp // block_kv

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal)
    dqh = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, NH, num_iq, num_jkv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 128), lambda b, h, i, j, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, NH, Sp, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * NH * S * T * D,
            bytes_accessed=(2 * B * NH * S * D + 2 * B * NKV * T * D) * 2,
            transcendentals=B * NH * S * T,
        ),
    )(kv_start.astype(jnp.int32), kv_end, qh, kh, vh, doh, lse, delta)
    dq = dqh[:, :, :S].transpose(0, 2, 1, 3)

    # dk/dv: one program per (b, kv-head, kv-block); innermost sweeps the
    # group's q-heads × q-blocks, accumulating into VMEM scratch.
    def h_of(t):
        return t // num_iq

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, causal=causal, num_iq=num_iq, block_q=block_q
    )
    dkh, dvh = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, NKV, num_jkv, group * num_iq),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, hk, j, t, *_: (b, hk * group + h_of(t), t % num_iq, 0),
                ),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, hk, j, t, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, hk, j, t, *_: (b, hk, j, 0)),
                pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, hk, j, t, *_: (b, hk * group + h_of(t), t % num_iq, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_q, 128),
                    lambda b, hk, j, t, *_: (b, hk * group + h_of(t), t % num_iq, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_q, 128),
                    lambda b, hk, j, t, *_: (b, hk * group + h_of(t), t % num_iq, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_kv, D), lambda b, hk, j, t, *_: (b, hk, j, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, hk, j, t, *_: (b, hk, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, NKV, Tp, D), k.dtype),
            jax.ShapeDtypeStruct((B, NKV, Tp, D), v.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * NH * S * T * D,
            bytes_accessed=(2 * B * NH * S * D + 4 * B * NKV * T * D) * 2,
            transcendentals=B * NH * S * T,
        ),
    )(kv_start.astype(jnp.int32), kv_end, qh, kh, vh, doh, lse, delta)
    dk = dkh[:, :, :T].transpose(0, 2, 1, 3)
    dv = dvh[:, :, :T].transpose(0, 2, 1, 3)
    return dq, dk, dv
