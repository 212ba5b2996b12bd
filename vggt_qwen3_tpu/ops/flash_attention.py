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

    q_pos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
    kv_pos = j * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    block_live = True
    if causal:
        # whole block in this q-block's future? skip its work entirely
        block_live = (j * bkv) <= (iq * bq + bq - 1)

    @pl.when(block_live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [bq, D]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bkv]
        valid = (kv_pos >= start_ref[b]) & (kv_pos < end_ref[b])
        if causal:
            valid = valid & (kv_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)

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

    @pl.when(j == num_kv - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_kv", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    kv_start: Optional[jnp.ndarray] = None,
    kv_end: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 512,
    interpret: bool = False,
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
    B, S, NH, D = q.shape
    _, T, NKV, _ = k.shape
    group = NH // NKV
    if scale is None:
        scale = D**-0.5
    if kv_start is None:
        kv_start = jnp.zeros((B,), jnp.int32)
    if kv_end is None:
        kv_end = jnp.full((B,), T, jnp.int32)

    block_q = min(block_q, max(S, 8))
    block_kv = min(block_kv, T)

    def forward(q, k, v, kv_start, kv_end):
        # head-major layout for per-(b, h) programs
        qh = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)  # [B, NH, S', D]
        kh = _pad_to(k.transpose(0, 2, 1, 3), 2, block_kv)  # [B, NKV, T', D]
        vh = _pad_to(v.transpose(0, 2, 1, 3), 2, block_kv)
        Sp, Tp = qh.shape[2], kh.shape[2]
        kv_end = jnp.minimum(kv_end.astype(jnp.int32), T)

        grid = (B, NH, Sp // block_q, Tp // block_kv)
        kernel = functools.partial(_flash_kernel, scale=scale, causal=causal)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                    pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                    pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((block_q, 1), jnp.float32),
                    pltpu.VMEM((block_q, 1), jnp.float32),
                    pltpu.VMEM((block_q, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, NH, Sp, D), q.dtype),
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
        return out[:, :, :S].transpose(0, 2, 1, 3)

    def reference(q, k, v, kv_start, kv_end):
        # semantics-equivalent XLA path (used only for the backward pass:
        # pallas_call has no autodiff rule, so differentiating through the
        # kernel — e.g. a train step whose param tree includes the vision
        # tower, even with stop_gradient downstream — would fail at trace)
        from .attention import combine_masks, make_causal_mask, mha

        kv_pos = jnp.arange(T)[None, :]
        masks = [
            (kv_pos >= kv_start[:, None])[:, None, None, :],
            (kv_pos < kv_end[:, None])[:, None, None, :],
        ]
        if causal:
            masks.append(make_causal_mask(S, T)[None, None])
        return mha(q, k, v, mask=combine_masks(*masks), scale=scale)

    @jax.custom_vjp
    def fa(q, k, v, kv_start, kv_end):
        return forward(q, k, v, kv_start, kv_end)

    def fa_fwd(q, k, v, kv_start, kv_end):
        return forward(q, k, v, kv_start, kv_end), (q, k, v, kv_start, kv_end)

    def fa_bwd(res, g):
        q, k, v, kv_start, kv_end = res
        _, vjp = jax.vjp(lambda q_, k_, v_: reference(q_, k_, v_, kv_start, kv_end), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None

    fa.defvjp(fa_fwd, fa_bwd)
    return fa(q, k, v, kv_start, kv_end)
