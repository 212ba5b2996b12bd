"""Weight-only int8 quantization (W8A16) with a Pallas TPU matmul kernel.

Decode of a 4B dense model is HBM-bandwidth-bound (measured: the bf16 decode
step sits exactly at the weight+KV streaming floor). Halving weight bytes with
per-output-channel int8 is the standard serving lever; XLA's
``w8.astype(bf16) * scale`` dequant reaches only ~70% of int8-ideal bandwidth
on this chip, so the hot path uses a Pallas kernel that DMA-pipelines int8
weight tiles into VMEM and fuses dequantization into the MXU feed.

Quantization scheme: symmetric per-output-channel — ``w8 = round(w / s)``,
``s[n] = max|w[:, n]| / 127`` — the ubiquitous W8A16 recipe (bf16 activations,
bf16 accumulation via MXU with fp32 preferred element type).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_channel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., K, N] → {"w8": int8 [..., K, N], "scale": bf16 [..., 1, N]}."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    w8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": s.astype(jnp.bfloat16)}


def _w8a16_kernel(x_ref, w8_ref, s_ref, out_ref):
    w = w8_ref[:].astype(jnp.bfloat16) * s_ref[:]
    out_ref[:] = jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_n", "interpret"))
def w8a16_matmul(
    x: jnp.ndarray,
    w8: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x @ dequant(w8, scale)`` via Pallas.

    Args:
        x: [M, K] bf16 (M is the flattened batch; callers reshape).
        w8: [K, N] int8.
        scale: [1, N] or [N] bf16 per-output-channel scales.
    Returns:
        [M, N] in x.dtype.
    """
    M, K = x.shape
    K2, N = w8.shape
    assert K == K2, (x.shape, w8.shape)
    scale = scale.reshape(1, N)
    block_n = min(block_n, N)
    assert N % block_n == 0, (N, block_n)

    grid = (N // block_n,)
    return pl.pallas_call(
        _w8a16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N + M * K * 2 + M * N * 2,
            transcendentals=0,
        ),
    )(x, w8, scale)


def _w8a8_kernel(x8_ref, xs_ref, w8_ref, ws_ref, out_ref):
    acc = jax.lax.dot_general(
        x8_ref[:], w8_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * xs_ref[:].astype(jnp.float32) * ws_ref[:].astype(jnp.float32)
    ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_n", "interpret", "out_dtype"))
def w8a8_matmul(
    x8: jnp.ndarray,
    x_scale: jnp.ndarray,
    w8: jnp.ndarray,
    w_scale: jnp.ndarray,
    *,
    block_n: int = 512,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full-int8 matmul: ``(x8 @ w8) * x_scale * w_scale``.

    The int8×int8→int32 dot runs on the MXU with no dequantized weight tile in
    VMEM — DMA streams raw int8, which is what makes this kernel hit the int8
    bandwidth floor where the dequant-to-bf16 variant cannot.

    Args: x8 [M, K] int8, x_scale [M, 1], w8 [K, N] int8, w_scale [1, N].
    """
    M, K = x8.shape
    _, N = w8.shape
    w_scale = w_scale.reshape(1, N)
    x_scale = x_scale.reshape(M, 1)
    block_n = min(block_n, N)
    assert N % block_n == 0, (N, block_n)
    return pl.pallas_call(
        _w8a8_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N + M * K + M * N * 2,
            transcendentals=0,
        ),
    )(x8, x_scale, w8, w_scale)


# ---------------------------------------------------------------------------
# W4 (int4 group-wise) — decode is weight-streaming-bound, so halving weight
# bytes again over W8 is the next latency lever for single-query serving.
# Native jnp.int4 arrays cannot cross jit boundaries on this backend (dispatch
# recursion bug), so storage is two nibbles per int8 byte. Layout matters for
# XLA fusion: packed byte row i holds source row i (low nibble) and row
# i + K/2 (high nibble) — a HALF-SPLIT, not an interleave — so the consuming
# matmul decomposes into two dots whose dequant (shift → bf16 → group-scale)
# is purely elementwise per operand and fuses into the MXU feed exactly like
# the int8 path does. (An interleaved stack→reshape unpack defeats fusion:
# XLA materializes the full bf16 matrix every step — measured 10× slower.)
# Group-wise scales along K (group=128) keep the quantization error well
# below per-channel int4.
# ---------------------------------------------------------------------------

W4_GROUP = 128


def quantize_per_group_w4(w: jnp.ndarray, *, group: int = W4_GROUP) -> Dict[str, jnp.ndarray]:
    """[K, N] → {"w4p": int8 [K//2, N] packed nibbles (low = rows [:K//2],
    high = rows [K//2:]), "gscale": bf16 [K//group, N]}.

    All intermediates stay int8 after the rounding step (no int32/uint8
    copies) — converting a 4B model must not peak far above the fp32 view of
    one matrix on a 16 GB chip.
    """
    K, N = w.shape
    group = min(group, K // 2)  # small test dims: keep the half-split legal
    assert K % 2 == 0 and K % group == 0 and (K // 2) % group == 0, (K, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    s = jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 7.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -7, 7).astype(jnp.int8).reshape(K, N)
    lo = q[: K // 2, :] & 0xF
    hi = q[K // 2 :, :] << 4
    packed = lo | hi
    return {"w4p": packed, "gscale": s[:, 0, :].astype(jnp.bfloat16)}


def _w4_halves(packed: jnp.ndarray, gscale: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed [K//2, N] + scales [K//g, N] → (bf16 [K//2, N] low-half rows,
    bf16 [K//2, N] high-half rows). Each half is elementwise over the packed
    bytes, so XLA fuses it into the consuming dot's operand read."""
    K2, N = packed.shape
    g = 2 * K2 // gscale.shape[0]
    s_lo = gscale[: K2 // g, :]
    s_hi = gscale[K2 // g :, :]
    lo = ((packed << 4) >> 4).astype(jnp.bfloat16)   # int8 arith: sign-extended low nibble
    hi = (packed >> 4).astype(jnp.bfloat16)          # arithmetic shift: signed high nibble
    lo = (lo.reshape(K2 // g, g, N) * s_lo[:, None, :]).reshape(K2, N)
    hi = (hi.reshape(K2 // g, g, N) * s_hi[:, None, :]).reshape(K2, N)
    return lo, hi


def _unpack_w4(packed: jnp.ndarray, gscale: jnp.ndarray) -> jnp.ndarray:
    """Full dequant to bf16 [K, N] (testing / fallback — the hot path never
    materializes this; see :func:`linear`)."""
    lo, hi = _w4_halves(packed, gscale)
    return jnp.concatenate([lo, hi], axis=0)


def _w4a16_kernel(x_ref, p_ref, s_ref, out_ref):
    K2 = p_ref.shape[0]
    bn = p_ref.shape[1]
    g = 2 * K2 // s_ref.shape[0]
    # Nibble unpack in the bf16 domain: Mosaic does not legalize vector
    # int8 shifts on this toolchain and int32 intermediates blow the VMEM
    # budget at prefill tile sizes; every byte value is exact in bf16, and
    # floor/mul/select lower fine on the VPU.
    # fp32 domain: v5e has no bf16 ALU (floor/select), and int8 shifts do not
    # legalize — fp32 floor/mul is the portable unpack
    pf = p_ref[:].astype(jnp.float32)
    hi = jnp.floor(pf * (1.0 / 16.0))         # == arithmetic >> 4 (signed)
    r = pf - hi * 16                          # low nibble bits in [0, 15]
    lo = r - 16 * jnp.floor(r * (1.0 / 8.0))  # sign-extend without a compare
    lo = lo.astype(jnp.bfloat16)
    hi = hi.astype(jnp.bfloat16)
    s = s_ref[:]
    lo = (lo.reshape(K2 // g, g, bn) * s[: K2 // g][:, None, :]).reshape(K2, bn)
    hi = (hi.reshape(K2 // g, g, bn) * s[K2 // g :][:, None, :]).reshape(K2, bn)
    acc = jnp.dot(x_ref[:, :K2], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, K2:], hi, preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_n", "block_m", "interpret"))
def w4a16_matmul(
    x: jnp.ndarray,
    w4p: jnp.ndarray,
    gscale: jnp.ndarray,
    *,
    block_n: int = 128,
    block_m: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x @ dequant_w4(w4p, gscale)`` via Pallas: DMA streams the packed int8
    nibbles (half the W8 bytes), unpack + group-scale happen in VMEM feeding
    the MXU. x [M, K] bf16, w4p [K//2, N] int8, gscale [K//group, N].

    Grid is (N-blocks outer, M-blocks inner) so the packed weight tile stays
    resident across the whole M sweep and each byte is DMA'd exactly once.
    """
    M, K = x.shape
    K2, N = w4p.shape
    assert K == 2 * K2, (x.shape, w4p.shape)
    block_n = min(block_n, N)
    block_m = min(block_m, M)
    assert N % block_n == 0, (N, block_n)
    grid = (N // block_n, pl.cdiv(M, block_m))
    return pl.pallas_call(
        _w4a16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gscale.shape[0], block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N // 2 + M * K * 2 + M * N * 2,
            transcendentals=0,
        ),
    )(x, w4p, gscale)


def quantize_activations(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row symmetric int8: [M, K] → (int8 [M, K], scale [M, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    x8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return x8, s


# Implementation selector for quantized matmuls. Measured on this chip
# (B=128 decode shapes): XLA's fused dequant streams int8 at ~357 GB/s vs
# ~290 GB/s for the current Pallas W8A8 and ~234 GB/s for Pallas W8A16 —
# the XLA path wins today; the kernels stay for further Mosaic tuning.
_QUANT_IMPL = "xla"


def set_quant_impl(impl: str) -> None:
    """'xla' | 'pallas_w8a8' | 'pallas_w8a16' (affects tracing; set before jit).

    Applies to W8 dicts only; W4 dicts always take the fused-XLA unpack path
    (measured fastest — see BASELINE.md chip notes).
    """
    global _QUANT_IMPL
    assert impl in ("xla", "pallas_w8a8", "pallas_w8a16"), impl
    _QUANT_IMPL = impl


def linear(x: jnp.ndarray, w, *, interpret: bool = False) -> jnp.ndarray:
    """``x @ w`` where ``w`` is a dense array or a quantized dict (W8 or W4).

    Accepts x of shape [..., K]; quantized paths flatten leading dims.
    """
    if not isinstance(w, dict):
        return x @ w
    if "w4p" in w:
        return _w4_linear(x, w)
    if _QUANT_IMPL == "xla":
        return x @ (w["w8"].astype(x.dtype) * w["scale"].astype(x.dtype))
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if _QUANT_IMPL == "pallas_w8a16":
        y = w8a16_matmul(x2, w["w8"], w["scale"], interpret=interpret)
    else:
        x8, xs = quantize_activations(x2)
        y = w8a8_matmul(x8, xs, w["w8"], w["scale"], interpret=interpret, out_dtype=x.dtype)
    return y.reshape(*lead, -1)


# W4 matmul implementation. Candidates measured on-chip (see BASELINE.md;
# W8 reference 235 ms for prefill-157 + 32-token decode at B=1):
# - "two_dot" (401 ms): x_lo @ dequant(lo) + x_hi @ dequant(hi); XLA does NOT
#   fuse the shift-based nibble unpack into the dot operand — it materializes
#   the bf16 halves every step.
# - "group_dot" (666 ms): per-group batched dot, scales on partial outputs;
#   worse — tiny per-group dots starve the MXU.
# - "pallas" (default on TPU): explicit VMEM unpack kernel (w4a16_matmul) —
#   DMA streams only the packed bytes.
_W4_IMPL = "auto"  # auto → pallas on TPU, two_dot elsewhere (CPU tests)


def set_w4_impl(impl: str) -> None:
    """'auto' | 'two_dot' | 'group_dot' | 'pallas' (affects tracing; set before jit)."""
    global _W4_IMPL
    assert impl in ("auto", "two_dot", "group_dot", "pallas"), impl
    _W4_IMPL = impl


def _w4_linear(x: jnp.ndarray, w) -> jnp.ndarray:
    packed, gscale = w["w4p"], w["gscale"]
    K2 = packed.shape[-2]
    impl = _W4_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "two_dot"
    if impl == "two_dot":
        lo, hi = _w4_halves(packed, gscale)
        return x[..., :K2] @ lo.astype(x.dtype) + x[..., K2:] @ hi.astype(x.dtype)
    if impl == "pallas":
        lead = x.shape[:-1]
        y = w4a16_matmul(x.reshape(-1, x.shape[-1]), packed, gscale)
        return y.reshape(*lead, -1)
    # group_dot — no concat/copy of the packed bytes: one batched dot per
    # nibble half, scales applied to the [G/2, M, N] partial outputs
    N = packed.shape[-1]
    G = gscale.shape[-2]          # total groups over the full K
    g = 2 * K2 // G               # group size
    lead = x.shape[:-1]
    x3 = x.reshape(-1, G, g)      # [M, G, g] — groups in original K order
    sf = gscale.astype(jnp.float32)

    def half(xh, qh, sh):
        partial = jnp.einsum(
            "mGk,Gkn->Gmn", xh, qh.astype(x.dtype), preferred_element_type=jnp.float32
        )
        return jnp.einsum("Gmn,Gn->mn", partial, sh)

    y = half(x3[:, : G // 2], ((packed << 4) >> 4).reshape(G // 2, g, N), sf[: G // 2])
    y += half(x3[:, G // 2 :], (packed >> 4).reshape(G // 2, g, N), sf[G // 2 :])
    return y.astype(x.dtype).reshape(*lead, N)


def dequantize(w) -> jnp.ndarray:
    """Quantized dict → dense bf16 (testing / fallback)."""
    if not isinstance(w, dict):
        return w
    if "w4p" in w:
        return _unpack_w4(w["w4p"], w["gscale"])
    return w["w8"].astype(jnp.bfloat16) * w["scale"]
