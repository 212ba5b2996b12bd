"""Weight-only quantization: W8 (per-channel int8) and W4 (group-int4 storage).

Decode of a 4B dense model is HBM-bandwidth-bound (measured: the bf16 decode
step sits exactly at the weight+KV streaming floor), so weight bytes ≈ decode
latency. W8 is the serving default: XLA fuses ``w8.astype(bf16) * scale``
into the matmul operand read, and the measured decode step (6.2 ms/token at
B=1 on the 4B model, 1× v5e) sits at the int8 streaming floor.

W4 halves the bytes again but is a **storage mode only** on the current
toolchain — every matmul formulation measured slower than the fused-W8 path
(reference: 235 ms for prefill-157 + 32-token decode at B=1):

- two XLA dots over packed-nibble halves with shift-unpack ....... 401 ms
  (XLA materializes the dequantized bf16 halves every step)
- per-group batched dots, scales on partial outputs .............. 666 ms
  (small per-group dots starve the MXU)
- Pallas VMEM-unpack kernel ...................................... 452 ms
  (7 projections × 36 layers = 252 kernel launches per decode step;
  launch overhead dominates at decode shapes)
- native ``jnp.int4`` via ``lax.bitcast_convert_type`` ........... 40 GB/s
  (XLA's s4→bf16 convert is scalarized on this runtime; the same loop
  streams int8 at 357–402 GB/s)

Also recorded: Mosaic does not legalize int8 vector shifts, v5e has no bf16
ALU (floor/select), and native int4 arrays cannot cross a jit boundary on the
axon backend (dispatch recursion). Earlier Pallas W8 matmul kernels reached
only 290 GB/s (W8A8) / 234 GB/s (W8A16) vs 357 GB/s for XLA's fused dequant
and were removed — same-launch-overhead story. Revisit W4 when XLA grows a
vectorized s4 convert: the group-scale epilogue is NOT the obstacle (int8 +
group scales measured 402 GB/s, *faster* than per-channel's 221 GB/s in the
same harness).

Quantization schemes:
- W8: symmetric per-output-channel — ``w8 = round(w / s)``,
  ``s[n] = max|w[:, n]| / 127`` (bf16 activations, fp32 MXU accumulation).
- W4: symmetric per-(group, channel), group = 128 along K, two nibbles per
  int8 byte with a half-split layout (low nibbles = rows [:K/2], high =
  rows [K/2:]) so the consuming matmul needs no interleave.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def quantize_per_channel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., K, N] → {"w8": int8 [..., K, N], "scale": bf16 [..., 1, N]}."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    w8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": s.astype(jnp.bfloat16)}


def quantize_activations(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row symmetric int8: [M, K] → (int8 [M, K], scale [M, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    x8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return x8, s


# ---------------------------------------------------------------------------
# W4 storage mode
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
    bf16 [K//2, N] high-half rows)."""
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
    """Full dequant to bf16 [K, N] (testing / fallback)."""
    lo, hi = _w4_halves(packed, gscale)
    return jnp.concatenate([lo, hi], axis=0)


def _w4_linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """Two dots over the K halves — the least-bad W4 matmul (see module
    docstring); a single dot over concat(lo, hi) would materialize twice."""
    packed, gscale = w["w4p"], w["gscale"]
    K2 = packed.shape[-2]
    lo, hi = _w4_halves(packed, gscale)
    return x[..., :K2] @ lo.astype(x.dtype) + x[..., K2:] @ hi.astype(x.dtype)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


A8_MARKER = "a8"


def mark_act_quant(w: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Tag a W8 dict so :func:`linear` runs it as int8×int8 (W8A8).

    The marker is a zero-size leaf: presence changes the pytree structure, so
    jit correctly retraces when switching serving modes (a global flag would
    silently reuse the stale trace for equal-shaped params). It keeps the
    stacked-layer leading dims (``[..., 0]``) so ``lax.scan`` over layers can
    slice it like every other leaf."""
    lead = w["w8"].shape[:-2]
    return dict(w, **{A8_MARKER: jnp.zeros(lead + (0,), jnp.int8)})


def linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """``x @ w`` where ``w`` is a dense array or a quantized dict.

    - W8 (``{"w8", "scale"}``): plain XLA matmul over ``int8 * scale`` — XLA
      fuses the dequant into the operand read (the int8 streaming floor);
      MXU runs at bf16 rate.
    - W8A8 (W8 dict + :func:`mark_act_quant` marker): activations quantize
      per-row to int8 and the dot runs native int8×int8→int32 on the MXU —
      2× the bf16 MXU rate; large-batch decode is ~half compute-bound, so
      this is the throughput serving mode (measured 11,011 vs 7,512 tok/s at
      B=368 — BASELINE.md).
    - W4 (``{"w4p", "gscale"}``): storage mode, see module docstring.
    """
    if not isinstance(w, dict):
        return x @ w
    if "w4p" in w:
        return _w4_linear(x, w)
    if A8_MARKER in w:
        if w["w8"].ndim != 2:
            raise ValueError(
                f"W8A8 linear expects a 2-D weight, got shape {w['w8'].shape}: "
                "stacked [L, K, N] W8A8 dicts must be sliced per layer first "
                "(e.g. inside lax.scan), unlike the plain-W8 branch which "
                "batches over leading dims"
            )
        lead = x.shape[:-1]
        x8, xs = quantize_activations(x.reshape(-1, x.shape[-1]))
        y = jax.lax.dot_general(
            x8, w["w8"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * xs * w["scale"].astype(jnp.float32)
        return y.astype(x.dtype).reshape(*lead, -1)
    return x @ (w["w8"].astype(x.dtype) * w["scale"].astype(x.dtype))


def dequantize(w) -> jnp.ndarray:
    """Quantized dict → dense bf16 (testing / fallback)."""
    if not isinstance(w, dict):
        return w
    if "w4p" in w:
        return _unpack_w4(w["w4p"], w["gscale"])
    return w["w8"].astype(jnp.bfloat16) * w["scale"]
