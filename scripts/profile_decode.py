"""Decode-step budget profiler (round-5 item 1 groundwork).

Measures, each in its own process (PROF_SECTION=...), at the bench shape
(B=368, T=160, W8 + int8 KV, Qwen3-4B):

- ``matmul``:  the full per-step matmul path (7 projections × 36 layers via
  lax.scan over stacked weights + LM head) with the real quant.linear W8
  dispatch, timed as N steps chained inside ONE jitted fori_loop (one fetch).
- ``attn``:    the fused decode-attention kernel alone, 36 layers/step.
- ``mlp``:     gate/up/down only (the kernel candidate's target).
- ``single``:  isolated [B,H]×[H,F] matmul variants — dense bf16, W8 fused
  dequant (scale on operand), W8 scale-on-output — MXU efficiency + whether
  XLA fuses the dequant.
- ``head``:    LM head [B,H]×[H,V] W8 variants.

The point: 35.5 ms/step measured (BENCH_r04) must decompose into
matmul + attention + rest before any kernel is written.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507 as CFG
from vggt_qwen3_tpu.ops import quant

B = int(os.environ.get("PROF_BATCH", "368"))
T = int(os.environ.get("PROF_T", "160"))
ITERS = int(os.environ.get("PROF_ITERS", "20"))
L, H, F, V = CFG.num_layers, CFG.hidden_size, CFG.intermediate_size, CFG.vocab_size
NH, NKV, D = CFG.num_heads, CFG.num_kv_heads, CFG.head_dim


def _fill_int8(shape, i=0):
    """Deterministic int8 fill, built ON DEVICE inside one jit, chunked over
    the leading axis — an eager whole-array f32 iota at the KV-cache shape
    is ~8.7 GB and OOMs the chip before the benchmark even starts."""

    def whole(sub, base):
        acc = jnp.zeros(sub, jnp.float32) + base
        for d in range(len(sub)):
            acc = acc + jax.lax.broadcasted_iota(jnp.float32, sub, d) * (5.0 + 2 * d)
        return (jnp.mod(acc + i, 251.0) - 125.0).astype(jnp.int8)

    total = int(np.prod(shape))
    if total * 4 <= 2 << 30:  # f32 working set fits comfortably
        return jax.jit(lambda: whole(shape, 0.0))()
    # chunk the f32 intermediate over the leading axis (the [L, B, NKV, T, D]
    # KV shapes are ~9 GB in f32 — whole-array OOMs the chip)
    return jax.jit(lambda: jax.lax.map(
        lambda j: whole(shape[1:], j.astype(jnp.float32) * 3.0),
        jnp.arange(shape[0])))()


def _w8(shape, i=0):
    K = shape[-2]
    return {
        "w8": _fill_int8(shape, i),
        "scale": jnp.full(shape[:-2] + (1, shape[-1]), 2e-4, jnp.bfloat16),
    }


def _time(fn, label, *args, reps=3):
    """Times ``jit(fn)(*args)``. Operands MUST be passed as ``args`` — a
    closure-captured device array bakes into the HLO as a literal constant,
    which the tunneled remote-compile helper rejects above ~100 MB
    (HTTP 413) and which distorts compile time for everything smaller."""
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(*args))
        times.append(time.time() - t0)
    dt = min(times)
    per = dt / ITERS * 1000
    print(f"{label}: {per:.3f} ms/step (compile {compile_s:.1f}s, "
          f"{dt*1000:.1f} ms / {ITERS} iters)", flush=True)
    return per


def section_matmul(mlp_only=False, quant_mode="w8"):
    layers = {
        "wq": _w8((L, H, NH * D), 1), "wk": _w8((L, H, NKV * D), 2),
        "wv": _w8((L, H, NKV * D), 3), "wo": _w8((L, NH * D, H), 4),
        "gate": _w8((L, H, F), 5), "up": _w8((L, H, F), 6),
        "down": _w8((L, F, H), 7),
    }
    head = _w8((H, V), 8)
    if quant_mode == "w8a8":
        layers = {k: quant.mark_act_quant(v) for k, v in layers.items()}
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, H)) * 0.02, jnp.bfloat16)

    fused = os.environ.get("PROF_FUSED") == "1"

    def layer_body(x, lp, li, ws):
        if not mlp_only:
            if fused:
                from vggt_qwen3_tpu.ops.decode_matmul import fused_linear_w8, fused_qkv_w8

                q, k, v = fused_qkv_w8(x, ws["wq"], ws["wk"], ws["wv"], li)
            else:
                q = quant.linear(x, lp["wq"])
                k = quant.linear(x, lp["wk"])
                v = quant.linear(x, lp["wv"])
            # stand-in for attention output: fold q/k/v into a [B, NH*D] "attn"
            a = q + jnp.tile(k, (1, NH // NKV)) * 1e-3 + jnp.tile(v, (1, NH // NKV)) * 1e-3
            if fused:
                from vggt_qwen3_tpu.ops.decode_matmul import fused_linear_w8

                x = x + fused_linear_w8(a, ws["wo"], li)
            else:
                x = x + quant.linear(a, lp["wo"])
        if fused:
            from vggt_qwen3_tpu.ops.decode_matmul import fused_mlp_w8

            x = x + fused_mlp_w8(x, ws["gate"], ws["up"], ws["down"], li)
        else:
            g = jax.nn.silu(quant.linear(x, lp["gate"])) * quant.linear(x, lp["up"])
            x = x + quant.linear(g, lp["down"])
        return x * 0.999, None  # keep magnitudes bounded over ITERS

    def step(x, layers, head):
        if fused:
            # the fused kernels index stacked weights via scalar prefetch
            x, _ = jax.lax.scan(
                lambda xx, li: layer_body(xx, None, li, layers),
                x, jnp.arange(L))
        elif quant_mode == "w8a8":
            # W8A8 linear requires 2-D weights: scan slices the stacked dicts
            x, _ = jax.lax.scan(lambda xx, lp: layer_body(xx, lp, None, None), x, layers)
        else:
            x, _ = jax.lax.scan(lambda xx, lp: layer_body(xx, lp, None, None), x, layers)
        logits = quant.linear(x, head).astype(jnp.float32)
        # fold logits back so the head can't be DCE'd; tiny reduce
        return x + (logits.sum(-1, keepdims=True) * 1e-12).astype(x.dtype)

    def run(x0, layers, head):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, x: step(x, layers, head), x0).sum()

    name = "mlp_path" if mlp_only else "matmul_path"
    if fused:
        name += "+fused_kernels"
    _time(run, f"{name}[{quant_mode}] (B={B})", x0, layers, head)


def section_attn():
    from vggt_qwen3_tpu.ops.decode_attention import gqa_decode_attention

    k = _fill_int8((L, B, NKV, T, D), 1)
    v = _fill_int8((L, B, NKV, T, D), 2)
    ks = jnp.full((L, B, NKV, T), 2e-2, jnp.bfloat16)
    vs = jnp.full((L, B, NKV, T), 2e-2, jnp.bfloat16)
    start = jnp.zeros((B,), jnp.int32)
    end = jnp.full((B,), T, jnp.int32)
    q0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, NH, D)) * 0.1, jnp.bfloat16)

    def step(q, k, v, ks, vs, start, end):
        def body(qq, li):
            o = gqa_decode_attention(qq, k, v, li, start, end, ks, vs)
            return o * 0.999, None
        q, _ = jax.lax.scan(body, q, jnp.arange(L))
        return q

    def run(q0, k, v, ks, vs, start, end):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, q: step(q, k, v, ks, vs, start, end), q0).sum()

    _time(run, f"attn_kernel (B={B}, T={T}, {L} layers)",
          q0, k, v, ks, vs, start, end)


def section_single():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H)) * 0.1, jnp.bfloat16)
    wq = _w8((H, F))
    wd = (wq["w8"].astype(jnp.bfloat16) * wq["scale"]).astype(jnp.bfloat16)
    flops = 2 * B * H * F
    for label, fn in [
        ("dense bf16", lambda xx, w, q: xx @ w),
        ("W8 fused dequant (operand)",
         lambda xx, w, q: xx @ (q["w8"].astype(jnp.bfloat16) * q["scale"])),
        ("W8 scale-on-output",
         lambda xx, w, q: (xx @ q["w8"].astype(jnp.bfloat16)) * q["scale"][0]),
    ]:
        def run(x0, w, q, f=fn):
            def body(i, xx):
                y = f(xx, w, q)
                return xx + (y.sum(-1, keepdims=True) * 1e-9).astype(xx.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x0).sum()
        per = _time(run, f"single[{label}] [{B},{H}]x[{H},{F}]", x, wd, wq)
        print(f"   → {flops/per*1e-9:.1f} TFLOP/s, weight stream {H*F/per*1e-6:.0f} GB/s(int8-equiv)",
              flush=True)


def section_head():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H)) * 0.1, jnp.bfloat16)
    emb = {  # tied embedding layout [V, H], per-row scales (the real bench path)
        "w8": _fill_int8((V, H)),
        "scale": jnp.full((V, 1), 2e-4, jnp.bfloat16),
    }
    flops = 2 * B * H * V

    def head(xx, emb):
        y = jnp.einsum("bh,vh->bv", xx, emb["w8"].astype(xx.dtype),
                       preferred_element_type=jnp.float32)
        return y * emb["scale"][:, 0].astype(jnp.float32)

    def run(x0, emb):
        def body(i, xx):
            y = head(xx, emb)
            return xx + (y.sum(-1, keepdims=True) * 1e-12).astype(xx.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x0).sum()

    per = _time(run, f"lm_head [{B},{H}]x[{V},{H}]^T W8", x, emb)
    print(f"   → {flops/per*1e-9:.1f} TFLOP/s, weight stream {V*H/per*1e-6:.0f} GB/s(int8)",
          flush=True)


if __name__ == "__main__":
    sec = os.environ.get("PROF_SECTION", "single")
    print(f"profile_decode: section={sec} B={B} T={T} iters={ITERS} "
          f"backend={jax.default_backend()}", flush=True)
    if sec == "matmul":
        section_matmul(quant_mode=os.environ.get("PROF_QUANT", "w8"))
    elif sec == "mlp":
        section_matmul(mlp_only=True)
    elif sec == "attn":
        section_attn()
    elif sec == "single":
        section_single()
    elif sec == "head":
        section_head()
    else:
        raise SystemExit(f"unknown PROF_SECTION {sec}")
