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
    acc = jnp.zeros(shape, jnp.float32)
    for d in range(len(shape)):
        acc = acc + jax.lax.broadcasted_iota(jnp.float32, shape, d) * (3.0 + 2 * d)
    return (jnp.mod(acc + i, 251.0) - 125.0).astype(jnp.int8)


def _w8(shape, i=0):
    K = shape[-2]
    return {
        "w8": _fill_int8(shape, i),
        "scale": jnp.full(shape[:-2] + (1, shape[-1]), 2e-4, jnp.bfloat16),
    }


def _time(fn, label, reps=3):
    t0 = time.time()
    np.asarray(jax.jit(fn)())
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(jax.jit(fn)())
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

    def layer_body(x, lp):
        if not mlp_only:
            q = quant.linear(x, lp["wq"])
            k = quant.linear(x, lp["wk"])
            v = quant.linear(x, lp["wv"])
            # stand-in for attention output: fold q/k/v into a [B, NH*D] "attn"
            a = q + jnp.tile(k, (1, NH // NKV)) * 1e-3 + jnp.tile(v, (1, NH // NKV)) * 1e-3
            x = x + quant.linear(a, lp["wo"])
        g = jax.nn.silu(quant.linear(x, lp["gate"])) * quant.linear(x, lp["up"])
        x = x + quant.linear(g, lp["down"])
        return x * 0.999, None  # keep magnitudes bounded over ITERS

    def step(x):
        if quant_mode == "w8a8":
            # W8A8 linear requires 2-D weights: scan slices the stacked dicts
            x, _ = jax.lax.scan(lambda xx, lp: layer_body(xx, lp), x, layers)
        else:
            x, _ = jax.lax.scan(layer_body, x, layers)
        logits = quant.linear(x, head).astype(jnp.float32)
        # fold logits back so the head can't be DCE'd; tiny reduce
        return x + (logits.sum(-1, keepdims=True) * 1e-12).astype(x.dtype)

    def run():
        return jax.lax.fori_loop(0, ITERS, lambda i, x: step(x), x0).sum()

    name = "mlp_path" if mlp_only else "matmul_path"
    _time(run, f"{name}[{quant_mode}] (B={B})")


def section_attn():
    from vggt_qwen3_tpu.ops.decode_attention import gqa_decode_attention

    k = _fill_int8((L, B, NKV, T, D), 1)
    v = _fill_int8((L, B, NKV, T, D), 2)
    ks = jnp.full((L, B, NKV, T), 2e-2, jnp.bfloat16)
    vs = jnp.full((L, B, NKV, T), 2e-2, jnp.bfloat16)
    start = jnp.zeros((B,), jnp.int32)
    end = jnp.full((B,), T, jnp.int32)
    q0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, NH, D)) * 0.1, jnp.bfloat16)

    def step(q):
        def body(qq, li):
            o = gqa_decode_attention(qq, k, v, li, start, end, ks, vs)
            return o * 0.999, None
        q, _ = jax.lax.scan(body, q, jnp.arange(L))
        return q

    def run():
        return jax.lax.fori_loop(0, ITERS, lambda i, q: step(q), q0).sum()

    _time(run, f"attn_kernel (B={B}, T={T}, {L} layers)")


def section_single():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H)) * 0.1, jnp.bfloat16)
    wq = _w8((H, F))
    wd = (wq["w8"].astype(jnp.bfloat16) * wq["scale"]).astype(jnp.bfloat16)
    flops = 2 * B * H * F
    for label, fn in [
        ("dense bf16", lambda xx: xx @ wd),
        ("W8 fused dequant (operand)", lambda xx: xx @ (wq["w8"].astype(jnp.bfloat16) * wq["scale"])),
        ("W8 scale-on-output", lambda xx: (xx @ wq["w8"].astype(jnp.bfloat16)) * wq["scale"][0]),
    ]:
        def run(f=fn):
            def body(i, xx):
                y = f(xx)
                return xx + (y.sum(-1, keepdims=True) * 1e-9).astype(xx.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x).sum()
        per = _time(run, f"single[{label}] [{B},{H}]x[{H},{F}]")
        print(f"   → {flops/per*1e-9:.1f} TFLOP/s, weight stream {H*F/per*1e-6:.0f} GB/s(int8-equiv)",
              flush=True)


def section_head():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H)) * 0.1, jnp.bfloat16)
    emb = {  # tied embedding layout [V, H], per-row scales (the real bench path)
        "w8": _fill_int8((V, H)),
        "scale": jnp.full((V, 1), 2e-4, jnp.bfloat16),
    }
    flops = 2 * B * H * V

    def head(xx):
        y = jnp.einsum("bh,vh->bv", xx, emb["w8"].astype(xx.dtype),
                       preferred_element_type=jnp.float32)
        return y * emb["scale"][:, 0].astype(jnp.float32)

    def run():
        def body(i, xx):
            y = head(xx)
            return xx + (y.sum(-1, keepdims=True) * 1e-12).astype(xx.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x).sum()

    per = _time(run, f"lm_head [{B},{H}]x[{V},{H}]^T W8")
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
