"""Qwen3 dense decoder, pure-functional JAX.

Architecture (matches HF ``Qwen3ForCausalLM`` for ``Qwen/Qwen3-4B-Instruct-2507``,
the reference's text model — ``src/models/vggt_qwen3_vlm.py:36-40``):

- token embedding (optionally tied to the LM head),
- per layer: RMSNorm → GQA attention with per-head QK RMSNorm + RoPE → residual,
  RMSNorm → SwiGLU MLP → residual,
- final RMSNorm → LM head.

TPU-first design notes:
- All per-layer parameters are **stacked along a leading layer axis** and the
  decoder runs as a single ``lax.scan`` — one compiled layer body regardless of
  depth, fast compiles, and sharding specs that apply uniformly per layer.
- KV caches are explicit arrays threaded through the scan; cache slots are
  sequence indices (left-padding compatible) while rotary positions are supplied
  separately, mirroring HF position-id semantics so decode parity holds.
- Attention dispatches to the XLA reference path here; Pallas flash kernels
  plug in via ``ops.flash_attention`` (same signature) on the hot paths.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Qwen3Config
from ..ops import quant
from ..ops.attention import (
    attend,
    combine_masks,
    flash_eligible,
    make_causal_mask,
    mha,
    mha_quantized_kv,
)
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: Qwen3Config, dtype: Optional[str] = None) -> Params:
    """Random init (normal(0.02) linears/embeddings, unit norms), HF-style."""
    dt = jnp.dtype(dtype or cfg.dtype)
    keys = jax.random.split(rng, 8)

    def normal(key, shape):
        return (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02).astype(dt)

    L, H, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    D, NH, NKV = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    params: Params = {
        "embed": normal(keys[0], (cfg.vocab_size, H)),
        "final_norm": jnp.ones((H,), dtype=dt),
        "layers": {
            "ln1": jnp.ones((L, H), dtype=dt),
            "ln2": jnp.ones((L, H), dtype=dt),
            "wq": normal(keys[1], (L, H, NH * D)),
            "wk": normal(keys[2], (L, H, NKV * D)),
            "wv": normal(keys[3], (L, H, NKV * D)),
            "wo": normal(keys[4], (L, NH * D, H)),
            "q_norm": jnp.ones((L, D), dtype=dt),
            "k_norm": jnp.ones((L, D), dtype=dt),
            "gate": normal(keys[5], (L, H, F)),
            "up": normal(keys[6], (L, H, F)),
            "down": normal(keys[7], (L, F, H)),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal(jax.random.fold_in(rng, 99), (H, cfg.vocab_size))
    return params


def init_cache(
    cfg: Qwen3Config, batch: int, max_len: int, dtype: Optional[str] = None
) -> Dict[str, jnp.ndarray]:
    """Contiguous KV cache: k/v of shape [L, B, NKV, max_len, D].

    **Head-major** layout: each (batch row, kv head) owns a contiguous
    ``[T, D]`` slab, so decode-attention kernels DMA whole per-head K/V
    histories without relayout, and the per-step write touches one row per
    head instead of a strided scatter across heads.

    ``dtype='int8'`` stores quantized K/V with per-(token, head) bf16 scales
    (``ks``/``vs`` [L, B, NKV, T]) — halves decode KV traffic, the dominant
    HBM cost after weight quantization; opt-in (default bf16 for parity).
    """
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if (dtype or cfg.dtype) == "int8":
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.bfloat16),
            "vs": jnp.zeros(sshape, jnp.bfloat16),
        }
    dt = jnp.dtype(dtype or cfg.dtype)
    return {"k": jnp.zeros(shape, dtype=dt), "v": jnp.zeros(shape, dtype=dt)}


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S, K, D] → (int8 values, bf16 per-(token, head) scales [B, S, K])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    emb = params["embed"]
    if isinstance(emb, dict):  # W8 serving mode: int8 rows × per-vocab scale
        return emb["w8"][input_ids].astype(emb["scale"].dtype) * emb["scale"][input_ids]
    return emb[input_ids]


def _layer_qkv(cfg: Qwen3Config, h, lp, cos, sin, qkv_fn=None):
    """Pre-attention projections: normed x, rotated q/k, v.

    Projections route through :func:`quant.linear` so layers hold either
    dense bf16 matrices or int8 ``{"w8", "scale"}`` dicts (W8 serving mode);
    ``qkv_fn`` overrides them with the fused one-launch Pallas kernel
    (``ops.decode_matmul.fused_qkv_w8``) on kernel-shaped decode steps.
    """
    B, S, _ = h.shape
    D, NH, NKV = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
    if qkv_fn is not None:
        q, k, v = qkv_fn(x)
        q = q.reshape(B, S, NH, D)
        k = k.reshape(B, S, NKV, D)
        v = v.reshape(B, S, NKV, D)
    else:
        q = _maybe_lora(lp, "wq", x, quant.linear(x, lp["wq"])).reshape(B, S, NH, D)
        k = _maybe_lora(lp, "wk", x, quant.linear(x, lp["wk"])).reshape(B, S, NKV, D)
        v = _maybe_lora(lp, "wv", x, quant.linear(x, lp["wv"])).reshape(B, S, NKV, D)
    q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def _layer_post_attn(cfg: Qwen3Config, h, lp, attn, mlp_fn=None, wo_fn=None):
    B, S, _ = h.shape
    a = attn.reshape(B, S, cfg.num_heads * cfg.head_dim)
    if wo_fn is not None:  # fused stacked-W8 kernel (ops/decode_matmul.py)
        h = h + wo_fn(a)
    else:
        h = h + _maybe_lora(lp, "wo", a, quant.linear(a, lp["wo"]))
    x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
    if mlp_fn is not None:  # fused Pallas W8 SwiGLU (ops/decode_matmul.py)
        return h + mlp_fn(x)
    gated = jax.nn.silu(_maybe_lora(lp, "gate", x, quant.linear(x, lp["gate"]))) * _maybe_lora(
        lp, "up", x, quant.linear(x, lp["up"])
    )
    return h + _maybe_lora(lp, "down", gated, quant.linear(gated, lp["down"]))


def _layer_step(cfg: Qwen3Config, h, lp, kc, vc, cos, sin, mask, cache_offset):
    """One decoder layer, cache-free (kc/vc None) or with per-layer slices."""
    q, k, v = _layer_qkv(cfg, h, lp, cos, sin)
    if kc is not None:
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, cache_offset, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, cache_offset, 0, 0))
        k_all, v_all = kc, vc
    else:
        k_all, v_all = k, v
    attn = mha(q, k_all, v_all, mask=mask)
    return _layer_post_attn(cfg, h, lp, attn), kc, vc


def forward_hidden(
    params: Params,
    cfg: Qwen3Config,
    inputs_embeds: jnp.ndarray,
    *,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_offset: int | jnp.ndarray = 0,
    prefill_padding: Optional[str] = None,
    decode_frontier: bool = False,
    pipeline=None,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Run the decoder stack.

    Args:
        inputs_embeds: [B, S, H].
        attention_mask: [B, T] over key positions (T = cache length when a
            cache is passed, else S); 1 = valid. None = all valid.
        positions: [B, S] rotary positions; defaults to
            ``cache_offset + arange(S)``.
        cache: optional KV cache from :func:`init_cache`; updated copy returned.
        cache_offset: slot index where this segment's KV entries are written.
            May be a **[B] array of per-row offsets** — the continuous-batching
            decode path (``S == 1``) or the speculative block-verify path
            (``S > 1``), where every sequence sits at its own depth in its
            cache row; writes become per-row scatters and the causal
            constraint must then be expressed via ``attention_mask`` — a
            ``[B, T]`` frontier mask for single-token decode, or a
            ``[B, S, T]`` per-query mask for block verify (each query covers
            its own row frontier plus the in-block causal prefix).
        prefill_padding: 'left' | 'right' — declares the prompt's padding as
            contiguous, unlocking the Pallas flash-attention prefill path
            (inference only; the kernel has no VJP). Requires
            ``cache_offset == 0`` with a cache present.
        decode_frontier: declares that each ``attention_mask`` row is ONE
            contiguous ``[start, end)`` run of valid kv slots that already
            encodes causality (true for every engine decode step — left-padded
            prompt + appended generation). With ``S == 1`` this unlocks the
            fused Pallas decode-attention kernel
            (``ops.decode_attention``) on TPU at eligible shapes.
        pipeline: optional ``parallel.pipeline.PipelinePlan`` — when its mesh
            has ``pp > 1``, the (cache-free) training path runs the layer
            stack as a GPipe pipeline over the ``pp`` mesh axis instead of a
            local scan. Ignored on cached (inference) calls.
    Returns:
        (hidden [B, S, H], updated cache or None)
    """
    B, S, _ = inputs_embeds.shape
    kv_len = cache["k"].shape[3] if cache is not None else S
    # [B] cache_offset → per-row scatter decode (continuous batching; S > 1 is
    # the ragged block-verify path of speculative decoding — each row appends
    # an S-token block at its own depth)
    per_row = getattr(cache_offset, "ndim", 0) == 1
    if per_row:
        assert cache is not None and attention_mask is not None
        if S > 1:
            assert attention_mask.ndim == 3, (
                "per-row block decode (S > 1) needs a [B, S, T] per-query mask"
            )

    if positions is None:
        if per_row:
            positions = cache_offset[:, None] + jnp.arange(S)[None, :]
        else:
            positions = cache_offset + jnp.arange(S)[None, :]
            positions = jnp.broadcast_to(positions, (B, S))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    pad = None
    if attention_mask is not None:
        if attention_mask.ndim == 3:  # [B, S_q, T] per-query-position mask
            pad = attention_mask[:, None, :, :].astype(bool)
        else:
            pad = attention_mask[:, None, None, :].astype(bool)
    if per_row:
        # the per-row key mask is the causal frontier — no triangular mask
        mask = pad
    else:
        causal = make_causal_mask(S, kv_len, q_offset=cache_offset)[None, None]
        mask = combine_masks(causal, pad)

    h = inputs_embeds

    if cache is not None:
        L = cfg.num_layers

        # Flash prefill: with contiguous padding declared and the cache empty
        # (offset 0), attention over the freshly-computed K/V of the prompt is
        # exactly attention over the cache — run the Pallas kernel on it.
        use_flash = (
            prefill_padding is not None
            and S > 1
            and flash_eligible(S, S, cfg.head_dim)
        )
        if use_flash:
            prompt_mask = (
                attention_mask[:, :S].astype(jnp.int32)
                if attention_mask is not None
                else jnp.ones((B, S), jnp.int32)
            )
            # ``prefill_padding`` declares the valid slots form ONE contiguous
            # run per row; locate it directly ([start, start+length)) rather
            # than assuming pads sit at a specific end — splice_expand's
            # no-image fallback yields runs with padding on BOTH sides.
            lengths = prompt_mask.sum(-1)
            kv_start = jnp.argmax(prompt_mask, axis=-1).astype(jnp.int32)
            kv_end = kv_start + lengths

        quantized_kv = "ks" in cache

        # Fused decode-attention kernel gate: S=1, frontier-declared mask,
        # TPU backend, eligible shapes (ops/decode_attention.py). The kernel
        # reads the WHOLE stacked cache with a scalar-prefetched layer index
        # so the scan never materializes per-layer slices for it.
        # env: "1" (default) = on for TPU; "0" = off; "force" = on for any
        # backend via the kernel interpreter (CPU engine-level tests)
        _dk = os.environ.get("VGGT_DECODE_KERNEL", "1")
        _dk_on = _dk != "0" and (jax.default_backend() == "tpu" or _dk == "force")
        _eligible = False
        if decode_frontier and _dk_on and attention_mask is not None:
            from ..ops.decode_attention import decode_attention_eligible

            _eligible = decode_attention_eligible(
                B, cfg.num_heads, cfg.num_kv_heads, kv_len, cfg.head_dim,
                cache["k"].dtype,
            )
        use_decode_kernel = _eligible and S == 1 and attention_mask.ndim == 2
        # speculative verify blocks: S = k+1 queries per row, query j's mask
        # row = query 0's plus exactly j more slots (in-block causality) —
        # the structure both speculative engines build
        use_verify_kernel = (
            _eligible
            and S > 1
            and per_row
            and attention_mask.ndim == 3
            and S * cfg.num_heads <= 1024
        )

        # Fused W8 dequant-matmul MLP kernel (ops/decode_matmul.py): batched
        # decode/verify steps only (B·S rows), plain-W8 stacked weights, no
        # MLP LoRA. env: "1" (default — measured 10,005 vs 9,364 tok/s W8 at
        # B=368 and token-exact on chip, r5) = on for TPU, "0" = off,
        # "force" = interpreter on any backend (tests).
        _mm = os.environ.get("VGGT_DECODE_MATMUL", "1")
        _mm_on = _mm != "0" and (jax.default_backend() == "tpu" or _mm == "force")
        lyr = params["layers"]
        use_mlp_kernel = False
        if _mm_on and (use_decode_kernel or use_verify_kernel):
            from ..ops.decode_matmul import mlp_eligible

            plain_w8 = all(
                isinstance(lyr.get(k), dict)
                and "w8" in lyr[k]
                and quant.A8_MARKER not in lyr[k]
                for k in ("gate", "up", "down")
            )
            no_mlp_lora = "lora" not in lyr or not any(
                k in lyr["lora"] for k in ("gate", "up", "down")
            )
            use_mlp_kernel = (
                plain_w8
                and no_mlp_lora
                and mlp_eligible(B * S, cfg.hidden_size, cfg.intermediate_size)
            )
        # the qkv/wo projections ride the same switch (fused one-launch
        # kernels per layer; VGGT_DECODE_QKV=0 / VGGT_DECODE_WO=0 isolate
        # each for A/B)
        use_qkv_kernel = use_wo_kernel = False
        if _mm_on and (use_decode_kernel or use_verify_kernel):
            from ..ops.decode_matmul import linear_eligible, qkv_eligible

            rows = B * S
            plain = lambda k: (isinstance(lyr.get(k), dict) and "w8" in lyr[k]
                               and quant.A8_MARKER not in lyr[k])
            no_lora = lambda k: "lora" not in lyr or k not in lyr["lora"]
            use_qkv_kernel = (
                os.environ.get("VGGT_DECODE_QKV", "1") != "0"
                and all(plain(k) and no_lora(k) for k in ("wq", "wk", "wv"))
                and qkv_eligible(rows, cfg.hidden_size, cfg.q_dim, cfg.kv_dim)
            )
            use_wo_kernel = (
                os.environ.get("VGGT_DECODE_WO", "1") != "0"
                and plain("wo") and no_lora("wo")
                and linear_eligible(rows, cfg.q_dim, cfg.hidden_size)
            )
        interp = jax.default_backend() != "tpu"
        if use_mlp_kernel:
            from ..ops.decode_matmul import fused_mlp_w8

            stacked_mlp = {k: lyr[k] for k in ("gate", "up", "down")}

            _bf = int(os.environ.get("VGGT_MLP_BLOCK_F", "0")) or None  # tuning

            def make_mlp_fn(li):
                def mlp_fn(x):
                    Bx, Sx, Hx = x.shape
                    y = fused_mlp_w8(
                        x.reshape(Bx * Sx, Hx),
                        stacked_mlp["gate"], stacked_mlp["up"],
                        stacked_mlp["down"], li, block_f=_bf,
                        interpret=interp,
                    )
                    return y.reshape(Bx, Sx, Hx)
                return mlp_fn
        else:
            make_mlp_fn = None
        if use_qkv_kernel:
            from ..ops.decode_matmul import fused_qkv_w8

            stacked_qkv = {k: lyr[k] for k in ("wq", "wk", "wv")}

            def make_qkv_fn(li):
                def qkv_fn(x):
                    Bx, Sx, Hx = x.shape
                    q, k, v = fused_qkv_w8(
                        x.reshape(Bx * Sx, Hx), stacked_qkv["wq"],
                        stacked_qkv["wk"], stacked_qkv["wv"], li,
                        interpret=interp,
                    )
                    return (q.reshape(Bx, Sx, -1), k.reshape(Bx, Sx, -1),
                            v.reshape(Bx, Sx, -1))
                return qkv_fn
        else:
            make_qkv_fn = None
        if use_wo_kernel:
            from ..ops.decode_matmul import fused_linear_w8

            stacked_wo = lyr["wo"]

            def make_wo_fn(li):
                def wo_fn(a):
                    Bx, Sx, Kx = a.shape
                    y = fused_linear_w8(
                        a.reshape(Bx * Sx, Kx), stacked_wo, li,
                        interpret=interp,
                    )
                    return y.reshape(Bx, Sx, -1)
                return wo_fn
        else:
            make_wo_fn = None
        if use_decode_kernel:
            from ..ops.decode_attention import gqa_decode_attention

            am = attention_mask.astype(jnp.int32)
            f_start = jnp.argmax(am, axis=-1).astype(jnp.int32)
            f_end = f_start + am.sum(-1).astype(jnp.int32)
            # belt-and-braces causal clamp (engine masks already stop at the
            # frontier; a sloppier caller's mask must not see the future)
            f_end = jnp.minimum(f_end, jnp.asarray(cache_offset, jnp.int32) + 1)
        elif use_verify_kernel:
            from ..ops.decode_attention import gqa_block_verify_attention

            am0 = attention_mask[:, 0, :].astype(jnp.int32)  # query 0's row
            f_start = jnp.argmax(am0, axis=-1).astype(jnp.int32)
            f_off = f_start + am0.sum(-1).astype(jnp.int32) - 1
            f_off = jnp.minimum(f_off, jnp.asarray(cache_offset, jnp.int32))

        rows = jnp.arange(B)

        def write_kv(c, li, name, val):
            """KV write for this layer into the head-major cache
            ([L, B, NKV, T, ...]; ``val`` arrives seq-major [B, S, NKV, ...]):
            contiguous slice update at a scalar offset, or a per-row scatter
            at [B] offsets (continuous-batching decode / speculative block
            verify — each sequence appends its S-token block at its own
            depth)."""
            buf = c[name]
            if per_row:
                offs = cache_offset[:, None] + jnp.arange(val.shape[1])[None, :]
                # advanced indices (rows, offs) separated by the head slice →
                # indexed result is [B, S, NKV, ...], matching val directly
                return buf.at[li, rows[:, None], :, offs].set(val.astype(buf.dtype))
            starts = (li, 0, 0, cache_offset) + (0,) * (buf.ndim - 4)
            return jax.lax.dynamic_update_slice(
                buf, jnp.moveaxis(val.astype(buf.dtype), 1, 2)[None], starts
            )

        def body(carry, xs):
            h, c = carry
            lp, li = xs
            q, k, v = _layer_qkv(
                cfg, h, lp, cos, sin,
                qkv_fn=make_qkv_fn(li) if make_qkv_fn is not None else None,
            )
            # single-token in-place writes into the full [L, B, T, NKV, D]
            # carry — only S new entries hit HBM, never a whole layer slice
            if quantized_kv:
                k8, ks = _quantize_kv(k)
                v8, vs = _quantize_kv(v)
                c = dict(
                    c,
                    k=write_kv(c, li, "k", k8),
                    v=write_kv(c, li, "v", v8),
                    ks=write_kv(c, li, "ks", ks),
                    vs=write_kv(c, li, "vs", vs),
                )
            else:
                c = dict(c, k=write_kv(c, li, "k", k), v=write_kv(c, li, "v", v))
            if use_flash:
                attn = attend(q, k, v, causal=True, kv_start=kv_start, kv_end=kv_end)
            elif use_decode_kernel:
                attn = gqa_decode_attention(
                    q[:, 0],
                    c["k"],
                    c["v"],
                    li,
                    f_start,
                    f_end,
                    c.get("ks"),
                    c.get("vs"),
                    interpret=jax.default_backend() != "tpu",
                )[:, None]
            elif use_verify_kernel:
                attn = gqa_block_verify_attention(
                    q,
                    c["k"],
                    c["v"],
                    li,
                    f_start,
                    f_off,
                    c.get("ks"),
                    c.get("vs"),
                    interpret=jax.default_backend() != "tpu",
                )
            elif quantized_kv:
                # scales folded onto scores/probs so the int8 K/V enter their
                # dots as PURE converts (XLA fuses those; a dequant-then-mha
                # here materializes bf16 KV to HBM — ~3× slower decode step)
                attn = mha_quantized_kv(
                    q,
                    jax.lax.dynamic_index_in_dim(c["k"], li, axis=0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(c["ks"], li, axis=0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(c["v"], li, axis=0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(c["vs"], li, axis=0, keepdims=False),
                    mask=mask,
                    kv_heads_major=True,
                )
            else:
                kc = jax.lax.dynamic_index_in_dim(c["k"], li, axis=0, keepdims=False)
                vc = jax.lax.dynamic_index_in_dim(c["v"], li, axis=0, keepdims=False)
                attn = mha(q, kc, vc, mask=mask, kv_heads_major=True)
            h = _layer_post_attn(
                cfg, h, lp, attn,
                mlp_fn=make_mlp_fn(li) if make_mlp_fn is not None else None,
                wo_fn=make_wo_fn(li) if make_wo_fn is not None else None,
            )
            return (h, c), None

        # the fused kernels read the STACKED weights via their scalar-
        # prefetched layer index — keep covered keys out of the scan xs so
        # no per-layer weight slice is ever materialized for them
        kernel_keys = (
            (("gate", "up", "down") if use_mlp_kernel else ())
            + (("wq", "wk", "wv") if use_qkv_kernel else ())
            + (("wo",) if use_wo_kernel else ())
        )
        scan_layers = {
            k: v for k, v in params["layers"].items() if k not in kernel_keys
        }
        (h, new_cache), _ = jax.lax.scan(
            body, (h, dict(cache)), (scan_layers, jnp.arange(L))
        )
    elif pipeline is not None and pipeline.pp > 1:
        # pipeline-parallel training path: GPipe wavefront over the pp mesh
        # axis (shard_map + ppermute), per-layer checkpoint inside each stage
        from ..parallel.pipeline import pipeline_decoder

        def layer_fn(hh, lp, c, s, m):
            hh, _, _ = _layer_step(cfg, hh, lp, None, None, c, s, m, 0)
            return hh

        h = pipeline_decoder(
            params["layers"], h, cos, sin, mask, plan=pipeline, layer_fn=layer_fn
        )
        new_cache = None
    else:
        # training path: rematerialize each layer in the backward — stores
        # one [B, S, H] carry per layer instead of every block intermediate
        # (jax.checkpoint; the standard TPU memory/FLOPs trade, SURVEY §5.7)
        @jax.checkpoint
        def body(h, lp):
            h, _, _ = _layer_step(cfg, h, lp, None, None, cos, sin, mask, 0)
            return h, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        new_cache = None

    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, new_cache


QUANTIZED_LAYER_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down")

# HF/PEFT module names (the reference's lora.target_modules —
# configs/stage1_3d.yaml:43-48) → our stacked-layer keys.
LORA_TARGET_MAP = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}


def add_lora(params: Params, cfg: Qwen3Config, lora_cfg, rng: jax.Array) -> Params:
    """Attach low-rank adapters: for each target projection W [L, in, out],
    train ΔW = (A @ B) · α/r with A ~ N(0, 0.02), B = 0 (standard LoRA init —
    the adapted model starts exactly at the base model). The scale is stored
    alongside as a [L, 1] constant so the pytree is self-contained."""
    r = lora_cfg.rank
    L = cfg.num_layers
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i, name in enumerate(lora_cfg.target_modules):
        key = LORA_TARGET_MAP[name]
        w = params["layers"][key]
        in_dim, out_dim = (w["w8"].shape[-2:] if isinstance(w, dict) else w.shape[-2:])
        dt = (w["scale"].dtype if isinstance(w, dict) else w.dtype)
        k = jax.random.fold_in(rng, i)
        lora[key] = {
            "A": (jax.random.normal(k, (L, in_dim, r), jnp.float32) * 0.02).astype(dt),
            "B": jnp.zeros((L, r, out_dim), dt),
            "s": jnp.full((L, 1), lora_cfg.scale, dt),
        }
    out = dict(params)
    out["layers"] = dict(params["layers"], lora=lora)
    return out


def _maybe_lora(lp, key: str, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """y + LoRA delta for projection ``key`` when an adapter is present."""
    lora = lp.get("lora") if isinstance(lp, dict) else None
    if lora is None or key not in lora:
        return y
    ad = lora[key]
    delta = (x @ ad["A"]) @ ad["B"]
    return y + delta * ad["s"][0]


def quantize_params(
    params: Params, *, embed: bool = True, donate: bool = True, mode: str = "w8"
) -> Params:
    """bf16 params → quantized serving params.

    ``mode="w8"``: per-output-channel int8 for every layer projection (the
    default — near-lossless). ``mode="w4"``: group-wise int4 (group 128 along
    K, packed two-per-byte) for the layer projections — halves weight HBM
    footprint; a storage mode today, not a latency win (every W4 matmul
    formulation measured slower than fused W8 on this toolchain — BASELINE.md
    "W4 investigation"). Either way the token embedding / tied LM head quantizes (by
    default) to int8 rows with per-vocab scales — the bf16 head alone streams
    ~778 MB per decode step on the 4B model (norms and QK-norms stay bf16).

    Each source matrix is **donated** to its quantization jit so the bf16
    buffer frees before the next one quantizes — without this, originals and
    int8 copies co-reside and a 4B model OOMs a 16GB chip mid-conversion.
    Pass ``donate=False`` to keep the caller's bf16 tree valid (e.g. the
    bf16-vs-quantized eval comparison).
    """
    from ..ops.quant import mark_act_quant, quantize_per_channel, quantize_per_group_w4

    assert mode in ("w8", "w8a8", "w4"), mode
    donate_args = (0,) if donate else ()
    if mode == "w4":
        # layer mats are stacked [L, K, N]; lax.map runs the 2-D group
        # quantizer one layer at a time so the fp32 working set peaks at a
        # single matrix, not 36 of them (a vmap here OOMs a 16 GB chip)
        quantize = jax.jit(
            lambda w: jax.lax.map(quantize_per_group_w4, w),
            donate_argnums=donate_args,
        )
    else:
        quantize = jax.jit(quantize_per_channel, donate_argnums=donate_args)
    layers = dict(params["layers"])
    for key in QUANTIZED_LAYER_KEYS:
        layers[key] = quantize(layers[key])
        if mode == "w8a8":  # int8×int8 MXU dots (embed/head stay W8A16)
            layers[key] = mark_act_quant(layers[key])
    out = dict(params)
    out["layers"] = layers
    if embed:
        # [V, H] with per-row (per-vocab) scales: the same scale serves the
        # embedding gather and, transposed, the per-output-channel LM head.
        def quantize_rows(w):
            wf = w.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-1, keepdims=True), 1e-8) / 127.0
            w8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
            return {"w8": w8, "scale": s.astype(jnp.bfloat16)}

        out["embed"] = jax.jit(quantize_rows, donate_argnums=donate_args)(params["embed"])
        if "lm_head" in params:  # untied head: [H, V] → per-output-channel
            # ALWAYS per-channel int8 — the head stays W8A16 in every mode
            # (lm_logits only speaks {"w8","scale"}, and the stacked-layer W4
            # quantizer would crash on a 2-D matrix)
            head_quant = jax.jit(quantize_per_channel, donate_argnums=donate_args)
            out["lm_head"] = head_quant(params["lm_head"])
    return out


def lm_logits(params: Params, cfg: Qwen3Config, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head; float32 logits (HF computes loss/logits in fp32)."""
    if cfg.tie_word_embeddings:
        w = params["embed"]
        if isinstance(w, dict):
            # int8 matmul with the scale applied to the [B,S,V] output —
            # XLA fuses the row-scale multiply into the matmul epilogue.
            y = jnp.einsum(
                "bsh,vh->bsv",
                hidden,
                w["w8"].astype(hidden.dtype),
                preferred_element_type=jnp.float32,
            )
            return y * w["scale"][:, 0].astype(jnp.float32)
        w = w.T
    else:
        w = params["lm_head"]
        if isinstance(w, dict):
            y = jnp.einsum(
                "bsh,hv->bsv",
                hidden,
                w["w8"].astype(hidden.dtype),
                preferred_element_type=jnp.float32,
            )
            return y * w["scale"][0].astype(jnp.float32)
    return jnp.einsum("bsh,hv->bsv", hidden, w, preferred_element_type=jnp.float32)


def greedy_head_eligible(params: Params, cfg: Qwen3Config, B: int) -> bool:
    """Static gate for the fused head-argmax kernel (ops/decode_matmul.py):
    tied W8 embedding head, kernel-tileable dims, kernel backend available.
    env ``VGGT_HEAD_KERNEL``: "1" (default) = on for TPU, "0" = off,
    "force" = interpreter on any backend (tests)."""
    _hk = os.environ.get("VGGT_HEAD_KERNEL", "1")
    if _hk == "0" or not (jax.default_backend() == "tpu" or _hk == "force"):
        return False
    if not cfg.tie_word_embeddings or not isinstance(params.get("embed"), dict):
        return False
    from ..ops.decode_matmul import head_argmax_eligible

    return head_argmax_eligible(B, cfg.hidden_size, cfg.vocab_size)


def greedy_tokens(params: Params, cfg: Qwen3Config, hidden: jnp.ndarray) -> jnp.ndarray:
    """argmax over the LM head for the LAST position, [B] int32 — via the
    fused head-argmax kernel when eligible (the [B, V] f32 logits never
    touch HBM), else the XLA head + argmax. Bit-compatible: the kernel's
    per-tile dequant/scale factorization matches :func:`lm_logits`
    element-for-element, so the argmax agrees with XLA's."""
    if hidden.ndim == 3:
        hidden = hidden[:, -1]
    B = hidden.shape[0]
    if greedy_head_eligible(params, cfg, B):
        from ..ops.decode_matmul import fused_head_argmax

        tok, _ = fused_head_argmax(
            hidden, params["embed"],
            interpret=jax.default_backend() != "tpu",
        )
        return tok
    return jnp.argmax(lm_logits(params, cfg, hidden[:, None])[:, -1], -1).astype(jnp.int32)


def forward_greedy(
    params: Params,
    cfg: Qwen3Config,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_offset: int | jnp.ndarray = 0,
    prefill_padding: Optional[str] = None,
    decode_frontier: bool = False,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """:func:`forward` for pure greedy decode: returns (next_token [B] int32,
    cache) instead of logits, routing the head through
    :func:`greedy_tokens` so eligible shapes skip the logits round-trip."""
    if inputs_embeds is None:
        assert input_ids is not None
        inputs_embeds = embed_tokens(params, input_ids)
    hidden, new_cache = forward_hidden(
        params,
        cfg,
        inputs_embeds,
        attention_mask=attention_mask,
        positions=positions,
        cache=cache,
        cache_offset=cache_offset,
        prefill_padding=prefill_padding,
        decode_frontier=decode_frontier,
    )
    return greedy_tokens(params, cfg, hidden), new_cache


def forward(
    params: Params,
    cfg: Qwen3Config,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_offset: int | jnp.ndarray = 0,
    prefill_padding: Optional[str] = None,
    decode_frontier: bool = False,
    last_logit_only: bool = False,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Full forward → (float32 logits [B, S, V], updated cache).

    ``last_logit_only``: compute the LM head on the final position only
    (returns [B, 1, V]). Prefill needs exactly that, and relying on XLA to
    slice-fuse away the rest is not safe — at B=368, S=128 the full-sequence
    fp32 logits are a 28.6 GB allocation that fails compilation, and even
    when it fits the head wastes ~S× the decode-head FLOPs."""
    if inputs_embeds is None:
        assert input_ids is not None
        inputs_embeds = embed_tokens(params, input_ids)
    hidden, new_cache = forward_hidden(
        params,
        cfg,
        inputs_embeds,
        attention_mask=attention_mask,
        positions=positions,
        cache=cache,
        cache_offset=cache_offset,
        prefill_padding=prefill_padding,
        decode_frontier=decode_frontier,
    )
    if last_logit_only:
        hidden = hidden[:, -1:]
    return lm_logits(params, cfg, hidden), new_cache
