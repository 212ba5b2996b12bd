"""Fused W8 dequant-matmul MLP kernel (``ops/decode_matmul.py``) numerics +
engine dispatch, interpreter mode on CPU (on-TPU A/B rides
``VGGT_DECODE_MATMUL`` through bench.py like the decode-attention kernel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_qwen3_tpu.ops.decode_matmul import (
    _pick_block_f,
    fused_mlp_w8,
    mlp_eligible,
    mlp_w8_xla,
)
from vggt_qwen3_tpu.ops.quant import quantize_per_channel

L, B, H, F = 3, 64, 256, 512


def _stacked_w8(rng, shape):
    w = jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)
    return jax.vmap(quantize_per_channel)(w)


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(0)
    return (
        _stacked_w8(rng, (L, H, F)),
        _stacked_w8(rng, (L, H, F)),
        _stacked_w8(rng, (L, F, H)),
    )


def test_matches_xla_oracle_per_layer(weights):
    gate, up, down = weights
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H)) * 0.3, jnp.float32)
    for li in range(L):
        got = fused_mlp_w8(x, gate, up, down, li, interpret=True)
        ref = mlp_w8_xla(x, gate, up, down, li)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
        )


@pytest.mark.parametrize("block_f", [128, 256, 512])
def test_block_f_invariance(weights, block_f):
    """Accumulating over more/fewer F tiles must not change results beyond
    fp32 reassociation noise."""
    gate, up, down = weights
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, H)) * 0.3, jnp.float32)
    ref = fused_mlp_w8(x, gate, up, down, 0, block_f=F, interpret=True)
    got = fused_mlp_w8(x, gate, up, down, 0, block_f=block_f, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-6, atol=1e-7
    )


def test_eligibility_gate():
    assert mlp_eligible(368, 2560, 9728)       # the bench decode shape
    assert not mlp_eligible(1, 2560, 9728)     # B=1 latency path stays XLA
    assert not mlp_eligible(368, 2560, 9729)   # untileable F
    assert not mlp_eligible(100, 2560, 9728)   # sublane-misaligned batch
    assert not mlp_eligible(4096, 2560, 9728)  # resident x would blow VMEM
    assert _pick_block_f(368, 2560, 9728) in (128, 256, 512, 1024)


def _engine_cfg():
    """Kernel-eligible dims: num_kv_heads=4 → NKV·T = 128 satisfies the
    decode-attention flatten constraint (the MLP kernel gate requires the
    attention kernel's decode/verify shape to be live)."""
    from vggt_qwen3_tpu.config import Qwen3Config

    return Qwen3Config(
        vocab_size=256, hidden_size=512, num_layers=2, num_heads=4,
        num_kv_heads=4, head_dim=128, intermediate_size=256, rope_theta=1e4,
        tie_word_embeddings=True, dtype="float32",
    )


def test_engine_generate_token_exact_with_forced_kernel(monkeypatch):
    """VGGT_DECODE_MATMUL=force (with the attention kernel also forced —
    the MLP kernel dispatches only on kernel-shaped decode steps) must
    reproduce the XLA path's tokens exactly, incl. left padding + int8 KV +
    W8 quantized weights. Dispatch is asserted via a trace-time counter, and
    jax.clear_caches() between modes keeps the env-flag A/B honest (jit
    cache keys don't include env vars)."""
    import vggt_qwen3_tpu.ops.decode_matmul as dm
    from tests.test_decode_attention import count_dispatch
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate_text
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    counter = count_dispatch(monkeypatch, dm, "fused_mlp_w8")
    params = qwen3.quantize_params(
        qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype="float32"),
        donate=False,
    )
    rng = np.random.default_rng(0)
    B_eng = 160  # B·T = 160·32 ≥ 4096, T = 32 tile-aligned → kernel-eligible
    ids = rng.integers(1, 256, (B_eng, 16))
    mask = np.ones_like(ids)
    ids[:3, :5] = 0
    mask[:3, :5] = 0
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=0, kv_dtype="int8")

    monkeypatch.setenv("VGGT_DECODE_KERNEL", "force")
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "0")
    jax.clear_caches()
    ref, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert counter["n"] == 0
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "force")
    jax.clear_caches()
    got, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert counter["n"] > 0, "MLP kernel never dispatched — vacuous"
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()


def test_speculative_verify_blocks_token_exact(monkeypatch):
    """The S=k+1 block-verify path flattens to [B·S, H] rows for the fused
    MLP — speculative generate must stay token-exact with both kernels
    forced."""
    import vggt_qwen3_tpu.ops.decode_matmul as dm
    from tests.test_decode_attention import count_dispatch
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate_text
    from vggt_qwen3_tpu.inference.speculative import generate_speculative
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    counter = count_dispatch(monkeypatch, dm, "fused_mlp_w8")
    params = qwen3.quantize_params(
        qwen3.init_params(jax.random.PRNGKey(1), cfg, dtype="float32"),
        donate=False,
    )
    rng = np.random.default_rng(3)
    # B·T = 160·32 ≥ 4096 (attention-kernel gate, which also gates the MLP
    # kernel); B·(k+1) = 640 rows, %16 == 0, ≤ 1024
    B_eng = 160
    cyc = [7, 23, 5, 41]
    ids = rng.integers(1, 256, (B_eng, 16))
    ids[:, -len(cyc):] = cyc  # draftable structure
    mask = np.ones_like(ids)
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=0, kv_dtype="int8")

    monkeypatch.setenv("VGGT_DECODE_KERNEL", "force")
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "0")
    jax.clear_caches()
    ref, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    emb = qwen3.embed_tokens(params, jnp.asarray(ids))
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "force")
    jax.clear_caches()
    got, _, iters = generate_speculative(
        params, cfg, gen_cfg, inputs_embeds=emb,
        attention_mask=jnp.asarray(mask), prompt_ids=jnp.asarray(ids),
        draft_k=3, ngram=2,
    )
    assert counter["n"] > 0, "MLP kernel never dispatched — vacuous"
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()
    assert int(np.asarray(iters)) < 16  # blocks actually amortized


def test_qkv_and_wo_kernels_match_xla(weights):
    """fused_qkv_w8 / fused_linear_w8 vs quant.linear per layer."""
    from vggt_qwen3_tpu.ops import quant
    from vggt_qwen3_tpu.ops.decode_matmul import fused_linear_w8, fused_qkv_w8

    rng = np.random.default_rng(5)
    NQ = NKVD = 512
    wq = _stacked_w8(rng, (L, H, NQ))
    wk = _stacked_w8(rng, (L, H, NKVD))
    wv = _stacked_w8(rng, (L, H, NKVD))
    wo = _stacked_w8(rng, (L, NQ, H))
    x = jnp.asarray(rng.standard_normal((B, H)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.standard_normal((B, NQ)) * 0.3, jnp.float32)

    def sl(w, li):
        return {k: v[li] for k, v in w.items()}

    for li in range(L):
        q, k, v = fused_qkv_w8(x, wq, wk, wv, li, interpret=True)
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(quant.linear(x, sl(wq, li))), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(quant.linear(x, sl(wk, li))), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(quant.linear(x, sl(wv, li))), rtol=2e-5, atol=2e-6)
        y = fused_linear_w8(a, wo, li, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(quant.linear(a, sl(wo, li))), rtol=2e-5, atol=2e-6)


def test_engine_all_kernels_agree(monkeypatch):
    """With MLP + QKV + WO kernels ALL forced, the engine's greedy tokens
    stay (near-)identical to the pure-XLA path's and every kernel's dispatch
    is asserted.

    Tokens are compared with a ≤1% row-divergence allowance, NOT strict
    equality: a quantized embed makes the residual stream bf16, and the
    kernels round their silu/mul intermediates to bf16 in a different fused
    order than XLA does, so random-weight logits drift ~1% and occasionally
    tie-flip an argmax (observed 0–2 rows of 160). Wiring bugs (wrong layer
    index, wrong slice) collapse agreement to ~0, which this still catches.
    Strict TOKEN-EXACT parity is asserted where it matters — on real Mosaic
    kernels at the production shape — by ``scripts/parity_decode_kernels.py``
    (run on-chip each bench round: 17,664/17,664 tokens identical with all
    three kernels live, r5), and at the logits level deterministically by
    ``test_decode_step_logits_parity_all_kernels`` below. The two engine
    tests above additionally happen to be token-exact with their seeds."""
    import vggt_qwen3_tpu.ops.decode_matmul as dm
    from tests.test_decode_attention import count_dispatch
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate_text
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    c_mlp = count_dispatch(monkeypatch, dm, "fused_mlp_w8")
    c_qkv = count_dispatch(monkeypatch, dm, "fused_qkv_w8")
    c_wo = count_dispatch(monkeypatch, dm, "fused_linear_w8")
    params = qwen3.quantize_params(
        qwen3.init_params(jax.random.PRNGKey(2), cfg, dtype="float32"),
        donate=False,
    )
    rng = np.random.default_rng(6)
    ids = rng.integers(1, 256, (160, 16))
    mask = np.ones_like(ids)
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=0, kv_dtype="int8")

    monkeypatch.setenv("VGGT_DECODE_KERNEL", "force")
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "0")
    jax.clear_caches()
    ref, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert c_mlp["n"] == c_qkv["n"] == c_wo["n"] == 0
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "force")
    jax.clear_caches()
    got, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert c_mlp["n"] > 0 and c_qkv["n"] > 0 and c_wo["n"] > 0
    rows_diff = int((np.asarray(got) != np.asarray(ref)).any(axis=1).sum())
    assert rows_diff <= 2, f"{rows_diff}/160 rows diverged — wiring bug"


def test_head_argmax_matches_xla_head():
    """fused_head_argmax vs the lm_logits factorization + jnp.argmax, on a
    tied-embedding-layout W8 head. Rows whose top-2 logit gap is below f32
    reassociation noise are excluded — an argmax there is not well-defined
    across tilings."""
    from vggt_qwen3_tpu.ops.decode_matmul import fused_head_argmax

    rng = np.random.default_rng(9)
    V, Hh, Bh = 1280, 256, 64
    wf = rng.standard_normal((V, Hh)).astype(np.float32) * 0.05
    s = np.maximum(np.abs(wf).max(-1, keepdims=True), 1e-8) / 127.0
    head = {
        "w8": jnp.asarray(np.clip(np.round(wf / s), -127, 127), jnp.int8),
        "scale": jnp.asarray(s, jnp.bfloat16),
    }
    x = jnp.asarray(rng.standard_normal((Bh, Hh)) * 0.3, jnp.float32)
    tok, m = fused_head_argmax(x, head, interpret=True)
    logits = np.asarray(
        jnp.einsum("bh,vh->bv", x, head["w8"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
        * head["scale"][:, 0].astype(jnp.float32)
    )
    ref = logits.argmax(-1)
    top2 = np.sort(logits, -1)
    decisive = (top2[:, -1] - top2[:, -2]) > 1e-5
    assert decisive.sum() >= Bh - 2
    np.testing.assert_array_equal(np.asarray(tok)[decisive], ref[decisive])
    np.testing.assert_allclose(
        np.asarray(m)[decisive], logits.max(-1)[decisive], rtol=1e-6)


def test_engine_greedy_head_fast_path(monkeypatch):
    """VGGT_HEAD_KERNEL=force routes engine.generate through the fused
    head-argmax fast path (token carry, no logits materialization) — tokens
    must agree with the slow path (≤1% tie-flip allowance, same reasoning as
    test_engine_all_kernels_agree) and EOS early-stop semantics must hold."""
    import vggt_qwen3_tpu.ops.decode_matmul as dm
    from tests.test_decode_attention import count_dispatch
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate_text
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    c_head = count_dispatch(monkeypatch, dm, "fused_head_argmax")
    params = qwen3.quantize_params(
        qwen3.init_params(jax.random.PRNGKey(3), cfg, dtype="float32"),
        donate=False,
    )
    rng = np.random.default_rng(8)
    ids = rng.integers(1, 256, (160, 16))
    mask = np.ones_like(ids)
    # eos present in-vocab: exercises the done/pad semantics of the fast scan
    gen_cfg = GenerationConfig(
        max_new_tokens=16, pad_token_id=0, eos_token_id=7, kv_dtype="int8")

    monkeypatch.setenv("VGGT_DECODE_KERNEL", "force")
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "0")
    monkeypatch.setenv("VGGT_HEAD_KERNEL", "0")
    jax.clear_caches()
    ref, ref_len = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert c_head["n"] == 0
    monkeypatch.setenv("VGGT_HEAD_KERNEL", "force")
    jax.clear_caches()
    got, got_len = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert c_head["n"] > 0, "head kernel never dispatched — vacuous"
    rows_diff = int((np.asarray(got) != np.asarray(ref)).any(axis=1).sum())
    assert rows_diff <= 2, f"{rows_diff}/160 rows diverged — wiring bug"
    same = ~(np.asarray(got) != np.asarray(ref)).any(axis=1)
    np.testing.assert_array_equal(
        np.asarray(got_len)[same], np.asarray(ref_len)[same])


def test_decode_step_logits_parity_all_kernels(monkeypatch):
    """Deterministic wiring proof at the LOGITS level: replicate the
    engine's prefill + decode step (S=1) + a speculative verify-shaped step
    (S=4) via ``qwen3.forward`` and compare logits between pure XLA and all
    fused kernels forced. No argmax → no tie-flip fragility; tight
    tolerances bound the reassociation noise directly.

    ``embed=False`` keeps the token embedding dense f32 — a quantized embed
    dequantizes with BF16 scales, making the whole residual stream bf16 even
    at f32 config, and bf16 elementwise rounding (silu/mul fused differently
    in the kernel vs XLA) adds ~1% legitimate drift that would drown the
    wiring signal this test exists to catch (wrong layer index / wrong slice
    produce O(1) diffs)."""
    import vggt_qwen3_tpu.ops.decode_matmul as dm
    from tests.test_decode_attention import count_dispatch
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    c_mlp = count_dispatch(monkeypatch, dm, "fused_mlp_w8")
    c_qkv = count_dispatch(monkeypatch, dm, "fused_qkv_w8")
    c_wo = count_dispatch(monkeypatch, dm, "fused_linear_w8")
    params = qwen3.quantize_params(
        qwen3.init_params(jax.random.PRNGKey(2), cfg, dtype="float32"),
        donate=False, embed=False,
    )
    rng = np.random.default_rng(7)
    B_eng, S = 160, 16
    ids = jnp.asarray(rng.integers(1, 256, (B_eng, S)))
    total = S + 16  # T=32 tile-aligned, B·T ≥ 4096 → decode-kernel eligible

    def run():
        jax.clear_caches()
        cache = qwen3.init_cache(cfg, B_eng, total, dtype="int8")
        mask = jnp.zeros((B_eng, total), jnp.int32).at[:, :S].set(1)
        positions = jnp.arange(S)[None].repeat(B_eng, 0)
        emb = qwen3.embed_tokens(params, ids)
        lg0, cache = qwen3.forward(
            params, cfg, inputs_embeds=emb, attention_mask=mask,
            positions=positions, cache=cache, cache_offset=0,
            prefill_padding="left", last_logit_only=True,
        )
        # decode step (S=1) — the decode-kernel shape
        mask = mask.at[:, S].set(1)
        tok = jnp.argmax(lg0[:, -1], -1)
        lg1, cache = qwen3.forward(
            params, cfg, inputs_embeds=qwen3.embed_tokens(params, tok[:, None]),
            attention_mask=mask, positions=jnp.full((B_eng, 1), S),
            cache=cache, cache_offset=S, decode_frontier=True,
        )
        # verify-shaped step (S=4): per-row offsets + [B, S, T] per-query
        # frontier mask (query j covers slots < S+2+j) — the speculative
        # block-verify path
        blk = jnp.tile(tok[:, None], (1, 4))
        vmask = (
            jnp.arange(total)[None, None, :]
            < (S + 2 + jnp.arange(4))[None, :, None]
        ).astype(jnp.int32).repeat(B_eng, 0)
        lg4, _ = qwen3.forward(
            params, cfg, inputs_embeds=qwen3.embed_tokens(params, blk),
            attention_mask=vmask,
            positions=S + 1 + jnp.arange(4)[None].repeat(B_eng, 0),
            cache=cache, cache_offset=jnp.full((B_eng,), S + 1),
            decode_frontier=True,
        )
        return np.asarray(lg0), np.asarray(lg1), np.asarray(lg4)

    monkeypatch.setenv("VGGT_DECODE_KERNEL", "force")
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "0")
    refs = run()
    assert c_mlp["n"] == c_qkv["n"] == c_wo["n"] == 0
    monkeypatch.setenv("VGGT_DECODE_MATMUL", "force")
    gots = run()
    assert c_mlp["n"] > 0 and c_qkv["n"] > 0 and c_wo["n"] > 0
    for name, ref, got in zip(("prefill", "decode", "verify"), refs, gots):
        np.testing.assert_allclose(
            got, ref, rtol=5e-5, atol=5e-5, err_msg=name)
