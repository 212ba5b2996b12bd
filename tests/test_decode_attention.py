"""Numerics for the fused Pallas GQA decode-attention kernel
(``ops/decode_attention.py``) against the XLA oracle
(``ops.attention.mha_quantized_kv`` / ``mha`` in head-major layout), run in
interpreter mode on CPU. On-TPU token-exactness through ``engine.generate``
is exercised by the bench harness (the kernel dispatches only on a real TPU
backend — ``models/qwen3.py`` ``use_decode_kernel``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_qwen3_tpu.ops.attention import mha, mha_quantized_kv
from vggt_qwen3_tpu.ops.decode_attention import (
    decode_attention_eligible,
    gqa_decode_attention,
)

L, B, NH, NKV, T, D = 3, 4, 8, 2, 64, 128


def _rand_cache(rng, quantized: bool):
    if quantized:
        k = rng.integers(-127, 128, (L, B, NKV, T, D)).astype(np.int8)
        v = rng.integers(-127, 128, (L, B, NKV, T, D)).astype(np.int8)
        ks = (rng.uniform(0.5, 2.0, (L, B, NKV, T)) * 0.01).astype(np.float32)
        vs = (rng.uniform(0.5, 2.0, (L, B, NKV, T)) * 0.01).astype(np.float32)
        return (
            jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ks, jnp.bfloat16), jnp.asarray(vs, jnp.bfloat16),
        )
    k = jnp.asarray(rng.standard_normal((L, B, NKV, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, NKV, T, D)), jnp.float32)
    return k, v, None, None


def _frontier(rng):
    start = rng.integers(0, 8, (B,)).astype(np.int32)
    end = rng.integers(16, T + 1, (B,)).astype(np.int32)
    return jnp.asarray(start), jnp.asarray(end)


def _frontier_mask(start, end):
    pos = jnp.arange(T)[None, :]
    return (pos >= start[:, None]) & (pos < end[:, None])  # [B, T]


@pytest.mark.parametrize("block_b", [1, 2, 4])
def test_quantized_matches_xla_oracle(block_b):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, NH, D)), jnp.float32)
    k, v, ks, vs = _rand_cache(rng, quantized=True)
    start, end = _frontier(rng)
    mask = _frontier_mask(start, end)[:, None, None, :]

    for li in range(L):
        got = gqa_decode_attention(
            q, k, v, li, start, end, ks, vs, interpret=True, block_b=block_b
        )
        ref = mha_quantized_kv(
            q[:, None], k[li], ks[li], v[li], vs[li],
            mask=mask, kv_heads_major=True,
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-4
        )


def test_bf16_cache_matches_xla_oracle():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, NH, D)), jnp.float32)
    k, v, _, _ = _rand_cache(rng, quantized=False)
    start, end = _frontier(rng)
    mask = _frontier_mask(start, end)[:, None, None, :]

    got = gqa_decode_attention(q, k, v, 1, start, end, interpret=True, block_b=2)
    ref = mha(q[:, None], k[1], v[1], mask=mask, kv_heads_major=True)[:, 0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_layer_index_selects_the_right_layer():
    """The scalar-prefetched layer index must pick layer li's KV — a wrong
    index map would silently attend over another layer's history."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, NH, D)), jnp.float32)
    k, v, ks, vs = _rand_cache(rng, quantized=True)
    start = jnp.zeros((B,), jnp.int32)
    end = jnp.full((B,), T, jnp.int32)

    out0 = gqa_decode_attention(q, k, v, 0, start, end, ks, vs, interpret=True)
    out2 = gqa_decode_attention(q, k, v, 2, start, end, ks, vs, interpret=True)
    assert not np.allclose(np.asarray(out0), np.asarray(out2))
    # traced layer index (as inside the decoder scan) matches the static one
    out2b = gqa_decode_attention(
        q, k, v, jnp.asarray(2, jnp.int32), start, end, ks, vs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out2b))


def test_single_valid_slot_row():
    """A row whose frontier is one token wide must return exactly that
    token's V (softmax over a single slot), not NaN."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, NH, D)), jnp.float32)
    k, v, ks, vs = _rand_cache(rng, quantized=True)
    start = jnp.asarray([0, 5, 0, 0], jnp.int32)
    end = jnp.asarray([1, 6, T, T], jnp.int32)

    got = np.asarray(gqa_decode_attention(q, k, v, 0, start, end, ks, vs, interpret=True))
    assert np.isfinite(got).all()
    # row 1, kv-head h: output of its query heads == dequantized v[slot 5]
    deq = np.asarray(v[0, 1, :, 5].astype(jnp.float32)) * np.asarray(
        vs[0, 1, :, 5].astype(jnp.float32)
    )[:, None]  # [NKV, D]
    group = NH // NKV
    for h in range(NH):
        np.testing.assert_allclose(got[1, h], deq[h // group], rtol=2e-2, atol=2e-4)


def test_eligibility_gate():
    assert decode_attention_eligible(368, 32, 8, 160, 128, jnp.int8)
    assert not decode_attention_eligible(368, 32, 8, 62, 128, jnp.int8)  # T misaligned
    assert not decode_attention_eligible(368, 32, 8, 160, 64, jnp.int8)  # D != 128
    assert not decode_attention_eligible(1, 32, 8, 160, 128, jnp.int8)  # tiny cache
    assert decode_attention_eligible(368, 32, 8, 160, 128, jnp.bfloat16)
    assert not decode_attention_eligible(368, 32, 8, 152, 128, jnp.bfloat16)


def test_block_b_tile_legality():
    """The r5 profile_serve crash shape: a 16-slot engine with a 288-token
    budget (NKV·T = 2304) made the VMEM budget pick bb=4, whose
    ``(1, 4, 2304)`` scale block Mosaic rejects (second-to-last dim must be
    a multiple of 8 or the full batch). The picker must now return a legal
    block (8, via the relaxed 5.5 MB tier) — and shapes where no legal
    block fits VMEM must fail eligibility so the XLA path serves them."""
    from vggt_qwen3_tpu.ops.decode_attention import _pick_block_b

    # the crash shape: B=16 slots, NKV=8, T=288 → bb must be 8, not 4
    assert _pick_block_b(16, 8 * 288, 128, 1) == 8
    assert decode_attention_eligible(16, 32, 8, 288, 128, jnp.int8)
    # sub-8 batches: the whole-batch block is legal (block == array dim)
    assert _pick_block_b(4, 8 * 288, 128, 1) == 4
    # no legal block fits VMEM (bf16 cache, 2048-token rows) → ineligible
    assert _pick_block_b(16, 8 * 2048, 128, 2) is None
    assert not decode_attention_eligible(16, 32, 8, 2048, 128, jnp.bfloat16)
    # every returned block is tile-legal by construction
    for b in (8, 16, 24, 368):
        bb = _pick_block_b(b, 8 * 160, 128, 1)
        assert bb is not None and b % bb == 0 and (bb % 8 == 0 or bb == b)


def _engine_cfg(seed=0):
    """Kernel-ELIGIBLE engine dims: num_kv_heads=4 so NKV·T = 4·32 = 128
    satisfies the (NKV·T) % 128 flatten constraint — with num_kv_heads=2 the
    kernel silently fell back to XLA and the r4 versions of these engine
    tests compared XLA to itself (caught in r5; the on-chip bench A/B used
    B=368, T=160 → eligible, so the perf claims stand)."""
    from vggt_qwen3_tpu.config import Qwen3Config

    return Qwen3Config(
        vocab_size=256, hidden_size=512, num_layers=2, num_heads=4,
        num_kv_heads=4, head_dim=128, intermediate_size=256, rope_theta=1e4,
        tie_word_embeddings=True, dtype="float32",
    )


def count_dispatch(monkeypatch, module, name):
    """Wrap ``module.name`` with a trace-time call counter. Env-flag A/B in
    ONE process must also ``jax.clear_caches()`` between modes — the env
    flags are read at trace time and jit cache keys don't include them, so a
    cached trace from the previous mode would otherwise be reused (the other
    half of the r4 vacuity)."""
    counter = {"n": 0}
    orig = getattr(module, name)

    def wrapped(*a, **k):
        counter["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(module, name, wrapped)
    return counter


def test_engine_generate_token_exact_with_forced_kernel(monkeypatch):
    """Engine-level dispatch gate: VGGT_DECODE_KERNEL=force routes the S=1
    decode steps through the fused kernel (interpreter off-TPU) and the
    generated tokens must equal the XLA path's, including left padding and
    int8 KV. Dispatch is ASSERTED (trace-time call counter), not assumed."""
    import vggt_qwen3_tpu.ops.decode_attention as da
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate_text
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype="float32")
    rng = np.random.default_rng(0)
    B_eng = 160  # B·T = 160·32 ≥ 4096, T = 16+16 = 32 tile-aligned
    ids = rng.integers(1, 256, (B_eng, 16))
    mask = np.ones_like(ids)
    ids[:3, :5] = 0
    mask[:3, :5] = 0  # left padding on a few rows
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=0, kv_dtype="int8")

    counter = count_dispatch(monkeypatch, da, "gqa_decode_attention")
    monkeypatch.setenv("VGGT_DECODE_KERNEL", "0")
    jax.clear_caches()
    ref, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert counter["n"] == 0
    monkeypatch.setenv("VGGT_DECODE_KERNEL", "force")
    jax.clear_caches()
    got, _ = generate_text(
        params, cfg, gen_cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    assert counter["n"] > 0, "kernel never dispatched — test would be vacuous"
    assert np.asarray(got).tolist() == np.asarray(ref).tolist()


def test_per_row_decode_forced_kernel_matches_xla(monkeypatch):
    """The continuous-batching decode shape: [B] per-row cache offsets with a
    [B, T] frontier mask (each slot at its own depth). Forced-kernel forward
    must match the XLA path bit-for-bit in greedy terms."""
    import vggt_qwen3_tpu.ops.decode_attention as da
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    counter = count_dispatch(monkeypatch, da, "gqa_decode_attention")
    params = qwen3.init_params(jax.random.PRNGKey(4), cfg, dtype="float32")
    rng = np.random.default_rng(4)
    B_pr, T_pr = 160, 32
    cache = qwen3.init_cache(cfg, B_pr, T_pr, dtype="int8")

    # per-row prompts of varying depth, prefilled at offset 0
    plen = rng.integers(4, 12, (B_pr,))
    ids = rng.integers(1, 256, (B_pr, 16))
    mask16 = (np.arange(16)[None, :] < plen[:, None]).astype(np.int32)
    kv_mask = np.zeros((B_pr, T_pr), np.int32)
    kv_mask[:, :16] = mask16
    emb = qwen3.embed_tokens(params, jnp.asarray(ids * mask16))
    _, cache = qwen3.forward(
        params, cfg, inputs_embeds=emb,
        attention_mask=jnp.asarray(kv_mask),
        positions=jnp.asarray(np.maximum(np.cumsum(mask16, -1) - 1, 0)),
        cache=cache, cache_offset=0, last_logit_only=True,
    )

    # one per-row decode step at each row's own frontier
    offs = plen.astype(np.int32)
    kv_mask2 = kv_mask.copy()
    kv_mask2[np.arange(B_pr), offs] = 1
    tok = rng.integers(1, 256, (B_pr, 1))
    demb = qwen3.embed_tokens(params, jnp.asarray(tok))

    outs = {}
    for mode in ("0", "force"):
        monkeypatch.setenv("VGGT_DECODE_KERNEL", mode)
        jax.clear_caches()
        logits, _ = qwen3.forward(
            params, cfg, inputs_embeds=demb,
            attention_mask=jnp.asarray(kv_mask2),
            positions=jnp.asarray(offs)[:, None],
            cache=cache, cache_offset=jnp.asarray(offs),
            decode_frontier=True,
        )
        outs[mode] = np.asarray(logits[:, 0])
    assert counter["n"] > 0, "kernel never dispatched — test would be vacuous"
    assert np.argmax(outs["0"], -1).tolist() == np.argmax(outs["force"], -1).tolist()
    np.testing.assert_allclose(outs["force"], outs["0"], rtol=3e-2, atol=3e-3)


def test_block_verify_matches_xla_oracle():
    """Speculative verify-block attention (S queries per row at per-row
    depths, in-block causal) vs the XLA oracle with the [B, S, T] mask both
    speculative engines build."""
    from vggt_qwen3_tpu.ops.decode_attention import gqa_block_verify_attention

    rng = np.random.default_rng(7)
    S = 4
    q = jnp.asarray(rng.standard_normal((B, S, NH, D)), jnp.float32)
    k, v, ks, vs = _rand_cache(rng, quantized=True)
    start = jnp.asarray(rng.integers(0, 6, (B,)), jnp.int32)
    off = jnp.asarray(rng.integers(10, T - S, (B,)), jnp.int32)

    # oracle mask: valid(r, j, t) = start_r ≤ t < off_r + j + 1
    pos = jnp.arange(T)[None, None, :]
    mask = (pos >= start[:, None, None]) & (
        pos < (off[:, None] + jnp.arange(S)[None, :] + 1)[:, :, None]
    )  # [B, S, T]

    for li in range(L):
        got = gqa_block_verify_attention(
            q, k, v, li, start, off, ks, vs, interpret=True, block_b=2
        )
        ref = mha_quantized_kv(
            q, k[li], ks[li], v[li], vs[li],
            mask=mask[:, None, :, :], kv_heads_major=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-4
        )


def test_block_verify_s1_equals_decode_kernel():
    """S=1 block verify is plain decode with end = off + 1."""
    from vggt_qwen3_tpu.ops.decode_attention import gqa_block_verify_attention

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((B, NH, D)), jnp.float32)
    k, v, ks, vs = _rand_cache(rng, quantized=True)
    start = jnp.zeros((B,), jnp.int32)
    off = jnp.asarray(rng.integers(4, T - 1, (B,)), jnp.int32)

    a = gqa_decode_attention(q, k, v, 1, start, off + 1, ks, vs, interpret=True)
    b = gqa_block_verify_attention(
        q[:, None], k, v, 1, start, off, ks, vs, interpret=True
    )[:, 0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_speculative_generate_token_exact_with_forced_kernel(monkeypatch):
    """The speculative engine's verify blocks route through the fused
    block-verify kernel under force — tokens must equal the XLA path's."""
    import vggt_qwen3_tpu.ops.decode_attention as da
    from vggt_qwen3_tpu.inference.engine import GenerationConfig
    from vggt_qwen3_tpu.inference.speculative import generate_speculative
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    counter = count_dispatch(monkeypatch, da, "gqa_block_verify_attention")
    params = qwen3.init_params(jax.random.PRNGKey(9), cfg, dtype="float32")
    rng = np.random.default_rng(9)
    B_eng = 160  # B·T = 160·32 ≥ 4096, T = 12+20 = 32 tile-aligned
    ids = rng.integers(1, 256, (B_eng, 12))
    mask = jnp.ones((B_eng, 12), jnp.int32)
    emb = qwen3.embed_tokens(params, jnp.asarray(ids))
    gen_cfg = GenerationConfig(max_new_tokens=20, pad_token_id=0, kv_dtype="int8")

    outs = {}
    for mode in ("0", "force"):
        monkeypatch.setenv("VGGT_DECODE_KERNEL", mode)
        jax.clear_caches()
        toks, lens, _ = generate_speculative(
            params, cfg, gen_cfg, inputs_embeds=emb, attention_mask=mask,
            prompt_ids=jnp.asarray(ids), draft_k=3, ngram=2,
        )
        outs[mode] = (np.asarray(toks).tolist(), np.asarray(lens).tolist())
    assert counter["n"] > 0, "verify kernel never dispatched — vacuous"
    assert outs["force"] == outs["0"]


def test_speculative_forced_kernel_with_dead_rows(monkeypatch):
    """Rows that hit EOS mid-run keep attending as garbage (their outputs
    are discarded); kernel and XLA garbage differ, so exactness must come
    from the engine's alive-gating — prove tokens and lengths still match
    when rows die at different steps."""
    import vggt_qwen3_tpu.ops.decode_attention as da
    from vggt_qwen3_tpu.inference.engine import GenerationConfig
    from vggt_qwen3_tpu.inference.speculative import generate_speculative
    from vggt_qwen3_tpu.models import qwen3

    cfg = _engine_cfg()
    counter = count_dispatch(monkeypatch, da, "gqa_block_verify_attention")
    params = qwen3.init_params(jax.random.PRNGKey(10), cfg, dtype="float32")
    rng = np.random.default_rng(10)
    B_eng = 160
    ids = rng.integers(1, 256, (B_eng, 12))
    mask = jnp.ones((B_eng, 12), jnp.int32)
    emb = qwen3.embed_tokens(params, jnp.asarray(ids))

    # find a token some rows emit early and declare it EOS
    free_cfg = GenerationConfig(max_new_tokens=20, pad_token_id=0, kv_dtype="int8")
    monkeypatch.setenv("VGGT_DECODE_KERNEL", "0")
    jax.clear_caches()
    free, _, _ = generate_speculative(
        params, cfg, free_cfg, inputs_embeds=emb, attention_mask=mask,
        prompt_ids=jnp.asarray(ids), draft_k=3, ngram=2,
    )
    vals, counts = np.unique(np.asarray(free)[:, :6], return_counts=True)
    eos = int(vals[np.argmax(counts)])  # common early token → staggered deaths
    gen_cfg = GenerationConfig(max_new_tokens=20, pad_token_id=0,
                               kv_dtype="int8", eos_token_id=eos)

    outs = {}
    for mode in ("0", "force"):
        monkeypatch.setenv("VGGT_DECODE_KERNEL", mode)
        jax.clear_caches()
        toks, lens, _ = generate_speculative(
            params, cfg, gen_cfg, inputs_embeds=emb, attention_mask=mask,
            prompt_ids=jnp.asarray(ids), draft_k=3, ngram=2,
        )
        outs[mode] = (np.asarray(toks).tolist(), np.asarray(lens).tolist())
    assert counter["n"] > 0, "verify kernel never dispatched — vacuous"
    lens0 = outs["0"][1]
    assert min(lens0) < max(lens0), "want staggered deaths for the edge case"
    assert outs["force"] == outs["0"]
