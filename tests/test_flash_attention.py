"""Flash-attention kernel numerics vs the XLA reference (interpret mode)."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from vggt_qwen3_tpu.ops.attention import combine_masks, make_causal_mask, mha
from vggt_qwen3_tpu.ops.flash_attention import flash_attention


def rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def test_noncausal_matches_mha():
    B, S, T, NH, NKV, D = 2, 37, 53, 4, 4, 32
    q, k, v = rand((B, S, NH, D), 0), rand((B, T, NKV, D), 1), rand((B, T, NKV, D), 2)
    ref = mha(q, k, v)
    out = flash_attention(q, k, v, block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_gqa_matches_mha():
    B, S, T, NH, NKV, D = 1, 24, 24, 8, 2, 16
    q, k, v = rand((B, S, NH, D), 3), rand((B, T, NKV, D), 4), rand((B, T, NKV, D), 5)
    ref = mha(q, k, v)
    out = flash_attention(q, k, v, block_q=8, block_kv=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_causal_matches_mha():
    B, S, NH, NKV, D = 2, 33, 4, 2, 16
    q, k, v = rand((B, S, NH, D), 6), rand((B, S, NKV, D), 7), rand((B, S, NKV, D), 8)
    mask = make_causal_mask(S, S)[None, None]
    ref = mha(q, k, v, mask=mask)
    out = flash_attention(q, k, v, causal=True, block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_left_padding_bounds_match_mha():
    """kv_start per row (left padding) + causal, the prefill configuration."""
    B, S, NH, NKV, D = 2, 20, 4, 2, 16
    q, k, v = rand((B, S, NH, D), 9), rand((B, S, NKV, D), 10), rand((B, S, NKV, D), 11)
    starts = jnp.asarray([3, 0], jnp.int32)
    pad = (jnp.arange(S)[None, :] >= starts[:, None])[:, None, None, :]
    mask = combine_masks(make_causal_mask(S, S)[None, None], pad)
    ref = mha(q, k, v, mask=mask)
    out = flash_attention(
        q, k, v, causal=True, kv_start=starts, block_q=8, block_kv=8, interpret=True
    )
    # compare only valid query rows (padded rows see no valid kv in ref too,
    # but ref softmaxes over -inf → ours guards l=0; both are don't-care)
    o, r = np.asarray(out), np.asarray(ref)
    for b in range(B):
        s0 = int(starts[b])
        np.testing.assert_allclose(o[b, s0:], r[b, s0:], atol=2e-5, rtol=2e-5)


def test_kv_end_bound():
    B, S, T, NH, NKV, D = 1, 8, 32, 2, 2, 16
    q, k, v = rand((B, S, NH, D), 12), rand((B, T, NKV, D), 13), rand((B, T, NKV, D), 14)
    end = jnp.asarray([20], jnp.int32)
    pad = (jnp.arange(T)[None, :] < end[:, None])[:, None, None, :]
    ref = mha(q, k, v, mask=pad)
    out = flash_attention(q, k, v, kv_end=end, block_q=8, block_kv=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16_runs_and_close():
    B, S, NH, NKV, D = 1, 64, 4, 2, 32
    q = rand((B, S, NH, D), 15).astype(jnp.bfloat16)
    k = rand((B, S, NKV, D), 16).astype(jnp.bfloat16)
    v = rand((B, S, NKV, D), 17).astype(jnp.bfloat16)
    ref = mha(q, k, v)
    out = flash_attention(q, k, v, block_q=32, block_kv=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_flash_prefill_integration_matches_masked_path(monkeypatch):
    """qwen3 prefill with prefill_padding='left' must match the XLA masked
    cache path (flash forced on via interpret mode)."""
    import jax

    from vggt_qwen3_tpu.config import Qwen3Config
    from vggt_qwen3_tpu.models import qwen3 as q3
    from vggt_qwen3_tpu.ops.flash_attention import flash_attention as fa

    monkeypatch.setattr(q3, "flash_eligible", lambda s, t, d: True)
    monkeypatch.setattr(
        q3,
        "attend",
        lambda q, k, v, **kw: fa(q, k, v, interpret=True, block_q=8, block_kv=8, **kw),
    )
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=8, intermediate_size=64, rope_theta=1e4, tie_word_embeddings=True,
    )
    params = q3.init_params(jax.random.PRNGKey(0), cfg, dtype="float32")
    B, S, total = 2, 12, 20
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 128, (B, S)))
    am = np.ones((B, total), np.int32)
    am[:, S:] = 0
    am[0, :4] = 0  # left padding, row 0
    am = jnp.asarray(am)
    pos = jnp.maximum(jnp.cumsum(am[:, :S], -1) - 1, 0)
    cache = q3.init_cache(cfg, B, total, dtype="float32")

    ref, _ = q3.forward(params, cfg, input_ids=ids, attention_mask=am,
                        positions=pos, cache=cache, cache_offset=0)
    out, _ = q3.forward(params, cfg, input_ids=ids, attention_mask=am,
                        positions=pos, cache=cache, cache_offset=0,
                        prefill_padding="left")
    r, o = np.asarray(ref), np.asarray(out)
    valid = np.asarray(am[:, :S]).astype(bool)
    np.testing.assert_allclose(o[valid], r[valid], atol=2e-4, rtol=2e-4)


def test_flash_has_gradients_via_xla_reference():
    """custom_vjp: Pallas forward, XLA-reference backward — training through
    the vision tower must not crash on the missing pallas autodiff rule, and
    gradients must match the pure-XLA path."""
    import jax

    B, S, NH, NKV, D = 1, 16, 4, 2, 16
    q, k, v = rand((B, S, NH, D), 20), rand((B, S, NKV, D), 21), rand((B, S, NKV, D), 22)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, block_q=8, block_kv=8, interpret=True).sum()

    def loss_ref(q, k, v):
        return mha(q, k, v).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_mha_per_head_mask_contract():
    """mha must honor a full [B, NH, S, T] per-head mask (was silently
    misaligned against the grouped score layout)."""
    B, S, T, NH, NKV, D = 1, 6, 6, 4, 2, 8
    q, k, v = rand((B, S, NH, D), 23), rand((B, T, NKV, D), 24), rand((B, T, NKV, D), 25)
    rng = np.random.default_rng(26)
    mask = jnp.asarray(rng.random((B, NH, S, T)) > 0.3)
    mask = mask.at[:, :, :, 0].set(True)  # keep ≥1 valid key per row
    out = mha(q, k, v, mask=mask)
    # oracle: repeat KV to NH and compute per-head softmax attention
    kr = jnp.repeat(k, NH // NKV, axis=2)
    vr = jnp.repeat(v, NH // NKV, axis=2)
    scores = jnp.einsum("bshd,bthd->bhst", q, kr) * (D**-0.5)
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhst,bthd->bshd", probs, vr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

