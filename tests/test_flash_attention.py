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



# ---------------------------------------------------------------------------
# Real Pallas backward (VERDICT r1 item 4): grad parity vs XLA reference
# ---------------------------------------------------------------------------


def _ref_grads(q, k, v, g, *, causal=False, kv_start=None, kv_end=None):
    T = k.shape[1]

    def ref(q, k, v):
        masks = []
        kv_pos = jnp.arange(T)[None, :]
        if kv_start is not None:
            masks.append((kv_pos >= kv_start[:, None])[:, None, None, :])
        if kv_end is not None:
            masks.append((kv_pos < kv_end[:, None])[:, None, None, :])
        if causal:
            masks.append(make_causal_mask(q.shape[1], T)[None, None])
        return mha(q, k, v, mask=combine_masks(*masks) if masks else None)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


def _flash_grads(q, k, v, g, *, causal=False, kv_start=None, kv_end=None, bq=8, bkv=8):
    def fa(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, kv_start=kv_start, kv_end=kv_end,
            block_q=bq, block_kv=bkv, interpret=True,
        )

    _, vjp = jax.vjp(fa, q, k, v)
    return vjp(g)


def _assert_grads_close(a, b, atol=3e-5, names=("dq", "dk", "dv")):
    for ga, gb, name in zip(a, b, names):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=atol, rtol=1e-4, err_msg=name
        )


def test_backward_noncausal_uneven_blocks():
    # S, T not multiples of the blocks: exercises padding in all three kernels
    B, S, T, NH, NKV, D = 2, 13, 21, 4, 2, 16
    q, k, v = rand((B, S, NH, D), 30), rand((B, T, NKV, D), 31), rand((B, T, NKV, D), 32)
    g = rand((B, S, NH, D), 33)
    _assert_grads_close(_flash_grads(q, k, v, g), _ref_grads(q, k, v, g))


def test_backward_causal():
    B, S, NH, NKV, D = 2, 24, 4, 4, 16
    q, k, v = rand((B, S, NH, D), 40), rand((B, S, NKV, D), 41), rand((B, S, NKV, D), 42)
    g = rand((B, S, NH, D), 43)
    _assert_grads_close(
        _flash_grads(q, k, v, g, causal=True), _ref_grads(q, k, v, g, causal=True)
    )


def test_backward_causal_left_padded_gqa():
    B, S, NH, NKV, D = 3, 17, 8, 2, 8
    q, k, v = rand((B, S, NH, D), 50), rand((B, S, NKV, D), 51), rand((B, S, NKV, D), 52)
    g = rand((B, S, NH, D), 53)
    starts = jnp.asarray([0, 3, 9], jnp.int32)
    ends = jnp.asarray([S, S - 2, S], jnp.int32)
    # Dead rows (left padding: q_pos < start attends to nothing) carry zero
    # cotangents in real training (loss-masked); the kernels define their
    # grads as 0 while the XLA ref's all-masked softmax degenerates to
    # uniform — so compare under dead-zeroed cotangents, the real contract.
    live = np.asarray(jnp.arange(S)[None] >= starts[:, None])  # [B, S]
    g = g * jnp.asarray(live)[:, :, None, None]
    gf = _flash_grads(q, k, v, g, causal=True, kv_start=starts, kv_end=ends)
    gr = _ref_grads(q, k, v, g, causal=True, kv_start=starts, kv_end=ends)
    _assert_grads_close(gf, gr)
    # and with arbitrary (nonzero) dead-row cotangents, flash dq there is 0
    g_dirty = rand((B, S, NH, D), 54)
    gf_dirty = _flash_grads(q, k, v, g_dirty, causal=True, kv_start=starts, kv_end=ends)
    assert np.abs(np.asarray(gf_dirty[0])[~live]).max() == 0.0


def test_backward_row_with_no_valid_kv_is_finite():
    # kv_end == 0 for batch row 1: every q row there is dead — grads must be
    # finite, zero for dq, and match the ref under dead-zeroed cotangents
    B, S, NH, NKV, D = 2, 8, 2, 2, 8
    q, k, v = rand((B, S, NH, D), 60), rand((B, S, NKV, D), 61), rand((B, S, NKV, D), 62)
    g = rand((B, S, NH, D), 63)
    ends = jnp.asarray([S, 0], jnp.int32)
    gf = _flash_grads(q, k, v, g, kv_end=ends)
    for t in gf:
        assert np.isfinite(np.asarray(t)).all()
    assert np.abs(np.asarray(gf[0])[1]).max() == 0.0  # dead dq rows
    g = g.at[1].set(0.0)
    _assert_grads_close(
        _flash_grads(q, k, v, g, kv_end=ends), _ref_grads(q, k, v, g, kv_end=ends)
    )


def test_backward_value_and_grad_through_composite_loss():
    # non-trivial cotangents: weighted masked loss, not .sum()
    B, S, NH, NKV, D = 2, 19, 4, 2, 16
    q, k, v = rand((B, S, NH, D), 70), rand((B, S, NKV, D), 71), rand((B, S, NKV, D), 72)
    w = rand((B, S, NH, D), 73)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, block_q=8, block_kv=8, interpret=True)
        return jnp.sum(jnp.tanh(o) * w)

    def loss_ref(q, k, v):
        o = mha(q, k, v, mask=make_causal_mask(S, S)[None, None])
        return jnp.sum(jnp.tanh(o) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    _assert_grads_close(gf, gr)
