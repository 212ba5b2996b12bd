"""Token-level parity of our JAX Qwen3 vs transformers' Qwen3 (CPU, fp32).

This is the gate from SURVEY.md §7.2 step 2: logits parity on fixed prompts,
with and without padding, and prefill+decode KV-cache consistency.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import Qwen3Config as HFQwen3Config
from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import Qwen3Config
from vggt_qwen3_tpu.models import qwen3
from vggt_qwen3_tpu.models.convert_qwen3 import config_from_hf, convert_state_dict


def make_tiny_pair(tie=True, seed=0):
    hf_cfg = HFQwen3Config(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=128,
        rope_theta=10_000.0,
        tie_word_embeddings=tie,
        max_position_embeddings=2048,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    hf_model = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    cfg = config_from_hf(hf_cfg)
    params = convert_state_dict(hf_model.state_dict(), cfg, dtype="float32")
    return hf_model, cfg, params


def test_logits_parity_full_sequence():
    hf_model, cfg, params = make_tiny_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _ = qwen3.forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_logits_parity_untied_head():
    hf_model, cfg, params = make_tiny_pair(tie=False, seed=1)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, size=(1, 9))
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _ = qwen3.forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_logits_parity_left_padding():
    """Left-padded batch with HF position_ids semantics (inference path)."""
    hf_model, cfg, params = make_tiny_pair(seed=2)
    rng = np.random.default_rng(2)
    B, S = 2, 12
    ids = rng.integers(0, cfg.vocab_size, size=(B, S))
    mask = np.ones((B, S), dtype=np.int64)
    mask[0, :4] = 0  # left padding on row 0
    position_ids = np.maximum(mask.cumsum(-1) - 1, 0)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(position_ids),
        ).logits.numpy()
    ours, _ = qwen3.forward(
        params,
        cfg,
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        positions=jnp.asarray(position_ids),
    )
    ours = np.asarray(ours)
    # Compare only valid (non-pad) positions; pad rows see different masks.
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], atol=2e-4, rtol=2e-4)


def test_kv_cache_prefill_decode_matches_full():
    """prefill(S) + decode(1)*k must equal the cache-free full forward."""
    _, cfg, params = make_tiny_pair(seed=3)
    rng = np.random.default_rng(3)
    B, S, extra = 2, 7, 3
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, S + extra)))

    full_logits, _ = qwen3.forward(params, cfg, input_ids=ids)

    max_len = S + extra
    cache = qwen3.init_cache(cfg, B, max_len, dtype="float32")
    mask = jnp.zeros((B, max_len), dtype=jnp.int32).at[:, :S].set(1)
    logits, cache = qwen3.forward(
        params, cfg, input_ids=ids[:, :S], attention_mask=mask, cache=cache, cache_offset=0
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :S]), atol=1e-4, rtol=1e-4
    )
    for t in range(extra):
        mask = mask.at[:, S + t].set(1)
        step_logits, cache = qwen3.forward(
            params,
            cfg,
            input_ids=ids[:, S + t : S + t + 1],
            attention_mask=mask,
            cache=cache,
            cache_offset=S + t,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, S + t]),
            atol=1e-4,
            rtol=1e-4,
        )


def test_bf16_forward_runs():
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96,
    )
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype="bfloat16")
    ids = jnp.arange(10)[None, :] % cfg.vocab_size
    logits, _ = qwen3.forward(params, cfg, input_ids=ids)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())
