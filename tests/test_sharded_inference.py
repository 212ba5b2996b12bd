"""Tensor-parallel inference: generate() with TP/FSDP-sharded params on the
virtual 8-device mesh — the BASELINE.json requirement that "Qwen3 weights
shard tensor-parallel over ICI" applies to inference, not just training."""

import numpy as np

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import MeshConfig, Qwen3Config
from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate_text
from vggt_qwen3_tpu.models import qwen3
from vggt_qwen3_tpu.parallel.mesh import build_mesh
from vggt_qwen3_tpu.parallel.sharding import param_shardings

CFG = Qwen3Config(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, rope_theta=1e4, tie_word_embeddings=True,
    dtype="float32",
)


def test_generate_with_tp_sharded_params_matches_single_device():
    params = qwen3.init_params(jax.random.PRNGKey(0), CFG, dtype="float32")
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 512, (4, 9)))
    gen_cfg = GenerationConfig(max_new_tokens=10, repetition_penalty=1.1,
                               penalize_prompt=True, pad_token_id=0)
    ref, _ = generate_text(params, CFG, gen_cfg, input_ids=ids)

    mesh = build_mesh(MeshConfig(dp=1, fsdp=2, tp=2), jax.devices()[:4])
    sharded = jax.device_put(params, param_shardings(params, mesh))
    # sanity: the big projections are actually distributed
    sh = sharded["layers"]["wq"].sharding
    assert not sh.is_fully_replicated
    out, _ = generate_text(sharded, CFG, gen_cfg, input_ids=ids)
    assert np.asarray(out).tolist() == np.asarray(ref).tolist()


def test_generate_with_quantized_sharded_params():
    """W8 weights + TP sharding + int8 KV compose."""
    params = qwen3.quantize_params(
        qwen3.init_params(jax.random.PRNGKey(1), CFG, dtype="float32")
    )
    mesh = build_mesh(MeshConfig(dp=1, fsdp=2, tp=2), jax.devices()[:4])
    sharded = jax.device_put(params, param_shardings(params, mesh))
    assert not sharded["layers"]["wq"]["w8"].sharding.is_fully_replicated
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 512, (2, 7)))
    gen_cfg = GenerationConfig(max_new_tokens=8, pad_token_id=0, kv_dtype="int8")
    ref, _ = generate_text(params, CFG, gen_cfg, input_ids=ids)
    out, _ = generate_text(sharded, CFG, gen_cfg, input_ids=ids)
    assert np.asarray(out).tolist() == np.asarray(ref).tolist()


def test_speculative_with_tp_sharded_params():
    """Speculative decoding composes with TP/FSDP sharding: the ragged
    block-verify forward + while_loop run under the partitioner and stay
    token-exact vs the unsharded monolithic scan (the TP-8 latency
    projection assumes exactly this composition)."""
    from vggt_qwen3_tpu.inference.speculative import generate_speculative

    params = qwen3.init_params(jax.random.PRNGKey(2), CFG, dtype="float32")
    ids = jnp.asarray(np.random.default_rng(2).integers(1, 512, (2, 9)))
    mask = jnp.ones(ids.shape, jnp.int32)
    emb = qwen3.embed_tokens(params, ids)
    gen_cfg = GenerationConfig(max_new_tokens=12, repetition_penalty=1.1,
                               pad_token_id=0)
    ref, ref_l = generate_text(params, CFG, gen_cfg, input_ids=ids)

    mesh = build_mesh(MeshConfig(dp=1, fsdp=2, tp=2), jax.devices()[:4])
    sharded = jax.device_put(params, param_shardings(params, mesh))
    semb = qwen3.embed_tokens(sharded, ids)
    toks, lens, _ = generate_speculative(
        sharded, CFG, gen_cfg, inputs_embeds=semb, attention_mask=mask,
        prompt_ids=ids, draft_k=4, ngram=3,
    )
    from vggt_qwen3_tpu.inference.engine import generate

    # compare against the embeds-path reference (same penalize-prompt
    # semantics as the speculative call above)
    ref_e, ref_el = generate(
        params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask, prompt_ids=ids
    )
    assert np.asarray(toks).tolist() == np.asarray(ref_e).tolist()
    assert np.asarray(lens).tolist() == np.asarray(ref_el).tolist()


def test_early_exit_fused_with_tp_sharded_params():
    """Fused while_loop early exit under TP sharding — token-exact."""
    from vggt_qwen3_tpu.inference.engine import generate, generate_early_exit

    params = qwen3.init_params(jax.random.PRNGKey(3), CFG, dtype="float32")
    ids = jnp.asarray(np.random.default_rng(3).integers(1, 512, (2, 8)))
    mask = jnp.ones(ids.shape, jnp.int32)
    emb = qwen3.embed_tokens(params, ids)
    gen_cfg = GenerationConfig(max_new_tokens=10, pad_token_id=0)
    ref, ref_l = generate(params, CFG, gen_cfg, inputs_embeds=emb, attention_mask=mask)

    mesh = build_mesh(MeshConfig(dp=1, fsdp=2, tp=2), jax.devices()[:4])
    sharded = jax.device_put(params, param_shardings(params, mesh))
    semb = qwen3.embed_tokens(sharded, ids)
    toks, lens, steps = generate_early_exit(
        sharded, CFG, gen_cfg, inputs_embeds=semb, attention_mask=mask,
        budget=np.array([6, 4]),
    )
    toks = np.asarray(toks)
    ref = np.asarray(ref)
    assert toks[0, :6].tolist() == ref[0, :6].tolist()
    assert toks[1, :4].tolist() == ref[1, :4].tolist()
    assert np.asarray(lens).tolist() == [6, 4]
    assert steps == 6
