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
