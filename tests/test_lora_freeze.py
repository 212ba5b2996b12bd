"""LoRA adapters, freeze_text_layers masking, and view dropout — the training
capabilities the reference declared in YAML but never wired (SURVEY.md §5.6)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import (
    DataConfig,
    LoRAConfig,
    MeshConfig,
    PerceiverConfig,
    Qwen3Config,
    StageConfig,
    TrainConfig,
    VLMConfig,
    load_stage_config,
)
from vggt_qwen3_tpu.models import qwen3
from vggt_qwen3_tpu.train import trainer

TEXT = Qwen3Config(
    vocab_size=256, hidden_size=64, num_layers=3, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, rope_theta=1e4, tie_word_embeddings=True,
    dtype="float32",
)


def _stage(**kw):
    model = VLMConfig(
        text=TEXT, vision=None,
        projector=PerceiverConfig(latent_dim=64, num_latents=8, num_heads=4, num_layers=2, ffn_dim=96, dropout=0.0),
        num_vis_tokens=8, geom_tokens=0, vision_backbone="mock", mock_vision_dim=32,
        dtype="float32",
    )
    train = TrainConfig(lr=1e-3, proj_lr=1e-3, warmup_ratio=0.0, max_steps=20, grad_accum=1)
    return StageConfig(model=model, data=DataConfig(), train=train, mesh=MeshConfig(), **kw)


def test_lora_init_is_identity():
    """B=0 init: adapted forward equals the base forward exactly."""
    params = qwen3.init_params(jax.random.PRNGKey(0), TEXT, dtype="float32")
    lcfg = LoRAConfig(enable=True, rank=4, alpha=8)
    lparams = qwen3.add_lora(params, TEXT, lcfg, jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 10)))
    base, _ = qwen3.forward(params, TEXT, input_ids=ids)
    lora, _ = qwen3.forward(lparams, TEXT, input_ids=ids)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(lora))


def test_lora_training_updates_only_adapters():
    stage = _stage(lora=LoRAConfig(enable=True, rank=4, alpha=8))
    state, tx = trainer.init_train_state(jax.random.PRNGKey(0), stage, dtype="float32")
    step = trainer.make_train_step(stage, tx, image_token_id=200, has_geom=False)
    B, T = 2, 24
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, (B, T))
    ids[:, 1] = 200
    batch = {
        "pixel_values": jnp.zeros((B, 1, 3, 28, 28), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(np.where(np.arange(T)[None] < 10, -100, ids)),
    }
    before = jax.tree.map(np.asarray, state.params)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    after = jax.tree.map(np.asarray, state.params)

    # base text weights frozen
    np.testing.assert_array_equal(before["text"]["layers"]["wq"], after["text"]["layers"]["wq"])
    np.testing.assert_array_equal(before["text"]["embed"], after["text"]["embed"])
    # adapters moved (B starts at zero; grads flow through x@A)
    assert not np.allclose(
        before["text"]["layers"]["lora"]["wq"]["B"], after["text"]["layers"]["lora"]["wq"]["B"]
    )
    # projector still trains
    assert not np.allclose(before["projector"]["latents"], after["projector"]["latents"])


def test_freeze_text_layers_masks_updates():
    stage = _stage(freeze_text_layers=(0, 1))
    state, tx = trainer.init_train_state(jax.random.PRNGKey(0), stage, dtype="float32")
    step = trainer.make_train_step(stage, tx, image_token_id=200, has_geom=False)
    B, T = 2, 20
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 200, (B, T))
    ids[:, 1] = 200
    batch = {
        "pixel_values": jnp.zeros((B, 1, 3, 28, 28), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(np.where(np.arange(T)[None] < 8, -100, ids)),
    }
    before = np.asarray(state.params["text"]["layers"]["wq"])
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    after = np.asarray(state.params["text"]["layers"]["wq"])
    np.testing.assert_array_equal(before[0], after[0])  # frozen
    np.testing.assert_array_equal(before[1], after[1])  # frozen
    assert not np.allclose(before[2], after[2])  # trains


def test_reference_yaml_lora_and_freeze_parse():
    stage = load_stage_config("/root/reference/configs/stage1_3d.yaml")
    assert stage.lora.enable and stage.lora.rank == 16 and stage.lora.alpha == 32
    assert stage.lora.target_modules == ("q_proj", "k_proj", "v_proj", "o_proj")
    assert stage.freeze_text_layers == (0, 1, 2, 3)


def test_view_dropout_keeps_shapes():
    from vggt_qwen3_tpu.data.collator import MultiViewCollator
    from vggt_qwen3_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(None)
    coll = MultiViewCollator(28, tok, 96, num_vis_tokens=4, geom_tokens=0,
                             view_dropout=0.9, seed=0)
    rng = np.random.default_rng(0)
    sample = {
        "images": [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8) for _ in range(4)],
        "question": "q", "answer": "a", "geom_token": None,
    }
    batch = coll([sample, sample])
    assert batch["pixel_values"].shape == (2, 4, 3, 28, 28)
    # with p=0.9 nearly all non-first views are replaced by duplicates
    pv = batch["pixel_values"][0]
    dup = sum(np.allclose(pv[i], pv[0]) for i in range(1, 4))
    assert dup >= 2


def test_qlora_w8_frozen_base_trains_adapters():
    """The QLoRA single-chip recipe (bench train mode): frozen base W8,
    bf16/f32 LoRA adapters. Backward must flow THROUGH the dequantized int8
    matmuls into the adapters — finite, nonzero grads, a step that lowers
    the loss, and a base forward that stays close to bf16."""
    import optax

    # all-bf16 like the bench: quantized-base activations are bf16, so the
    # adapters must be too (a mixed f32 adapter changes the residual dtype
    # mid-scan, which lax.scan rejects)
    params = qwen3.init_params(jax.random.PRNGKey(0), TEXT, dtype="bfloat16")
    lcfg = LoRAConfig(enable=True, rank=4, alpha=8)
    lparams = qwen3.add_lora(params, TEXT, lcfg, jax.random.PRNGKey(1))

    # quantize the base, re-attach adapters (the bench's init_quantized path)
    lora = lparams["layers"]["lora"]
    qp = qwen3.quantize_params(dict(lparams), donate=False)
    qp["layers"] = dict(qp["layers"], lora=lora)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 256, (2, 12)))
    labels = ids

    def loss_fn(adapters):
        p = dict(qp)
        p["layers"] = dict(p["layers"], lora=adapters)
        logits, _ = qwen3.forward(p, TEXT, input_ids=ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, labels[:, 1:, None], axis=-1).mean()

    l0, grads = jax.jit(jax.value_and_grad(loss_fn))(lora)
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(float(l0)) and np.isfinite(gnorm) and gnorm > 0

    tx = optax.adam(1e-2)
    state = tx.init(lora)
    adapters = lora
    for i in range(5):
        _, g = jax.jit(jax.value_and_grad(loss_fn))(adapters)
        u, state = tx.update(g, state, adapters)
        adapters = optax.apply_updates(adapters, u)
    l1 = float(loss_fn(adapters))
    assert l1 < float(l0)  # the adapters actually learn through the W8 base

    # W8 base forward stays near the bf16 base (near-lossless weight quant;
    # adapters are zero-init B=0 so the quantized forward IS the base)
    base_bf16, _ = qwen3.forward(params, TEXT, input_ids=ids)
    base_w8, _ = qwen3.forward(qp, TEXT, input_ids=ids)
    drift = np.abs(np.asarray(base_w8, np.float32) - np.asarray(base_bf16, np.float32))
    scale = np.abs(np.asarray(base_bf16, np.float32)).max()
    assert drift.max() < 0.08 * max(scale, 1.0)
