"""Ring attention as a FEATURE, not just an op (VERDICT r3 item 4): the
>16-view path threads ``ring_mesh``/``ring_axis`` from the sft CLI through
``trainer.make_train_step`` → ``vlm.train_forward`` → ``vlm.encode_images``
→ ``vggt.aggregator`` global attention. A 24-view VLM LOSS (and its grads)
on the virtual mesh must match the unsharded path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import (
    DataConfig, MeshConfig, PerceiverConfig, Qwen3Config, StageConfig,
    TrainConfig, VGGTConfig, VLMConfig,
)
from vggt_qwen3_tpu.models import vlm
from vggt_qwen3_tpu.parallel.mesh import build_mesh

V = 24  # views: past the 16-view single-chip envelope the ring exists for

TEXT = Qwen3Config(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128, rope_theta=1e4, tie_word_embeddings=True,
    dtype="float32",
)
VISION = VGGTConfig(
    img_size=56, patch_size=14, embed_dim=32, num_layers=2, num_heads=2,
    num_register_tokens=4, patch_depth=2, dtype="float32",
)
CFG = VLMConfig(
    text=TEXT, vision=VISION, projector=PerceiverConfig(
        latent_dim=64, num_latents=16, num_heads=4, num_layers=2, ffn_dim=128,
        dropout=0.0,
    ),
    num_vis_tokens=16, geom_tokens=0, vision_backbone="vggt", dtype="float32",
)


def _batch(B=2, T=48):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, V, 3, 56, 56)), jnp.float32)
    ids = rng.integers(1, 400, size=(B, T))
    ids[:, 4] = 500
    labels = np.where(np.arange(T)[None] < 8, -100, ids)
    return images, jnp.asarray(ids), jnp.ones((B, T), jnp.int32), jnp.asarray(labels)


def _loss_fn(ring_mesh, ring_axis):
    def f(params, images, ids, mask, labels):
        return vlm.train_forward(
            params, CFG, images=images, geom_token=None, input_ids=ids,
            attention_mask=mask, labels=labels, image_token_id=500,
            ring_mesh=ring_mesh, ring_axis=ring_axis,
        )
    return f


def test_24_view_vlm_loss_and_grads_match_unsharded():
    params = vlm.init_params(jax.random.PRNGKey(0), CFG, dtype="float32")
    images, ids, mask, labels = _batch()

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(_loss_fn(None, None)))(
        params, images, ids, mask, labels
    )

    mesh = build_mesh(MeshConfig(dp=1, fsdp=4, tp=2), jax.devices()[:8])
    # shard_map (inside ring attention) requires a jit around it
    loss, grads = jax.jit(jax.value_and_grad(_loss_fn(mesh, "fsdp")))(
        params, images, ids, mask, labels
    )
    # V·T = 24·21 = 504 global tokens shard 4-way over fsdp
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5, atol=2e-6)
    for key in ("projector", "text"):
        r = jax.tree.leaves(ref_grads[key])[0]
        g = jax.tree.leaves(grads[key])[0]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=5e-4, atol=1e-5
        )


def test_trainer_step_with_ring_axis():
    """The sft CLI surface: make_train_step(ring_axis=...) runs one sharded
    step on the virtual mesh and matches the no-ring step's loss."""
    from vggt_qwen3_tpu.train import trainer

    stage = StageConfig(
        model=CFG, data=DataConfig(),
        train=TrainConfig(lr=5e-6, proj_lr=1e-4, warmup_ratio=0.03,
                          max_steps=10, grad_accum=1, batch_size_per_device=1),
        mesh=MeshConfig(dp=1, fsdp=4, tp=2),
    )
    mesh = build_mesh(stage.mesh, jax.devices()[:8])

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype="float32")
        return state

    state_shape = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    shardings = trainer.state_shardings(state_shape, mesh)
    tx = trainer.make_tx(stage, state_shape.params)

    images, ids, mask, labels = _batch(B=4)
    batch = {
        "pixel_values": images[:4].repeat(2, axis=0)[:4],
        "input_ids": ids.repeat(2, axis=0)[:4],
        "attention_mask": mask.repeat(2, axis=0)[:4],
        "labels": labels.repeat(2, axis=0)[:4],
    }

    losses = {}
    for ring in (None, "fsdp"):
        state = jax.jit(init_fn, out_shardings=shardings)(jax.random.PRNGKey(0))
        step = trainer.make_train_step(
            stage, tx, image_token_id=500, has_geom=False,
            state_sharding=shardings, ring_axis=ring,
        )
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[ring] = float(metrics["loss"])
    assert np.isfinite(losses[None]) and np.isfinite(losses["fsdp"])
    np.testing.assert_allclose(losses["fsdp"], losses[None], rtol=2e-5)


def test_ring_axis_without_sharding_raises():
    from vggt_qwen3_tpu.train import trainer

    stage = StageConfig(
        model=CFG, data=DataConfig(),
        train=TrainConfig(lr=5e-6, proj_lr=1e-4, warmup_ratio=0.03,
                          max_steps=10, grad_accum=1, batch_size_per_device=1),
        mesh=MeshConfig(),
    )
    with pytest.raises(ValueError, match="ring_axis requires"):
        trainer.make_train_step(
            stage, None, image_token_id=500, has_geom=False, ring_axis="fsdp"
        )
