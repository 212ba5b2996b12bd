"""Block-wise 8-bit Adam (train/adam8bit.py): memory shape, exactness of the
storage round-trip at step scale, and trajectory quality vs exact AdamW."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vggt_qwen3_tpu.train.adam8bit import (
    BLOCK, Adam8bitState, adamw8bit, scale_by_adam8bit,
)


def _problem(seed=0, dim=700):  # deliberately not a BLOCK multiple
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((dim, dim)) / np.sqrt(dim), jnp.float32)
    b = jnp.asarray(rng.standard_normal((dim,)), jnp.float32)
    params = {
        "w": jnp.asarray(rng.standard_normal((dim, dim)) * 0.02, jnp.float32),
        "c": jnp.asarray(rng.standard_normal((dim,)) * 0.02, jnp.float32),
    }

    def loss(p):
        r = A @ p["c"] + p["w"].sum(axis=1) - b
        return (r * r).mean() + 1e-3 * (p["w"] ** 2).mean()

    return params, jax.jit(jax.value_and_grad(loss))


def test_moment_storage_is_int8_blocks():
    params, grad_fn = _problem()
    tx = scale_by_adam8bit()
    state = tx.init(params)
    assert isinstance(state, Adam8bitState)
    def qleaves(tree):
        return jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, dict) and "q" in x
        )

    for leaf in qleaves(state.mu_q):
        assert leaf["q"].dtype == jnp.int8
        assert leaf["q"].shape[1] == BLOCK
        assert leaf["s"].dtype == jnp.float32
    # int8 moments ≈ n_params × 2 bytes (+ scales/64) vs 8 bytes f32
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_bytes = sum(
        l["q"].size + l["s"].size * 4
        for tree in (state.mu_q, state.nu_q)
        for l in qleaves(tree)
    )
    assert n_bytes < 2.2 * n_params


def test_trajectory_tracks_exact_adamw():
    """50 steps on a quadratic: the 8-bit trajectory's loss must track exact
    AdamW closely (blockwise absmax keeps relative moment error ~1/254)."""
    params_q, grad_fn = _problem(1)
    params_e = jax.tree.map(jnp.copy, params_q)
    tx_q = adamw8bit(1e-2, weight_decay=1e-4)
    tx_e = optax.adamw(1e-2, weight_decay=1e-4)
    s_q, s_e = tx_q.init(params_q), tx_e.init(params_e)

    losses_q, losses_e = [], []
    for _ in range(50):
        lq, gq = grad_fn(params_q)
        uq, s_q = tx_q.update(gq, s_q, params_q)
        params_q = optax.apply_updates(params_q, uq)
        le, ge = grad_fn(params_e)
        ue, s_e = tx_e.update(ge, s_e, params_e)
        params_e = optax.apply_updates(params_e, ue)
        losses_q.append(float(lq))
        losses_e.append(float(le))

    # both optimize; final losses within 5% of the initial-loss scale
    assert losses_q[-1] < losses_q[0] * 0.5
    assert abs(losses_q[-1] - losses_e[-1]) < 0.05 * abs(losses_e[0])
    # drift stays bounded through the run, measured against the problem's
    # loss scale (late-run losses → 0 make pointwise relative error
    # meaningless; mid-run transients re-converge — the mean is the gate)
    scale = abs(losses_e[0])
    drift = [abs(a - b) / scale for a, b in zip(losses_q, losses_e)]
    assert max(drift) < 0.12
    assert sum(drift) / len(drift) < 0.03


def test_first_step_matches_exact_adam_bitwise_scale():
    """Step 1 from zero moments: mu = (1-b1)·g, nu = (1-b2)·g² — the
    quantize/dequantize round-trip error must stay at int8 resolution."""
    params, grad_fn = _problem(2, dim=300)
    _, g = grad_fn(params)
    tx_q, tx_e = scale_by_adam8bit(), optax.scale_by_adam()
    u_q, _ = tx_q.update(g, tx_q.init(params), params)
    u_e, _ = tx_e.update(g, tx_e.init(params), params)
    for a, b in zip(jax.tree.leaves(u_q), jax.tree.leaves(u_e)):
        # Adam's first step is sign(g)-ish (±1); int8 blockwise keeps it
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.04)


def test_chunked_update_matches_one_shot():
    """Leaves above chunk_blocks×BLOCK stream through lax.map. Blocks are
    mathematically independent, so chunking changes nothing but XLA's fusion
    choices (FMA formation / div-to-mul inside the scan body flip the last
    ulp) — moment codes must agree to ±1, and updates to ~1 code of
    feedback (a boundary flip re-enters at scale/127 on later steps).
    Covers non-BLOCK-multiple leaves (dim 700 →
    partial last block) and non-chunk-multiple block counts (1914 % 64 ≠ 0
    → the padded-chunk path)."""
    params, grad_fn = _problem(4, dim=700)
    variants = {
        "one-shot": scale_by_adam8bit(chunk_blocks=1 << 30),
        "chunk64": scale_by_adam8bit(chunk_blocks=64),
        "chunk7": scale_by_adam8bit(chunk_blocks=7),
    }
    states = {k: tx.init(params) for k, tx in variants.items()}
    p = {k: jax.tree.map(jnp.copy, params) for k in variants}
    for _ in range(3):
        outs = {}
        for k, tx in variants.items():
            _, g = grad_fn(p[k])
            u, states[k] = tx.update(g, states[k], p[k])
            p[k] = optax.apply_updates(p[k], u)
            outs[k] = u
        for k in ("chunk64", "chunk7"):
            for a, b in zip(
                jax.tree.leaves(outs["one-shot"]), jax.tree.leaves(outs[k])
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
                )
            for a, b in zip(
                jax.tree.leaves(states["one-shot"]), jax.tree.leaves(states[k])
            ):
                a, b = np.asarray(a), np.asarray(b)
                if a.dtype == np.int8:  # moment codes: ±1 code of drift
                    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1
                else:  # scales / count
                    np.testing.assert_allclose(a, b, rtol=1e-4, atol=0)


def test_multisteps_composition():
    """optax.MultiSteps(adamw8bit, k): accumulates k micro-grads then applies
    one 8-bit update — the bench's timed grad-accum cycle shape."""
    params, grad_fn = _problem(3, dim=300)
    k = 3
    tx = optax.MultiSteps(adamw8bit(1e-2), every_k_schedule=k)
    state = tx.init(params)
    l0, _ = grad_fn(params)
    for i in range(2 * k):
        _, g = grad_fn(params)
        u, state = tx.update(g, state, params)
        params = optax.apply_updates(params, u)
    l1, _ = grad_fn(params)
    assert float(l1) < float(l0)
    assert int(state.mini_step) == 0  # completed whole cycles


def test_trainer_optimizer_yaml_option_sharded_step():
    """train.optimizer: adamw8bit is a first-class trainer option: the
    sharded train step runs on the virtual mesh with int8 blocked moments
    (replicated — they don't mirror param shapes) and a finite loss."""
    import dataclasses

    from vggt_qwen3_tpu.config import (
        DataConfig, MeshConfig, PerceiverConfig, Qwen3Config, StageConfig,
        TrainConfig, VLMConfig,
    )
    from vggt_qwen3_tpu.parallel.mesh import build_mesh
    from vggt_qwen3_tpu.parallel.sharding import batch_sharding
    from vggt_qwen3_tpu.train import trainer

    text = Qwen3Config(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128, rope_theta=1e4,
        tie_word_embeddings=True, dtype="float32",
    )
    model = VLMConfig(
        text=text, vision=None,
        projector=PerceiverConfig(latent_dim=64, num_latents=8, num_heads=4,
                                  num_layers=2, ffn_dim=96, dropout=0.0),
        num_vis_tokens=8, geom_tokens=0, vision_backbone="mock",
        mock_vision_dim=32, dtype="float32",
    )
    stage = StageConfig(
        model=model, data=DataConfig(),
        train=TrainConfig(optimizer="adamw8bit", lr=1e-3, proj_lr=1e-3,
                          warmup_ratio=0.0, max_steps=10, grad_accum=1,
                          batch_size_per_device=1),
        mesh=MeshConfig(dp=1, fsdp=2, tp=2),
    )
    mesh = build_mesh(stage.mesh, jax.devices()[:4])

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype="float32")
        return state

    state_shape = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    shardings = trainer.state_shardings(state_shape, mesh)
    state = jax.jit(init_fn, out_shardings=shardings)(jax.random.PRNGKey(0))
    tx = trainer.make_tx(stage, state_shape.params)
    step = trainer.make_train_step(
        stage, tx, image_token_id=500, has_geom=False, state_sharding=shardings
    )

    rng = np.random.default_rng(0)
    B, T = 4, 24
    ids = rng.integers(1, 400, size=(B, T))
    ids[:, 2] = 500
    batch = {
        "pixel_values": jnp.asarray(rng.uniform(0, 1, (B, 1, 3, 28, 28)), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(np.where(np.arange(T)[None] < 4, -100, ids)),
    }
    batch = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # int8 moments present in the sharded opt state
    qs = [l for l in jax.tree.leaves(state.opt_state) if l.dtype == jnp.int8]
    assert qs and all(l.shape[-1] == BLOCK for l in qs)
    # second step (donated state) works too
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_unknown_optimizer_rejected():

    from vggt_qwen3_tpu.config import TrainConfig
    from vggt_qwen3_tpu.train.trainer import build_optimizer

    with np.testing.assert_raises(ValueError):
        build_optimizer(
            TrainConfig(optimizer="sgd", lr=1e-3, proj_lr=1e-3,
                        warmup_ratio=0.0, max_steps=10, grad_accum=1,
                        batch_size_per_device=1),
            labels=None,
        )


def test_adam8bit_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of the int8 blocked moments (the resume contract
    must hold for the 8-bit optimizer too): stepped state round-trips
    bit-exactly, and a restored state continues stepping."""
    from vggt_qwen3_tpu.train import checkpoint as ckpt

    params, grad_fn = _problem(5, dim=300)
    tx = adamw8bit(1e-2, weight_decay=1e-4)
    state = tx.init(params)
    for i in range(3):
        _, g = grad_fn(params)
        u, state = tx.update(g, state, params)
        params = optax.apply_updates(params, u)

    bundle = {"params": params, "opt": state}
    path = tmp_path / "step_3"
    ckpt.save(bundle, path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), bundle
    )
    restored = ckpt.restore(path, abstract)
    for a, b in zip(jax.tree.leaves(bundle), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored optimizer keeps stepping identically to the live one
    _, g = grad_fn(params)
    u_live, _ = tx.update(g, state, params)
    u_rest, _ = tx.update(g, restored["opt"], restored["params"])
    for a, b in zip(jax.tree.leaves(u_live), jax.tree.leaves(u_rest)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
