"""Pipeline parallelism (GPipe over a ``pp`` mesh axis) — equivalence vs the
plain layer scan, forward and backward, plus full-train-step integration.

The reference has no PP (its only model-scale strategy is DeepSpeed ZeRO-3,
``src/train/train_sft.py:119-121``); this is the TPU-native strategy beyond
it (SURVEY.md §2.7 "PP"). Because ``parallel/pipeline.py`` only reschedules
*when* each layer runs — never what is computed — the pipelined decoder must
match the monolithic scan to float tolerance, including gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vggt_qwen3_tpu.config import MeshConfig, Qwen3Config
from vggt_qwen3_tpu.models import qwen3
from vggt_qwen3_tpu.parallel.mesh import build_mesh
from vggt_qwen3_tpu.parallel.pipeline import PipelinePlan, pipeline_decoder
from vggt_qwen3_tpu.parallel.sharding import param_shardings

CFG = Qwen3Config(
    vocab_size=128,
    hidden_size=48,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=12,
    intermediate_size=96,
    rope_theta=10_000.0,
    dtype="float32",
)


def _layer_fn(hh, lp, cos, sin, mask):
    hh, _, _ = qwen3._layer_step(CFG, hh, lp, None, None, cos, sin, mask, 0)
    return hh


@pytest.fixture(scope="module")
def setup():
    params = qwen3.init_params(jax.random.PRNGKey(0), CFG, dtype="float32")
    B, S = 4, 10
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, S, CFG.hidden_size)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    from vggt_qwen3_tpu.ops.rope import rope_cos_sin
    from vggt_qwen3_tpu.ops.attention import make_causal_mask

    cos, sin = rope_cos_sin(positions, CFG.head_dim, CFG.rope_theta)
    mask = make_causal_mask(S, S)[None, None]
    return params, h, cos, sin, mask


def _plain(layers, h, cos, sin, mask):
    def body(hh, lp):
        return _layer_fn(hh, lp, cos, sin, jnp.broadcast_to(mask, (hh.shape[0], 1) + mask.shape[2:])), None

    out, _ = jax.lax.scan(body, h, layers)
    return out


def _pp_mesh(pp: int, rest: str = "tp"):
    n = len(jax.devices())
    assert n % pp == 0
    kw = {rest: n // pp} if rest else {}
    return build_mesh(MeshConfig(pp=pp, **kw))


@pytest.mark.parametrize("pp,M", [(2, 2), (2, 4), (4, 4)])
def test_pipeline_forward_matches_scan(setup, pp, M):
    params, h, cos, sin, mask = setup
    mesh = _pp_mesh(pp)
    plan = PipelinePlan(mesh=mesh, num_microbatches=M)
    ref = _plain(params["layers"], h, cos, sin, mask)
    out = pipeline_decoder(
        params["layers"], h, cos, sin, mask, plan=plan, layer_fn=_layer_fn
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_scan(setup):
    params, h, cos, sin, mask = setup
    mesh = _pp_mesh(2)
    plan = PipelinePlan(mesh=mesh, num_microbatches=4)

    def loss_pp(layers, h):
        out = pipeline_decoder(layers, h, cos, sin, mask, plan=plan, layer_fn=_layer_fn)
        return (out.astype(jnp.float32) ** 2).mean()

    def loss_ref(layers, h):
        out = _plain(layers, h, cos, sin, mask)
        return (out.astype(jnp.float32) ** 2).mean()

    g_pp = jax.grad(loss_pp, argnums=(0, 1))(params["layers"], h)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params["layers"], h)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5)


def test_pipeline_forward_under_stage_sharded_params(setup):
    """With the registry's pp stage-sharding on the stacked layers (each rank
    holds L/pp layers), the shard_map in_spec consumes the layout directly."""
    params, h, cos, sin, mask = setup
    mesh = _pp_mesh(2)
    plan = PipelinePlan(mesh=mesh, num_microbatches=2)
    sh = param_shardings({"text": params}, mesh)["text"]
    placed = jax.device_put(params, sh)
    # the layer dim must actually be stage-sharded over pp
    spec = sh["layers"]["wq"].spec
    assert spec[0] == "pp"
    ref = _plain(params["layers"], h, cos, sin, mask)
    out = jax.jit(
        lambda ls, hh: pipeline_decoder(ls, hh, cos, sin, mask, plan=plan, layer_fn=_layer_fn)
    )(placed["layers"], h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_validates_divisibility(setup):
    params, h, cos, sin, mask = setup
    mesh = _pp_mesh(2)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_decoder(
            params["layers"], h, cos, sin, mask,
            plan=PipelinePlan(mesh=mesh, num_microbatches=3), layer_fn=_layer_fn,
        )
    cfg3 = Qwen3Config(
        vocab_size=128, hidden_size=48, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=12, intermediate_size=96, dtype="float32",
    )
    p3 = qwen3.init_params(jax.random.PRNGKey(1), cfg3, dtype="float32")
    with pytest.raises(ValueError, match="pp"):
        pipeline_decoder(
            p3["layers"], h, cos, sin, mask,
            plan=PipelinePlan(mesh=mesh, num_microbatches=2), layer_fn=_layer_fn,
        )


def test_forward_hidden_pipeline_kwarg(setup):
    """qwen3.forward_hidden(pipeline=...) routes the training path through the
    pipeline and matches the default scan."""
    params, h, _, _, _ = setup
    mesh = _pp_mesh(2)
    plan = PipelinePlan(mesh=mesh, num_microbatches=2)
    amask = jnp.ones(h.shape[:2], jnp.int32).at[:, -2:].set(0)
    ref, _ = qwen3.forward_hidden(params, CFG, h, attention_mask=amask)
    out, _ = qwen3.forward_hidden(params, CFG, h, attention_mask=amask, pipeline=plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _tiny_vlm_batch():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    stage = ge._tiny_stage()
    B, T = 4, 24
    rngnp = np.random.default_rng(3)
    ids = rngnp.integers(1, 400, size=(B, T))
    ids[:, 4] = 500
    batch = {
        "pixel_values": jnp.asarray(rngnp.uniform(0, 1, (B, 2, 3, 56, 56)), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(np.where(np.arange(T)[None] < 8, -100, ids)),
    }
    return stage, batch


def test_vlm_loss_pipeline_matches_plain_same_mesh():
    """Same pp=2 mesh, same registry-placed params: train_forward with the
    pipeline plan matches train_forward without it (only the layer schedule
    changes, so drift is pure float reassociation)."""
    from vggt_qwen3_tpu.models import vlm
    from vggt_qwen3_tpu.parallel.sharding import shard_batch

    stage, batch = _tiny_vlm_batch()
    mesh = build_mesh(MeshConfig(dp=2, tp=2, pp=2))
    plan = PipelinePlan(mesh=mesh, num_microbatches=4)
    params = vlm.init_params(jax.random.PRNGKey(0), stage.model, dtype="float32")
    params = jax.device_put(params, param_shardings(params, mesh))
    batch = shard_batch(batch, mesh)

    def loss(params, batch, plan):
        return vlm.train_forward(
            params, stage.model, images=batch["pixel_values"], geom_token=None,
            input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
            labels=batch["labels"], image_token_id=500, pipeline=plan,
        )

    ref = float(jax.jit(lambda p, b: loss(p, b, None))(params, batch))
    out = float(jax.jit(lambda p, b: loss(p, b, plan))(params, batch))
    assert abs(out - ref) < 2e-5, (out, ref)


@pytest.mark.parametrize("lora", [False, True])
def test_train_step_runs_on_pp_mesh(lora):
    """Full sharded train step (two-group AdamW + accum + clip) on a
    dp×tp×pp mesh: the trainer auto-builds the pipeline plan from the mesh,
    the step runs, loss is finite, and a second (donated-state) call works.
    With ``lora=True`` the stacked adapters ([L, ...] under text.layers.lora)
    stage-shard over pp alongside the base weights and train through the
    pipelined layer_fn."""
    import dataclasses

    from vggt_qwen3_tpu.config import LoRAConfig
    from vggt_qwen3_tpu.parallel.sharding import shard_batch
    from vggt_qwen3_tpu.train import trainer

    stage, batch = _tiny_vlm_batch()
    if lora:
        stage = dataclasses.replace(
            stage, lora=LoRAConfig(enable=True, rank=4, alpha=8, dropout=0.0)
        )
    mesh = build_mesh(MeshConfig(dp=2, tp=2, pp=2))

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype="float32")
        return state

    rng = jax.random.PRNGKey(0)
    state_shape = jax.eval_shape(init_fn, rng)
    shardings = trainer.state_shardings(state_shape, mesh)
    state = jax.jit(init_fn, out_shardings=shardings)(rng)
    tx = trainer.make_tx(stage, state_shape.params)
    step = trainer.make_train_step(
        stage, tx, image_token_id=500, has_geom=False, state_sharding=shardings
    )
    batch = shard_batch(batch, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    l0 = float(metrics["loss"])
    assert np.isfinite(l0) and float(metrics["grad_norm"]) > 0
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
