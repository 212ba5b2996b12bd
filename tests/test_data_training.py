"""Data pipeline + sharded training integration tests."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import (
    DataConfig,
    MeshConfig,
    PerceiverConfig,
    Qwen3Config,
    StageConfig,
    TrainConfig,
    VLMConfig,
)
from vggt_qwen3_tpu.data.collator import MultiViewCollator, data_loader
from vggt_qwen3_tpu.data.dataset import DatasetConfig, MultiSourceDataset, MultiViewJsonDataset
from vggt_qwen3_tpu.data.tokenizer import IMAGE_TOKEN, load_tokenizer
from vggt_qwen3_tpu.parallel.mesh import build_mesh
from vggt_qwen3_tpu.parallel.sharding import batch_sharding
from vggt_qwen3_tpu.train import checkpoint as ckpt
from vggt_qwen3_tpu.train import trainer

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("toy")
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_toy_dataset.py"),
         "--out", str(out), "--scenes", "8", "--views", "2", "--geom"],
        check=True,
    )
    return out


def test_dataset_loading_and_schema(toy_dir):
    ds = MultiViewJsonDataset(DatasetConfig(str(toy_dir / "train.jsonl"), 2, 56, "qa"))
    assert len(ds) == 6
    s = ds[0]
    assert len(s["images"]) == 2 and s["images"][0].dtype == np.uint8
    assert s["question"].startswith("What color")
    assert isinstance(s["answer"], str)
    assert s["scene_id"].startswith("toy_scene")
    assert set(s["geom_token"]) == {"R", "t", "K", "depth_hist"}
    # meta access does not load images (qa_inference sampling path)
    assert "scene_id" in ds.meta(0)


def test_ragged_view_counts_pad_and_collate(toy_dir, tmp_path):
    """Mixed-source batches with different per-record view counts must stack:
    stage1 mixes 8-view scanqa with 1-view sqa3d records — the dataset pads
    ragged views by repeating the last one (code-review r2 finding 1)."""
    import shutil
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    src = next((toy_dir / "images").iterdir())
    rows = []
    for i, n_views in enumerate([1, 3, 2]):
        views = []
        for v in range(n_views):
            p = img_dir / f"s{i}_v{v}.jpg"
            shutil.copy(src, p)
            views.append(str(p))
        # per-view geom with the SAME ragged count as the images (row 1 none)
        geom = None if i == 1 else {
            "R": [[float(v)] * 9 for v in range(n_views)],
            "t": [[0.0] * 3] * n_views,
            "K": [[1.0] * 9] * n_views,
            "depth_hist": [[0.1] * 16] * n_views,
        }
        rows.append({"images": views, "geom_token": geom, "question": "q?",
                     "answer": "a", "scene_id": f"s{i}", "task": "qa"})
    jl = tmp_path / "ragged.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows))

    ds = MultiViewJsonDataset(DatasetConfig(str(jl), 3, 56, "qa"))
    for i in range(3):
        assert len(ds[i]["images"]) == 3, i  # padded to num_views
        g = ds[i]["geom_token"]
        if g is not None:
            assert g["R"].shape == (3, 9), i  # geom views padded too
    tok = load_tokenizer(None)
    collator = MultiViewCollator(56, tok, 128, num_vis_tokens=8, geom_tokens=2)
    batch = collator([ds[0], ds[1], ds[2]])
    assert batch["pixel_values"].shape[:2] == (3, 3)
    assert batch["geom_token"]["R"].shape == (3, 3, 9)  # [B, V, k], ragged mix ok
    assert list(batch["geom_token"]["mask"]) == [True, False, True]


def test_collator_emit_geom_forced(toy_dir):
    """emit_geom=True yields a geom batch even when NO row carries geom —
    the static per-config decision that keeps every host on one compiled
    step (code-review r2 finding 3)."""
    ds = MultiViewJsonDataset(DatasetConfig(str(toy_dir / "train.jsonl"), 2, 56, "qa"))
    tok = load_tokenizer(None)
    collator = MultiViewCollator(56, tok, 128, num_vis_tokens=8, geom_tokens=2,
                                 emit_geom=True)
    s = dict(ds[0])
    s["geom_token"] = None  # no geom anywhere in the batch
    batch = collator([s, s])
    assert batch["geom_token"] is not None
    assert not batch["geom_token"]["mask"].any()
    # SHAPE STABILITY: geom arrays are [B, V, k] whether or not any row
    # carries geom — a with-geom batch must produce identical shapes, or
    # multi-host ranks compile different programs for one global step
    with_geom = collator([ds[0], ds[1]])
    for key in ("R", "t", "K", "depth_hist"):
        assert batch["geom_token"][key].shape == with_geom["geom_token"][key].shape, key
        assert batch["geom_token"][key].shape[1] == 2  # V = padded view count
    # and emit_geom=False suppresses geom even when rows have it
    collator2 = MultiViewCollator(56, tok, 128, num_vis_tokens=8, geom_tokens=2,
                                  emit_geom=False)
    assert collator2([ds[0]])["geom_token"] is None


def test_multisource_schedule_semantics(toy_dir):
    """~100-slot schedule from mix ratios (dataset_builder.py:102-108)."""
    ds = MultiViewJsonDataset(DatasetConfig(str(toy_dir / "train.jsonl"), 1, 56, "qa"))
    multi = MultiSourceDataset({"a": ds, "b": ds}, {"a": 0.7, "b": 0.3})
    assert multi.order.count("a") == 70
    assert multi.order.count("b") == 30
    assert len(multi) == 12
    _ = multi[0], multi[5]  # samples fetch


def test_collator_semantics(toy_dir):
    tok = load_tokenizer(None)
    ds = MultiViewJsonDataset(DatasetConfig(str(toy_dir / "train.jsonl"), 2, 56, "qa"))
    coll = MultiViewCollator(56, tok, max_length=128, num_vis_tokens=16, geom_tokens=2)
    batch = coll([ds[0], ds[1]])
    B, V = 2, 2
    assert batch["pixel_values"].shape == (B, V, 3, 56, 56)
    assert batch["input_ids"].shape[1] >= 16 + 2 + 64  # min_text_length pad
    # prompt + padding are -100; answer ids supervised
    labels = batch["labels"]
    ids = batch["input_ids"]
    img_id = tok.convert_tokens_to_ids(IMAGE_TOKEN)
    for b in range(B):
        pos = np.where(ids[b] == img_id)[0]
        assert len(pos) == 1  # one <image> token per prompt
        sup = labels[b] != -100
        assert sup.sum() > 0
        assert (labels[b][sup] == ids[b][sup]).all()
        assert (labels[b][: int(pos[0]) + 1] == -100).all()  # prompt masked
    # geometry stacked with mask
    assert batch["geom_token"]["R"].shape == (B, V, 9)
    assert batch["geom_token"]["mask"].all()


def test_loader_small_dataset_large_batch(toy_dir):
    """batch_size > len(dataset) must still yield full batches (regression:
    the naive epoch loop span an infinite empty loop)."""
    tok = load_tokenizer(None)
    ds = MultiViewJsonDataset(DatasetConfig(str(toy_dir / "train.jsonl"), 1, 56, "qa"))
    coll = MultiViewCollator(56, tok, max_length=96, num_vis_tokens=4, geom_tokens=0)
    it = data_loader(ds, coll, batch_size=10, seed=0)
    batch = next(it)
    assert batch["input_ids"].shape[0] == 10


def _tiny_stage(mesh: MeshConfig) -> StageConfig:
    text = Qwen3Config(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, rope_theta=1e4, tie_word_embeddings=True,
        dtype="float32",
    )
    model = VLMConfig(
        text=text, vision=None,
        projector=PerceiverConfig(latent_dim=64, num_latents=8, num_heads=4, num_layers=2, ffn_dim=96, dropout=0.0),
        num_vis_tokens=8, geom_tokens=0, vision_backbone="mock", mock_vision_dim=32,
        dtype="float32",
    )
    train = TrainConfig(lr=1e-3, proj_lr=1e-3, warmup_ratio=0.0, max_steps=30,
                        grad_accum=1, gradient_clip=1.0)
    return StageConfig(model=model, data=DataConfig(), train=train, mesh=mesh)


def test_sharded_training_loss_decreases():
    mesh_cfg = MeshConfig(dp=2, fsdp=2, tp=2)
    mesh = build_mesh(mesh_cfg, jax.devices()[:8])
    stage = _tiny_stage(mesh_cfg)

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype="float32")
        return state

    rng = jax.random.PRNGKey(0)
    shape = jax.eval_shape(init_fn, rng)
    shardings = trainer.state_shardings(shape, mesh)
    state = jax.jit(init_fn, out_shardings=shardings)(rng)
    tx = trainer.make_tx(stage, shape.params)
    step = trainer.make_train_step(stage, tx, image_token_id=500, has_geom=False,
                                   state_sharding=shardings)

    B, T = 8, 32
    rngnp = np.random.default_rng(0)
    ids = rngnp.integers(1, 400, size=(B, T))
    ids[:, 2] = 500
    bsh = batch_sharding(mesh)
    batch = {
        "pixel_values": jax.device_put(jnp.asarray(rngnp.uniform(0, 1, (B, 1, 3, 28, 28)), jnp.float32), bsh),
        "input_ids": jax.device_put(jnp.asarray(ids), bsh),
        "attention_mask": jax.device_put(jnp.ones((B, T), jnp.int32), bsh),
        "labels": jax.device_put(jnp.asarray(np.where(np.arange(T)[None] < 12, -100, ids)), bsh),
    }
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.5, losses
    assert int(state.step) == 12


def test_checkpoint_save_restore_roundtrip(tmp_path):
    mesh_cfg = MeshConfig(dp=1, fsdp=4, tp=2)
    mesh = build_mesh(mesh_cfg, jax.devices()[:8])
    stage = _tiny_stage(mesh_cfg)

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype="float32")
        return state

    shape = jax.eval_shape(init_fn, jax.random.PRNGKey(7))
    shardings = trainer.state_shardings(shape, mesh)
    state = jax.jit(init_fn, out_shardings=shardings)(jax.random.PRNGKey(7))

    path = tmp_path / "step_5"
    ckpt.save(state, path)
    assert ckpt.latest_step_dir(tmp_path) == path
    abstract = ckpt.abstract_like(shape, shardings)
    restored = ckpt.restore(path, abstract)
    flat_a = jax.tree.leaves(state.params)
    flat_b = jax.tree.leaves(restored.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_fast_forward_reproduces_stream(toy_dir):
    """data_loader(start_batches=k) is bit-identical to batches k.. of the
    uninterrupted stream, including view-dropout randomness (resume contract,
    VERDICT r1 item 10)."""
    from vggt_qwen3_tpu.data.collator import MultiViewCollator, data_loader
    from vggt_qwen3_tpu.data.dataset import DatasetConfig, MultiViewJsonDataset
    from vggt_qwen3_tpu.data.tokenizer import load_tokenizer

    ds = MultiViewJsonDataset(
        DatasetConfig(path_glob=str(toy_dir / "train.jsonl"), num_views=2,
                      image_size=32, task="toy")
    )
    tok = load_tokenizer(None)

    def make(start):
        coll = MultiViewCollator(32, tok, 96, num_vis_tokens=4, geom_tokens=2,
                                 view_dropout=0.5, seed=7)
        return data_loader(ds, coll, 3, shuffle=True, seed=11, start_batches=start)

    full = make(0)
    batches = [next(full) for _ in range(6)]
    resumed = make(4)
    for want in batches[4:]:
        got = next(resumed)
        np.testing.assert_array_equal(got["pixel_values"], want["pixel_values"])
        np.testing.assert_array_equal(got["input_ids"], want["input_ids"])
        np.testing.assert_array_equal(got["labels"], want["labels"])


def test_resume_equivalence_cli(tmp_path):
    """train 6 steps == train 3 + resume + 3: same logged losses after the
    resume point (exact batch stream + stateless per-step rng)."""
    import json as _json
    import subprocess
    import sys

    repo = Path(__file__).resolve().parents[1]

    def run(out_dir, *, stop_at=None, resume=False):
        cmd = [
            sys.executable, "-m", "vggt_qwen3_tpu.train.sft",
            "--config", "configs/toy.yaml", "--output_dir", str(out_dir),
            "--tiny", "--mock_vision", "--max_steps", "6",
            "--save_every_steps", "3", "--log_every_steps", "1",
        ]
        if stop_at is not None:  # early interrupt: same lr-schedule horizon
            cmd += ["--stop_at_step", str(stop_at)]
        if resume:
            cmd += ["--resume"]
        r = subprocess.run(cmd, cwd=repo, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, (r.stdout, r.stderr)

    def losses(out_dir):
        out = {}
        for line in (Path(out_dir) / "metrics.jsonl").read_text().splitlines():
            rec = _json.loads(line)
            out[rec["step"]] = rec["loss"]
        return out

    run(tmp_path / "full")
    run(tmp_path / "split", stop_at=3)
    run(tmp_path / "split", resume=True)

    full = losses(tmp_path / "full")
    split = losses(tmp_path / "split")
    for step in (3, 4, 5):
        assert step in full and step in split, (full.keys(), split.keys())
        np.testing.assert_allclose(split[step], full[step], rtol=1e-5,
                                   err_msg=f"step {step}")


def test_prefetch_loader_bit_identical_and_propagates_errors(toy_dir):
    """VERDICT r4 item 7: the default-on prefetch thread changes WHEN batches
    are built, never WHAT — the stream is bit-identical to the synchronous
    loader, and a producer exception surfaces at the consumer."""
    from vggt_qwen3_tpu.data.collator import prefetch_iter

    tok = load_tokenizer(None)
    ds = MultiViewJsonDataset(DatasetConfig(str(toy_dir / "train.jsonl"), 1, 56, "qa"))
    coll = MultiViewCollator(56, tok, max_length=96, num_vis_tokens=4, geom_tokens=0)
    sync = data_loader(ds, coll, batch_size=4, seed=3, prefetch_batches=0)
    pre = data_loader(ds, coll, batch_size=4, seed=3, prefetch_batches=2)
    for _ in range(6):
        a, b = next(sync), next(pre)
        la = jax.tree.leaves(a)
        lb = jax.tree.leaves(b)
        assert jax.tree.structure(a) == jax.tree.structure(b)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def boom():
        yield {"ok": 1}
        raise RuntimeError("producer failed")

    it = prefetch_iter(boom(), depth=2)
    assert next(it) == {"ok": 1}
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)
