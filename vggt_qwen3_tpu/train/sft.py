"""SFT training CLI.

TPU-idiomatic replacement for the reference's ``accelerate launch
src/train/train_sft.py`` + ``train_fixed.sh`` stack (SURVEY.md §2.9, §3.1):
no memory probing or NCCL env zoo — a typed CLI, a device mesh, and jit.

Usage (reference stage YAMLs load unmodified):

    python -m vggt_qwen3_tpu.train.sft --config configs/stage1_3d.yaml \
        --output_dir ckpts/stage1 [--max_steps N] [--dp 1 --fsdp 8 --tp 1] \
        [--mock_vision] [--tiny] [--resume] [--data_root DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    MeshConfig,
    PerceiverConfig,
    Qwen3Config,
    QWEN3_TINY,
    VGGT_TINY,
    load_stage_config,
)
from ..data.collator import MultiViewCollator, data_loader
from ..data.dataset import DatasetConfig, MultiSourceDataset, MultiViewJsonDataset
from ..data.tokenizer import IMAGE_TOKEN, load_tokenizer
from ..parallel.mesh import build_mesh
from ..parallel.sharding import batch_sharding
from ..utils.logging import MetricLogger
from . import checkpoint as ckpt
from . import trainer


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="VGGT-Qwen3 TPU SFT trainer.")
    p.add_argument("--config", required=True, help="stage YAML (reference schema)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_steps", type=int, default=None, help="override YAML max_steps")
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--fsdp", type=int, default=None)
    p.add_argument("--tp", type=int, default=None)
    p.add_argument("--pp", type=int, default=None, help="pipeline stages (GPipe)")
    p.add_argument(
        "--pp_microbatches", type=int, default=None,
        help="GPipe microbatches per step (default 2·pp); batch must divide by it",
    )
    p.add_argument(
        "--ring", nargs="?", const="fsdp", default=None, metavar="AXIS",
        help="shard VGGT global attention as ring attention over this mesh "
        "axis (default fsdp when given bare) — the >16-view scale-out path; "
        "views·tokens must divide by the axis extent",
    )
    p.add_argument("--mock_vision", action="store_true", help="zero-token vision backend")
    p.add_argument("--tiny", action="store_true", help="tiny model dims (smoke tests)")
    p.add_argument("--resume", action="store_true", help="resume from latest step_<n>/")
    p.add_argument("--data_root", default=None, help="base dir for relative data paths")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--save_every_steps", type=int, default=None, help="override YAML")
    p.add_argument("--log_every_steps", type=int, default=None, help="override YAML")
    p.add_argument(
        "--stop_at_step", type=int, default=None,
        help="stop early WITHOUT changing the lr-schedule horizon "
             "(unlike --max_steps); resume continues to max_steps",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="join a multi-process run via jax.distributed.initialize(); "
             "on TPU pods no further flags are needed",
    )
    p.add_argument("--coordinator_address", default=None, help="host:port (non-TPU)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def build_stage(args) -> "StageConfig":
    # Mesh priority: CLI > YAML `mesh:` block (when it fits the visible
    # devices) > all-devices fsdp (the ZeRO-3-like default).
    mesh_cfg = None
    if args.dp or args.fsdp or args.tp or args.pp:
        mesh_cfg = MeshConfig(dp=args.dp or 1, fsdp=args.fsdp or 1, tp=args.tp or 1,
                              pp=args.pp or 1)
    text_cfg = QWEN3_TINY if args.tiny else None
    vision_cfg = VGGT_TINY if args.tiny else None
    stage = load_stage_config(args.config, text_config=text_cfg, vision_config=vision_cfg, mesh=mesh_cfg)
    n_dev = len(jax.devices())
    if mesh_cfg is None and stage.mesh.num_devices != n_dev:
        if stage.mesh.num_devices != 1:
            print(
                f"note: config mesh {stage.mesh.shape} needs {stage.mesh.num_devices} "
                f"devices, have {n_dev} — falling back to fsdp={n_dev}",
                flush=True,
            )
        stage = dataclasses.replace(stage, mesh=MeshConfig(dp=1, fsdp=n_dev, tp=1))
    if args.tiny:
        stage = dataclasses.replace(
            stage,
            model=dataclasses.replace(
                stage.model,
                num_vis_tokens=min(stage.model.num_vis_tokens, 16),
                geom_tokens=min(stage.model.geom_tokens, 2),
                projector=PerceiverConfig(
                    latent_dim=64, num_latents=min(stage.model.num_vis_tokens, 16),
                    num_heads=4, num_layers=2, ffn_dim=128, dropout=0.1,
                ),
                dtype="float32",
            ),
            # Clamp data dims to the tiny vision tower (448px × 8 views per
            # sample would ship ~86 MB/step through the device tunnel for a
            # smoke run whose image content is irrelevant).
            data=dataclasses.replace(
                stage.data,
                image_size=VGGT_TINY.img_size,
                num_views=min(stage.data.num_views, 2),
                max_length=min(stage.data.max_length, 256),
            ),
        )
    if args.mock_vision:
        stage = dataclasses.replace(
            stage, model=dataclasses.replace(stage.model, vision=None, vision_backbone="mock")
        )
    if args.max_steps:
        stage = dataclasses.replace(
            stage, train=dataclasses.replace(stage.train, max_steps=args.max_steps)
        )
    if args.seed is not None:
        stage = dataclasses.replace(
            stage, train=dataclasses.replace(stage.train, seed=args.seed)
        )
    if args.save_every_steps is not None:
        stage = dataclasses.replace(
            stage, train=dataclasses.replace(stage.train, save_every_steps=args.save_every_steps)
        )
    if args.log_every_steps is not None:
        stage = dataclasses.replace(
            stage, train=dataclasses.replace(stage.train, log_every_steps=args.log_every_steps)
        )
    if args.pp_microbatches is not None:
        stage = dataclasses.replace(
            stage, train=dataclasses.replace(stage.train, pp_microbatches=args.pp_microbatches)
        )
    return stage


def build_data(stage, args, tokenizer, start_batches: int = 0):
    datasets = {}
    for name, glob_path in stage.data.datasets.items():
        datasets[name] = MultiViewJsonDataset(
            DatasetConfig(
                path_glob=glob_path,
                num_views=stage.data.num_views,
                image_size=stage.data.image_size,
                task=name,
                root=args.data_root,
            )
        )
    multi = MultiSourceDataset(datasets, stage.data.mix_ratio)
    n_proc = jax.process_count()
    # Fixed padded text length ALWAYS: the jitted train step compiles once
    # per shape, so a per-batch dynamic max_len scatters minutes-scale
    # recompiles through a 30k-step run — and on multi-host every host must
    # produce identical shapes regardless of its local rows.
    pad_to = max(
        stage.data.max_length,
        stage.model.num_vis_tokens + stage.model.geom_tokens + 64,
    )
    collator = MultiViewCollator(
        stage.data.image_size,
        tokenizer,
        stage.data.max_length,
        num_vis_tokens=stage.model.num_vis_tokens,
        geom_tokens=stage.model.geom_tokens,
        view_dropout=stage.data.view_dropout,
        seed=stage.train.seed,
        pad_to=pad_to,
        # static per-config decision (not per-batch/per-shard): geom tokens
        # configured → every batch runs the geom step with zero-filled rows
        # where absent, so one XLA program serves the whole run on every host
        emit_geom=stage.model.geom_tokens > 0,
    )
    global_batch = stage.train.batch_size_per_device * stage.mesh.dp * stage.mesh.fsdp
    return data_loader(
        multi, collator, global_batch, shuffle=True, seed=stage.train.seed,
        start_batches=start_batches,
        shard_rank=jax.process_index(), shard_count=n_proc,
    )


def main() -> None:
    args = parse_args()
    if args.multihost:
        from ..parallel.multihost import initialize

        initialize(args.coordinator_address, args.num_processes, args.process_id)
    stage = build_stage(args)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    tokenizer = load_tokenizer(
        None if args.tiny else (stage.tokenizer_path or stage.text_model_name)
    )
    image_token_id = tokenizer.convert_tokens_to_ids(IMAGE_TOKEN)

    mesh = build_mesh(stage.mesh)

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype=stage.model.dtype)
        return state

    rng = jax.random.PRNGKey(stage.train.seed)
    state_shape = jax.eval_shape(init_fn, rng)
    shardings = trainer.state_shardings(state_shape, mesh)

    start_step = 0
    resume_dir = ckpt.latest_step_dir(out_dir) if args.resume else None
    if resume_dir is not None:
        abstract = ckpt.abstract_like(state_shape, shardings)
        state = ckpt.restore(resume_dir, abstract)
        start_step = int(state.step)
        print(f"resumed from {resume_dir} at step {start_step}", flush=True)
    else:
        state = jax.jit(init_fn, out_shardings=shardings)(rng)

    # resume-exact data stream: the loader fast-forwards to the absolute
    # batch index (one batch per step) and the collator/loader randomness is
    # a pure function of (seed, batch index) — a resumed run re-sees the
    # exact batch sequence an uninterrupted run would (VERDICT r1 item 10)
    loader = build_data(stage, args, tokenizer, start_batches=start_step)

    tx = trainer.make_tx(stage, state_shape.params)
    is_main = jax.process_index() == 0
    logger = MetricLogger(out_dir) if is_main else None
    bsh = batch_sharding(mesh)

    n_proc = jax.process_count()

    def to_device(tree):
        if n_proc > 1:
            from ..parallel.multihost import global_batch_from_local

            return global_batch_from_local(tree, bsh)
        return jax.tree.map(lambda v: jax.device_put(jnp.asarray(v), bsh), tree)
    base_sched = trainer.cosine_schedule(stage.train.lr, stage.train)
    proj_sched = trainer.cosine_schedule(stage.train.proj_lr or stage.train.lr, stage.train)

    step_fns = {}  # compiled per geom presence
    # per-step rng derives statelessly from (seed, step) so resume reproduces
    # the exact dropout/rng stream without checkpointing a key
    train_rng_base = jax.random.PRNGKey(stage.train.seed + 1)
    max_steps = stage.train.max_steps
    print(
        f"🚀 training: mesh dp={stage.mesh.dp} fsdp={stage.mesh.fsdp} tp={stage.mesh.tp} | "
        f"max_steps={max_steps} grad_accum={stage.train.grad_accum} | "
        f"backend={jax.default_backend()}",
        flush=True,
    )

    stop_step = min(max_steps, args.stop_at_step) if args.stop_at_step else max_steps
    step = start_step
    loader_stall_s = 0.0  # host time blocked on the (prefetched) loader
    loader_it = iter(loader)
    while True:
        t_fetch = time.time()
        batch = next(loader_it)
        loader_stall_s += time.time() - t_fetch
        if step >= stop_step:
            break
        has_geom = batch["geom_token"] is not None
        if has_geom not in step_fns:
            step_fns[has_geom] = trainer.make_train_step(
                stage, tx, image_token_id, has_geom=has_geom,
                state_sharding=shardings, ring_axis=args.ring,
            )
        device_batch = to_device(
            {k: v for k, v in batch.items() if k != "geom_token" and v is not None}
        )
        if has_geom:
            device_batch["geom_token"] = to_device(
                {k: v for k, v in batch["geom_token"].items() if k != "mask"}
            )
        step_rng = jax.random.fold_in(train_rng_base, step)
        state, metrics = step_fns[has_geom](state, device_batch, step_rng)

        if step % stage.train.log_every_steps == 0 and logger is not None:
            loss = float(metrics["loss"])
            logger.console(step, max_steps, loss, float(base_sched(step)), float(proj_sched(step)))
            logger.log(
                step,
                {
                    "loss": loss,
                    "grad_norm": float(metrics["grad_norm"]),
                    "learning_rate_base": float(base_sched(step)),
                    "learning_rate_proj": float(proj_sched(step)),
                    # ≈0 when prefetch keeps up; grows when host decode+
                    # collation can't hide under device step time
                    "loader_stall_s": loader_stall_s,
                },
                max_steps=max_steps,
            )
            loader_stall_s = 0.0
        step += 1
        if stage.train.save_every_steps and step % stage.train.save_every_steps == 0:
            ckpt.save(state, out_dir / f"step_{step}")
            print(f"💾 checkpoint → {out_dir / f'step_{step}'}", flush=True)

    final_dir = out_dir / f"step_{step}"
    if not final_dir.exists():  # a periodic save may have landed on this step
        ckpt.save(state, final_dir)
    if logger is not None:
        logger.close()
    print(f"done at step {step}; final checkpoint → {final_dir}", flush=True)


if __name__ == "__main__":
    main()
