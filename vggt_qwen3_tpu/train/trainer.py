"""SFT trainer: sharded train state, two-group AdamW + cosine warmup,
gradient accumulation, frozen-vision masking.

Reproduces the reference training semantics (``src/train/train_sft.py``):

- two parameter groups — base (Qwen3) at ``lr`` and projector+geom head at
  ``proj_lr`` (``train_sft.py:138-156``; cfg ``stage1_3d.yaml:26-27``),
- HF-style cosine schedule with linear warmup over ``warmup_ratio·max_steps``
  (``train_sft.py:158-163``),
- gradient accumulation (``grad_accum``; ``accelerator.accumulate`` in the
  reference) via ``optax.MultiSteps``,
- global-norm gradient clipping 1.0 (reference: DeepSpeed
  ``gradient_clipping`` — ``configs/deepspeed_zero3.json:15``),
- frozen vision tower: zero updates, no optimizer moments
  (``freeze_vision`` — ``vggt_qwen3_vlm.py:44-45``),
- ZeRO-3-equivalent sharding: params/optimizer state sharded over ``fsdp``,
  TP over ``tp``, batch over ``(dp, fsdp)`` — XLA emits the all-gather /
  reduce-scatter that DeepSpeed does by hand (SURVEY.md §2.7).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import StageConfig, TrainConfig, VLMConfig
from ..models import vlm
from ..parallel.sharding import param_shardings


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def cosine_schedule(lr: float, cfg: TrainConfig) -> optax.Schedule:
    """HF get_cosine_schedule_with_warmup equivalent (train_sft.py:158-163)."""
    warmup = max(int(cfg.warmup_ratio * cfg.max_steps), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup,
        # decay_steps counts from step 0 and must exceed warmup (tiny runs
        # with max_steps == warmup would otherwise request 0 decay steps)
        decay_steps=max(cfg.max_steps, warmup + 1),
        end_value=0.0,
    )


def param_group_labels(params: Any, freeze_vision: bool, *, lora: bool = False) -> Any:
    """'base' (Qwen3) / 'proj' (projector + geom head) / 'frozen' (vision).

    Mirrors the reference's name-based grouping (``train_sft.py:138-145``:
    "projector" or "geom_head" in name → proj group). With ``lora=True`` the
    text model's base weights freeze and only the adapters take the base lr —
    the behavior the reference's ``lora:`` block promised but never wired
    (SURVEY.md §5.6)."""

    def label(path, _leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        top = keys[0]
        if top in ("projector", "geom"):
            return "proj"
        if top == "vision":
            return "frozen" if freeze_vision else "base"
        if top == "text" and lora:
            return "base" if "lora" in keys else "frozen"
        return "base"

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_text_layers_mask(frozen: tuple, num_layers: int) -> optax.GradientTransformation:
    """Zero updates for frozen layer indices on stacked text-layer params
    ([L, ...] leading layer axis). Implements the reference's declared-but-
    unwired ``freeze_text_layers`` (stage1_3d.yaml:9, SURVEY.md §5.6)."""
    import numpy as np

    def update_fn(updates, state, params=None):
        del params
        keep = np.ones((num_layers,), np.float32)
        for i in frozen:
            if i < num_layers:  # configs may freeze [0..3] while --tiny has 2 layers
                keep[i] = 0.0

        def mask(path, u):
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            if (
                len(keys) >= 2
                and keys[0] == "text"
                and keys[1] == "layers"
                and hasattr(u, "ndim")
                and u.ndim >= 1
                and u.shape[0] == num_layers
            ):
                k = jnp.asarray(keep, u.dtype).reshape((num_layers,) + (1,) * (u.ndim - 1))
                return u * k
            return u

        return jax.tree_util.tree_map_with_path(mask, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def build_optimizer(
    cfg: TrainConfig,
    labels: Any,
    *,
    freeze_text_layers: tuple = (),
    num_text_layers: int = 0,
) -> optax.GradientTransformation:
    if cfg.optimizer not in ("adamw", "adamw8bit"):
        raise ValueError(f"unknown train.optimizer {cfg.optimizer!r}")

    def adamw(lr: float) -> optax.GradientTransformation:
        if cfg.optimizer == "adamw8bit":
            # block-wise int8 moments (train/adam8bit.py) — 4× smaller
            # optimizer state and half the update's HBM traffic; the
            # single-chip recipe's default companion (TRAINING_GUIDE.md)
            from .adam8bit import scale_by_adam8bit

            return optax.chain(
                scale_by_adam8bit(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_learning_rate(cosine_schedule(lr, cfg)),
            )
        return optax.adamw(
            cosine_schedule(lr, cfg),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        )

    parts = [
        optax.clip_by_global_norm(cfg.gradient_clip),
        optax.multi_transform(
            {
                "base": adamw(cfg.lr),
                "proj": adamw(cfg.proj_lr if cfg.proj_lr is not None else cfg.lr),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    ]
    if freeze_text_layers and num_text_layers:
        parts.append(freeze_text_layers_mask(freeze_text_layers, num_text_layers))
    tx = optax.chain(*parts)
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def make_tx(stage: StageConfig, params_shape: Any) -> optax.GradientTransformation:
    """Optimizer from the stage config; ``params_shape`` may be abstract
    (eval_shape output) — labels only need the tree structure."""
    labels = param_group_labels(
        params_shape, stage.model.freeze_vision, lora=stage.lora.enable
    )
    return build_optimizer(
        stage.train,
        labels,
        freeze_text_layers=stage.freeze_text_layers,
        num_text_layers=stage.model.text.num_layers,
    )


def init_train_state(
    rng: jax.Array, stage: StageConfig, *, dtype: Optional[str] = None
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = vlm.init_params(rng, stage.model, dtype=dtype)
    if stage.lora.enable:
        from ..models import qwen3 as qwen3_mod

        params["text"] = qwen3_mod.add_lora(
            params["text"], stage.model.text, stage.lora, jax.random.fold_in(rng, 7)
        )
    tx = make_tx(stage, params)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)), tx


def state_shardings(state_shape: TrainState, mesh) -> TrainState:
    """Shardings for the whole train state.

    Optimizer-state leaves mirror parameter shapes (AdamW mu/nu, MultiSteps
    accumulators), so the same suffix rules apply; scalar counters replicate.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def maybe(tree):
        return param_shardings(tree, mesh)

    params_sh = maybe(state_shape.params)

    from ..parallel.sharding import path_keys, spec_with_pp

    pp = dict(mesh.shape).get("pp", 1)

    def opt_leaf(path, leaf):
        ndim = len(leaf.shape)
        if ndim == 0:
            return NamedSharding(mesh, P())
        keys = path_keys(path)
        # 8-bit Adam moments are [n_blocks, BLOCK] — they do NOT mirror the
        # param shapes, so the suffix rules (which match on param names in
        # the path) must not assign them a weight layout; replicate (the
        # whole 8-bit state is ~2 bytes/param)
        if any(k in ("mu_q", "nu_q") for k in keys):
            return NamedSharding(mesh, P())
        # other optimizer leaves mirror param shapes — reuse the param rules
        # (incl. pp stage-sharding of text.layers moments/accumulators)
        return NamedSharding(mesh, spec_with_pp(keys, ndim, pp))

    opt_sh = jax.tree_util.tree_map_with_path(opt_leaf, state_shape.opt_state)
    return TrainState(params=params_sh, opt_state=opt_sh, step=NamedSharding(mesh, P()))


def make_train_step(
    stage: StageConfig,
    tx: optax.GradientTransformation,
    image_token_id: int,
    *,
    has_geom: bool,
    state_sharding: Optional[TrainState] = None,
    ring_axis: Optional[str] = None,
):
    """Jitted (state, batch, rng) → (state, metrics). Donates the state.

    ``state_sharding`` (from :func:`state_shardings`) pins the train state's
    in/out shardings so the compiler can't drift them between calls — without
    it the second invocation pays a full recompile when propagated output
    shardings differ from the registry's.

    ``ring_axis`` (needs ``state_sharding``): run VGGT global attention as
    ring attention with the cross-view sequence sharded over that mesh axis
    (``--ring`` in the sft CLI; SURVEY §5.7 >16-view scale-out).
    """
    mcfg: VLMConfig = stage.model

    # Batch-axis constraint for boundary activations: pins the backward
    # cotangents batch-sharded (see vlm.train_forward's act_constraint doc) so
    # the partitioner never hits "involuntary full rematerialization" on the
    # splice/logits transpose ops.
    act_constraint = None
    pipeline = None
    ring_mesh = None
    if ring_axis is not None and state_sharding is None:
        raise ValueError("ring_axis requires state_sharding (a mesh to ring over)")
    if state_sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = jax.tree.leaves(state_sharding.params)[0].mesh

        def act_constraint(x):
            spec = P(("dp", "fsdp"), *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        if ring_axis is not None:
            if dict(mesh.shape).get(ring_axis, 1) < 2:
                raise ValueError(
                    f"ring axis {ring_axis!r} has extent < 2 on mesh {dict(mesh.shape)}"
                )
            ring_mesh = mesh

        pp = dict(mesh.shape).get("pp", 1)
        if pp > 1:
            from ..parallel.pipeline import PipelinePlan

            pipeline = PipelinePlan(
                mesh=mesh,
                num_microbatches=stage.train.pp_microbatches or 2 * pp,
            )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        def loss_fn(params):
            return vlm.train_forward(
                params,
                mcfg,
                images=batch["pixel_values"],
                geom_token=batch.get("geom_token") if has_geom else None,
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                labels=batch["labels"],
                image_token_id=image_token_id,
                rng=rng,
                act_constraint=act_constraint,
                pipeline=pipeline,
                ring_mesh=ring_mesh,
                ring_axis=ring_axis if ring_mesh is not None else None,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    if state_sharding is not None:
        return jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(state_sharding, None, None),
            out_shardings=(state_sharding, None),
        )
    return jax.jit(step_fn, donate_argnums=(0,))
