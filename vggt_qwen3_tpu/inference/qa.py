"""QA inference CLI (ScanQA/SQA3D) — reference ``src/inference/qa_inference.py``
rebuilt TPU-first.

Observable behavior preserved for EM@1 parity: prompt ``f"{question}\\n<image>\\n"``
(``qa_inference.py:170``), sequence-expanding splice (``:119-145``), greedy +
repetition-penalty 1.1 decoding (``:207-216``), answer-extraction heuristics
(``:220-243``), unique-scene sampling with seed 42 (``:345-361``), JSONL
records (``:246-257``).

TPU-first delta: samples run in **batches** through one compiled
prefill+decode (the reference loops per-sample through HF ``generate``), which
is what makes the 7,231-sample eval and the tok/s targets feasible
(BASELINE.json configs 1-2).

    python -m vggt_qwen3_tpu.inference.qa --config configs/stage1_3d.yaml \
        --glob 'data/processed/scanqa/*.jsonl' --num_samples 50 \
        --max_new_tokens 32 --output_jsonl out.jsonl [--checkpoint_dir DIR] \
        [--tiny] [--mock_vision] [--batch_size 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import random
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QWEN3_TINY, StageConfig, VGGT_TINY, load_stage_config, PerceiverConfig
from ..data.dataset import DatasetConfig, MultiViewJsonDataset
from ..data.tokenizer import IMAGE_TOKEN, load_tokenizer
from ..models import vlm
from .batching import generate_batch, max_prompt_len
from .engine import GenerationConfig
from .postprocess import postprocess_qa_answer


def load_model(stage: StageConfig, checkpoint_dir: Optional[str], rng_seed: int = 0):
    """Init params (optionally restoring a trained checkpoint).

    Checkpoint resolution: an Orbax dir written by our trainer — either a
    ``step_<n>`` dir or a parent containing them (latest wins). This replaces
    the reference's 4-level torch fallback chain (``qa_inference.py:51-105``);
    converting reference torch checkpoints is ``tools/convert_reference_ckpt.py``.
    """
    params = vlm.init_params(jax.random.PRNGKey(rng_seed), stage.model, dtype=stage.model.dtype)
    if not checkpoint_dir:
        return params
    from ..train import checkpoint as ckpt
    from ..train import trainer

    path = Path(checkpoint_dir)
    if not path.exists():
        print(f"⚠️  checkpoint dir {path} does not exist; using base weights")
        return params
    step_dir = path if (path / "_CHECKPOINT_METADATA").exists() else ckpt.latest_step_dir(path)
    if step_dir is None:
        print(f"⚠️  no checkpoint found under {path}; using base weights")
        return params

    def init_fn(rng):
        state, _ = trainer.init_train_state(rng, stage, dtype=stage.model.dtype)
        return state

    shape = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    from ..parallel.mesh import build_mesh
    from ..parallel.sharding import param_shardings

    mesh = build_mesh(None)
    shardings = trainer.state_shardings(shape, mesh)
    abstract = ckpt.abstract_like(shape, shardings)
    state = ckpt.restore(step_dir, abstract)
    print(f"🔄 restored checkpoint {step_dir}")
    return state.params


def pick_unique_scene_samples(dataset: MultiViewJsonDataset, num: int, seed: int) -> List[int]:
    """Random unique-scene subset (qa_inference.py:345-361)."""
    rng = random.Random(seed)
    order = list(range(len(dataset)))
    rng.shuffle(order)
    seen, picked = set(), []
    for idx in order:
        scene = dataset.meta(idx).get("scene_id")
        if scene in seen:
            continue
        seen.add(scene)
        picked.append(idx)
        if len(picked) >= num:
            break
    return picked


def run_inference(
    params,
    stage: StageConfig,
    tokenizer,
    samples: List[Dict],
    *,
    max_new_tokens: int = 64,
    batch_size: int = 8,
    output_path: Optional[Path] = None,
    verbose: bool = True,
    quantize: bool = False,
    kv_dtype: Optional[str] = None,
    quant_mode: str = "w8",
    early_exit: bool = True,
    speculative: bool = False,
    pad_to_len: Optional[int] = None,
    append: bool = False,
    index_base: int = 0,
) -> List[Dict]:
    """``early_exit`` (default on): each batch stops decoding once every row
    hit EOS (token-exact — ``engine.generate_early_exit`` fused mode); with
    the deployment's 1-2-word answers this skips most of the 32-step budget.
    Disable (``--no_early_exit``) to force the fixed-length scan.
    ``speculative``: prompt-lookup speculative decode (also token-exact;
    wins when answers echo prompt spans).

    ``pad_to_len``/``append``/``index_base``: streaming-caller support (the
    full-split soak feeds samples in mega-chunks so images never all load at
    once) — a caller-supplied prompt bucket keeps ONE compiled program
    across chunks, ``append`` continues the output JSONL, ``index_base``
    offsets the record indices."""
    if quantize:  # quantized serving mode (weights + embedding/LM head)
        from ..models import qwen3

        params = dict(params)
        params["text"] = qwen3.quantize_params(
            dict(params["text"]), donate=False, mode=quant_mode
        )
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        repetition_penalty=1.1,
        penalize_prompt=False,  # HF inputs_embeds semantics (qa_inference path)
        kv_dtype=kv_dtype,
    )
    if output_path is not None:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        if not append:
            output_path.write_text("", encoding="utf-8")

    results: List[Dict] = []
    t0 = time.time()
    all_questions = [s.get("question") or s.get("instruction") or "" for s in samples]
    if pad_to_len is None:
        # fixed bucket across the whole run → generate compiles once
        pad_to_len = max_prompt_len(tokenizer, [f"{q}\n{IMAGE_TOKEN}\n" for q in all_questions])
    for start in range(0, len(samples), batch_size):
        chunk = samples[start : start + batch_size]
        questions = all_questions[start : start + batch_size]
        prompts = [f"{q}\n{IMAGE_TOKEN}\n" for q in questions]
        tokens, lengths = generate_batch(
            params, stage, tokenizer, chunk, prompts, gen_cfg,
            pad_to_len=pad_to_len, pad_to_batch=batch_size,
            early_exit=early_exit, speculative=speculative,
        )

        for j, sample in enumerate(chunk):
            raw = tokenizer.decode(tokens[j][: lengths[j]], skip_special_tokens=True)
            text = postprocess_qa_answer(raw, questions[j])
            record = {
                "index": index_base + start + j,
                "task": sample.get("task"),
                "scene_id": sample.get("scene_id"),
                "question": questions[j],
                "prediction": text,
                "reference": sample.get("answer"),
            }
            results.append(record)
            if output_path is not None:
                with output_path.open("a", encoding="utf-8") as f:
                    f.write(json.dumps(record, ensure_ascii=False) + "\n")
            if verbose:
                print(f"[{record['index']}] {questions[j]}\n → {text}", flush=True)
    if verbose:
        dt = time.time() - t0
        print(f"{len(samples)} samples in {dt:.1f}s ({len(samples)/max(dt,1e-9):.2f} samples/s)")
    return results


def build_stage(args) -> StageConfig:
    if (getattr(args, "checkpoint_dir", None) is None
            and not (args.tiny or args.mock_vision)
            and not getattr(args, "random_full", False)):
        # Shared by qa/arkit/server/baseline mains: without a checkpoint the
        # full-size model would be random-init (no pretrained weights are
        # fetchable in this environment) — fall back to a fast smoke config
        # so every CLI runs out-of-the-box (VERDICT r1 item 2).
        print(
            "⚠️  no --checkpoint_dir — falling back to --tiny --mock_vision smoke "
            "mode (random init). Pass --checkpoint_dir for real inference.",
            flush=True,
        )
        args.tiny = True
        args.mock_vision = True
    text_cfg = QWEN3_TINY if args.tiny else None
    vision_cfg = VGGT_TINY if args.tiny else None
    stage = load_stage_config(args.config, text_config=text_cfg, vision_config=vision_cfg)
    if args.tiny:
        stage = dataclasses.replace(
            stage,
            model=dataclasses.replace(
                stage.model,
                num_vis_tokens=min(stage.model.num_vis_tokens, 16),
                projector=PerceiverConfig(
                    latent_dim=64, num_latents=min(stage.model.num_vis_tokens, 16),
                    num_heads=4, num_layers=2, ffn_dim=128, dropout=0.0,
                ),
                dtype="float32",
            ),
            data=dataclasses.replace(stage.data, image_size=min(stage.data.image_size, 56)),
        )
    if args.mock_vision:
        stage = dataclasses.replace(
            stage, model=dataclasses.replace(stage.model, vision=None, vision_backbone="mock")
        )
    return stage


def main() -> None:
    p = argparse.ArgumentParser(description="ScanQA/SQA3D QA inference (TPU).")
    p.add_argument("--config", default="configs/stage1_3d.yaml")
    p.add_argument("--glob", default="data/processed/scanqa/*.jsonl")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--num_samples", type=int, default=20)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--output_jsonl", default="ckpts/qa_infer/qa_predictions.jsonl")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--data_root", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--mock_vision", action="store_true")
    p.add_argument(
        "--no_early_exit", action="store_true",
        help="force the fixed-length decode scan (outputs are identical "
             "either way; early exit just skips steps after every row's EOS)",
    )
    p.add_argument(
        "--speculative", action="store_true",
        help="prompt-lookup speculative decode (token-exact)",
    )
    args = p.parse_args()

    stage = build_stage(args)
    tokenizer = load_tokenizer(None if args.tiny else stage.tokenizer_path or stage.text_model_name)
    params = load_model(stage, args.checkpoint_dir)

    dataset = MultiViewJsonDataset(
        DatasetConfig(
            path_glob=args.glob,
            num_views=stage.data.num_views,
            image_size=stage.data.image_size,
            task="qa",
            root=args.data_root,
        )
    )
    picked = pick_unique_scene_samples(dataset, args.num_samples, args.seed)
    samples = [dataset[i] for i in picked]
    run_inference(
        params, stage, tokenizer, samples,
        max_new_tokens=args.max_new_tokens,
        batch_size=args.batch_size,
        output_path=Path(args.output_jsonl) if args.output_jsonl else None,
        early_exit=not args.no_early_exit,
        speculative=args.speculative,
    )


if __name__ == "__main__":
    main()
