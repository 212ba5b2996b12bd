"""ARKit RoomPlan action-JSON inference CLI — reference
``src/inference/arkit_inference.py`` rebuilt TPU-first.

Observable behavior preserved (SURVEY.md §3.3): system-hint prompt
(``arkit_inference.py:249-254``), first-N-scenes sample selection with no
shuffling (``:114-133``), greedy decode with repetition penalty 1.1 +
``no_repeat_ngram_size=4`` and ``max_new_tokens=256`` (``:274-284``), prompt
echo stripping + first-balanced-JSON extraction (``:147-179``), and the inline
exact-match metric over sort-keys-canonicalized references (``:320-348``).

    python -m vggt_qwen3_tpu.inference.arkit --config configs/stage2_arkit.yaml \
        --glob 'data/processed/arkit_synth/*.json' --max_scenes 9 \
        --output_jsonl out.jsonl [--tiny] [--mock_vision]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple


from ..config import StageConfig
from ..data.dataset import DatasetConfig, MultiViewJsonDataset
from ..data.tokenizer import IMAGE_TOKEN, load_tokenizer
from .batching import generate_batch, max_prompt_len
from .engine import GenerationConfig
from .postprocess import extract_first_json, postprocess_arkit_generation
from .qa import build_stage, load_model

SYSTEM_HINT = (
    "You are a RoomPlan assistant. Given multi-view images and an instruction, "
    "reply with only the final JSON action using keys action, scene, center, normal, extent. "
    "Do not repeat the instruction text."
)


def load_arkit_samples(glob_pattern: str, max_scenes: int, num_views: int,
                       image_size: int, root: Optional[str] = None) -> List[Dict]:
    """First N scenes, no shuffling (arkit_inference.py:114-133)."""
    dataset = MultiViewJsonDataset(
        DatasetConfig(path_glob=glob_pattern, num_views=num_views,
                      image_size=image_size, task="arkit_synth", root=root)
    )
    return [dataset[i] for i in range(min(max_scenes, len(dataset)))]


def run_inference(
    params,
    stage: StageConfig,
    tokenizer,
    samples: List[Dict],
    *,
    max_new_tokens: int = 256,
    batch_size: int = 4,
    output_path: Optional[Path] = None,
    compute_metrics: bool = True,
    verbose: bool = True,
    constrained_json: bool = False,
    speculative: bool = False,
) -> Tuple[List[Dict], Optional[Dict[str, float]]]:
    """``constrained_json=True`` masks the decode to the action-JSON schema
    FSM (``inference/constrained.py``) — every generation is a parseable
    ``{action, scene, center, normal, extent}`` object by construction.
    OFF by default: parity/EM runs reproduce the reference's free decode +
    post-hoc brace extraction (``arkit_inference.py:166-179``).

    ``speculative=True`` decodes via prompt-lookup speculative blocks
    (token-exact — ``inference/speculative.py``); the action JSON's repeated
    key skeleton is the high-acceptance case. OFF by default."""
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        repetition_penalty=1.1,
        no_repeat_ngram=4,
        penalize_prompt=False,
    )
    constraint = None
    if constrained_json:
        import jax.numpy as jnp

        from .constrained import action_json_constraint

        constraint = jnp.asarray(
            action_json_constraint(tokenizer, vocab_size=stage.model.text.vocab_size)
        )
    if output_path is not None:
        output_path.parent.mkdir(parents=True, exist_ok=True)
        output_path.write_text("", encoding="utf-8")

    results: List[Dict] = []
    total_with_ref = 0
    total_exact = 0
    all_questions = [s.get("question") or s.get("instruction") or "" for s in samples]
    pad_to_len = max_prompt_len(
        tokenizer, [f"{SYSTEM_HINT}\nInstruction: {q}\n{IMAGE_TOKEN}\n" for q in all_questions]
    )
    for start in range(0, len(samples), batch_size):
        chunk = samples[start : start + batch_size]
        questions = all_questions[start : start + batch_size]
        prompts = [f"{SYSTEM_HINT}\nInstruction: {q}\n{IMAGE_TOKEN}\n" for q in questions]
        tokens, lengths = generate_batch(
            params, stage, tokenizer, chunk, prompts, gen_cfg,
            pad_to_len=pad_to_len, pad_to_batch=batch_size, constraint=constraint,
            speculative=speculative,
        )

        for j, sample in enumerate(chunk):
            idx = start + j
            raw_text = tokenizer.decode(tokens[j][: lengths[j]], skip_special_tokens=True).strip()
            # generation contains only new tokens (no prompt echo in our
            # engine), but keep the reference's cleanup for byte-parity
            cleaned = postprocess_arkit_generation(raw_text, prompts[j], questions[j])
            prediction = extract_first_json(cleaned)
            raw_pred = extract_first_json(raw_text)
            reference = sample.get("answer")
            record = {
                "index": idx,
                "scene_id": sample.get("scene_id"),
                "question": questions[j],
                "prediction": prediction,
                "raw_prediction": raw_pred,
                "reference": reference,
            }
            results.append(record)
            if output_path is not None:
                with output_path.open("a", encoding="utf-8") as f:
                    f.write(json.dumps(record, ensure_ascii=False) + "\n")
            if compute_metrics and reference is not None:
                total_with_ref += 1
                ref_str = (
                    json.dumps(reference, sort_keys=True)
                    if isinstance(reference, (dict, list))
                    else str(reference)
                )
                if ref_str.strip() == prediction.strip():
                    total_exact += 1
            if verbose:
                print(f"[{idx}] {questions[j]}\n → {prediction}", flush=True)

    metrics: Optional[Dict[str, float]] = None
    if compute_metrics and total_with_ref > 0:
        metrics = {
            "num_samples": len(samples),
            "num_with_reference": total_with_ref,
            "exact_match": total_exact / float(total_with_ref),
        }
        if verbose:
            print(
                f"\nSummary over {total_with_ref} samples with reference:"
                f" exact_match = {metrics['exact_match']:.3f}"
            )
    return results, metrics


def main() -> None:
    p = argparse.ArgumentParser(description="ARKit RoomPlan action inference (TPU).")
    p.add_argument("--config", default="configs/stage2_arkit.yaml")
    p.add_argument("--glob", default="data/processed/arkit_synth/*.json")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--max_scenes", type=int, default=9)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--output_jsonl", default="ckpts/arkit_infer/predictions.jsonl")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--data_root", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--mock_vision", action="store_true")
    p.add_argument(
        "--constrained_json", action="store_true",
        help="FSM-mask the decode to the action-JSON schema (100%% parseable "
             "outputs); off by default for reference parity",
    )
    p.add_argument(
        "--speculative", action="store_true",
        help="prompt-lookup speculative decode (token-exact; fastest on the "
             "repetitive action-JSON structure)",
    )
    args = p.parse_args()

    stage = build_stage(args)
    tokenizer = load_tokenizer(None if args.tiny else stage.tokenizer_path or stage.text_model_name)
    params = load_model(stage, args.checkpoint_dir)
    samples = load_arkit_samples(
        args.glob, args.max_scenes, stage.data.num_views, stage.data.image_size, args.data_root
    )
    t0 = time.time()
    run_inference(
        params, stage, tokenizer, samples,
        max_new_tokens=args.max_new_tokens,
        batch_size=args.batch_size,
        output_path=Path(args.output_jsonl) if args.output_jsonl else None,
        constrained_json=args.constrained_json,
        speculative=args.speculative,
    )
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
