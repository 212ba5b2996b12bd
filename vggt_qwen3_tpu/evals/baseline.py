"""Baseline evaluation driver — reference ``scripts/eval_baseline_quick.py``.

Runs QA inference over the SQA3D/ScanQA/ARKit test splits and computes
exact/partial match with the reference's metric semantics
(``eval_baseline_quick.py:36-135``): string refs — exact = case-insensitive
stripped equality, partial = substring either direction; dict refs — partial =
``ref['action'] in pred``, exact = parsed-JSON equality. Writes
``baseline_summary.json`` (``:209-211``).

TPU-first delta: inference runs in-process and batched (the reference
subprocess-spawns a fresh model per dataset), so the model loads once.

    python -m vggt_qwen3_tpu.evals.baseline --config configs/stage1_3d.yaml \
        --num_samples 50 --max_new_tokens 32 --output_dir outputs/qa/baseline_eval \
        [--datasets sqa3d scanqa arkit] [--tiny --mock_vision] [--data_root DIR]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List

from ..data.dataset import DatasetConfig, MultiViewJsonDataset
from ..data.tokenizer import load_tokenizer
from ..inference.qa import build_stage, load_model, pick_unique_scene_samples, run_inference

DEFAULT_GLOBS = {
    "sqa3d": "data/processed/sqa3d/test_split.jsonl",
    "scanqa": "data/processed/scanqa/test_split.jsonl",
    "arkit": "data/processed/arkit_synth/test.json",
}


def compute_metrics(records: List[Dict]) -> Dict[str, float]:
    exact = partial = 0
    total = len(records)
    for rec in records:
        pred = rec["prediction"]
        ref = rec["reference"]
        if isinstance(ref, dict):
            pred_lower = pred.lower().strip()
            if "action" in ref and ref["action"] in pred_lower:
                partial += 1
            try:
                if json.loads(pred) == ref:
                    exact += 1
            except Exception:
                pass
        else:
            p = pred.lower().strip()
            r = str(ref).lower().strip()
            if p == r:
                exact += 1
            elif r in p or p in r:
                partial += 1
    return {
        "total": total,
        "exact_match": exact,
        "partial_match": partial,
        "accuracy": exact / total * 100 if total else 0.0,
        "partial_accuracy": (exact + partial) / total * 100 if total else 0.0,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description="Quick baseline evaluation.")
    ap.add_argument("--config", default="configs/stage1_3d.yaml")
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--num_samples", type=int, default=50)
    ap.add_argument("--max_new_tokens", type=int, default=32)
    ap.add_argument("--output_dir", default="outputs/qa/baseline_eval")
    ap.add_argument("--datasets", nargs="+", default=["sqa3d", "scanqa", "arkit"])
    ap.add_argument("--glob", action="append", default=None,
                    help="name=glob override, repeatable")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--mock_vision", action="store_true")
    ap.add_argument(
        "--compare_quant", action="store_true",
        help="run each dataset twice — bf16 vs quantized weights + int8 KV — "
             "and report the EM delta (quantization quality gate; VERDICT r1 "
             "item 7, one-command job for weights day)",
    )
    ap.add_argument(
        "--quant_mode", choices=["w8", "w8a8", "w4"], default="w8",
        help="which quantized serving mode --compare_quant measures "
             "(w8 = near-lossless default, w8a8 = throughput mode, w4 = storage mode)",
    )
    ap.add_argument(
        "--random_full", action="store_true",
        help="run the FULL-SIZE model at random init when no checkpoint is "
             "given (systems soak / perf validation — predictions are "
             "garbage; the default no-checkpoint path falls back to tiny)",
    )
    ap.add_argument(
        "--serve_quant", choices=["none", "w8", "w8a8"], default="none",
        help="quantize the text weights once after load (donating the bf16 "
             "copy) and decode with int8 KV — the serving configuration the "
             "QA throughput bench measures",
    )
    args = ap.parse_args()

    globs = dict(DEFAULT_GLOBS)
    for ov in args.glob or []:
        name, pattern = ov.split("=", 1)
        globs[name] = pattern

    stage = build_stage(args)
    tokenizer = load_tokenizer(None if args.tiny else stage.tokenizer_path or stage.text_model_name)
    params = load_model(stage, args.checkpoint_dir)
    serve_kv = None
    if args.serve_quant != "none":
        if args.compare_quant:
            raise SystemExit("--serve_quant and --compare_quant are exclusive "
                             "(the compare path quantizes per dataset itself)")
        from ..models import qwen3 as _qwen3

        # donate: the bf16 text weights free as the int8 copy materializes —
        # both co-resident would OOM a 16 GB chip on the 4B model
        params = dict(params)
        params["text"] = _qwen3.quantize_params(params["text"], mode=args.serve_quant)
        serve_kv = "int8"

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    summary: Dict[str, Dict] = {}
    for name in args.datasets:
        pattern = globs[name]
        try:
            dataset = MultiViewJsonDataset(
                DatasetConfig(path_glob=pattern, num_views=stage.data.num_views,
                              image_size=stage.data.image_size, task=name, root=args.data_root)
            )
        except FileNotFoundError as e:
            print(f"⚠️  skipping {name}: {e}")
            continue
        # num_samples < 0 → the FULL split in file order (no unique-scene
        # subsetting), streamed in mega-chunks so all images never co-reside
        # in host memory (full splits are ~17 GB of decoded pixels) — the
        # systems-soak mode (VERDICT r4 item 6). The 50-sample unique-scene
        # protocol stays the scored-eval default.
        if args.num_samples < 0:
            from ..inference.qa import IMAGE_TOKEN, max_prompt_len

            n = len(dataset)
            metas = [dataset.meta(i) for i in range(n)]
            pad = max_prompt_len(tokenizer, [
                f"{m.get('question') or m.get('instruction') or ''}\n{IMAGE_TOKEN}\n"
                for m in metas
            ])
            records = []
            mega = 8 * args.batch_size
            t_soak = time.time()
            for s0 in range(0, n, mega):
                chunk = [dataset[i] for i in range(s0, min(s0 + mega, n))]
                records += run_inference(
                    params, stage, tokenizer, chunk,
                    max_new_tokens=args.max_new_tokens,
                    batch_size=args.batch_size,
                    output_path=out_dir / f"{name}_baseline.jsonl",
                    verbose=False, pad_to_len=pad, append=s0 > 0, index_base=s0,
                    kv_dtype=serve_kv,
                )
                done = len(records)
                dt = time.time() - t_soak
                print(f"  soak {name}: {done}/{n} ({done/max(dt,1e-9):.2f} "
                      f"samples/s, {dt:.0f}s)", flush=True)
        else:
            picked = pick_unique_scene_samples(dataset, args.num_samples, args.seed)
            samples = [dataset[i] for i in picked]
            records = run_inference(
                params, stage, tokenizer, samples,
                max_new_tokens=args.max_new_tokens,
                batch_size=args.batch_size,
                output_path=out_dir / f"{name}_baseline.jsonl",
                verbose=False, kv_dtype=serve_kv,
            )
        metrics = compute_metrics(records)
        summary[name] = metrics
        print(
            f"{name}: {metrics['exact_match']}/{metrics['total']} exact "
            f"({metrics['accuracy']:.1f}%), partial_accuracy {metrics['partial_accuracy']:.1f}%"
        )
        if args.compare_quant and args.num_samples < 0:
            print("⚠️  --compare_quant ignored in full-split soak mode "
                  "(use the 50-sample protocol for the quality gate)")
        elif args.compare_quant:
            q_records = run_inference(
                params, stage, tokenizer, samples,
                max_new_tokens=args.max_new_tokens,
                batch_size=args.batch_size,
                output_path=out_dir / f"{name}_baseline_{args.quant_mode}.jsonl",
                verbose=False,
                quantize=True,
                kv_dtype="int8",
                quant_mode=args.quant_mode,
            )
            q_metrics = compute_metrics(q_records)
            agree = sum(
                r["prediction"] == q["prediction"]
                for r, q in zip(records, q_records)
            ) / max(len(records), 1)
            summary[name][f"quantized_{args.quant_mode}_int8kv"] = q_metrics
            summary[name]["em_delta_quantized"] = (
                q_metrics["accuracy"] - metrics["accuracy"]
            )
            summary[name]["prediction_agreement"] = round(agree, 4)
            print(
                f"{name} [{args.quant_mode.upper()}+int8kv]: {q_metrics['exact_match']}/{q_metrics['total']} "
                f"exact (Δaccuracy {summary[name]['em_delta_quantized']:+.1f}pp, "
                f"prediction agreement {agree:.0%})"
            )

    (out_dir / "baseline_summary.json").write_text(json.dumps(summary, indent=2))
    print(f"summary → {out_dir / 'baseline_summary.json'}")


if __name__ == "__main__":
    main()
