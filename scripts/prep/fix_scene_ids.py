"""Rejoin scene/question metadata onto processed JSONL.

Equivalent of reference ``scripts/prep/fix_scene_ids.py:40-140``: processed
splits that lost ``scene_id``/``question_id``/object metadata are repaired by
joining against the original annotation files keyed on
``(question, answer)`` (first answer for multi-answer ScanQA records).

    python scripts/prep/fix_scene_ids.py --processed data/processed/scanqa/train_split.jsonl \
        --annotations data/raw/scanqa/ScanQA_v1.0_train.json --dataset scanqa
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List, Tuple


def load_any(path: Path) -> List[Dict]:
    if path.suffix == ".jsonl":
        return [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    data = json.loads(path.read_text())
    return data if isinstance(data, list) else data.get("data", [])


def build_key(question: str, answer) -> Tuple[str, str]:
    if isinstance(answer, list):
        answer = answer[0] if answer else ""
    return (str(question).strip().lower(), str(answer).strip().lower())


def annotation_index(records: List[Dict], dataset: str) -> Dict[Tuple[str, str], Dict]:
    index: Dict[Tuple[str, str], Dict] = {}
    for rec in records:
        question = rec.get("question") or rec.get("situation", "")
        answers = rec.get("answers") or rec.get("answer") or []
        meta = {
            "scene_id": rec.get("scene_id"),
            "question_id": rec.get("question_id"),
        }
        if dataset == "scanqa":
            meta["object_ids"] = rec.get("object_ids")
            meta["object_names"] = rec.get("object_names")
        key = build_key(question, answers)
        index.setdefault(key, meta)
    return index


def main() -> None:
    ap = argparse.ArgumentParser(description="Rejoin scene ids onto processed JSONL.")
    ap.add_argument("--processed", type=Path, required=True)
    ap.add_argument("--annotations", type=Path, required=True)
    ap.add_argument("--dataset", choices=["scanqa", "sqa3d"], default="scanqa")
    ap.add_argument("--output", type=Path, default=None, help="default: in-place")
    args = ap.parse_args()

    processed = load_any(args.processed)
    index = annotation_index(load_any(args.annotations), args.dataset)

    fixed = missing = 0
    for rec in processed:
        if rec.get("scene_id") is not None:
            continue
        key = build_key(rec.get("question", ""), rec.get("answer", ""))
        meta = index.get(key)
        if meta is None:
            missing += 1
            continue
        for k, v in meta.items():
            if v is not None and rec.get(k) is None:
                rec[k] = v
        fixed += 1

    out = args.output or args.processed
    with out.open("w", encoding="utf-8") as f:
        for rec in processed:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"fixed {fixed} records ({missing} without a match) → {out}")


if __name__ == "__main__":
    main()
