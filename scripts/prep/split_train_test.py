"""Scene-disjoint train/test split — reference ``scripts/prep/split_train_test.py``.

Groups samples by ``scene_id``, shuffles scenes with seed 42, holds out 10%
(at least one scene) for test, routes null-scene samples to train
(``split_train_test.py:42-94``), and verifies zero scene leakage before
writing (``:137-142``).

    python scripts/prep/split_train_test.py --input data/processed/scanqa/all.jsonl \
        --output-dir data/processed/scanqa [--test-ratio 0.1] [--seed 42]
"""

from __future__ import annotations

import argparse
import json
import random
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Tuple


def load_samples(path: Path) -> List[Dict]:
    if path.suffix == ".jsonl":
        return [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    data = json.loads(path.read_text())
    return data if isinstance(data, list) else data.get("data", [])


def split_by_scenes(samples: List[Dict], test_ratio: float, seed: int = 42) -> Tuple[List[Dict], List[Dict]]:
    rng = random.Random(seed)
    by_scene: Dict[str, List[Dict]] = defaultdict(list)
    null_scene: List[Dict] = []
    for s in samples:
        if s.get("scene_id") is None:
            null_scene.append(s)
        else:
            by_scene[s["scene_id"]].append(s)

    scenes = sorted(by_scene)
    rng.shuffle(scenes)
    n_test = max(1, int(len(scenes) * test_ratio))
    test_scenes = set(scenes[:n_test])

    train = [s for sc in scenes[n_test:] for s in by_scene[sc]]
    test = [s for sc in scenes[:n_test] for s in by_scene[sc]]
    if null_scene:
        print(f"  ⚠️  {len(null_scene)} samples with null scene_id added to training")
        train.extend(null_scene)

    # leakage verification
    overlap = {s["scene_id"] for s in test} & {
        s["scene_id"] for s in train if s.get("scene_id") is not None
    }
    assert not overlap, f"scene leakage: {sorted(overlap)[:5]}"
    return train, test


def save_jsonl(samples: List[Dict], path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", encoding="utf-8") as f:
        for s in samples:
            f.write(json.dumps(s, ensure_ascii=False) + "\n")
    print(f"  saved {len(samples)} samples → {path}")


def main() -> None:
    ap = argparse.ArgumentParser(description="Scene-disjoint train/test split.")
    ap.add_argument("--input", type=Path, required=True)
    ap.add_argument("--output-dir", type=Path, required=True)
    ap.add_argument("--test-ratio", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    samples = load_samples(args.input)
    train, test = split_by_scenes(samples, args.test_ratio, args.seed)
    save_jsonl(train, args.output_dir / "train_split.jsonl")
    save_jsonl(test, args.output_dir / "test_split.jsonl")
    n_scenes = len({s.get("scene_id") for s in samples if s.get("scene_id")})
    print(f"split {len(samples)} samples / {n_scenes} scenes → {len(train)} train, {len(test)} test")


if __name__ == "__main__":
    main()
