"""Generate a synthetic toy dataset for offline smoke tests.

Equivalent of the reference's ``scripts/prep/make_toy_dataset.py:43-92``:
solid-color JPEG views + identity-ish geometry tokens + QA records, so the
full train/eval path runs with zero downloads.

    python scripts/make_toy_dataset.py --out data/toy --scenes 8 --views 2
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path

COLORS = [
    ("red", (200, 40, 40)),
    ("green", (40, 180, 60)),
    ("blue", (40, 80, 200)),
    ("yellow", (220, 200, 40)),
]


def build_geom(num_views: int):
    return {
        "R": [[1, 0, 0, 0, 1, 0, 0, 0, 1] for _ in range(num_views)],
        "t": [[0.0, 0.0, float(v)] for v in range(num_views)],
        "K": [[500, 0, 224, 0, 500, 224, 0, 0, 1] for _ in range(num_views)],
        "depth_hist": [[1.0 / 16] * 16 for _ in range(num_views)],
    }


def main() -> None:
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/toy")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--geom", action="store_true", help="emit geometry tokens")
    args = ap.parse_args()

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rng = random.Random(42)
    records = []
    for s in range(args.scenes):
        name, rgb = COLORS[s % len(COLORS)]
        images = []
        for v in range(args.views):
            img = Image.new("RGB", (args.size, args.size), rgb)
            rel = f"images/scene{s:03d}_v{v}.jpg"
            img.save(out / rel, quality=90)
            images.append(str(out / rel))
        records.append(
            {
                "images": images,
                "geom_token": build_geom(args.views) if args.geom else None,
                "question": f"What color is the room in scene {s}?",
                "answer": name,
                "task": "qa",
                "scene_id": f"toy_scene_{s:03d}",
                "question_id": f"toy_q_{s:03d}",
            }
        )
    rng.shuffle(records)
    split = max(1, len(records) // 4)
    with (out / "train.jsonl").open("w") as f:
        for r in records[split:]:
            f.write(json.dumps(r) + "\n")
    with (out / "test.jsonl").open("w") as f:
        for r in records[:split]:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(records) - split} train / {split} test samples under {out}")


if __name__ == "__main__":
    main()
