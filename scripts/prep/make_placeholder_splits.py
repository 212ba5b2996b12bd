"""Generate synthetic placeholder train/test splits under ``data/processed/``.

The production stage configs (``configs/stage1_3d.yaml``, ``stage2_arkit.yaml``)
point at ``data/processed/{scanqa,sqa3d}/train_split.jsonl`` and
``data/processed/arkit_synth/*.json`` — paths the real prep scripts
(``scripts/prep/prepare_scanqa.py`` etc.) fill from raw downloads, which this
offline environment cannot fetch. This script writes honest synthetic
stand-ins in the exact record schema (reference
``src/dataio/dataset_builder.py:24-88`` 6-key contract) so every entry point
— ``./train.sh debug stage1``, QA/ARKit inference, ``evals/baseline.py`` —
runs end-to-end before real data lands.

A ``PLACEHOLDER`` marker file is written next to each split;
``scripts/validate_data.py`` warns while it is present, and the real prep
scripts remove it when they overwrite the splits.

    python scripts/prep/make_placeholder_splits.py [--out data/processed]
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path

OBJECTS = ["table", "chair", "sofa", "lamp", "shelf", "bed", "desk", "cabinet"]
COLORS = [
    ("red", (200, 40, 40)),
    ("green", (40, 180, 60)),
    ("blue", (40, 80, 200)),
    ("yellow", (220, 200, 40)),
    ("white", (235, 235, 235)),
    ("black", (25, 25, 25)),
    ("brown", (130, 85, 40)),
    ("gray", (128, 128, 128)),
]
PLACES = ["center of the room", "by the window", "against the north wall", "in the corner"]


def _make_scene_images(img_dir: Path, scene: str, rgb, views: int, size: int = 96):
    from PIL import Image

    paths = []
    for v in range(views):
        # vary brightness per view so views are not byte-identical
        f = 0.7 + 0.3 * (v / max(views - 1, 1))
        img = Image.new("RGB", (size, size), tuple(int(c * f) for c in rgb))
        rel = img_dir / f"{scene}_v{v}.jpg"
        img.save(rel, quality=85)
        paths.append(str(rel))
    return paths


def _geom(views: int):
    return {
        "R": [[1, 0, 0, 0, 1, 0, 0, 0, 1]] * views,
        "t": [[0.0, 0.0, float(v)] for v in range(views)],
        "K": [[400, 0, 48, 0, 400, 48, 0, 0, 1]] * views,
        "depth_hist": [[1.0 / 16] * 16] * views,
    }


def make_qa_split(out: Path, img_root: Path, task: str, scenes: int, views: int,
                  per_scene: int, rng: random.Random, split: str):
    records = []
    for s in range(scenes):
        color_name, rgb = COLORS[(s + (0 if split == "train" else 3)) % len(COLORS)]
        obj = OBJECTS[s % len(OBJECTS)]
        place = PLACES[s % len(PLACES)]
        scene_id = f"ph_{task}_{split}_{s:03d}"
        images = _make_scene_images(img_root, scene_id, rgb, views)
        qa = [
            (f"What color is the {obj} in the {place}?", f"{color_name} {obj}"),
            (f"Where is the {color_name} {obj} located?", place),
            (f"How many {obj}s are visible in the scene?", str(1 + s % 3)),
            (f"Is there a {obj} in this room?", "yes"),
        ]
        for q_i in range(per_scene):
            q, a = qa[q_i % len(qa)]
            records.append({
                "images": images,
                "geom_token": _geom(views) if task == "scanqa" else None,
                "task": task,
                "question": q,
                "answer": a,
                "scene_id": scene_id,
                "question_id": f"{split}-{scene_id}-{q_i}",
            })
    rng.shuffle(records)
    path = out / task / f"{split}_split.jsonl"
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    (path.parent / "PLACEHOLDER").write_text(
        "synthetic stand-in from scripts/prep/make_placeholder_splits.py — "
        "run the real prep scripts to replace\n"
    )
    return path, len(records)


def make_arkit_split(out: Path, img_root: Path, scenes: int, views: int,
                     rng: random.Random, split: str):
    records = []
    for s in range(scenes):
        color_name, rgb = COLORS[s % len(COLORS)]
        obj = OBJECTS[(s + 2) % len(OBJECTS)]
        scene_id = f"ph_arkit_{split}_{s:03d}"
        images = _make_scene_images(img_root, scene_id, rgb, views)
        center = [round(rng.uniform(-2, 2), 2) for _ in range(3)]
        extent = [round(rng.uniform(0.4, 1.6), 2) for _ in range(3)]
        records.append({
            "images": images,
            "geom_token": None,
            "task": "arkit_actions",
            "instruction": (
                f"In scene {scene_id}, find an open spot and place a {color_name} "
                f"{obj} so it does not collide with existing furniture."
            ),
            "action_json": {
                "action": f"place_{obj}",
                "scene": scene_id,
                "center": center,
                "normal": [0, 1, 0],
                "extent": extent,
            },
            "scene_id": scene_id,
        })
    path = out / "arkit_synth" / (f"{split}.json")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(records, indent=1))
    (path.parent / "PLACEHOLDER").write_text(
        "synthetic stand-in from scripts/prep/make_placeholder_splits.py — "
        "run the real prep scripts to replace\n"
    )
    return path, len(records)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/processed")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--per_scene", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.out)
    img_root = out / "placeholder_images"
    img_root.mkdir(parents=True, exist_ok=True)
    rng = random.Random(args.seed)

    made = []
    made.append(make_qa_split(out, img_root, "scanqa", args.scenes, 8, args.per_scene, rng, "train"))
    made.append(make_qa_split(out, img_root, "scanqa", max(args.scenes // 2, 2), 8, 2, rng, "test"))
    made.append(make_qa_split(out, img_root, "sqa3d", args.scenes, 1, args.per_scene, rng, "train"))
    made.append(make_qa_split(out, img_root, "sqa3d", max(args.scenes // 2, 2), 1, 2, rng, "test"))
    made.append(make_arkit_split(out, img_root, args.scenes, 10, rng, "train"))
    made.append(make_arkit_split(out, img_root, max(args.scenes // 2, 2), 10, rng, "test"))
    for path, n in made:
        print(f"wrote {path} ({n} records)")
    print("NOTE: placeholder data — run scripts/prep/prepare_scanqa.py etc. for the real splits")


if __name__ == "__main__":
    main()
