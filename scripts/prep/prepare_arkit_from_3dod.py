"""ARKitScenes 3DOD → RoomPlan action-JSON samples.

Equivalent of reference ``scripts/prep/prepare_arkit_from_3dod.py:68-152``:
discover scenes carrying ``*_3dod_annotation.json`` + ``lowres_wide`` images,
take the first N lowres views per scene, and convert each annotated object's
oriented bounding box into ``{action: place_anchor, scene, center, normal,
extent}`` with a synthesized English instruction.

    python scripts/prep/prepare_arkit_from_3dod.py --root data/raw/arkit/Training \
        --output data/processed/arkit_synth/train.json [--num-views 10] [--max-scenes N]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional


def discover_scenes(root: Path) -> List[Path]:
    scenes = []
    if not root.exists():
        print(f"⚠️  ARKit root {root} does not exist.")
        return scenes
    for scene_dir in sorted(root.glob("*")):
        if (
            scene_dir.is_dir()
            and list(scene_dir.glob("*_3dod_annotation.json"))
            and (scene_dir / "lowres_wide").is_dir()
        ):
            scenes.append(scene_dir)
    print(f"discovered {len(scenes)} ARKit 3DOD scenes under {root}")
    return scenes


def make_instruction(scene_id: str, label: str) -> str:
    return (
        f"In scene {scene_id}, find an object belonging to the category '{label}' "
        f"and place a virtual anchor at the center of that object."
    )


def build_action_json(scene_id: str, obj: Dict) -> Dict:
    seg = obj.get("segments", {})
    obb = seg.get("obbAligned") or seg.get("obb") or {}
    return {
        "action": "place_anchor",
        "scene": scene_id,
        "center": obb.get("centroid", [0, 0, 0]),
        "normal": obb.get("dominantNormal", [0, 1, 0]),
        "extent": obb.get("axesLengths", [1, 1, 1]),
    }


def iter_samples(root: Path, num_views: int, max_scenes: Optional[int]) -> Iterable[Dict]:
    scenes = discover_scenes(root)
    if max_scenes is not None:
        scenes = scenes[:max_scenes]
    for scene_dir in scenes:
        scene_id = scene_dir.name
        ann_files = list(scene_dir.glob("*_3dod_annotation.json"))
        try:
            ann = json.loads(ann_files[0].read_text())
        except Exception as e:
            print(f"⚠️  failed to read {ann_files[0]}: {e}")
            continue
        images = [str(p) for p in sorted((scene_dir / "lowres_wide").glob("*.png"))[:num_views]]
        if not images:
            continue
        for obj in ann.get("data", []):
            label = obj.get("label", "object")
            yield {
                "images": images,
                "geom_token": None,
                "task": "arkit_synth",
                "instruction": make_instruction(scene_id, label),
                "action_json": build_action_json(scene_id, obj),
                "scene_id": scene_id,
            }


def main() -> None:
    ap = argparse.ArgumentParser(description="Prepare ARKit 3DOD action samples.")
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--num-views", type=int, default=10)
    ap.add_argument("--max-scenes", type=int, default=None)
    args = ap.parse_args()

    samples = list(iter_samples(args.root, args.num_views, args.max_scenes))
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(samples, ensure_ascii=False))
    print(f"wrote {len(samples)} samples → {args.output}")


if __name__ == "__main__":
    main()
