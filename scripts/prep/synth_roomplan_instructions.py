"""Synthesize RoomPlan instructions from plane/camera exports.

Equivalent of reference ``scripts/prep/synth_roomplan_instructions.py:67-133``:
per scene, reads ``planes.json`` (id, class, center, normal, extent) and
``cameras.json`` (per-view pose R/t + intrinsics K), emits one
instruction/action_json per plane plus a camera-derived geometry token.

    python scripts/prep/synth_roomplan_instructions.py --root data/raw/roomplan \
        --output data/processed/arkit_synth/synth.json [--num-views 10]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, Iterable, List


PLANE_VERBS = {
    "wall": "mount a virtual shelf on",
    "floor": "place a rug at the center of",
    "ceiling": "attach a light fixture to",
    "table": "place a vase on",
    "door": "hang a sign on",
}


def make_instruction(scene_id: str, plane: Dict) -> str:
    cls = plane.get("class", "surface")
    verb = PLANE_VERBS.get(cls, "place a virtual anchor on")
    return f"In scene {scene_id}, {verb} the {cls} with id {plane.get('id', 0)}."


def build_geom_token(cameras: List[Dict], num_views: int) -> Dict[str, List]:
    views = cameras[:num_views]
    return {
        "R": [c.get("R", [1, 0, 0, 0, 1, 0, 0, 0, 1]) for c in views],
        "t": [c.get("t", [0.0, 0.0, 0.0]) for c in views],
        "K": [c.get("K", [500, 0, 0, 0, 500, 0, 0, 0, 1]) for c in views],
        "depth_hist": [c.get("depth_hist", [1.0 / 16] * 16) for c in views],
    }


def iter_samples(root: Path, num_views: int) -> Iterable[Dict]:
    for scene_dir in sorted(p for p in root.glob("*") if p.is_dir()):
        planes_file = scene_dir / "planes.json"
        cameras_file = scene_dir / "cameras.json"
        if not planes_file.exists() or not cameras_file.exists():
            continue
        planes = json.loads(planes_file.read_text())
        cameras = json.loads(cameras_file.read_text())
        images = [c["image"] for c in cameras[:num_views] if "image" in c]
        scene_id = scene_dir.name
        for plane in planes:
            yield {
                "images": images,
                "geom_token": build_geom_token(cameras, num_views),
                "task": "arkit_synth",
                "instruction": make_instruction(scene_id, plane),
                "action_json": {
                    "action": f"anchor_{plane.get('class', 'surface')}",
                    "scene": scene_id,
                    "center": plane.get("center", [0, 0, 0]),
                    "normal": plane.get("normal", [0, 1, 0]),
                    "extent": plane.get("extent", [1, 1, 1]),
                },
                "scene_id": scene_id,
            }


def main() -> None:
    ap = argparse.ArgumentParser(description="Synthesize RoomPlan instructions.")
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--num-views", type=int, default=10)
    args = ap.parse_args()

    samples = list(iter_samples(args.root, args.num_views))
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(samples, ensure_ascii=False))
    print(f"wrote {len(samples)} samples → {args.output}")


if __name__ == "__main__":
    main()
