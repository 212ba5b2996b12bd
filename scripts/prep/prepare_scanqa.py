"""ScanQA/SQA3D preparation: ScanNet frames + QA annotations → multi-view
JSON samples with geometry tokens.

Equivalent of reference ``scripts/prep/prepare_scanqa.py:32-142``: N sampled
views per scene; per view R (3×3 pose rotation, flattened 9) + t (3) from the
4×4 ScanNet pose, K (flattened 3×3 intrinsics), and a 16-bin normalized depth
histogram (zeros → NaN → excluded); emits a JSON array consumable by
``MultiViewJsonDataset``.

    python scripts/prep/prepare_scanqa.py --dataset scanqa \
        --scan-root data/raw/scannet --qa-file data/raw/scanqa/questions.json \
        --output data/processed/scanqa/train.json --num-views 8
"""

from __future__ import annotations

import argparse
import json
import math
import random
from pathlib import Path
from typing import Dict, Iterable, List

import numpy as np


def depth_histogram(depth: np.ndarray, num_bins: int = 16) -> List[float]:
    vals = depth[np.isfinite(depth)]
    if vals.size == 0:
        return [0.0] * num_bins
    counts, _ = np.histogram(vals, bins=num_bins, range=(vals.min(), vals.max()))
    return (counts / (counts.sum() + 1e-6)).astype(np.float32).tolist()


def read_depth(path: Path) -> np.ndarray:
    try:
        import imageio.v2 as imageio

        raw = imageio.imread(path).astype(np.float32)
    except ImportError:
        from PIL import Image

        raw = np.asarray(Image.open(path)).astype(np.float32)
    raw[raw == 0] = math.nan
    return raw


def view_geometry(scan_root: Path, scene_id: str, view_id: int) -> Dict[str, List[float]]:
    pose = np.loadtxt(scan_root / scene_id / "pose" / f"{view_id:06d}.txt").reshape(4, 4)
    intr = np.loadtxt(scan_root / scene_id / "intrinsic" / f"{view_id:06d}.txt").reshape(3, 3)
    depth = read_depth(scan_root / scene_id / "depth" / f"{view_id:06d}.png")
    return {
        "R": pose[:3, :3].flatten().tolist(),
        "t": pose[:3, 3].tolist(),
        "K": intr.flatten().tolist(),
        "depth_hist": depth_histogram(depth),
    }


def iter_samples(args: argparse.Namespace) -> Iterable[Dict]:
    entries = json.loads(Path(args.qa_file).read_text())
    rng = random.Random(args.seed)
    for entry in entries:
        scene_id = entry["scene_id"]
        available = entry["available_views"]
        view_ids = rng.sample(available, k=min(args.num_views, len(available)))
        images, geoms = [], []
        for vid in view_ids:
            images.append(f"{scene_id}/color/{vid:06d}.jpg")
            geoms.append(view_geometry(args.scan_root, scene_id, vid))
        yield {
            "images": images,
            "geom_token": {k: [g[k] for g in geoms] for k in ("R", "t", "K", "depth_hist")},
            "task": "3d_qa",
            "question": entry["question"],
            "answer": entry["answer"],
            "scene_id": scene_id,
            "question_id": entry.get("question_id"),
        }


def main() -> None:
    ap = argparse.ArgumentParser(description="Prepare ScanQA/SQA3D data.")
    ap.add_argument("--dataset", default="scanqa", choices=["scanqa", "sqa3d"])
    ap.add_argument("--scan-root", type=Path, required=True)
    ap.add_argument("--qa-file", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--num-views", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    args.output.parent.mkdir(parents=True, exist_ok=True)
    samples = list(iter_samples(args))
    args.output.write_text(json.dumps(samples, ensure_ascii=False, indent=None))
    print(f"Wrote {len(samples)} samples to {args.output}")


if __name__ == "__main__":
    main()
