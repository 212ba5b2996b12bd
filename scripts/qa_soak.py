"""Full-split QA eval soak (VERDICT r4 item 6).

Runs `evals/baseline.py` over the reference's ENTIRE ScanQA + SQA3D test
splits (7,231 samples — `wc -l /root/reference/data/processed/*/test_split.jsonl`)
on the real-size model at random init: a SYSTEMS soak, not a quality eval —
it validates the projected ~8-min wall figure and exercises ~226 batches of
the QA pipeline in one process, surfacing slow leaks (dispatch counters,
host memory, snapshot futures) nothing shorter runs long enough to see.

The reference snapshot ships the split JSONLs but not the scene images, so
this script synthesizes one small PNG per unique image path (content is
irrelevant to a systems soak) under a soak data root, then invokes the eval
CLI with --random_full --serve_quant w8 --num_samples -1.

Usage: python scripts/qa_soak.py [--root outputs/soak_data] [--batch 32]
       [--setup_only] [--datasets scanqa sqa3d]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference/data/processed")


def synthesize_images(root: Path, datasets) -> int:
    """One flat-ish PNG per unique image path across the splits."""
    import numpy as np
    from PIL import Image

    paths = set()
    for name in datasets:
        split = REF / name / "test_split.jsonl"
        with split.open() as f:
            for line in f:
                rec = json.loads(line)
                for p in rec.get("images") or []:
                    paths.add(p)
    made = 0
    for i, rel in enumerate(sorted(paths)):
        out = root / rel
        if out.exists():
            continue
        out.parent.mkdir(parents=True, exist_ok=True)
        # cheap distinctive content; flat blocks keep the PNGs ~KB-sized
        rng = np.random.default_rng(i)
        tile = rng.integers(0, 255, (8, 8, 3), np.uint8)
        img = np.repeat(np.repeat(tile, 56, axis=0), 56, axis=1)  # 448²
        Image.fromarray(img).save(out)
        made += 1
    return made


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=str(REPO / "outputs" / "soak_data"))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--datasets", nargs="+", default=["scanqa", "sqa3d"])
    ap.add_argument("--setup_only", action="store_true")
    ap.add_argument("--serve_quant", default="w8")
    args = ap.parse_args()

    root = Path(args.root)
    t0 = time.time()
    made = synthesize_images(root, args.datasets)
    print(f"soak data: {made} images synthesized under {root} "
          f"({time.time()-t0:.1f}s)", flush=True)
    if args.setup_only:
        return

    cmd = [
        sys.executable, "-m", "vggt_qwen3_tpu.evals.baseline",
        "--random_full", "--serve_quant", args.serve_quant,
        "--num_samples", "-1", "--batch_size", str(args.batch),
        "--max_new_tokens", "32",
        "--datasets", *args.datasets,
        "--data_root", str(root),
        "--output_dir", str(REPO / "outputs" / "qa_soak"),
    ]
    for name in args.datasets:
        cmd += ["--glob", f"{name}={REF / name / 'test_split.jsonl'}"]
    print("exec:", " ".join(cmd), flush=True)
    t0 = time.time()
    rc = subprocess.run(cmd, cwd=REPO).returncode
    print(f"soak: rc={rc} wall={time.time()-t0:.0f}s", flush=True)
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
