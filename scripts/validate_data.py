"""Dataset integrity validation — reference ``scripts/validate_data.py``.

Per record: JSON parses, required fields present (``images`` +
``question|instruction`` + ``answer|action_json``), every image path resolves
(with the ``data/raw`` fallback). Also resolves every dataset glob in a stage
config. Exit code 1 on any failure (``validate_data.py:190-193``).

    python scripts/validate_data.py --files data/toy/*.jsonl
    python scripts/validate_data.py --config configs/stage1_3d.yaml
"""

from __future__ import annotations

import argparse
import glob as globlib
import json
import sys
from pathlib import Path


def check_record(rec: dict, base: Path) -> list[str]:
    errors = []
    if not rec.get("images"):
        errors.append("missing/empty 'images'")
    if not (rec.get("question") or rec.get("instruction")):
        errors.append("missing 'question'/'instruction'")
    if rec.get("answer") is None and rec.get("action_json") is None:
        errors.append("missing 'answer'/'action_json'")
    for img in rec.get("images", []):
        p = Path(img)
        candidates = [p] if p.is_absolute() else [base / p, base / "data" / "raw" / p]
        if not any(c.exists() for c in candidates):
            errors.append(f"image not found: {img}")
    return errors


def check_file(path: Path, base: Path, max_report: int = 10) -> int:
    n_bad = 0
    records = []
    try:
        if path.suffix == ".jsonl":
            for i, line in enumerate(path.read_text().splitlines()):
                if not line.strip():
                    continue
                try:
                    records.append((i + 1, json.loads(line)))
                except json.JSONDecodeError as e:
                    print(f"  ❌ {path}:{i+1}: JSON parse error: {e}")
                    n_bad += 1
        else:
            data = json.loads(path.read_text())
            if isinstance(data, dict):
                data = data.get("data") or data.get("samples") or []
            records = [(i, r) for i, r in enumerate(data)]
    except Exception as e:
        print(f"  ❌ {path}: unreadable: {e}")
        return 1

    for lineno, rec in records:
        errs = check_record(rec, base)
        if errs:
            n_bad += 1
            if n_bad <= max_report:
                print(f"  ❌ {path}:{lineno}: " + "; ".join(errs))
    status = "✅" if n_bad == 0 else "❌"
    print(f"{status} {path}: {len(records)} records, {n_bad} bad")
    return n_bad


def main() -> None:
    ap = argparse.ArgumentParser(description="Validate dataset JSONL/JSON files.")
    ap.add_argument("--files", nargs="*", default=[], help="files or globs")
    ap.add_argument("--config", default=None, help="stage YAML; validates its dataset globs")
    ap.add_argument("--data_root", default=".", help="base dir for relative image paths")
    args = ap.parse_args()

    base = Path(args.data_root)
    targets: list[Path] = []
    for pattern in args.files:
        targets.extend(Path(p) for p in globlib.glob(pattern))
    if args.config:
        import yaml

        cfg = yaml.safe_load(Path(args.config).read_text())
        for name, pattern in (cfg.get("data", {}).get("datasets") or {}).items():
            matches = [Path(p) for p in globlib.glob(pattern)]
            if not matches:
                print(f"❌ dataset '{name}': glob '{pattern}' matches nothing")
                sys.exit(1)
            print(f"dataset '{name}': {len(matches)} file(s)")
            targets.extend(matches)

    if not targets:
        print("nothing to validate (pass --files and/or --config)")
        sys.exit(1)

    for marker in sorted({t.parent / "PLACEHOLDER" for t in targets}):
        if marker.exists():
            print(f"⚠️  {marker.parent}: synthetic placeholder data "
                  f"(scripts/prep/make_placeholder_splits.py) — not real splits")

    total_bad = sum(check_file(t, base) for t in targets)
    sys.exit(0 if total_bad == 0 else 1)


if __name__ == "__main__":
    main()
