"""Datasets: lazy multi-view JSON/JSONL reader + mixed-ratio multi-source.

Re-implements the reference data layer (``src/dataio/dataset_builder.py``)
without torch:

- :class:`MultiViewJsonDataset` — glob over .json/.jsonl files; dict payloads
  unwrap ``data``/``samples``; records normalize to ``{images, geom_token,
  question|instruction, answer|action_json, task, scene_id}``
  (``dataset_builder.py:24-88``); image paths resolve with the ``data/raw``
  fallback (``:62-75``); images load as RGB uint8 numpy arrays.
- :class:`MultiSourceDataset` — the reference's mix-ratio interleave kept
  quirks-and-all (SURVEY.md §7.2 step 7): a ~100-slot schedule from the
  ratios, ``random.Random(0)``, random-with-replacement sampling
  (``dataset_builder.py:91-117``).
"""

from __future__ import annotations

import glob as globlib
import json
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


@dataclass(frozen=True)
class DatasetConfig:
    path_glob: str
    num_views: int
    image_size: int
    task: str
    root: Optional[str] = None  # base dir for relative paths (default: cwd)


class MultiViewJsonDataset:
    def __init__(self, config: DatasetConfig) -> None:
        self.config = config
        pattern = config.path_glob
        root = Path(config.root) if config.root else Path()
        pattern_path = Path(pattern)
        if pattern_path.is_file():
            files = [pattern_path]
        elif pattern_path.is_absolute():
            files = sorted(Path(p) for p in globlib.glob(pattern))
        else:
            files = sorted(root.glob(pattern))
        self.files = files
        # .jsonl files go through the native mmap indexer (csrc/jsonl_index.cpp)
        # — records parse lazily on access instead of materializing the whole
        # dataset at open; .json arrays stay eager (they require full parse).
        from .jsonl_index import JsonlIndex

        self._eager: List[Dict] = []
        self._slots: List = []  # dict (eager) | (JsonlIndex, i) (lazy)
        for file in files:
            if file.suffix == ".jsonl":
                idx = JsonlIndex(file)
                self._slots.extend((idx, i) for i in range(len(idx)))
            else:
                records = json.loads(file.read_text(encoding="utf-8"))
                if isinstance(records, dict):
                    records = records.get("data") or records.get("samples") or []
                if not isinstance(records, list):
                    raise ValueError(f"expected a JSON array in {file}")
                self._slots.extend(records)
        if not self._slots:
            raise FileNotFoundError(f"no samples found for pattern {config.path_glob}")

    def _record(self, idx: int) -> Dict:
        slot = self._slots[idx]
        if isinstance(slot, tuple):
            source, i = slot
            return source[i]
        return slot

    def __len__(self) -> int:
        return len(self._slots)

    def _load_image(self, rel_path: str) -> np.ndarray:
        # native thread-pooled decoder when VGGT_NATIVE_DECODE=1 (training
        # throughput); PIL otherwise — eval parity keeps the reference's
        # exact decoder (data/image_decode.py parity note)
        from .image_decode import decode_rgb

        root = Path(self.config.root) if self.config.root else Path()
        p = Path(rel_path)
        candidates = [p] if p.is_absolute() else [root / p, root / "data" / "raw" / p]
        for cand in candidates:
            if cand.exists():
                return decode_rgb(str(cand))
        tried = ", ".join(str(c) for c in candidates)
        raise FileNotFoundError(f"image not found: tried {tried}")

    def meta(self, idx: int) -> Dict:
        """Raw record metadata without loading images (qa_inference.py:353)."""
        return self._record(idx)

    def _normalize_geom(self, geom):
        """Per-view geom arrays follow the same truncate/pad-to-num_views
        policy as the images (repeat last view) — ragged geom view counts
        across mixed sources would otherwise crash the collator's stack, and
        geom views must describe the views the model actually sees."""
        if not isinstance(geom, dict):
            return geom
        V = self.config.num_views
        out = {}
        for key, val in geom.items():
            a = np.asarray(val, np.float32)
            if a.ndim == 2 and a.shape[0] != V:
                a = a[:V]
                if a.shape[0] and a.shape[0] < V:
                    a = np.concatenate([a, np.repeat(a[-1:], V - a.shape[0], axis=0)])
            out[key] = a
        return out

    def __getitem__(self, idx: int) -> Dict:
        sample = self._record(idx)
        images = sample["images"][: self.config.num_views]
        loaded = [self._load_image(img) for img in images]
        # pad ragged view counts by repeating the last view so multi-source
        # batches (e.g. 8-view scanqa + 1-view sqa3d under stage1's mix)
        # stack to a static [num_views, ...] — without this the collator's
        # np.stack dies on the first mixed batch
        while loaded and len(loaded) < self.config.num_views:
            loaded.append(loaded[-1])
        return {
            "images": loaded,
            "geom_token": self._normalize_geom(sample.get("geom_token")),
            "question": sample.get("question") or sample.get("instruction"),
            "answer": sample.get("answer") or sample.get("action_json"),
            "task": sample.get("task", self.config.task),
            "scene_id": sample.get("scene_id"),
        }


class MultiSourceDataset:
    """Mix-ratio interleave (reference semantics, including randomness)."""

    def __init__(self, datasets: Dict[str, MultiViewJsonDataset], mix_ratio: Dict[str, float]):
        self.datasets = datasets
        self.mix_ratio = mix_ratio
        self.order = self._build_schedule()
        self.total_length = sum(len(v) for v in datasets.values())
        self.random = random.Random(0)

    def _build_schedule(self) -> List[str]:
        total = sum(self.mix_ratio.values())
        schedule: List[str] = []
        for name, weight in self.mix_ratio.items():
            schedule.extend([name] * max(1, int(round(weight / total * 100))))
        return schedule

    def __len__(self) -> int:
        return self.total_length

    def __getitem__(self, idx: int) -> Dict:
        ds = self.datasets[self.order[idx % len(self.order)]]
        return ds[self.random.randint(0, len(ds) - 1)]

    def consume_rng(self, idx: int) -> None:
        """Advance the sampling rng exactly as ``self[idx]`` would, without
        touching data — lets a resumed loader fast-forward this dataset's
        stateful draw stream (the reference-parity quirk above) bit-exactly."""
        ds = self.datasets[self.order[idx % len(self.order)]]
        self.random.randint(0, len(ds) - 1)
