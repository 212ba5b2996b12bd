"""Training metrics: console + TensorBoard events + JSONL.

Emits the tag set the reference's monitor CLI expects (``train/loss``,
``train/learning_rate_base``, ``train/learning_rate_proj``,
``train/steps_per_sec``, ``train/progress_pct`` — ``scripts/
monitor_training.py:70-74``; the reference trainer only ever emitted
``loss``/``step``, SURVEY.md §5.5 — we emit the full set so the dashboard is
real, not aspirational). Console format mirrors ``train_sft.py:237-243``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, output_dir: str | Path, run_name: str = "roomplan") -> None:
        self.output_dir = Path(output_dir)
        logdir = self.output_dir / "logs" / run_name
        logdir.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = self.output_dir / "metrics.jsonl"
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(logdir))
        except Exception:
            pass
        self.start_time = time.time()

    def log(self, step: int, metrics: Dict[str, float], *, max_steps: Optional[int] = None) -> None:
        elapsed = time.time() - self.start_time
        steps_per_sec = (step + 1) / elapsed if elapsed > 0 else 0.0
        record = dict(metrics)
        record["steps_per_sec"] = steps_per_sec
        if max_steps:
            record["progress_pct"] = 100.0 * (step + 1) / max_steps
        if self._tb is not None:
            for k, v in record.items():
                self._tb.add_scalar(f"train/{k}", float(v), step)
            self._tb.flush()
        with self.jsonl_path.open("a", encoding="utf-8") as f:
            f.write(json.dumps({"step": step, **{k: float(v) for k, v in record.items()}}) + "\n")

    def console(self, step: int, max_steps: int, loss: float, base_lr: float, proj_lr: float) -> None:
        elapsed = time.time() - self.start_time
        sps = (step + 1) / elapsed if elapsed > 0 else 0.0
        eta_h = ((max_steps - step - 1) / sps / 3600.0) if sps > 0 else 0.0
        print(
            f"Step {step:5d}/{max_steps} | Loss: {loss:.4f} | "
            f"LR: {base_lr:.2e}/{proj_lr:.2e} | Speed: {sps:.2f} steps/s | "
            f"ETA: {eta_h:.1f}h",
            flush=True,
        )

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
