"""QA CLI early-exit (default) must produce byte-identical records to the
fixed-length scan — early exit only skips decode steps after every row's EOS
(``engine.generate_early_exit`` fused mode via ``batching.generate_batch``).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(out, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "vggt_qwen3_tpu.inference.qa",
         "--tiny", "--mock_vision", "--config", "configs/toy.yaml",
         "--glob", "data/toy/test.jsonl", "--num_samples", "3",
         "--max_new_tokens", "16", "--batch_size", "2",
         "--output_jsonl", str(out)] + extra,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return [json.loads(l) for l in out.read_text().splitlines()]


def test_qa_cli_early_exit_identical(tmp_path):
    ee = _run(tmp_path / "ee.jsonl", [])
    base = _run(tmp_path / "base.jsonl", ["--no_early_exit"])
    assert len(ee) == len(base) > 0
    for a, b in zip(ee, base):
        assert a == b
