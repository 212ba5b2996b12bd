"""Out-of-the-box stage-1 training smoke over the SHIPPED mixed datasets.

`./train.sh debug stage1` must not die on its first batch: the stage1 mix
interleaves 8-view scanqa records with 1-view sqa3d records (ragged view
counts — code-review r2 finding 1), geom-bearing scanqa rows with geom-less
sqa3d rows (static emit_geom decision — finding 3), and exercises the real
config → datasets → collator → sharded-train-step path end to end with the
tiny model dims. 2 optimizer steps on the virtual 8-device CPU mesh.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_stage1_two_steps_out_of_the_box(tmp_path):
    out = tmp_path / "stage1_smoke"
    r = subprocess.run(
        [
            sys.executable, "-m", "vggt_qwen3_tpu.train.sft",
            "--config", "configs/stage1_3d.yaml",
            "--output_dir", str(out),
            "--tiny", "--mock_vision",
            "--max_steps", "2", "--log_every_steps", "1",
            "--save_every_steps", "100",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    metrics = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 2, metrics
