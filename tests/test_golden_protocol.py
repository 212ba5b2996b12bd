"""Golden protocol parity against the reference's REAL shipped artifacts.

The reference ships its test splits and the frozen per-sample baseline
predictions (``outputs/qa/baseline_eval/*.jsonl``). Images are not in the
snapshot, but the sampling protocol is fully checkable: our unique-scene
seed-42 sampler over the real 3,664/3,567-line splits must select the exact
(question, scene_id) sequence the reference evaluated — the precondition for
EM@1 parity once weights are available (BASELINE.json)."""

from pathlib import Path

import json

import pytest

from vggt_qwen3_tpu.data.dataset import DatasetConfig, MultiViewJsonDataset
from vggt_qwen3_tpu.evals.baseline import compute_metrics
from vggt_qwen3_tpu.inference.qa import pick_unique_scene_samples

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference snapshot not mounted")


@pytest.mark.parametrize("name,total", [("sqa3d", 3664), ("scanqa", 3567)])
def test_eval_sample_selection_matches_reference(name, total):
    ds = MultiViewJsonDataset(
        DatasetConfig(str(REF / f"data/processed/{name}/test_split.jsonl"), 1, 448, "qa")
    )
    assert len(ds) == total  # README.md:130-138 dataset sizes
    picked = pick_unique_scene_samples(ds, 50, seed=42)
    ours = [(ds.meta(i).get("question"), ds.meta(i).get("scene_id")) for i in picked]
    ref_rows = [
        json.loads(l)
        for l in (REF / f"outputs/qa/baseline_eval/{name}_baseline.jsonl").read_text().splitlines()
    ]
    theirs = [(r["question"], r["scene_id"]) for r in ref_rows]
    assert ours == theirs  # exact order + content


def test_metrics_reproduce_reference_summary():
    """Our metric implementation over the reference's frozen predictions must
    reproduce its published baseline_summary.json numbers exactly."""
    summary = json.loads((REF / "outputs/qa/baseline_eval/baseline_summary.json").read_text())
    for name in ("sqa3d", "scanqa", "arkit"):
        rows = [
            json.loads(l)
            for l in (REF / f"outputs/qa/baseline_eval/{name}_baseline.jsonl").read_text().splitlines()
        ]
        ours = compute_metrics(rows)
        ref = summary[name]
        assert ours["total"] == ref["total"]
        assert ours["exact_match"] == ref["exact_match"]
        assert ours["partial_match"] == ref["partial_match"]
        assert abs(ours["accuracy"] - ref["accuracy"]) < 1e-9
        assert abs(ours["partial_accuracy"] - ref["partial_accuracy"]) < 1e-9
