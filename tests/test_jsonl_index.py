"""Native (C++) JSONL indexer + lazy dataset integration."""

import json
from pathlib import Path

import pytest

from vggt_qwen3_tpu.data.jsonl_index import JsonlIndex


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "data.jsonl"
    rows = [{"i": i, "text": f"räw-{i}"} for i in range(50)]
    body = "\n".join(json.dumps(r, ensure_ascii=False) for r in rows)
    # blank line + CRLF + trailing newline edge cases
    p.write_text(rows and (body.replace('\n', '\r\n', 1) + "\n\n"), encoding="utf-8")
    return p, rows


def test_index_matches_eager_parse(jsonl_file):
    p, rows = jsonl_file
    idx = JsonlIndex(p)
    assert len(idx) == len(rows)
    for i in (0, 1, 25, 49):
        assert idx[i] == rows[i]
    with pytest.raises(IndexError):
        idx.raw(50)
    idx.close()


def test_native_backend_available():
    """The C++ .so must build and load in this environment."""
    lib_path = Path(__file__).resolve().parent.parent / "csrc" / "libjsonl_index.so"
    import subprocess

    subprocess.run(["make", "-C", str(lib_path.parent)], check=True, capture_output=True)
    import vggt_qwen3_tpu.data.jsonl_index as ji

    ji._lib = None
    ji._lib_attempted = False
    idx = JsonlIndex(Path(__file__))  # any text file indexes lines
    assert idx.backend == "native"
    idx.close()


def test_dataset_uses_lazy_slots(tmp_path):
    from vggt_qwen3_tpu.data.dataset import DatasetConfig, MultiViewJsonDataset

    p = tmp_path / "d.jsonl"
    with p.open("w") as f:
        for i in range(5):
            f.write(json.dumps({"images": ["x.jpg"], "question": f"q{i}", "answer": "a",
                                "scene_id": f"s{i}"}) + "\n")
    ds = MultiViewJsonDataset(DatasetConfig(str(p), 1, 56, "qa"))
    assert len(ds) == 5
    assert ds.meta(3)["question"] == "q3"
    # lazy slots for jsonl
    assert isinstance(ds._slots[0], tuple)
