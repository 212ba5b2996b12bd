"""Golden tokenizer vector lock (VERDICT r2 item 1 / SURVEY §7.3 item 2).

``tools/record_tokenizer_golden.py`` freezes the tokenizer surface the
pipeline depends on. Here we prove the harness on fixtures: the checked-in
ByteTokenizer golden must reproduce bit-exactly (any drift in the adapter,
the prompt templates, or the padding helpers fails this), and — when a real
Qwen3 golden has been recorded (weights day) — the same check runs against
it automatically.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import record_tokenizer_golden as rec  # noqa: E402

from vggt_qwen3_tpu.data.tokenizer import load_tokenizer  # noqa: E402

FIXTURES = REPO / "tests" / "fixtures"
BYTE_GOLDEN = FIXTURES / "tokenizer_golden_byte.json"
QWEN3_GOLDEN = FIXTURES / "tokenizer_golden_qwen3.json"


def test_byte_golden_reproduces_exactly():
    assert BYTE_GOLDEN.exists(), (
        "regenerate: python tools/record_tokenizer_golden.py --out "
        "tests/fixtures/tokenizer_golden_byte.json"
    )
    golden = json.loads(BYTE_GOLDEN.read_text())
    golden.pop("tokenizer_dir", None)  # recorder metadata, not tokenizer surface
    now = rec.record(load_tokenizer(None))
    assert now == golden


def test_golden_covers_the_named_edge_cases():
    """The probe set must keep covering the slow-tokenizer risks SURVEY
    names: unicode, CJK, digits, adjacent specials, whitespace."""
    qs = [p["question"] for p in rec.PROBES]
    assert any("ü" in q or "ü" in q for q in qs)          # unicode
    assert any(any("一" <= c <= "鿿" for c in q) for q in qs)  # CJK
    assert any(q.strip() != q for q in qs)                  # leading/trailing ws
    assert any("<image>" in q for q in qs)                  # adjacent special
    assert any("\n" in q for q in qs)                       # embedded newline


def test_label_boundary_matches_collator_contract():
    """label_boundary = len(prompt ids): the −100 span the collator writes."""
    golden = json.loads(BYTE_GOLDEN.read_text())
    for e in golden["entries"]:
        assert e["train_ids"][: e["label_boundary"]] == e["qa_prompt_ids"]
        assert e["train_ids"][e["label_boundary"] :] == e["answer_ids"]
        # exactly one <image> token in every QA prompt
        assert len(e["image_token_positions"]) >= 1


@pytest.mark.skipif(not QWEN3_GOLDEN.exists(), reason="real-tokenizer golden not recorded yet (weights day)")
def test_qwen3_golden_reproduces_exactly():
    """Weights-day gate: once tokenizer files + recorded golden exist, the
    adapter must reproduce the real slow-tokenizer vectors bit-exactly."""
    golden = json.loads(QWEN3_GOLDEN.read_text())
    tok_dir = golden.get("tokenizer_dir")
    tok = load_tokenizer(tok_dir)
    assert type(tok).__name__ == golden["tokenizer_class"], (
        "tokenizer files missing — real golden exists but the slow tokenizer "
        "did not load; fix the path before trusting any parity run"
    )
    now = rec.record(tok)
    for key in ("vocab_len", "image_token_id", "eos_token_id", "pad_token_id"):
        assert now[key] == golden[key]
    assert now["entries"] == golden["entries"]
