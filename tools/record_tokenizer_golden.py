"""Record golden tokenizer vectors for the weights-day parity chain.

The reference tokenizes with the **slow** Qwen3 tokenizer (``use_fast=False``,
``src/train/train_sft.py:35-43``) — slow-tokenizer edge cases (added-token
splitting, byte-fallback, whitespace handling) are a named EM@1-parity risk
(SURVEY.md §7.3 item 2). This tool freezes the complete observable tokenizer
surface our pipeline depends on into one JSON file:

- vocab length before/after the ``<image>`` registration, the ``<image>`` id,
  eos/pad ids (pad←eos fallback),
- input_ids for every prompt shape the pipeline builds — the QA prompt
  ``f"{q}\\n<image>\\n"`` (``qa_inference.py:170``), the train prompt+answer
  concatenation with the label boundary (prompt token count), and the ARKit
  system-hint prompt (``arkit_inference.py:249-254``) — over probe strings
  chosen to hit slow-tokenizer edges (unicode, digits, adjacent specials,
  leading/trailing whitespace),
- left- and right-padded batches with attention masks
  (``train_sft.py:42`` right / ``qa_inference.py:115`` left),
- decode round-trips.

Run it on the machine that has the real tokenizer files; check the JSON in;
``tests/test_tokenizer_golden.py`` then locks our adapter against it forever.
Without real files it records the ByteTokenizer fallback — the same harness,
proven on fixtures (the checked-in ``tests/fixtures/tokenizer_golden_byte.json``).

    python tools/record_tokenizer_golden.py [--tokenizer /path/to/Qwen3-4B] \
        --out tests/fixtures/tokenizer_golden_qwen3.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vggt_qwen3_tpu.data.tokenizer import (  # noqa: E402
    IMAGE_TOKEN,
    load_tokenizer,
    pad_and_mask,
)

ARKIT_SYSTEM_HINT = (
    "You are a RoomPlan assistant. Given multi-view images and an instruction, "
    "reply with only the final JSON action using keys action, scene, center, normal, extent. "
    "Do not repeat the instruction text."
)

# Probe strings: each targets a slow-tokenizer edge the pipeline can hit.
PROBES: List[Dict[str, str]] = [
    {"question": "What color is the sofa?", "answer": "dark blue"},
    {"question": "How many chairs are there?", "answer": "3"},          # digits
    {"question": "  leading and trailing spaces  ", "answer": " white "},
    {"question": "Wo steht die Kaffeemaschine — über dem Kühlschrank?",  # unicode
     "answer": "ja, über dem Kühlschrank"},
    {"question": "桌子上有什么？", "answer": "一台笔记本电脑"},              # CJK byte-fallback
    {"question": f"adjacent{IMAGE_TOKEN}special", "answer": "x"},        # <image> mid-word
    {"question": "newline\nin question", "answer": "multi word answer here"},
    {"question": "emoji 🛋️ couch", "answer": "🛋️"},
]


def record(tokenizer) -> Dict:
    def enc(text: str) -> List[int]:
        return [int(i) for i in tokenizer(text, add_special_tokens=False)["input_ids"]]

    # load_tokenizer has ALREADY registered <image> by the time record()
    # runs, so this is the post-registration length (what inference sees);
    # the raw-HF pre-add length is recorded separately for weights-day
    # comparison against the downloaded tokenizer files.
    vocab_with_image = len(tokenizer)
    img_id = int(tokenizer.convert_tokens_to_ids(IMAGE_TOKEN))
    added = set(getattr(tokenizer, "get_added_vocab", dict)().keys())
    vocab_raw = vocab_with_image - (1 if IMAGE_TOKEN in added else 0)

    entries = []
    for probe in PROBES:
        q, a = probe["question"], probe["answer"]
        qa_prompt = f"{q}\n{IMAGE_TOKEN}\n"           # qa_inference.py:170
        prompt_ids = enc(qa_prompt)
        answer_ids = enc(a)
        arkit_prompt = f"{ARKIT_SYSTEM_HINT}\nInstruction: {q}\n{IMAGE_TOKEN}\n"
        entries.append(
            {
                "question": q,
                "answer": a,
                "qa_prompt_ids": prompt_ids,
                "answer_ids": answer_ids,
                # train-time concat + label boundary (collator contract)
                "train_ids": prompt_ids + answer_ids,
                "label_boundary": len(prompt_ids),
                "arkit_prompt_ids": enc(arkit_prompt),
                "image_token_positions": [
                    i for i, t in enumerate(prompt_ids) if t == img_id
                ],
                "decode_roundtrip": tokenizer.decode(answer_ids, skip_special_tokens=True),
            }
        )

    seqs = [e["qa_prompt_ids"] for e in entries[:3]]
    pad_id = int(tokenizer.pad_token_id)
    return {
        "tokenizer_class": type(tokenizer).__name__,
        "vocab_len": vocab_with_image,  # post-<image>-registration (runtime view)
        "vocab_len_raw": vocab_raw,     # pre-registration (raw HF tokenizer)
        "image_token": IMAGE_TOKEN,
        "image_token_id": img_id,
        "eos_token_id": int(tokenizer.eos_token_id),
        "pad_token_id": pad_id,
        "pad_equals_eos": int(tokenizer.pad_token_id) == int(tokenizer.eos_token_id),
        "entries": entries,
        "padded_right": pad_and_mask(seqs, pad_id, side="right"),
        "padded_left": pad_and_mask(seqs, pad_id, side="left"),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer dir (slow files); omit for ByteTokenizer fallback")
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    tok = load_tokenizer(args.tokenizer)
    golden = record(tok)
    # recorded so tests/test_tokenizer_golden.py can reload the same files
    golden["tokenizer_dir"] = args.tokenizer
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(golden, ensure_ascii=False, indent=1))
    print(
        f"recorded {golden['tokenizer_class']} golden: {len(golden['entries'])} "
        f"probes, vocab {golden['vocab_len']}, <image> id {golden['image_token_id']} "
        f"→ {args.out}"
    )


if __name__ == "__main__":
    main()
