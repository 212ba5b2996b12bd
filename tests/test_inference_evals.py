"""Answer post-processing heuristics and eval metric semantics."""

import json

import numpy as np

from vggt_qwen3_tpu.evals.baseline import compute_metrics
from vggt_qwen3_tpu.evals.em import exact_match_accuracy
from vggt_qwen3_tpu.evals.iou3d import iou_3d, macc_at_iou
from vggt_qwen3_tpu.inference.postprocess import (
    extract_first_json,
    postprocess_arkit_generation,
    postprocess_qa_answer,
)


class TestQAPostprocess:
    """qa_inference.py:220-243 heuristics."""

    def test_question_echo_stripped(self):
        assert postprocess_qa_answer("What color is it? brown", "What color is it?") == "brown"

    def test_image_token_removed(self):
        assert postprocess_qa_answer("<image> brown", "q") == "brown"

    def test_first_sentence_kept(self):
        assert postprocess_qa_answer("brown. it is a nice table.", "q") == "brown"

    def test_is_extraction_when_verbose(self):
        out = postprocess_qa_answer("The table next to you is brown", "q")
        assert out == "brown"

    def test_short_answers_untouched(self):
        assert postprocess_qa_answer("on the left side", "q") == "on the left side"

    def test_is_extraction_uses_last_is(self):
        out = postprocess_qa_answer("the answer is that it is dark red", "q")
        assert out == "dark red"


class TestArkitPostprocess:
    def test_prompt_echo_stripped(self):
        raw = 'PROMPT TEXT {"action": "place"}'
        assert postprocess_arkit_generation(raw, "PROMPT TEXT", "q") == '{"action": "place"}'

    def test_empty_falls_back_to_raw(self):
        assert postprocess_arkit_generation("PROMPT", "PROMPT", "q") == "PROMPT"

    def test_extract_first_json_balanced(self):
        text = 'noise {"a": {"b": 1}} trailing {"c": 2}'
        assert extract_first_json(text) == '{"a": {"b": 1}}'

    def test_extract_no_json_returns_input(self):
        assert extract_first_json("no json here") == "no json here"

    def test_extract_unbalanced_returns_input(self):
        assert extract_first_json('{"a": 1') == '{"a": 1'


class TestBaselineMetrics:
    """eval_baseline_quick.py:36-135 semantics."""

    def test_string_exact_and_partial(self):
        records = [
            {"prediction": "Brown ", "reference": "brown"},  # exact (ci, strip)
            {"prediction": "dark brown", "reference": "brown"},  # partial (ref in pred)
            {"prediction": "br", "reference": "brown"},  # partial (pred in ref)
            {"prediction": "blue", "reference": "brown"},  # miss
        ]
        m = compute_metrics(records)
        assert m["exact_match"] == 1 and m["partial_match"] == 2
        assert m["accuracy"] == 25.0 and m["partial_accuracy"] == 75.0

    def test_dict_reference_semantics(self):
        ref = {"action": "place", "scene": "x"}
        records = [
            {"prediction": json.dumps(ref), "reference": ref},  # exact + partial
            {"prediction": "will place the object", "reference": ref},  # partial only
            {"prediction": "nothing", "reference": ref},  # miss
        ]
        m = compute_metrics(records)
        assert m["exact_match"] == 1 and m["partial_match"] == 2

    def test_empty_prediction_partial_quirk(self):
        """Reference quirk kept: empty pred is a substring of any ref."""
        m = compute_metrics([{"prediction": "", "reference": "brown"}])
        assert m["partial_match"] == 1 and m["exact_match"] == 0


def test_em_accuracy():
    preds = [{"answer": " Brown"}, {"answer": "blue"}]
    refs = [{"answer": "brown"}, {"answer": "red"}]
    assert exact_match_accuracy(preds, refs) == 0.5


def test_iou3d_values():
    a = {"min": [0, 0, 0], "max": [2, 2, 2]}
    b = {"min": [1, 1, 1], "max": [3, 3, 3]}
    np.testing.assert_allclose(iou_3d(a, b), 1.0 / 15.0, atol=1e-6)
    assert iou_3d(a, a) > 0.999
    disjoint = {"min": [5, 5, 5], "max": [6, 6, 6]}
    assert iou_3d(a, disjoint) == 0.0


def test_macc_threshold():
    a = {"min": [0, 0, 0], "max": [2, 2, 2]}
    preds = [{"box": a}, {"box": {"min": [0, 0, 0], "max": [1.9, 2, 2]}}]
    refs = [{"box": a}, {"box": a}]
    assert macc_at_iou(preds, refs, 0.5) == 1.0
    assert macc_at_iou(preds, refs, 0.99) == 0.5


def test_loss_heads():
    import jax.numpy as jnp

    from vggt_qwen3_tpu.train.losses import (
        action_json_loss,
        combined_loss,
        geometry_consistency_loss,
    )

    pred = jnp.asarray([[1.0, 2.0, 3.0]])
    tgt = jnp.asarray([[1.0, 2.0, 5.0]])
    assert float(action_json_loss(pred, tgt)) == np.float32(2.0 / 3)
    same = jnp.asarray([[0.0, 1.0, 0.0]])
    assert float(geometry_consistency_loss(same, same)) < 1e-6
    assert float(geometry_consistency_loss(same, -same)) > 1.9  # opposite normals → ~2

    logits = jnp.zeros((1, 4, 8), jnp.float32)
    labels = jnp.asarray([[-100, 1, 2, 3]])
    out = combined_loss(logits, labels, action_pred=pred, action_target=tgt)
    assert set(out) == {"language", "action_json", "total"}
    assert abs(float(out["total"]) - float(out["language"]) - float(out["action_json"])) < 1e-6


def test_reference_ckpt_converter_prefix_routing(tmp_path):
    """tools/convert_reference_ckpt.py routes reference module prefixes."""
    import sys

    sys.path.insert(0, "tools")
    import torch

    from convert_reference_ckpt import split_by_prefix

    sd = {
        "text_model.model.embed_tokens.weight": torch.zeros(2),
        "module.projector.latents": torch.zeros(2),
        "geom_head.0.weight": torch.zeros(2),
        "vision_model.aggregator.camera_token": torch.zeros(2),
        "lm_head.weight": torch.zeros(2),  # bare HF fallthrough → text
    }
    groups = split_by_prefix(sd)
    assert "model.embed_tokens.weight" in groups["text"]
    assert "latents" in groups["projector"]
    assert "0.weight" in groups["geom"]
    assert "aggregator.camera_token" in groups["vision"]
    assert "lm_head.weight" in groups["text"]
