"""Exhaustive fuzz of our logit processors against HF's implementations.

HF repetition-penalty (sign-dependent multiply/divide) and no-repeat-ngram
banning must match exactly — the reference's published numbers flow through
them (``qa_inference.py:207-216``, ``arkit_inference.py:274-284``)."""

import numpy as np
import pytest

pytest.importorskip("torch")
import torch
from transformers.generation.logits_process import (
    NoRepeatNGramLogitsProcessor,
    RepetitionPenaltyLogitsProcessor,
)

import jax.numpy as jnp

from vggt_qwen3_tpu.ops.sampling import apply_no_repeat_ngram, apply_repetition_penalty


@pytest.mark.parametrize("penalty,ngram", [(1.1, 4), (1.3, 3), (1.0, 2), (1.1, 0)])
def test_processors_fuzz_vs_hf(penalty, ngram):
    rng = np.random.default_rng(hash((penalty, ngram)) % 2**32)
    V, CAP = 64, 16
    rep = RepetitionPenaltyLogitsProcessor(penalty) if penalty != 1.0 else None
    ngr = NoRepeatNGramLogitsProcessor(ngram) if ngram else None
    for _ in range(100):
        T = int(rng.integers(0, 12))
        seq = rng.integers(0, 16, size=(1, T))  # small id range forces n-gram hits
        logits = rng.normal(size=(1, V)).astype(np.float32)
        t_ids = torch.tensor(seq, dtype=torch.long)
        scores = torch.tensor(logits)
        if rep is not None:
            scores = rep(t_ids, scores)
        if ngr is not None:
            scores = ngr(t_ids, scores)
        ref = scores.numpy()

        buf = np.zeros((1, CAP), np.int32)
        buf[0, :T] = seq[0]
        ours = apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(buf), jnp.asarray([T]), penalty)
        ours = apply_no_repeat_ngram(ours, jnp.asarray(buf), jnp.asarray([T]), ngram)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
