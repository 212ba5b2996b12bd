"""ON-CHIP token parity of the fused decode kernels vs the XLA path.

The CPU suite proves parity in interpreter mode; this proves it on real
Mosaic-compiled kernels at a production-like shape (B=368, prompt 32,
48 greedy steps, W8 + int8 KV). jax.clear_caches() between modes keeps the
env-flag A/B honest (env is read at trace time; jit keys ignore it).

PARITY_MODES: comma list of "<matmul>:<head>" env pairs
(VGGT_DECODE_MATMUL : VGGT_HEAD_KERNEL). Default "0:0,1:0,1:1" chains
all-XLA → matmul kernels → matmul + fused LM-head-argmax (the pure-greedy
fast path carries TOKENS, not logits, so the head kernel needs its own
A/B leg — with it on in both legs a matmul-only A/B never compares it to
the XLA head). A bare "0,1" still works (head stays at its default).
VGGT_DECODE_KERNEL stays at its default (on for TPU).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507 as CFG
from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
from vggt_qwen3_tpu.models import qwen3

B = int(os.environ.get("PARITY_BATCH", "368"))
STEPS = int(os.environ.get("PARITY_STEPS", "48"))
PROMPT = int(os.environ.get("PARITY_PROMPT", "32"))


def main() -> None:
    modes = os.environ.get("PARITY_MODES", "0:0,1:0,1:1").split(",")
    print(f"parity: B={B} steps={STEPS} modes={modes} "
          f"backend={jax.default_backend()}", flush=True)

    def real_init():
        return qwen3.quantize_params(
            qwen3.init_params(jax.random.PRNGKey(0), CFG, dtype=CFG.dtype))

    params = bench._cheap_params(real_init)
    jax.block_until_ready(params)
    gen_cfg = GenerationConfig(max_new_tokens=STEPS, eos_token_id=None,
                               pad_token_id=0, repetition_penalty=1.0,
                               no_repeat_ngram=0, kv_dtype="int8")
    idsnp = np.random.default_rng(0).integers(1, CFG.vocab_size, (B, PROMPT))
    idsnp[:5, :7] = 0
    ids = jnp.asarray(idsnp)
    mask = jnp.asarray((idsnp != 0).astype(np.int32))
    embeds = qwen3.embed_tokens(params, ids)

    outs = {}
    for mode in modes:
        mm, _, hk = mode.partition(":")
        os.environ["VGGT_DECODE_MATMUL"] = mm
        if hk:
            os.environ["VGGT_HEAD_KERNEL"] = hk
        jax.clear_caches()
        t0 = time.time()
        toks, _ = generate(params, CFG, gen_cfg, inputs_embeds=embeds,
                           attention_mask=mask)
        outs[mode] = np.asarray(toks)
        print(f"mode {mode}: {time.time()-t0:.1f}s (compile+run)", flush=True)

    ref = outs[modes[0]]
    for mode in modes[1:]:
        same = (outs[mode] == ref).all()
        diff = int((outs[mode] != ref).sum())
        print(f"mode {mode} vs {modes[0]}: "
              f"{'TOKEN-EXACT' if same else f'{diff} token diffs'} "
              f"over {ref.size} tokens", flush=True)
        if not same:
            rows = np.unique(np.argwhere(outs[mode] != ref)[:, 0])[:5]
            print(f"  first differing rows: {rows.tolist()}", flush=True)
            raise SystemExit(1)
    print("parity OK", flush=True)


if __name__ == "__main__":
    main()
