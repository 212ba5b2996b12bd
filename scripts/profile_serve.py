"""Constrained-classic serving tax profiler (VERDICT r4 item 5).

Round-4 measured structured-classic serving at 21.0 req/s vs 36.6 classic
free-text at the SAME dispatch count — a 42% tax that FSM theory (one table
gather + mask per step) cannot explain. This isolates the per-dispatch cost:
the same SlotEngine state advances through `_decode_chunk` with and without
a constraint table, same slots, same occupancy, timed per dispatch.

Knobs: PROF_SLOTS (16), PROF_STATES (8 | 320 — the FSM state count scales
the table gather), PROF_CHUNK (4), PROF_STEPS (12 dispatches).
Run on the TPU; CPU works for smoke (PROF_TINY=1).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507, QWEN3_TINY
from vggt_qwen3_tpu.inference.engine import GenerationConfig
from vggt_qwen3_tpu.inference.slots import SlotEngine, _decode_chunk
from vggt_qwen3_tpu.models import qwen3

TINY = os.environ.get("PROF_TINY") == "1"
SLOTS = int(os.environ.get("PROF_SLOTS", "4" if TINY else "16"))
STATES = int(os.environ.get("PROF_STATES", "8"))
CHUNK = int(os.environ.get("PROF_CHUNK", "4"))
STEPS = int(os.environ.get("PROF_STEPS", "12"))


def main():
    cfg = QWEN3_TINY if TINY else QWEN3_4B_INSTRUCT_2507
    prompt_len, new_tokens = (8, 8) if TINY else (32, 256)  # long budget: no slot finishes
    print(f"profile_serve: slots={SLOTS} states={STATES} chunk={CHUNK} "
          f"steps={STEPS} backend={jax.default_backend()}", flush=True)

    def real_init():
        p = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype=cfg.dtype)
        if not TINY:
            p = qwen3.quantize_params(p)
        return p

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    params = bench._cheap_params(real_init) if not TINY else real_init()
    jax.block_until_ready(params)
    print("params ready", flush=True)

    gen_cfg = GenerationConfig(
        max_new_tokens=new_tokens, eos_token_id=None, pad_token_id=0,
        kv_dtype=None if TINY else "int8",
    )
    cyc = [t % (cfg.vocab_size - 2) + 1 for t in [7, 23, 5, 41, 9, 42, 11, 3301]]
    table = np.full((STATES, cfg.vocab_size), -1, np.int32)
    for s in range(STATES):
        table[s, cyc[s % len(cyc)]] = (s + 1) % STATES
    constraint = jnp.asarray(table)

    rng = np.random.default_rng(0)

    def fill_engine(constraint):
        eng = SlotEngine(params, cfg, gen_cfg, num_slots=SLOTS,
                         max_len=prompt_len + new_tokens, decode_chunk=CHUNK,
                         constraint=constraint)
        for i in range(SLOTS):
            ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, prompt_len)))
            emb = np.asarray(qwen3.embed_tokens(params, ids))
            eng.submit_embeds(emb, np.ones((1, prompt_len), np.int32))
        eng._admit_pending()
        return eng

    results = {}
    for label, cons in [("classic", None), (f"constrained[{STATES} states]", constraint)]:
        t0 = time.time()
        eng = fill_engine(cons)
        print(f"{label}: engine filled ({time.time()-t0:.1f}s)", flush=True)
        # compile once
        t0 = time.time()
        eng.state, snap = _decode_chunk(
            params, eng.state, cfg, gen_cfg, CHUNK, eng.constraint, frontier=True)
        np.asarray(snap)
        print(f"{label}: chunk compiled ({time.time()-t0:.1f}s)", flush=True)
        times = []
        for _ in range(STEPS):
            t0 = time.time()
            eng.state, snap = _decode_chunk(
                params, eng.state, cfg, gen_cfg, CHUNK, eng.constraint,
                frontier=True)
            np.asarray(snap)  # force execution (axon sync gotcha)
            times.append(time.time() - t0)
        per = float(np.median(times))
        results[label] = per
        print(f"{label}: median {per*1e3:.1f} ms/dispatch "
              f"(min {min(times)*1e3:.1f}, max {max(times)*1e3:.1f}) over "
              f"{STEPS} dispatches of {CHUNK} steps × {SLOTS} slots", flush=True)

    base = results["classic"]
    for label, per in results.items():
        if label != "classic":
            print(f"TAX: {label} = {per/base:.2f}× classic "
                  f"(+{(per-base)*1e3:.1f} ms/dispatch)", flush=True)


if __name__ == "__main__":
    main()
