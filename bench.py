"""Benchmark: Qwen3-4B batched greedy decode throughput on one TPU chip.

Headline metric for the driver (BASELINE.json north star: ≥5,000 decode
tok/s/chip on v5e). Random bf16 weights (no HF egress here) — throughput is
weight-value-independent. Prints ONE JSON line:
    {"metric": "qwen3_4b_decode_tok_s_chip", "value": N, "unit": "tok/s",
     "vs_baseline": N/5000}

Env knobs: BENCH_BATCH (default 368), BENCH_KV (int8|bf16, default int8),
BENCH_DECODE (default 128), BENCH_PROMPT (default 32), BENCH_TINY=1 (smoke:
tiny model, CPU-safe). BENCH_QUANT (w8|w8a8|none) selects the text weight
mode in EVERY bench mode (BENCH_WQUANT is accepted as a legacy alias);
BENCH_VQUANT (qa mode) quantizes the frozen vision tower. Default is **w8**
(W8A16): near-lossless per the mid-size drift gates. w8a8 is the throughput
mode (int8×int8 MXU dots, ~1.5× faster) but its EM delta on real weights is
unverified (`evals/baseline.py --compare_quant --quant_mode w8a8`) — it is
deliberately NOT the published headline until that gate clears.
Modes: BENCH_MODE=e2e (query latency), =qa (pipeline samples/s),
=train (stage-1 recipe step time / tokens/s / MFU), =serve (slot-engine
continuous-batching requests/s), =ring (>16-view on-chip evidence),
=spec (prompt-lookup speculative decoding speedup).

Timing note: this environment's tunneled TPU backend does not synchronize on
``block_until_ready`` — only host fetches synchronize — so timing fetches the
token buffer (tiny: B×decode int32) each call.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from functools import partial

import numpy as np

# ---------------------------------------------------------------------------
# Driver-capture hardening (VERDICT r3 item 1): round 3's perf work was
# invisible because the backend flapped at minute 0 and the bench burned the
# driver budget on ~80 s of random-weight init before dying. Three defenses:
#   1. _probe_backend(): a cheap SUBPROCESS probe with backoff before any
#      heavy work — a hung in-process backend init is uninterruptible (the
#      axon relay wedge blocks inside make_c_api_client), a child process
#      isn't. Fails fast with a clear rc instead of eating the driver timeout.
#   2. _cheap_params(): eval_shape the real init→quantize pipeline and fill
#      every leaf with fused iota/sin patterns directly on device — ONE
#      compile, no threefry, no transient bf16 copy next to the int8 one.
#      Throughput is weight-value-independent (docstring above).
#   3. _emit() + watchdog: the headline mode prints a preliminary metric line
#      after the FIRST timed rep; a watchdog thread exits 0 at the soft
#      deadline if any metric already printed (a later relay wedge can no
#      longer zero the round) and exits 3 at the hard deadline otherwise.
# ---------------------------------------------------------------------------

_METRIC_PRINTED = False


def _emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    """Print the driver-parsed JSON metric line (and arm the watchdog's
    success path). May be called twice — preliminary then refined; both are
    genuine measurements of the same metric."""
    global _METRIC_PRINTED
    print(
        json.dumps({"metric": metric, "value": value, "unit": unit,
                    "vs_baseline": vs_baseline}),
        flush=True,
    )
    _METRIC_PRINTED = True


_PROBE_SRC = (
    "import jax, numpy as np, jax.numpy as jnp\n"
    "x = jnp.ones((128, 128), jnp.bfloat16)\n"
    "print('probe ok', float(np.asarray((x @ x).sum())), flush=True)\n"
)


def _probe_backend() -> None:
    """Verify the backend accepts work BEFORE committing to heavy init.

    Runs a tiny matmul in a fresh subprocess (bounded by timeout — the parent
    survives a wedged relay) and retries with backoff. On exhaustion exits
    rc=3 immediately: a fast, legible failure beats the driver's rc=124."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    if os.environ.get("BENCH_TINY") == "1":
        return
    tries = int(os.environ.get("BENCH_PROBE_TRIES", "5"))
    sleeps = [10, 20, 30, 45, 60]
    for i in range(tries):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", "90")),
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"bench: backend probe {i+1}/{tries} timed out "
                  f"({time.time()-t0:.0f}s) — relay wedge pattern",
                  file=sys.stderr, flush=True)
            r = None
        if r is not None and r.returncode == 0 and "probe ok" in r.stdout:
            print(f"bench: backend probe ok in {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            return
        if r is not None:
            tail = (r.stderr or "").strip().splitlines()[-1:] or ["(no stderr)"]
            print(f"bench: backend probe {i+1}/{tries} failed rc={r.returncode}: "
                  f"{tail[0][:200]}", file=sys.stderr, flush=True)
        if i + 1 < tries:
            time.sleep(sleeps[min(i, len(sleeps) - 1)])
    print("bench: TPU backend unavailable after all probes — failing fast",
          file=sys.stderr, flush=True)
    raise SystemExit(3)


def _start_watchdog() -> None:
    """Exit 0 at the soft deadline if a metric line already printed (a wedge
    after first emission can't zero the round); exit 3 at the hard deadline
    otherwise. os._exit is deliberate: a wedged fetch blocks in C and ignores
    exceptions."""
    soft = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
    hard = soft * 2

    def watch():
        t0 = time.time()
        while True:
            time.sleep(10)
            dt = time.time() - t0
            if dt >= soft and _METRIC_PRINTED:
                print(f"bench: watchdog soft deadline ({soft:.0f}s) — metric "
                      "already emitted, exiting 0", file=sys.stderr, flush=True)
                os._exit(0)
            if dt >= hard:
                print(f"bench: watchdog hard deadline ({hard:.0f}s) — no "
                      "metric, exiting 3", file=sys.stderr, flush=True)
                os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def _cheap_init_on() -> bool:
    return os.environ.get("BENCH_CHEAP_INIT", "1") == "1"


def _cheap_params(init_fn):
    """Structure-true pseudo-weights without RNG: ``eval_shape`` the real
    (init → quantize) pipeline, then fill every leaf on device with fused
    iota/sin patterns in ONE jitted program. int8 leaves get a mod-251
    sawtooth, norm/layerscale weights 1.0, quant scales a small positive,
    floats sin(·)·0.02 — non-degenerate, finite, and irrelevant to
    throughput. Replaces ~80 s of threefry init + per-matrix quantize
    compiles with one cheap compile (VERDICT r3 item 1a)."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    shapes = jax.eval_shape(init_fn)
    leaves, treedef = tree_flatten_with_path(shapes)
    primes = (3.0, 7.0, 13.0, 29.0, 53.0)

    def fill(path, spec, i):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        shape, dt = spec.shape, spec.dtype
        acc = jnp.zeros(shape, jnp.float32)
        for d in range(len(shape)):
            acc = acc + jax.lax.broadcasted_iota(jnp.float32, shape, d) * primes[d % len(primes)]
        if jnp.issubdtype(dt, jnp.integer):
            return (jnp.mod(acc + float(i), 251.0) - 125.0).astype(dt)
        if "scale" in name:  # quant scales: small positive
            return jnp.full(shape, 2e-4, dt)
        if "ln" in name or "norm" in name:
            return jnp.ones(shape, dt)
        return (jnp.sin(acc * 0.12 + float(i)) * 0.02).astype(dt)

    @jax.jit
    def build():
        return tree_unflatten(treedef, [fill(p, s, i) for i, (p, s) in enumerate(leaves)])

    return build()


def _text_quant_mode() -> str:
    """Text-weight quant mode for all bench modes: BENCH_QUANT, legacy alias
    BENCH_WQUANT. Default w8 (W8A16) — the near-lossless headline mode."""
    return os.environ.get("BENCH_QUANT", os.environ.get("BENCH_WQUANT", "w8"))


def e2e_mode() -> None:
    """BENCH_MODE=e2e: single-view ScanQA-style query latency on one chip —
    448² image → VGGT-1B → Perceiver(128) → splice → prefill → 32-token greedy
    decode (north-star <200 ms on v5e-8; single-chip numbers here).

    BENCH_QUANT selects the text weight mode (w8 default — decode at B=1 is
    memory-bound so w8a8 ties it here; w4 is a storage mode that measured
    slower — BASELINE.md). "none" = bf16.
    """
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import (
        PerceiverConfig,
        QWEN3_4B_INSTRUCT_2507,
        VGGT_1B,
        VLMConfig,
    )
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
    from vggt_qwen3_tpu.models import qwen3, vlm

    cfg = VLMConfig(
        text=QWEN3_4B_INSTRUCT_2507, vision=VGGT_1B, projector=PerceiverConfig(),
        num_vis_tokens=128, geom_tokens=0, dtype="bfloat16",
    )
    wq = _text_quant_mode()

    def real_init():
        p = vlm.init_params(jax.random.PRNGKey(0), cfg, dtype="bfloat16")
        if wq != "none":
            p["text"] = qwen3.quantize_params(p["text"], mode=wq)
        return p

    params = _cheap_params(real_init) if _cheap_init_on() else real_init()
    np.asarray(jax.tree.leaves(params)[0][0])

    img_id = cfg.text.vocab_size - 1
    images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 1, 3, 448, 448)), jnp.bfloat16)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 150_000, (1, 30)))
    gen_cfg = GenerationConfig(max_new_tokens=32, pad_token_id=0, repetition_penalty=1.1)

    @jax.jit
    def query(params, images, ids):
        vis = vlm.encode_images(params, cfg, images)
        emb = qwen3.embed_tokens(params["text"], ids)
        mask = jnp.ones(ids.shape, jnp.int32)
        emb2, mask2 = vlm.splice_expand(emb, mask, ids.at[:, 10].set(img_id), vis, img_id)
        return generate(params["text"], cfg.text, gen_cfg, inputs_embeds=emb2, attention_mask=mask2)

    toks, _ = query(params, images, ids)
    np.asarray(toks)
    times = []
    for _ in range(5):
        t0 = time.time()
        toks, _ = query(params, images, ids)
        np.asarray(toks)
        times.append(time.time() - t0)
    ms = min(times) * 1000

    # TTFT: same program stopped after ONE generated token — isolates
    # vision + splice + prefill (+1 decode step) from the decode tail
    # (VERDICT r2 item 7: report TTFT separately from decode).
    ttft_cfg = GenerationConfig(max_new_tokens=1, pad_token_id=0,
                                repetition_penalty=1.1)

    @jax.jit
    def first_token(params, images, ids):
        vis = vlm.encode_images(params, cfg, images)
        emb = qwen3.embed_tokens(params["text"], ids)
        mask = jnp.ones(ids.shape, jnp.int32)
        emb2, mask2 = vlm.splice_expand(emb, mask, ids.at[:, 10].set(img_id), vis, img_id)
        return generate(params["text"], cfg.text, ttft_cfg,
                        inputs_embeds=emb2, attention_mask=mask2)

    tok1, _ = first_token(params, images, ids)
    np.asarray(tok1)
    ttimes = []
    for _ in range(5):
        t0 = time.time()
        tok1, _ = first_token(params, images, ids)
        np.asarray(tok1)
        ttimes.append(time.time() - t0)
    ttft_ms = min(ttimes) * 1000
    n_dec = gen_cfg.max_new_tokens - 1
    print(
        f"e2e: {ms:.1f} ms total; TTFT (vision+splice+prefill+1st token) "
        f"{ttft_ms:.1f} ms, decode tail {n_dec} tok × "
        f"{(ms - ttft_ms) / max(n_dec, 1):.2f} ms/tok",
        file=sys.stderr, flush=True,
    )
    # Early-exit latency curve: the 32-token number above is the protocol
    # worst case (max_new_tokens=32), but the deployment workload finishes at
    # EOS — ground-truth answers in the reference's frozen eval artifacts are
    # 1-2 words median (outputs/qa/baseline_eval/*.jsonl "reference" fields).
    # A per-row budget of k tokens does exactly the work of EOS-at-k, so the
    # curve below is the honest "query whose answer is k tokens" latency on
    # ONE chip: the ENTIRE query (vision → splice → prefill → while_loop
    # decode → pack) is one compiled program, one dispatch + one fetch —
    # budgets live on device so nothing else crosses the tunnel.
    from vggt_qwen3_tpu.inference.batching import _vision_splice_early_exit

    mask1 = jnp.ones(ids.shape, jnp.int32)
    ids_img = ids.at[:, 10].set(img_id)
    budgets = {k: jnp.asarray(np.full((1,), k, np.int32)) for k in (2, 4, 8, 16, 32)}

    def ee_query(k: int):
        packed, steps = _vision_splice_early_exit(
            params, cfg, gen_cfg, img_id, images, ids_img, mask1,
            budget=budgets[k],
        )
        np.asarray(packed)  # the one sync; `steps` stays on device
        return steps

    ee_query(32)  # compile the one-program query once
    for k in (2, 4, 8, 16, 32):
        etimes = []
        for _ in range(4):
            t0 = time.time()
            steps = ee_query(k)
            etimes.append(time.time() - t0)
        print(
            f"e2e early-exit (one program): answer_len={k:>2} → "
            f"{min(etimes) * 1000:.1f} ms ({int(steps)} steps)",
            file=sys.stderr, flush=True,
        )

    _emit("e2e_single_view_query_ms", round(ms, 1), "ms", round(200.0 / ms, 3))


def qa_mode() -> None:
    """BENCH_MODE=qa: batched QA pipeline throughput (samples/sec/chip) —
    the first metric BASELINE.json names. Full path per sample: 448² bird
    view → VGGT-1B → Perceiver → splice → prefill → 32-token greedy decode
    with repetition penalty, batch BENCH_QA_BATCH (default 32)."""
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import (
        PerceiverConfig,
        QWEN3_4B_INSTRUCT_2507,
        VGGT_1B,
        VLMConfig,
    )
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
    from vggt_qwen3_tpu.models import qwen3, vlm

    B = int(os.environ.get("BENCH_QA_BATCH", "32"))
    cfg = VLMConfig(
        text=QWEN3_4B_INSTRUCT_2507, vision=VGGT_1B, projector=PerceiverConfig(),
        num_vis_tokens=128, geom_tokens=0, dtype="bfloat16",
    )
    wq = _text_quant_mode()
    vq = os.environ.get("BENCH_VQUANT", "none")  # none|w8|w8a8 (frozen tower)

    def real_init():
        p = vlm.init_params(jax.random.PRNGKey(0), cfg, dtype="bfloat16")
        if wq != "none":
            p["text"] = qwen3.quantize_params(p["text"], mode=wq)
        if vq != "none":
            p = vlm.quantize_vision(p, mode=vq)
        return p

    params = _cheap_params(real_init) if _cheap_init_on() else real_init()
    np.asarray(jax.tree.leaves(params)[0][0])

    img_id = cfg.text.vocab_size - 1
    images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, 1, 3, 448, 448)), jnp.bfloat16)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 150_000, (B, 30)))
    gen_cfg = GenerationConfig(
        max_new_tokens=32, pad_token_id=0, repetition_penalty=1.1, kv_dtype="int8"
    )

    @jax.jit
    def batch_qa(params, images, ids):
        vis = vlm.encode_images(params, cfg, images)
        emb = qwen3.embed_tokens(params["text"], ids)
        mask = jnp.ones(ids.shape, jnp.int32)
        emb2, mask2 = vlm.splice_expand(emb, mask, ids.at[:, 10].set(img_id), vis, img_id)
        return generate(params["text"], cfg.text, gen_cfg, inputs_embeds=emb2, attention_mask=mask2)

    toks, _ = batch_qa(params, images, ids)
    np.asarray(toks)
    times = []
    for _ in range(3):
        t0 = time.time()
        toks, _ = batch_qa(params, images, ids)
        np.asarray(toks)
        times.append(time.time() - t0)
    sps = B / min(times)
    # baseline: the reference runs this path serially at batch 1 through HF
    # generate; no speed figure published — target the <200ms/query north
    # star (5 qps).
    _emit("qa_samples_per_sec_chip", round(sps, 2), "samples/s", round(sps / 5.0, 3))


def train_mode() -> None:
    """BENCH_MODE=train: stage-1 recipe training throughput, MEASURED
    end-to-end (VERDICT r3 item 3 — no analytic pieces).

    The timed region is a REAL grad-accum cycle as ONE jitted program:
    ``lax.scan`` over ``BENCH_TRAIN_CYCLE`` microbatches (default the
    recipe's full accum count), each computing loss+grads for the trainable
    set and feeding ``optax.MultiSteps`` — the final microbatch applies the
    actual optimizer update on device, inside the timing. Shapes are the
    shipped stage-1 recipe (``configs/stage1_3d.yaml``): B=6/device, 8 views
    @ 448², max_length 512, LoRA(r16 qkvo) + projector + geom trainable,
    VGGT frozen.

    What makes the update fit one 16 GB chip (each is the production
    single-chip recipe, not a bench trick):
    - frozen VGGT tower quantized (``vlm.quantize_vision``, default w8a8 —
      stop-gradiented, so pure inference-side compression; int8×int8 dots
      run the compute-bound vision fwd at 2× the bf16 MXU rate),
    - frozen Qwen3 base quantized W8 (the QLoRA recipe: int8 frozen base +
      bf16 LoRA/projector; backward differentiates activations THROUGH the
      dequantized matmuls, weight grads are never formed),
    - 8-bit block-wise Adam moments (``train/adam8bit.py``, the
      bitsandbytes technique — 2.5 GB instead of 9.8 GB f32 for the 1.2B
      trainable params).
    Knobs: BENCH_TRAIN_BATCH (6), BENCH_TRAIN_VIEWS (8), BENCH_TRAIN_CYCLE
    (recipe accum), BENCH_TRAIN_VQUANT (w8a8|w8|none),
    BENCH_TRAIN_TEXTQ (w8|none), BENCH_TRAIN_OPT (adam8bit|adamw),
    BENCH_TINY=1 (CPU smoke on toy shapes).

    Prints step_time_s for the measured optimizer step; stderr carries the
    tokens/s and MFU breakdown.
    """
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import load_stage_config, QWEN3_TINY, VGGT_TINY
    from vggt_qwen3_tpu.models import vlm

    tiny = os.environ.get("BENCH_TINY") == "1"
    stage = load_stage_config(
        "configs/stage1_3d.yaml",
        text_config=QWEN3_TINY if tiny else None,
        vision_config=VGGT_TINY if tiny else None,
    )
    mcfg = stage.model
    if tiny:
        import dataclasses

        from vggt_qwen3_tpu.config import PerceiverConfig

        mcfg = dataclasses.replace(
            mcfg, projector=PerceiverConfig(latent_dim=64, num_latents=16,
                                            num_heads=4, num_layers=2, ffn_dim=128),
            num_vis_tokens=16, dtype="float32",
        )
    B_target = int(os.environ.get("BENCH_TRAIN_BATCH", "2" if tiny else "6"))
    V = int(os.environ.get("BENCH_TRAIN_VIEWS", "2" if tiny else "8"))
    S = 56 if tiny else stage.data.image_size          # 448
    T = 64 if tiny else stage.data.max_length          # 512
    accum = stage.train.grad_accum                     # 32

    # ONE jitted init program: eager init dispatches ~40 separate
    # random-normal compiles through the tunnel helper (~30 min wall);
    # fused it is a single compile.
    def init_all(key):
        p = vlm.init_params(key, mcfg, dtype=mcfg.dtype)
        if stage.lora.enable:
            from vggt_qwen3_tpu.models import qwen3 as qwen3_mod

            p["text"] = qwen3_mod.add_lora(
                p["text"], mcfg.text, stage.lora, jax.random.fold_in(key, 7)
            )
        return p

    if tiny:
        # tiny smoke runs f32; W8's bf16 scales would mix dtypes mid-scan
        vq = tq = "none"
    else:
        vq = os.environ.get("BENCH_TRAIN_VQUANT", "w8a8")
        tq = os.environ.get("BENCH_TRAIN_TEXTQ", "w8")

    def init_quantized(key):
        p = init_all(key)
        if vq != "none":
            p = vlm.quantize_vision(p, mode=vq, donate=False)
        if tq != "none":
            from vggt_qwen3_tpu.models import qwen3 as qwen3_mod

            # QLoRA recipe: frozen base W8, LoRA/projector bf16. LoRA
            # adapters re-attach after quantization (quantize_params walks
            # the stacked projections only).
            lora = p["text"]["layers"].get("lora")
            p["text"] = qwen3_mod.quantize_params(p["text"], mode=tq, donate=False)
            if lora is not None:
                p["text"]["layers"] = dict(p["text"]["layers"], lora=lora)
        return p

    t0 = time.time()
    if _cheap_init_on() and not tiny:
        # cheap fill (norms=1 keeps the loss finite); values don't affect
        # step time and the isfinite assert below still guards the numerics
        params = _cheap_params(lambda: init_quantized(jax.random.PRNGKey(0)))
    else:
        params = jax.jit(init_quantized)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(
        f"init: {time.time()-t0:.1f}s (vision {vq}, frozen text {tq})",
        file=sys.stderr, flush=True,
    )

    # trainable = LoRA adapters + projector + geom head; everything else
    # closes over as frozen (grads never allocated for the 4B base / VGGT)
    trainable = {"projector": params.pop("projector"), "geom": params.pop("geom")}
    if stage.lora.enable:
        text = dict(params["text"])
        layers = dict(text["layers"])
        trainable["lora"] = layers.pop("lora")
        text["layers"] = layers
        params["text"] = text
    frozen = params

    img_id = mcfg.text.vocab_size - 1

    def measure(B: int) -> float:
        """Per-microbatch fwd+bwd seconds at batch B (compile + 3 reps)."""
        rngnp = np.random.default_rng(0)
        images = jnp.asarray(rngnp.uniform(0, 1, (B, V, 3, S, S)), mcfg.dtype)
        ids = rngnp.integers(1, mcfg.text.vocab_size, (B, T))
        ids[:, 4] = img_id
        input_ids = jnp.asarray(ids)
        mask = jnp.ones((B, T), jnp.int32)
        labels = jnp.asarray(np.where(np.arange(T)[None] < 8, -100, ids))
        geom = {
            "R": jnp.asarray(rngnp.normal(size=(B, V, 9)), jnp.float32),
            "t": jnp.asarray(rngnp.normal(size=(B, V, 3)), jnp.float32),
            "K": jnp.asarray(rngnp.normal(size=(B, V, 9)), jnp.float32),
            "depth_hist": jnp.asarray(rngnp.normal(size=(B, V, 16)), jnp.float32),
            "mask": jnp.ones((B,), bool),
        }

        def loss_fn(trainable, frozen, rng):
            p = dict(frozen)
            p["projector"] = trainable["projector"]
            p["geom"] = trainable["geom"]
            if "lora" in trainable:
                text = dict(p["text"])
                text["layers"] = dict(text["layers"], lora=trainable["lora"])
                p["text"] = text
            return vlm.train_forward(
                p, mcfg, images=images, geom_token=geom, input_ids=input_ids,
                attention_mask=mask, labels=labels, image_token_id=img_id, rng=rng,
            )

        grad_step = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.time()
        loss, grads = grad_step(trainable, frozen, jax.random.PRNGKey(1))
        lval = float(np.asarray(loss))
        # free the 2.5 GB grads BEFORE the next call allocates its own —
        # holding both doubles the trainable-grad footprint and OOMs shapes
        # that otherwise fit (measured: B=2 warmup passed, timed rep OOMed)
        del grads, loss
        print(f"B={B} compile+warmup: {time.time()-t0:.1f}s loss={lval:.3f}",
              file=sys.stderr, flush=True)
        assert np.isfinite(lval)
        times = []
        for i in range(3):
            t0 = time.time()
            loss, grads = grad_step(trainable, frozen, jax.random.PRNGKey(2 + i))
            np.asarray(loss)  # host fetch forces execution on this backend
            del grads, loss
            times.append(time.time() - t0)
        return min(times)

    # The stage-1 microbatch (B=6) sits right at the single-chip HBM edge
    # (weights 12.3 GB + trainable grads 2.5 GB leave <1 GB for activations).
    # On OOM, re-exec with B−1 in a FRESH process (failed executions leave
    # buffers that poison in-process retries) and project per-sample.
    B = int(os.environ.get("_BENCH_TRAIN_B_ACTUAL", str(B_target)))
    micro_cached = os.environ.get("_BENCH_TRAIN_MICRO_RAW")
    try:
        # cached across cycle-OOM re-execs: the B-micro number is already
        # measured and re-measuring costs ~5 min of compile per attempt
        micro_raw = float(micro_cached) if micro_cached else measure(B)
    except Exception as e:  # noqa: BLE001
        is_oom = "RESOURCE_EXHAUSTED" in str(e) or "Ran out of memory" in str(e)
        if not is_oom or B <= 1:
            raise
        print(f"B={B} OOM on one chip — re-exec with B={B-1}", file=sys.stderr, flush=True)
        os.environ["_BENCH_TRAIN_B_ACTUAL"] = str(B - 1)
        os.environ["BENCH_RETRIED"] = "0"  # OOM fallback ≠ transient retry budget
        os.execv(sys.executable, [sys.executable] + sys.argv)

    # ---- per-phase wall breakdown (VERDICT r4 item 2: attribute the MFU by
    # measurement, not narrative). BENCH_TRAIN_PHASES=1 times, at the SAME
    # micro shape: (a) the frozen vision+projector encode alone (fwd),
    # (b) the full loss forward, (c) the fwd+bwd micro (already measured) —
    # text fwd ≈ (b)−(a), bwd ≈ (c)−(b). BENCH_TRAIN_TRACE=<dir> wraps one
    # timed micro in jax.profiler.trace for op-level attribution (works iff
    # the tunneled backend exports traces; the decomposition above is the
    # backend-independent fallback).
    if os.environ.get("BENCH_TRAIN_PHASES") == "1":
        rngnp = np.random.default_rng(0)
        ph_images = jnp.asarray(rngnp.uniform(0, 1, (B, V, 3, S, S)), mcfg.dtype)
        ph_ids = rngnp.integers(1, mcfg.text.vocab_size, (B, T))
        ph_ids[:, 4] = img_id
        ph_input_ids = jnp.asarray(ph_ids)
        ph_mask = jnp.ones((B, T), jnp.int32)
        ph_labels = jnp.asarray(np.where(np.arange(T)[None] < 8, -100, ph_ids))
        ph_geom = {
            "R": jnp.asarray(rngnp.normal(size=(B, V, 9)), jnp.float32),
            "t": jnp.asarray(rngnp.normal(size=(B, V, 3)), jnp.float32),
            "K": jnp.asarray(rngnp.normal(size=(B, V, 9)), jnp.float32),
            "depth_hist": jnp.asarray(rngnp.normal(size=(B, V, 16)), jnp.float32),
            "mask": jnp.ones((B,), bool),
        }

        def assemble(trainable, fz):
            # fz is a jit ARGUMENT — closure-capturing the 5 GB frozen tree
            # bakes it into the HLO as literal constants, which the tunneled
            # remote-compile helper rejects at ~100 MB (HTTP 413; same bug
            # the measured cycle hit in c331f67)
            p = dict(fz)
            p["projector"] = trainable["projector"]
            p["geom"] = trainable["geom"]
            if "lora" in trainable:
                text = dict(p["text"])
                text["layers"] = dict(text["layers"], lora=trainable["lora"])
                p["text"] = text
            return p

        def ph_vision(trainable, fz, images):
            return vlm.encode_images(assemble(trainable, fz), mcfg, images).sum()

        def ph_loss(trainable, fz, images):
            # the ~230 MB image batch rides as an argument for the same
            # 413-avoidance reason as the frozen tree
            return vlm.train_forward(
                assemble(trainable, fz), mcfg, images=images, geom_token=ph_geom,
                input_ids=ph_input_ids, attention_mask=ph_mask, labels=ph_labels,
                image_token_id=img_id, rng=jax.random.PRNGKey(1),
            )

        def ph_time(fn, label):
            f = jax.jit(fn)
            t0 = time.time()
            np.asarray(f(trainable, frozen, ph_images))
            c = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(f(trainable, frozen, ph_images))
                ts.append(time.time() - t0)
            dt = min(ts)
            print(f"train phase [{label}]: {dt:.3f}s (compile {c:.1f}s)",
                  file=sys.stderr, flush=True)
            return dt

        t_vis = ph_time(ph_vision, "vision+projector fwd")
        t_fwd = ph_time(ph_loss, "full loss fwd")
        print(
            f"train phases @ B={B}: vision {t_vis:.3f}s | "
            f"text+splice+CE fwd ≈ {t_fwd - t_vis:.3f}s | "
            f"bwd ≈ {micro_raw - t_fwd:.3f}s | micro total {micro_raw:.3f}s "
            f"({t_vis/micro_raw*100:.0f}% / {(t_fwd-t_vis)/micro_raw*100:.0f}% / "
            f"{(micro_raw-t_fwd)/micro_raw*100:.0f}%)",
            file=sys.stderr, flush=True,
        )
        trace_dir = os.environ.get("BENCH_TRAIN_TRACE")
        if trace_dir:
            try:
                grad_fn = jax.jit(jax.value_and_grad(ph_loss))
                np.asarray(grad_fn(trainable, frozen, ph_images)[0])  # compile outside the trace
                with jax.profiler.trace(trace_dir):
                    loss, grads = grad_fn(trainable, frozen, ph_images)
                    np.asarray(loss)
                    del grads
                import glob
                files = glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True)
                print(f"train trace: {len(files)} files under {trace_dir}",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"train trace FAILED on this backend: {e!r}",
                      file=sys.stderr, flush=True)
        # the phase operands (esp. the ~230 MB image batch) must not stay
        # live into the measured cycle — CB=2 OOMed with them resident — and
        # a cycle-OOM re-exec must not re-run the (already printed) phases
        del ph_images, ph_geom, ph_input_ids, ph_mask, ph_labels
        os.environ["BENCH_TRAIN_PHASES"] = "0"

    # ---- the MEASURED grad-accum cycle: k microbatches + the real optimizer
    # update, one jitted program, update inside the timing. Accumulation is
    # hand-rolled (scan carries ONLY the bf16 grad accumulator; params and
    # optimizer state stay loop-invariant inputs, the inner update applies
    # once after the scan) — numerically what optax.MultiSteps computes, but
    # the MultiSteps formulation scan-carries tr+moments+acc (~7 GB) which
    # XLA double-buffers: measured 22.97 G > 15.75 G HBM at the recipe shape.
    # If even the lean cycle OOMs at the micro batch B, it re-execs with a
    # smaller cycle batch CB (B→4→2→1, micro number cached): every component
    # is still timed on device and the composed step is
    # accum × micro(B) + update_residual(CB) — the residual is B-independent.
    import optax

    k_cycle = int(os.environ.get("BENCH_TRAIN_CYCLE", str(accum)))
    k_cycle = max(1, min(k_cycle, accum))
    opt_name = os.environ.get("BENCH_TRAIN_OPT", "adam8bit")
    if opt_name == "adam8bit":
        from vggt_qwen3_tpu.train.adam8bit import adamw8bit

        inner_tx = adamw8bit(stage.train.proj_lr, weight_decay=stage.train.weight_decay)
    else:
        inner_tx = optax.adamw(stage.train.proj_lr, weight_decay=stage.train.weight_decay)
    opt_state = jax.jit(inner_tx.init)(trainable)
    jax.block_until_ready(opt_state)

    CB = int(os.environ.get("_BENCH_TRAIN_CB_ACTUAL", str(B)))

    def make_cycle(CB: int):
        rngnp = np.random.default_rng(0)
        c_images = jnp.asarray(rngnp.uniform(0, 1, (CB, V, 3, S, S)), mcfg.dtype)
        c_ids = rngnp.integers(1, mcfg.text.vocab_size, (CB, T))
        c_ids[:, 4] = img_id
        c_input_ids = jnp.asarray(c_ids)
        c_mask = jnp.ones((CB, T), jnp.int32)
        c_labels = jnp.asarray(np.where(np.arange(T)[None] < 8, -100, c_ids))
        c_geom = {
            "R": jnp.asarray(rngnp.normal(size=(CB, V, 9)), jnp.float32),
            "t": jnp.asarray(rngnp.normal(size=(CB, V, 3)), jnp.float32),
            "K": jnp.asarray(rngnp.normal(size=(CB, V, 9)), jnp.float32),
            "depth_hist": jnp.asarray(rngnp.normal(size=(CB, V, 16)), jnp.float32),
            "mask": jnp.ones((CB,), bool),
        }

        def cycle_loss(tr, frozen, rng):
            p = dict(frozen)
            p["projector"] = tr["projector"]
            p["geom"] = tr["geom"]
            if "lora" in tr:
                text = dict(p["text"])
                text["layers"] = dict(text["layers"], lora=tr["lora"])
                p["text"] = text
            return vlm.train_forward(
                p, mcfg, images=c_images, geom_token=c_geom, input_ids=c_input_ids,
                attention_mask=c_mask, labels=c_labels, image_token_id=img_id, rng=rng,
            )

        # frozen params enter as an ARGUMENT: closing over them bakes ~5 GB
        # of weights into the HLO as captured constants — XLA constant-folds
        # over them (25+ min lowering) and the executable blob balloons
        @partial(jax.jit, donate_argnums=(0, 1))
        def accum_cycle(tr, opt_state, frozen, rng):
            def micro(acc, i):
                loss, grads = jax.value_and_grad(cycle_loss)(
                    tr, frozen, jax.random.fold_in(rng, i)
                )
                acc = jax.tree.map(jnp.add, acc, grads)
                return acc, loss

            acc0 = jax.tree.map(jnp.zeros_like, tr)
            acc, losses = jax.lax.scan(micro, acc0, jnp.arange(k_cycle))
            mean_grads = jax.tree.map(lambda g: g / k_cycle, acc)
            updates, opt_state = inner_tx.update(mean_grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return tr, opt_state, losses.mean()

        return accum_cycle

    accum_cycle = make_cycle(CB)
    try:
        t0 = time.time()
        trainable, opt_state, mloss = accum_cycle(
            trainable, opt_state, frozen, jax.random.PRNGKey(9)
        )
        mloss = float(np.asarray(mloss))
        print(
            f"cycle compile+warmup (CB={CB}, {k_cycle} micro + {opt_name} update): "
            f"{time.time()-t0:.1f}s loss={mloss:.3f}",
            file=sys.stderr, flush=True,
        )
        assert np.isfinite(mloss)
    except Exception as e:  # noqa: BLE001
        is_oom = "RESOURCE_EXHAUSTED" in str(e) or "Ran out of memory" in str(e)
        if not is_oom or CB <= 1:
            raise
        nxt = {6: 4, 5: 4, 4: 2, 3: 2, 2: 1}.get(CB, max(1, CB // 2))
        print(f"cycle CB={CB} OOM — re-exec with CB={nxt} (micro cached)",
              file=sys.stderr, flush=True)
        os.environ["_BENCH_TRAIN_CB_ACTUAL"] = str(nxt)
        os.environ["_BENCH_TRAIN_B_ACTUAL"] = str(B)
        os.environ["_BENCH_TRAIN_MICRO_RAW"] = repr(micro_raw)
        os.environ["BENCH_RETRIED"] = "0"  # OOM fallback ≠ transient retry budget
        os.execv(sys.executable, [sys.executable] + sys.argv)

    cycle_times = []
    for i in range(2):
        t0 = time.time()
        trainable, opt_state, mloss = accum_cycle(
            trainable, opt_state, frozen, jax.random.PRNGKey(10 + i)
        )
        np.asarray(mloss)  # host fetch forces execution on this backend
        cycle_times.append(time.time() - t0)
    cycle_s = min(cycle_times)
    # measured residual of the update + accum bookkeeping beyond k raw micros
    # at the CYCLE batch (the residual — update math + accumulator adds — does
    # not depend on batch, so it composes with the B-micro measurement)
    micro_cb = micro_raw if CB == B else measure(CB)
    update_s = max(cycle_s - k_cycle * micro_cb, 0.0)
    # recipe step at the measured micro batch: accum micros + measured update
    step_meas = accum * micro_raw + update_s
    # per-sample projection to the recipe microbatch (update does not scale
    # with B; only stated when B < recipe B)
    micro_s = micro_raw * (B_target / B)
    step_s = accum * micro_s + update_s

    # tokens & MFU accounting (fwd 2PN, bwd adds ~4PN on trainable-path flops;
    # frozen VGGT is fwd-only; text base fwd+activation-bwd ≈ 6PN with LoRA)
    n_text = 4.02e9
    n_vis = 0.91e9
    n_proj = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(trainable["projector"]))
    vis_tokens = B_target * V * (1 + 4 + (S // 14) ** 2)
    text_tokens = B_target * T
    flops = (
        2 * n_vis * vis_tokens            # frozen vision fwd
        + 6 * n_text * text_tokens        # text fwd + full activation bwd
        + 6 * n_proj * B_target * mcfg.projector.num_latents
    )
    if tiny:
        flops = 1.0  # MFU meaningless on toy dims
    peak = 197e12  # v5e bf16 spec (comparable across rounds)
    # delivered-peak conversion: scripts/peak_probe.py measured this tunneled
    # chip at 88.9 TFLOP/s bf16 (45% of spec) — the spec-MFU understates how
    # much of the attached hardware the step actually uses by that factor
    delivered = 88.9e12
    mfu = flops / micro_s / peak
    tok_s = accum * text_tokens / step_s
    print(
        f"micro={micro_raw*1000:.0f} ms at B={B} "
        f"({micro_s*1000:.0f} ms per-sample-scaled to recipe B={B_target}; "
        f"V={V} {S}px T={T})\n"
        f"MEASURED cycle at CB={CB} ({k_cycle} micro + {opt_name} update in one "
        f"program): {cycle_s:.2f}s → recipe step at B={B}: {step_meas:.1f}s "
        f"(update residual {update_s*1000:.0f} ms, measured)\n"
        f"recipe step at B={B_target}"
        + ("" if B == B_target else " (per-sample projection)")
        + f": {step_s:.1f}s, "
        f"text tok/s={tok_s:.0f} MFU={mfu*100:.1f}% vs v5e spec "
        f"({flops / micro_s / delivered * 100:.1f}% vs this chip's measured "
        f"88.9 TFLOP/s delivered peak) "
        f"30k steps ≈ {step_s*30000/3600:.1f} h/chip-equivalent; v5e-8 dp8 ≈ same "
        f"step time at 8× global batch",
        file=sys.stderr, flush=True,
    )
    # reference budget: 30k steps in a 24h Slurm window → 2.88 s/step.
    # the emitted metric is the MEASURED step when the recipe microbatch fits
    # (B == B_target), else the per-sample projection (labeled above)
    emit_s = step_meas if B == B_target else step_s
    _emit("stage1_train_step_s", round(emit_s, 2), "s/step",
          round((24 * 3600 / 30000) / emit_s, 3))


def serve_mode() -> None:
    """BENCH_MODE=serve: token-level continuous-batching served throughput
    (VERDICT r2 item 3 measurement). Text-only workload isolating the slot
    engine: BENCH_SERVE_REQS requests (default 64) of prompt 32 with varied
    per-request budgets (8..32 tokens — uniform budgets would finish every
    slot at the same chunk boundary and never exercise mid-decode admission),
    submitted all at once against BENCH_SLOTS KV slots (default 16,
    decode_chunk 4) — slots free at staggered boundaries, so the run
    exercises steady-state mid-decode admission. Reports requests/s; stderr
    carries tok/s, chunk count, and mid-decode admissions. The engine fetches
    done-flags one chunk late (pipelined delivery), so the per-chunk host
    round-trip (~30 ms on this tunneled backend) overlaps the next chunk's
    compute — measured 5.99 → 21.18 req/s on this workload."""
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507, QWEN3_TINY
    from vggt_qwen3_tpu.inference.engine import GenerationConfig
    from vggt_qwen3_tpu.inference.slots import SlotEngine
    from vggt_qwen3_tpu.models import qwen3

    tiny = os.environ.get("BENCH_TINY") == "1"
    cfg = QWEN3_TINY if tiny else QWEN3_4B_INSTRUCT_2507
    n_req = int(os.environ.get("BENCH_SERVE_REQS", "8" if tiny else "64"))
    slots = int(os.environ.get("BENCH_SLOTS", "4" if tiny else "16"))
    prompt_len, new_tokens = (8, 8) if tiny else (
        int(os.environ.get("BENCH_SERVE_PROMPT", "32")),
        int(os.environ.get("BENCH_SERVE_NEW", "32")),
    )
    # kernel-eligible serve shape for on-chip A/B: BENCH_SLOTS=64
    # BENCH_SERVE_PROMPT=64 BENCH_SERVE_NEW=64 → row 128, B·T=8192, T%32=0

    # BENCH_SERVE_STRUCT=1: schema-FSM-constrained decoding (the ARKit action
    # serving case — outputs follow a repeating JSON-like skeleton).
    # BENCH_SERVE_SPEC=1: speculative verify blocks. Compare spec on/off at
    # STRUCT=1 for the structured-serving speedup; spec at STRUCT=0 (free
    # text, ~zero acceptance) is the honest worst case.
    spec = os.environ.get("BENCH_SERVE_SPEC") == "1"
    struct = os.environ.get("BENCH_SERVE_STRUCT", os.environ.get("BENCH_SERVE_SPEC", "0")) == "1"
    constraint = None
    cyc = [t % (cfg.vocab_size - 2) + 1 for t in [7, 23, 5, 41, 9, 42, 11, 3301]]
    if struct:
        table = np.full((len(cyc), cfg.vocab_size), -1, np.int32)
        for s, t in enumerate(cyc):
            table[s, t] = (s + 1) % len(cyc)
        constraint = jnp.asarray(table)
    wq = _text_quant_mode()

    def real_init():
        p = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype=cfg.dtype)
        if wq != "none" and not tiny:
            p = qwen3.quantize_params(p, mode=wq)
        return p

    # spec serving measures acceptance on real output distributions — cheap
    # deterministic weights would skew it (see spec_mode), so cheap init is
    # reserved for the non-speculative serve workload
    params = (_cheap_params(real_init)
              if _cheap_init_on() and not tiny and not spec else real_init())
    gen_cfg = GenerationConfig(
        max_new_tokens=new_tokens, eos_token_id=None, pad_token_id=0,
        kv_dtype=None if tiny else "int8",
    )
    # BENCH_SPEC_GUARD=0 measures the raw zero-acceptance bracket (guard
    # off); default keeps the production auto-fallback so the free-text
    # regression can't ship (tests/test_slot_engine.py spec-guard tests)
    guard_gain = (0.0 if os.environ.get("BENCH_SPEC_GUARD") == "0" else 1.35)
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=slots,
                     max_len=prompt_len + new_tokens, decode_chunk=4,
                     speculative=spec, constraint=constraint,
                     spec_min_gain=guard_gain)

    rng = np.random.default_rng(0)
    prompts = []
    budgets = []
    for i in range(n_req):
        # structured case: the skeleton also appears at the prompt tail (the
        # ARKit schema-in-system-hint pattern) so lookup warms immediately
        idsnp = rng.integers(1, cfg.vocab_size, (1, prompt_len))
        if struct:
            idsnp[0, -len(cyc):] = cyc
        ids = jnp.asarray(idsnp)
        emb = np.asarray(qwen3.embed_tokens(params, ids))
        prompts.append((emb, np.ones((1, prompt_len), np.int32), idsnp))
        # cycle budgets over [new_tokens/4, new_tokens] so completions stagger
        lo = max(1, new_tokens // 4)
        budgets.append(lo + i % (new_tokens - lo + 1))

    # warmup: one full closed pass (same protocol as serve_sla's capacity
    # probe) — bucket-batched admission dispatches in power-of-two groups
    # (A ∈ {1,2,4,8,16}, slots.py _admit_pending), so a single-request warmup
    # leaves four admit-batch shapes compiling INSIDE the timed window
    # (measured: 3.0 req/s cold vs warm steady state; a production engine
    # precompiles its shape buckets the same way)
    warm = [eng.submit_embeds(e, m, max_new_tokens=b,
                              lookup_ids=lids if spec else None)
            for (e, m, lids), b in zip(prompts[: 4 * slots],
                                       budgets[: 4 * slots])]
    eng.run_until_idle()
    for fut in warm:
        fut.result(timeout=600)
    eng.stats.requests = eng.stats.chunks = eng.stats.tokens = 0
    eng.stats.admitted_mid_decode = eng.stats.admit_dispatches = 0
    eng.stats.admission_wait_s = 0.0
    eng.stats.admission_log.clear()

    t0 = time.time()
    futs = [eng.submit_embeds(e, m, max_new_tokens=b,
                              lookup_ids=lids if spec else None)
            for (e, m, lids), b in zip(prompts, budgets)]
    eng.run_until_idle()
    for f in futs:
        f.result(timeout=120)
    dt = time.time() - t0
    rps = n_req / dt
    label = ("structured+spec" if struct and spec else
             "structured" if struct else "spec" if spec else "free")
    print(
        f"serve [{label}]: {n_req} reqs × {new_tokens} "
        f"tok over {slots} slots in {dt:.2f}s "
        f"→ {rps:.2f} req/s, {eng.stats.tokens/dt:.0f} served tok/s, "
        f"{eng.stats.chunks} chunks, {eng.stats.admitted_mid_decode} mid-decode admissions, "
        f"{eng.stats.admit_dispatches} admit dispatches for {n_req} reqs "
        f"(mean admission wait "
        f"{eng.stats.admission_wait_s/max(eng.stats.requests,1)*1e3:.0f} ms), "
        f"KV occupancy {eng.stats.kv_utilization*100:.0f}% "
        f"(reserved {slots}×{eng._row_len} rows)"
        + (
            f"; spec blocks {eng.stats.spec_blocks}, accepted "
            f"{eng.stats.spec_accepted}"
            + (
                f", guard tripped at chunk {eng.stats.spec_disabled_at}"
                if eng.stats.spec_disabled_at is not None
                else ""
            )
            if spec
            else ""
        ),
        file=sys.stderr, flush=True,
    )
    # north star <200 ms/query ⇒ 5 qps reference point
    _emit("served_requests_per_sec", round(rps, 2), "req/s", round(rps / 5.0, 3))


def serve_sla_mode() -> None:
    """BENCH_MODE=serve_sla: OPEN-loop serving — Poisson arrivals at
    0.5×/1.0×/1.5× the measured closed-loop capacity, reporting p50/p99 TTFT
    (submit → first emitted token, chunk-granular) and inter-token latency
    (VERDICT r4 item 4: the numbers an SLA is written against; the closed
    64-at-once serve workload can't produce them). Knobs: BENCH_SERVE_SPEC /
    BENCH_SERVE_STRUCT as in serve mode; BENCH_SLA_REQS per phase (default
    96); BENCH_SLA_LOADS (default "0.5,1.0,1.5"). Emits p99 TTFT at 1.0×."""
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507, QWEN3_TINY
    from vggt_qwen3_tpu.inference.engine import GenerationConfig
    from vggt_qwen3_tpu.inference.slots import SlotEngine
    from vggt_qwen3_tpu.models import qwen3

    tiny = os.environ.get("BENCH_TINY") == "1"
    cfg = QWEN3_TINY if tiny else QWEN3_4B_INSTRUCT_2507
    n_req = int(os.environ.get("BENCH_SLA_REQS", "8" if tiny else "96"))
    slots = int(os.environ.get("BENCH_SLOTS", "4" if tiny else "16"))
    prompt_len, new_tokens = (8, 8) if tiny else (
        int(os.environ.get("BENCH_SERVE_PROMPT", "32")),
        int(os.environ.get("BENCH_SERVE_NEW", "32")),
    )
    spec = os.environ.get("BENCH_SERVE_SPEC") == "1"
    struct = os.environ.get(
        "BENCH_SERVE_STRUCT", os.environ.get("BENCH_SERVE_SPEC", "0")) == "1"
    constraint = None
    cyc = [t % (cfg.vocab_size - 2) + 1 for t in [7, 23, 5, 41, 9, 42, 11, 3301]]
    if struct:
        table = np.full((len(cyc), cfg.vocab_size), -1, np.int32)
        for s, t in enumerate(cyc):
            table[s, t] = (s + 1) % len(cyc)
        constraint = jnp.asarray(table)
    wq = _text_quant_mode()

    def real_init():
        p = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype=cfg.dtype)
        if wq != "none" and not tiny:
            p = qwen3.quantize_params(p, mode=wq)
        return p

    params = (_cheap_params(real_init)
              if _cheap_init_on() and not tiny and not spec else real_init())
    gen_cfg = GenerationConfig(
        max_new_tokens=new_tokens, eos_token_id=None, pad_token_id=0,
        kv_dtype=None if tiny else "int8",
    )
    eng = SlotEngine(params, cfg, gen_cfg, num_slots=slots,
                     max_len=prompt_len + new_tokens, decode_chunk=4,
                     speculative=spec, constraint=constraint,
                     spec_min_gain=0.0 if spec else 1.35,
                     track_metrics=True)

    rng = np.random.default_rng(0)
    prompts = []
    budgets = []
    for i in range(n_req):
        idsnp = rng.integers(1, cfg.vocab_size, (1, prompt_len))
        if struct:
            idsnp[0, -len(cyc):] = cyc
        emb = np.asarray(qwen3.embed_tokens(params, jnp.asarray(idsnp)))
        prompts.append((emb, np.ones((1, prompt_len), np.int32), idsnp.astype(np.int32)))
        lo = max(1, new_tokens // 4)
        budgets.append(lo + i % (new_tokens - lo + 1))

    def submit(i):
        e, m, lids = prompts[i]
        return eng.submit_embeds(e, m, max_new_tokens=budgets[i],
                                 lookup_ids=lids if spec else None)

    # ---- closed-loop capacity probe (also compiles admit + chunk) --------
    t0 = time.time()
    futs = [submit(i) for i in range(min(n_req, 4 * slots))]
    eng.run_until_idle()
    for f in futs:
        f.result(timeout=300)
        eng.req_meta.pop(f, None)
    warm = time.time() - t0
    # second closed pass, warm, is the capacity estimate
    t0 = time.time()
    futs = [submit(i) for i in range(min(n_req, 4 * slots))]
    eng.run_until_idle()
    for f in futs:
        f.result(timeout=300)
        eng.req_meta.pop(f, None)
    cap = len(futs) / (time.time() - t0)
    print(f"serve_sla: closed-loop capacity {cap:.2f} req/s "
          f"(cold pass {warm:.2f}s)", file=sys.stderr, flush=True)

    label = ("structured+spec" if struct and spec else
             "structured" if struct else "spec" if spec else "free")
    loads = [float(x) for x in
             os.environ.get("BENCH_SLA_LOADS", "0.5,1.0,1.5").split(",")]
    arr_rng = np.random.default_rng(7)
    p99_at_1x = None
    eng.start()
    try:
        for load in loads:
            lam = max(cap * load, 1e-3)
            gaps = arr_rng.exponential(1.0 / lam, size=n_req)
            futs = []
            t_start = time.time()
            for i in range(n_req):
                time.sleep(float(gaps[i]))
                futs.append(submit(i))
            for f in futs:
                f.result(timeout=600)
            dt = time.time() - t_start
            metas = [eng.req_meta.pop(f) for f in futs]
            ttft = np.array([(m["first_tok"] - m["submit"]) * 1e3 for m in metas])
            wait = np.array([(m["admit"] - m["submit"]) * 1e3 for m in metas])
            itl = np.array([
                (m["done"] - m["first_tok"]) / max(m["n"] - 1, 1) * 1e3
                for m in metas if m.get("n", 0) > 1
            ])
            p50, p99 = np.percentile(ttft, 50), np.percentile(ttft, 99)
            print(
                f"serve_sla [{label}] load {load:.1f}×cap (λ={lam:.2f}/s): "
                f"{n_req} reqs in {dt:.2f}s ({len(futs)/dt:.2f} req/s) — "
                f"TTFT p50 {p50:.0f} / p99 {p99:.0f} ms, "
                f"admission wait p50 {np.percentile(wait, 50):.0f} / "
                f"p99 {np.percentile(wait, 99):.0f} ms, "
                f"inter-token p50 {np.percentile(itl, 50):.1f} / "
                f"p99 {np.percentile(itl, 99):.1f} ms",
                file=sys.stderr, flush=True,
            )
            if abs(load - 1.0) < 1e-6:
                p99_at_1x = p99
    finally:
        eng.stop()
    if p99_at_1x is None:
        p99_at_1x = p99  # last phase if 1.0× not requested
    # SLA reference point: the <200 ms north-star worst case
    _emit("serve_sla_p99_ttft_ms", round(float(p99_at_1x), 1), "ms",
          round(200.0 / max(float(p99_at_1x), 1e-9), 3))


def ring_mode() -> None:
    """BENCH_MODE=ring: on-chip evidence for the >16-view ring-attention path
    (VERDICT r2 item 9). Three measurements at the 32-view VGGT global-
    attention shape ([1, 32·1029 ≈ 32.9k tokens, 16 heads, 64 dim], bf16),
    all with the REAL Pallas kernel (interpret=False):

    1. direct flash forward — the single-chip baseline + timing,
    2. the ring lse-merge math executed on chip: two half-sequence
       flash_attention_with_lse calls merged with the exact ring combine
       (what every ring stage computes), vs the direct result,
    3. ring_attention_sharded on a 1-device mesh — the real shard_map +
       ppermute + scan program compiled and run on TPU.

    Multi-device numerics are covered on the virtual CPU mesh
    (tests/test_ring_attention.py); this attaches TPU-hardware numbers to
    the same code path. BENCH_RING_VIEWS (default 32) scales the shape."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vggt_qwen3_tpu.ops.flash_attention import (
        NEG_INF,
        flash_attention,
        flash_attention_with_lse,
    )
    from vggt_qwen3_tpu.ops.ring_attention import ring_attention_sharded

    tiny = os.environ.get("BENCH_TINY") == "1"
    views = int(os.environ.get("BENCH_RING_VIEWS", "2" if tiny else "32"))
    tokens_per_view = 36 if tiny else 1029
    T = views * tokens_per_view
    NH, D = (4, 16) if tiny else (16, 64)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, T, NH, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, T, NH, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, T, NH, D)), jnp.bfloat16)
    interp = jax.default_backend() != "tpu"

    # 1. direct flash
    direct = flash_attention(q, k, v, interpret=interp)
    np.asarray(direct)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = flash_attention(q, k, v, interpret=interp)
        np.asarray(out[0, :8])  # tiny fetch forces execution
        times.append(time.time() - t0)
    flash_ms = min(times) * 1000

    # 2. two-chunk lse merge (the per-stage ring combine) on chip
    @jax.jit
    def two_chunk(q, k, v):
        h = k.shape[1] // 2
        o1, l1 = flash_attention_with_lse(q, k[:, :h], v[:, :h], interpret=interp)
        o2, l2 = flash_attention_with_lse(q, k[:, h:], v[:, h:], interpret=interp)
        lses = jnp.stack([l1, l2])
        outs = jnp.stack([o1, o2])
        lse_max = jnp.max(lses, axis=0)
        w = jnp.exp(lses - jnp.where(lse_max <= NEG_INF * 0.5, 0.0, lse_max))
        w = w / jnp.maximum(jnp.sum(w, axis=0), 1e-30)
        w = jnp.moveaxis(w, (1, 2, 3), (1, 3, 2))
        return jnp.sum(outs.astype(jnp.float32) * w[..., None], axis=0).astype(q.dtype)

    merged = two_chunk(q, k, v)
    diff_merge = float(
        jnp.max(jnp.abs(merged.astype(jnp.float32) - direct.astype(jnp.float32)))
    )

    # 3. the real shard_map ring program on a 1-device mesh
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("seq",))
    ring = ring_attention_sharded(q, k, v, mesh, axis_name="seq", interpret=interp)
    diff_ring = float(
        jnp.max(jnp.abs(ring.astype(jnp.float32) - direct.astype(jnp.float32)))
    )

    scale_ref = float(jnp.max(jnp.abs(direct.astype(jnp.float32))))
    print(
        f"ring: {views} views ({T} tokens) flash fwd {flash_ms:.2f} ms; "
        f"2-chunk lse-merge max|Δ| {diff_merge:.2e}, shard_map ring max|Δ| "
        f"{diff_ring:.2e} (output scale {scale_ref:.2f})",
        file=sys.stderr, flush=True,
    )
    ok = diff_merge < 0.05 * scale_ref and diff_ring < 0.05 * scale_ref
    _emit("ring_32view_flash_ms", round(flash_ms, 2), "ms", 1.0 if ok else 0.0)
    if not ok:
        raise SystemExit("ring/flash consistency out of tolerance")


def spec_mode() -> None:
    """BENCH_MODE=spec: prompt-lookup speculative decoding (greedy-exact;
    ``inference/speculative.py``) vs the monolithic scan, on one chip.

    Decode pays one full weight read per token; speculation verifies k+1
    tokens per read, so the speedup equals the mean accepted block length
    (workload-dependent). Two measurements bracket it:

    1. high-acceptance: generation constrained to a repeating action-JSON-like
       token cycle (the ARKit workload's structure — BASELINE.json config 5),
       where the n-gram lookup predicts nearly everything after one period;
    2. zero-acceptance: unconstrained random-weight text (no repetition), the
       machinery's worst-case overhead vs ``generate``.

    Real-workload acceptance lands between; the EM-gate is trivially exact
    (token-identical outputs — tests/test_speculative.py). Knobs:
    BENCH_SPEC_BATCH (default 1 — the latency case), BENCH_SPEC_K (drafts per
    block, default 6), BENCH_SPEC_DECODE (default 64), BENCH_TINY=1.
    """
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507, QWEN3_TINY
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
    from vggt_qwen3_tpu.inference.speculative import generate_speculative
    from vggt_qwen3_tpu.models import qwen3

    tiny = os.environ.get("BENCH_TINY") == "1"
    cfg = QWEN3_TINY if tiny else QWEN3_4B_INSTRUCT_2507
    B = int(os.environ.get("BENCH_SPEC_BATCH", "1"))
    N = int(os.environ.get("BENCH_SPEC_DECODE", "16" if tiny else "64"))
    k = int(os.environ.get("BENCH_SPEC_K", "4" if tiny else "6"))
    prompt_len = 32

    # spec mode keeps REAL random init: the free-text bracket measures
    # prompt-lookup acceptance on the output token distribution, and cheap
    # deterministic weights can emit repetitive tokens that inflate it —
    # the one bench where weight values are NOT throughput-irrelevant.
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype=cfg.dtype)
    wq = _text_quant_mode()
    if wq != "none" and not tiny:
        params = qwen3.quantize_params(params, mode=wq)
    np.asarray(jax.tree.leaves(params)[0][0])

    # a forced repeating "JSON-ish" cycle: 12 distinct token states (about the
    # period of {"action": "...", — the schema's repeated key skeleton)
    cycle = [101, 5, 72, 880, 14, 3301, 9, 42, 7, 615, 23, 11]
    cycle = [t % (cfg.vocab_size - 2) + 1 for t in cycle]  # fit tiny vocabs
    assert len(set(cycle)) == len(cycle)
    table = np.full((len(cycle), cfg.vocab_size), -1, np.int32)
    for s, t in enumerate(cycle):
        table[s, t] = (s + 1) % len(cycle)
    constraint = jnp.asarray(table)

    idsnp = np.random.default_rng(0).integers(1, cfg.vocab_size, (B, prompt_len))
    # the ARKit system hint contains the JSON schema, so the skeleton's first
    # occurrence is IN the prompt — mirror that: lookup warms up in ~2 blocks
    idsnp[:, -len(cycle):] = cycle
    ids = jnp.asarray(idsnp)
    embeds = qwen3.embed_tokens(params, ids)
    mask = jnp.ones((B, prompt_len), jnp.int32)
    gen_cfg = GenerationConfig(max_new_tokens=N, pad_token_id=0, kv_dtype=_kv_dtype(tiny))

    def run(fn, label):
        out = fn()
        np.asarray(out[0])
        times = []
        for _ in range(4):
            t0 = time.time()
            out = fn()
            np.asarray(out[0])
            times.append(time.time() - t0)
        ms = min(times) * 1000
        extra = f", {out[2]} fwd passes" if len(out) > 2 else ""
        print(f"spec [{label}]: {ms:.1f} ms for {N} tok{extra}",
              file=sys.stderr, flush=True)
        return ms, (out[2] if len(out) > 2 else N)

    base_ms, _ = run(
        lambda: generate(params, cfg, gen_cfg, inputs_embeds=embeds,
                         attention_mask=mask, constraint=constraint),
        "generate, constrained")
    spec_ms, iters = run(
        lambda: generate_speculative(params, cfg, gen_cfg, inputs_embeds=embeds,
                                     attention_mask=mask, prompt_ids=ids,
                                     constraint=constraint, draft_k=k, ngram=3),
        f"speculative k={k}, constrained")
    base_free_ms, _ = run(
        lambda: generate(params, cfg, gen_cfg, inputs_embeds=embeds,
                         attention_mask=mask),
        "generate, free")
    spec_free_ms, free_iters = run(
        lambda: generate_speculative(params, cfg, gen_cfg, inputs_embeds=embeds,
                                     attention_mask=mask, prompt_ids=ids,
                                     draft_k=k, ngram=3),
        f"speculative k={k}, free (worst case)")

    speedup = base_ms / spec_ms
    print(
        f"spec: JSON-structured speedup {speedup:.2f}× ({base_ms:.1f} → "
        f"{spec_ms:.1f} ms, {iters} blocks for {N} tok = "
        f"{N/max(iters,1):.1f} tok/weight-read); worst-case overhead "
        f"{spec_free_ms/base_free_ms:.2f}× ({free_iters} blocks)",
        file=sys.stderr, flush=True,
    )

    # Full ARKit-style ACTION QUERY e2e: 448² view → VGGT → splice → prefill
    # → constrained JSON decode — monolithic scan vs one-program speculative.
    if os.environ.get("BENCH_SPEC_E2E", "1") == "1":
        from vggt_qwen3_tpu.config import PerceiverConfig, VGGT_1B, VGGT_TINY, VLMConfig
        from vggt_qwen3_tpu.inference.batching import (
            _vision_splice_generate,
            _vision_splice_speculative,
        )
        from vggt_qwen3_tpu.models import vlm

        vcfg = VLMConfig(
            text=cfg, vision=VGGT_TINY if tiny else VGGT_1B,
            projector=PerceiverConfig() if not tiny else PerceiverConfig(
                latent_dim=64, num_latents=16, num_heads=4, num_layers=2, ffn_dim=128),
            num_vis_tokens=16 if tiny else 128, geom_tokens=0,
            dtype=cfg.dtype,
        )
        px = 56 if tiny else 448
        # init ONLY vision/projector/geom — a full vlm.init_params would
        # transiently allocate a second bf16 copy of the 4B text weights next
        # to the resident quantized ones and OOM the chip
        from vggt_qwen3_tpu.models import geom as geom_mod, perceiver, vggt

        kv_, kp_, kg_ = jax.random.split(jax.random.PRNGKey(1), 3)
        vparams = {
            "text": params,  # reuse the (quantized) text weights
            "projector": jax.jit(
                lambda kk: perceiver.init_params(
                    kk, vcfg.projector, in_dim=vcfg.vision_out_dim,
                    out_dim=cfg.hidden_size, dtype=cfg.dtype)
            )(kp_),
            "geom": geom_mod.init_params(kg_, cfg.hidden_size, dtype=cfg.dtype),
            "vision": jax.jit(
                lambda kk: vggt.init_params(kk, vcfg.vision, dtype=cfg.dtype)
            )(kv_),
        }
        np.asarray(jax.tree.leaves(vparams["vision"])[0][0])
        img_id = cfg.vocab_size - 1
        images = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 1, 3, px, px)), cfg.dtype)
        aidsnp = np.random.default_rng(2).integers(1, cfg.vocab_size, (1, prompt_len))
        aidsnp[:, -len(cycle):] = cycle
        aidsnp[:, 4] = img_id
        aids = jnp.asarray(aidsnp)
        amask = jnp.ones((1, prompt_len), jnp.int32)
        NA = int(os.environ.get("BENCH_SPEC_ACTION_TOKENS", "16" if tiny else "96"))
        agen = GenerationConfig(max_new_tokens=NA, pad_token_id=0, kv_dtype=_kv_dtype(tiny))

        def mono_action():
            toks, _ = _vision_splice_generate(
                vparams, vcfg, agen, img_id, images, aids, amask, constraint)
            np.asarray(toks)
            return (NA,)

        def spec_action():
            packed, it = _vision_splice_speculative(
                vparams, vcfg, agen, img_id, k, 3, images, aids, amask,
                constraint=constraint)
            np.asarray(packed)
            return (packed, 0, it)

        a_ms, _ = run(mono_action, f"action query {NA} tok, monolithic")
        s_ms, a_iters = run(spec_action, f"action query {NA} tok, speculative")
        print(
            f"spec: action-query e2e {a_ms:.1f} → {s_ms:.1f} ms "
            f"({a_ms/s_ms:.2f}×, {int(np.asarray(a_iters))} weight reads for {NA} tok)",
            file=sys.stderr, flush=True,
        )
    _emit("spec_decode_json_speedup", round(speedup, 2), "x", round(speedup, 2))


def _kv_dtype(tiny: bool):
    if tiny:
        return None
    kv = os.environ.get("BENCH_KV", "int8")
    return "bfloat16" if kv == "bf16" else kv


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vggt_qwen3_tpu.config import QWEN3_4B_INSTRUCT_2507, QWEN3_TINY
    from vggt_qwen3_tpu.inference.engine import GenerationConfig, generate
    from vggt_qwen3_tpu.models import qwen3

    if os.environ.get("BENCH_MODE") == "e2e":
        return e2e_mode()
    if os.environ.get("BENCH_MODE") == "qa":
        return qa_mode()
    if os.environ.get("BENCH_MODE") == "train":
        return train_mode()
    if os.environ.get("BENCH_MODE") == "serve":
        return serve_mode()
    if os.environ.get("BENCH_MODE") == "serve_sla":
        return serve_sla_mode()
    if os.environ.get("BENCH_MODE") == "ring":
        return ring_mode()
    if os.environ.get("BENCH_MODE") == "spec":
        return spec_mode()

    tiny = os.environ.get("BENCH_TINY") == "1"
    cfg = QWEN3_TINY if tiny else QWEN3_4B_INSTRUCT_2507
    # 384 started OOMing HBM by ~47 MB (15.79/15.75G) mid-round-2; 368 keeps
    # ~300 MB headroom at the same per-step efficiency.
    B = int(os.environ.get("BENCH_BATCH", "8" if tiny else "368"))
    decode_steps = int(os.environ.get("BENCH_DECODE", "16" if tiny else "128"))
    prompt_len = int(os.environ.get("BENCH_PROMPT", "8" if tiny else "32"))
    target = 5000.0

    print(
        f"bench: model={'tiny' if tiny else 'qwen3-4b'} B={B} prompt={prompt_len} "
        f"decode={decode_steps} backend={jax.default_backend()} devices={len(jax.devices())}",
        file=sys.stderr,
        flush=True,
    )

    t0 = time.time()
    # w8 (default): int8 weights, bf16 activations — near-lossless per the
    # mid-size drift gates, so it is the published headline. BENCH_QUANT=w8a8
    # adds dynamic per-row int8 activations (int8×int8 MXU dots at 2× the
    # bf16 rate → ~1.5× tok/s) but its real-weight EM delta is unverified;
    # =none for bf16.
    bench_quant = _text_quant_mode()

    def real_init():
        p = qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype=cfg.dtype)
        if bench_quant in ("w8", "w8a8") and not tiny:
            p = qwen3.quantize_params(p, mode=bench_quant)
        return p

    if tiny or not _cheap_init_on():
        params = real_init()
    else:
        # same tree structure/dtypes as real_init, filled on device in one
        # cheap compile — tok/s is weight-value-independent (module docstring)
        params = _cheap_params(real_init)
    jax.block_until_ready(params)
    print(f"init params: {time.time()-t0:.1f}s "
          f"({'cheap' if not tiny and _cheap_init_on() else 'real'})",
          file=sys.stderr, flush=True)

    gen_cfg = GenerationConfig(
        max_new_tokens=decode_steps,
        eos_token_id=None,  # fixed-length decode for stable timing
        pad_token_id=0,
        repetition_penalty=1.0,
        no_repeat_ngram=0,
        kv_dtype=_kv_dtype(tiny),
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(1, cfg.vocab_size, (B, prompt_len)))
    embeds = qwen3.embed_tokens(params, ids)
    mask = jnp.ones((B, prompt_len), jnp.int32)

    # compile + warmup (np.asarray forces real execution on the axon backend)
    t0 = time.time()
    tokens, _ = generate(params, cfg, gen_cfg, inputs_embeds=embeds, attention_mask=mask)
    np.asarray(tokens)
    print(f"compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # timed (full generate incl. prefill; decode dominates at these sizes).
    # The FIRST rep's number is emitted immediately as a preliminary metric
    # line — a relay wedge later in the run can then no longer zero the
    # round (the watchdog exits 0 once any metric printed). The refined
    # min-of-reps line follows; both are genuine measurements.
    reps = 3
    times = []
    for i in range(reps):
        t0 = time.time()
        tokens, _ = generate(params, cfg, gen_cfg, inputs_embeds=embeds, attention_mask=mask)
        np.asarray(tokens)
        times.append(time.time() - t0)
        if i == 0:
            tok_s0 = B * decode_steps / times[0]
            print(f"preliminary (rep 1): {tok_s0:.0f} tok/s", file=sys.stderr, flush=True)
            _emit("qwen3_4b_decode_tok_s_chip", round(tok_s0, 1), "tok/s",
                  round(tok_s0 / target, 3))
    dt = min(times)
    tok_s = B * decode_steps / dt
    print(f"{dt*1000:.1f} ms/call → {tok_s:.0f} tok/s", file=sys.stderr, flush=True)
    _emit("qwen3_4b_decode_tok_s_chip", round(tok_s, 1), "tok/s",
          round(tok_s / target, 3))


def _main_with_retry() -> None:
    """The tunneled compile helper occasionally 500s (transient); re-exec a
    fresh process once rather than lose the round's headline metric. The
    backend probe runs FIRST (fast, bounded, subprocess-isolated) so a dead
    relay fails in minutes, not at the driver timeout."""
    _start_watchdog()
    if os.environ.get("BENCH_RETRIED") != "1":
        _probe_backend()
    try:
        main()
    except SystemExit:
        raise
    except Exception:
        if os.environ.get("BENCH_RETRIED") == "1":
            raise
        import traceback

        traceback.print_exc()
        print("bench: transient failure — retrying in a fresh process", file=sys.stderr, flush=True)
        os.environ["BENCH_RETRIED"] = "1"
        time.sleep(15)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_retry()
