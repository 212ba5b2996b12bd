"""Continuous-batching QA serving daemon.

The reference has no serving path at all (SURVEY.md §0: "no serving daemon");
this closes that gap. Two engines:

- ``--engine slots`` (default): **token-level continuous batching** — per-
  sequence KV slots with mid-decode admission (``inference/slots.py``). A
  request arriving while others are decoding is prefilled into a free slot
  and joins within one decode chunk.
- ``--engine batch``: batch-boundary coalescing — a batcher thread groups
  requests (up to ``--max_batch`` / ``--max_wait_ms``) and runs the
  compile-once spliced generate from ``inference/batching.py``. Lower
  overhead for uniform offline workloads (the eval shape).

Requests pad to fixed buckets either way, so the device programs never
retrace at serve time.

    python -m vggt_qwen3_tpu.inference.server --config configs/toy.yaml \
        --tiny --port 8765 [--engine slots|batch] [--kv_dtype int8|bf16]

    curl -s localhost:8765/healthz
    curl -s -X POST localhost:8765/v1/qa -d '{"question": "What color is the room?",
        "images": ["data/toy/images/scene000_v0.jpg"]}'
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List

import numpy as np

from ..data.tokenizer import IMAGE_TOKEN, load_tokenizer
from .batching import encode_prompts, generate_batch, stack_views
from .engine import GenerationConfig
from .postprocess import postprocess_qa_answer
from .qa import build_stage, load_model


class QAService:
    def __init__(self, stage, tokenizer, params, *, max_batch: int, max_wait_ms: float,
                 max_new_tokens: int, prompt_bucket: int,
                 kv_dtype: str = "int8") -> None:
        self.stage = stage
        self.tokenizer = tokenizer
        self.params = params
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.prompt_bucket = prompt_bucket
        self.gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id,
            repetition_penalty=1.1,
            kv_dtype=None if kv_dtype in ("bf16", "bfloat16") else kv_dtype,
        )
        self.queue: "queue.Queue[tuple[Dict, Future]]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0}
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._batcher, daemon=True)
        self.thread.start()

    def submit(self, request: Dict) -> Future:
        fut: Future = Future()
        self.queue.put((request, fut))
        return fut

    def _load_sample(self, request: Dict) -> Dict:
        from PIL import Image

        images = [np.asarray(Image.open(p).convert("RGB")) for p in request["images"]]
        return {"images": images[: self.stage.data.num_views]}

    def _batcher(self) -> None:
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run(batch)

    def _run(self, batch: List) -> None:
        requests = [r for r, _ in batch]
        futures = [f for _, f in batch]
        try:
            samples = [self._load_sample(r) for r in requests]
            questions = [r.get("question", "") for r in requests]
            prompts = [f"{q}\n{IMAGE_TOKEN}\n" for q in questions]
            tokens, lengths = generate_batch(
                self.params, self.stage, self.tokenizer, samples, prompts, self.gen_cfg,
                pad_to_len=self.prompt_bucket, pad_to_batch=self.max_batch,
            )
            self.stats["requests"] += len(requests)
            self.stats["batches"] += 1
            for i, fut in enumerate(futures):
                raw = self.tokenizer.decode(tokens[i][: lengths[i]], skip_special_tokens=True)
                fut.set_result({"prediction": postprocess_qa_answer(raw, questions[i])})
        except Exception as e:  # surface errors to every waiting request
            for fut in futures:
                if not fut.done():
                    fut.set_exception(e)

    def stop(self) -> None:
        self._stop.set()


class SlotQAService:
    """Token-level continuous batching front end (``inference/slots.py``):
    each request is vision-encoded + spliced as a compile-once B=1 program,
    prefilled into a free KV slot, and decoded alongside whatever else is in
    flight — mid-decode admission within one decode chunk."""

    def __init__(self, stage, tokenizer, params, *, num_slots: int,
                 max_new_tokens: int, prompt_bucket: int, decode_chunk: int = 4,
                 kv_dtype: str = "int8", speculative: bool = False,
                 draft_k: int = 6, ngram: int = 3, spec_chunk: int = 4) -> None:
        from functools import partial

        import jax

        from ..models import qwen3, vlm
        from .slots import SlotEngine

        self.stage = stage
        self.tokenizer = tokenizer
        self.params = params
        self.prompt_bucket = prompt_bucket
        self.gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id,
            repetition_penalty=1.1,
            kv_dtype=None if kv_dtype in ("bf16", "bfloat16") else kv_dtype,
        )
        # spliced prompt length = bucket + num_vis − 1 (+ geom prepend)
        vis_span = stage.model.num_vis_tokens + stage.model.geom_tokens
        max_len = prompt_bucket + vis_span - 1 + max_new_tokens
        self.speculative = speculative
        self.engine = SlotEngine(
            params["text"], stage.model.text, self.gen_cfg,
            num_slots=num_slots, max_len=max_len, decode_chunk=decode_chunk,
            speculative=speculative, draft_k=draft_k, ngram=ngram,
            spec_chunk=spec_chunk,
        )
        self.image_token_id = tokenizer.convert_tokens_to_ids(IMAGE_TOKEN)

        @partial(jax.jit, static_argnames=("model_cfg", "image_token_id"))
        def splice_one(params, model_cfg, image_token_id, images, ids, mask):
            vis = vlm.encode_images(params, model_cfg, images)
            embeds = qwen3.embed_tokens(params["text"], ids)
            return vlm.splice_expand(embeds, mask, ids, vis, image_token_id)

        self._splice_one = splice_one
        self.engine.start()

    @property
    def stats(self) -> Dict:
        s = self.engine.stats
        return {
            "requests": s.requests,
            "chunks": s.chunks,
            "admitted_mid_decode": s.admitted_mid_decode,
            "tokens": s.tokens,
        }

    def submit(self, request: Dict) -> Future:
        from PIL import Image

        outer: Future = Future()
        try:
            question = request.get("question", "")
            images = [np.asarray(Image.open(p).convert("RGB")) for p in request["images"]]
            sample = {"images": images[: self.stage.data.num_views]}
            prompt = f"{question}\n{IMAGE_TOKEN}\n"
            ids, mask = encode_prompts(self.tokenizer, [prompt], pad_to_len=self.prompt_bucket)
            views = stack_views([sample], self.stage.data.image_size)
            embeds, mask2 = self._splice_one(
                self.params, self.stage.model, self.image_token_id,
                views, ids, mask,
            )
            req_budget = request.get("max_new_tokens")
            if req_budget is not None:
                req_budget = min(int(req_budget), self.gen_cfg.max_new_tokens)
            # speculative draft memory: the TEXT prompt ids, zeros for pads
            # (the engine's lookup contract treats id 0 as padding)
            lids = (ids * mask).astype(np.int64) if self.speculative else None
            inner = self.engine.submit_embeds(
                np.asarray(embeds), np.asarray(mask2), max_new_tokens=req_budget,
                lookup_ids=lids,
            )
        except Exception as e:
            outer.set_exception(e)
            return outer

        def finish(fut):
            try:
                toks, n = fut.result()
                raw = self.tokenizer.decode(toks[:n], skip_special_tokens=True)
                outer.set_result({"prediction": postprocess_qa_answer(raw, question)})
            except Exception as e:  # surfaced to the HTTP handler
                outer.set_exception(e)

        inner.add_done_callback(finish)
        return outer

    def stop(self) -> None:
        self.engine.stop()


def make_handler(service: QAService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", **service.stats})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/v1/qa":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                request = json.loads(self.rfile.read(length) or b"{}")
                if not request.get("question") or not request.get("images"):
                    self._send(400, {"error": "required fields: question, images"})
                    return
                fut = service.submit(request)
                result = fut.result(timeout=300)
                self._send(200, result)
            except FileNotFoundError as e:
                self._send(400, {"error": f"image not found: {e}"})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


def main() -> None:
    ap = argparse.ArgumentParser(description="QA serving daemon.")
    ap.add_argument("--config", default="configs/stage1_3d.yaml")
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument(
        "--engine", choices=["slots", "batch"], default="slots",
        help="slots = token-level continuous batching (mid-decode admission); "
             "batch = batch-boundary coalescing (lower overhead for uniform "
             "offline workloads)",
    )
    ap.add_argument("--max_batch", type=int, default=8,
                    help="batch engine: coalescing cap; slots engine: num KV slots")
    ap.add_argument("--max_wait_ms", type=float, default=50.0)
    ap.add_argument("--decode_chunk", type=int, default=4,
                    help="slots engine: tokens decoded between admission checks")
    ap.add_argument("--max_new_tokens", type=int, default=32)
    ap.add_argument("--prompt_bucket", type=int, default=64)
    ap.add_argument(
        "--kv_dtype", choices=["int8", "bf16"], default="int8",
        help="KV cache storage: int8 halves decode HBM traffic (near-lossless "
             "greedy per the drift gates); bf16 = exact",
    )
    ap.add_argument(
        "--speculative", action="store_true",
        help="slots engine: speculative continuous batching — each dispatch "
             "verifies a drafted block, 1..k+1 tokens per weight read "
             "(token-exact; wins on structured/repetitive outputs)",
    )
    ap.add_argument("--draft_k", type=int, default=6,
                    help="--speculative: drafted tokens per verify block")
    ap.add_argument("--spec_chunk", type=int, default=4,
                    help="--speculative: verify blocks scanned per dispatch "
                         "(amortizes the per-dispatch host round-trip)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--mock_vision", action="store_true")
    ap.add_argument(
        "--quantize_vision", choices=["none", "w8", "w8a8"], default="none",
        help="frozen-VGGT-tower quantization (w8 = int8 weights, w8a8 = "
             "+int8 activations; vision at batch is compute-bound)",
    )
    ap.add_argument(
        "--quantize", choices=["none", "w8", "w8a8", "w4"], default="w8",
        help="weight quantization for the text model at load: w8 = "
             "near-lossless int8 (default), w8a8 = int8 activations too "
             "(2x MXU throughput mode), w4 = group-int4 storage mode, "
             "none = bf16 (KV cache is int8 regardless; see GenerationConfig)",
    )
    args = ap.parse_args()

    stage = build_stage(args)
    tokenizer = load_tokenizer(None if args.tiny else stage.tokenizer_path or stage.text_model_name)
    params = load_model(stage, args.checkpoint_dir)
    if args.quantize != "none" and not args.tiny:
        from ..models import qwen3

        params = dict(params)
        params["text"] = qwen3.quantize_params(dict(params["text"]), mode=args.quantize)
    if args.quantize_vision != "none" and not args.tiny:
        from ..models import vlm as vlm_mod

        params = vlm_mod.quantize_vision(params, mode=args.quantize_vision)
    if args.engine == "slots":
        service = SlotQAService(
            stage, tokenizer, params,
            num_slots=args.max_batch, max_new_tokens=args.max_new_tokens,
            prompt_bucket=args.prompt_bucket, decode_chunk=args.decode_chunk,
            kv_dtype=args.kv_dtype, speculative=args.speculative,
            draft_k=args.draft_k, spec_chunk=args.spec_chunk,
        )
    else:
        service = QAService(
            stage, tokenizer, params,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            max_new_tokens=args.max_new_tokens, prompt_bucket=args.prompt_bucket,
            kv_dtype=args.kv_dtype,
        )
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(service))
    print(
        f"🛰  serving on :{args.port} (engine {args.engine}, max_batch "
        f"{args.max_batch}, kv {args.kv_dtype})",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.stop()


if __name__ == "__main__":
    main()
