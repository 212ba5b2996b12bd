"""Multi-view collator: samples → model-ready batches.

Reproduces the reference collator (``src/dataio/collate_multiview.py:22-102``):

- per view: bicubic shorter-side resize → center crop → [0,1] CHW (our XLA
  preprocessing graph instead of torchvision),
- prompt ``f"{question}\\n<image>\\n"`` with the answer appended; non-string
  answers JSON-serialized (``:43-49``),
- labels: −100 on prompt and padding, answer ids supervised; sequences
  truncated to ``max_length`` **before** padding (``:60-67``),
- right-padding to at least ``num_vis_tokens + geom_tokens + 64`` so the
  training overwrite-splice has room (``:30,69-70``),
- geom dict stacked with zero-fill for missing entries plus a presence mask
  (``:81-95``).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from ..ops.preprocess import preprocess_views
from .tokenizer import IMAGE_TOKEN

# single source of truth for the geom feature layout (R:9, t:3, K:9,
# depth_hist:16 = 37 dims) — keep the collator's zero templates in sync with
# what models/geom.pack_features consumes
from ..models.geom import FEATURE_SPLITS

GEOM_KEYS = tuple(FEATURE_SPLITS)


class MultiViewCollator:
    def __init__(
        self,
        image_size: int,
        tokenizer,
        max_length: int,
        num_vis_tokens: int = 128,
        geom_tokens: int = 8,
        view_dropout: float = 0.0,
        seed: int = 0,
        pad_to: Optional[int] = None,
        emit_geom: Optional[bool] = None,
    ) -> None:
        self.image_size = image_size
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.min_text_length = num_vis_tokens + geom_tokens + 64
        # fixed padded length (multi-host: every host must produce the same
        # global-batch shape; also avoids per-batch recompiles on TPU)
        self.pad_to = pad_to
        # view dropout (reference declares data.view_dropout but never applies
        # it — SURVEY.md §5.6): each non-first view is replaced by a kept view
        # with prob p at collate time, keeping batch shapes static.
        self.view_dropout = view_dropout
        self.seed = seed
        # None → emit a geom batch iff any local row carries geom (legacy).
        # True/False → FORCED, decided from global config, so every host and
        # every batch runs the same compiled step (a per-shard decision lets
        # hosts pick different XLA programs for one global step and deadlock
        # in the collectives).
        self.emit_geom = emit_geom

    def _encode(self, text: str) -> List[int]:
        enc = self.tokenizer(text, add_special_tokens=False)
        return list(enc["input_ids"])

    def __call__(
        self,
        batch: List[Dict],
        batch_index: int = 0,
        row_indices: Optional[List[int]] = None,
    ) -> Dict[str, Optional[np.ndarray]]:
        # view-dropout randomness is a pure function of (seed, batch_index,
        # absolute row) so (a) a resumed run reproduces the exact batch stream
        # without replaying collation (VERDICT r1 item 10) and (b) a host
        # collating only its shard of a global batch (``row_indices``) draws
        # exactly what the full-batch collation would.
        import random as _random

        if row_indices is None:
            row_indices = list(range(len(batch)))
        pixel, ids_list, labels_list, geoms = [], [], [], []
        for sample, row in zip(batch, row_indices):
            rng = _random.Random(((self.seed << 24) ^ batch_index) * 1_000_003 + row)
            images = list(sample["images"])
            if self.view_dropout > 0.0 and len(images) > 1:
                kept = [images[0]] + [
                    im for im in images[1:] if rng.random() >= self.view_dropout
                ]
                # duplicate kept views to preserve the static view count
                while len(kept) < len(images):
                    kept.append(kept[rng.randrange(len(kept))])
                images = kept
            views = preprocess_views(images, self.image_size)
            pixel.append(np.asarray(views))
            answer_obj = sample["answer"]
            answer = answer_obj if isinstance(answer_obj, str) else json.dumps(
                answer_obj, ensure_ascii=False
            )
            prompt = f"{sample['question']}\n{IMAGE_TOKEN}\n"
            prompt_ids = self._encode(prompt)
            answer_ids = self._encode(answer)
            ids = (prompt_ids + answer_ids)[: self.max_length]
            labels = ([-100] * len(prompt_ids) + answer_ids)[: self.max_length]
            ids_list.append(ids)
            labels_list.append(labels)
            geoms.append(sample.get("geom_token"))

        pad_id = self.tokenizer.pad_token_id
        if self.pad_to is not None:
            max_len = self.pad_to
        else:
            max_len = max(max(len(i) for i in ids_list), self.min_text_length)
        input_ids = np.full((len(batch), max_len), pad_id, np.int32)
        labels = np.full((len(batch), max_len), -100, np.int32)
        for b, (ids, labs) in enumerate(zip(ids_list, labels_list)):
            input_ids[b, : len(ids)] = ids
            labels[b, : len(labs)] = labs
        attention_mask = (input_ids != pad_id).astype(np.int32)

        geom_batch = None
        emit_geom = self.emit_geom
        if emit_geom is None:
            emit_geom = any(g is not None for g in geoms)
        if emit_geom:
            # SHAPE-STABLE geom batch: always [B, V, k] per FEATURE_SPLITS key
            # (V = the batch's padded view count), regardless of which rows
            # carry geom or how each source stores it — a template-shaped
            # batch would make the array shapes depend on the local rows,
            # breaking the one-XLA-program / multi-host invariant.
            V = pixel[0].shape[0] if pixel else 1
            geom_batch = {}
            for key, width in FEATURE_SPLITS.items():
                rows = []
                for g in geoms:
                    if g is None or key not in g:
                        rows.append(np.zeros((V, width), np.float32))
                        continue
                    a = np.asarray(g[key], np.float32)
                    if a.shape[-1] != width:
                        raise ValueError(
                            f"geom_token[{key!r}] has width {a.shape[-1]}, "
                            f"expected {width} (FEATURE_SPLITS); offending "
                            f"record index {len(rows)} in this batch"
                        )
                    if a.ndim == 1:  # flat [k] → broadcast over views
                        a = np.broadcast_to(a, (V, width)).copy()
                    else:            # per-view [V', k] → pad/truncate to V
                        a = a[:V]
                        if a.shape[0] and a.shape[0] < V:
                            a = np.concatenate(
                                [a, np.repeat(a[-1:], V - a.shape[0], axis=0)]
                            )
                        elif not a.shape[0]:
                            a = np.zeros((V, width), np.float32)
                    rows.append(a)
                geom_batch[key] = np.stack(rows, axis=0)
            geom_batch["mask"] = np.asarray([g is not None for g in geoms], bool)

        return {
            "pixel_values": np.stack(pixel, axis=0),  # [B, V, 3, S, S]
            "geom_token": geom_batch,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels,
        }


def prefetch_iter(it, depth: int):
    """Run ``it`` on a background thread, keeping up to ``depth`` items ready
    in a bounded queue — host decode/collation overlaps device step time
    (VERDICT r4 item 7). Order-preserving and semantics-free: the collator's
    randomness keys off absolute (batch, row) indices, so a prefetched stream
    is bit-identical to the synchronous one. Exceptions re-raise at the
    consumer; the producer thread is a daemon (dies with the process) and
    also exits once the consumer drops the iterator."""
    import atexit as _atexit
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    _FAIL = object()
    stop = _threading.Event()

    def produce():
        try:
            src = iter(it)
            while not stop.is_set():
                item = next(src, StopIteration())
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except _queue.Full:
                        continue
                if isinstance(item, StopIteration):
                    return
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            q.put((_FAIL, e))

    thread = _threading.Thread(target=produce, daemon=True)
    thread.start()

    def shutdown():
        # a daemon thread mid-collation (numpy/JAX C++) at interpreter
        # teardown SIGABRTs the process — stop and join it first
        stop.set()
        while True:  # drain so a blocked put() can observe the stop flag
            try:
                q.get_nowait()
            except _queue.Empty:
                break
        thread.join(timeout=30)

    _atexit.register(shutdown)

    def consume():
        while True:
            item = q.get()
            if isinstance(item, StopIteration):
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _FAIL:
                raise item[1]
            yield item

    return consume()


def data_loader(
    dataset,
    collator,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 42,
    start_batches: int = 0,
    shard_rank: int = 0,
    shard_count: int = 1,
    prefetch_batches: Optional[int] = None,
):
    """Minimal epoch-cycling loader (the reference uses torch DataLoader with
    shuffle — train_sft.py:58-63); yields collated numpy batches forever.

    Batches draw from a continuous shuffled index stream across epoch
    boundaries, so ``batch_size > len(dataset)`` still yields full batches.

    ``start_batches`` fast-forwards the stream: batch ``start_batches`` of a
    resumed run is bit-identical to that batch of an uninterrupted run — the
    index stream advances in pure python (no dataset/collation cost) and the
    collator's randomness keys off the absolute (batch, row) index.

    ``shard_rank``/``shard_count`` (multi-host): every host walks the SAME
    global index stream, but host r materializes only its contiguous block of
    rows ``[r·B/count, (r+1)·B/count)`` of each global batch (``batch_size``
    stays the GLOBAL batch size; the block layout matches how
    ``jax.make_array_from_process_local_data`` places process-local rows).
    Skipped rows advance the dataset's stateful sampling rng via
    ``consume_rng``, so the global sample sequence is identical to the
    single-host run.

    ``prefetch_batches``: decode/collate this many batches ahead on a
    background thread (default 2; env ``VGGT_PREFETCH_BATCHES`` overrides,
    0 = synchronous). Bit-identical stream either way — see
    :func:`prefetch_iter`.
    """
    import os as _os
    import random as _random

    if batch_size % shard_count != 0:
        raise ValueError(f"global batch {batch_size} not divisible by {shard_count} hosts")
    n = len(dataset)
    if n == 0:
        raise ValueError("empty dataset")

    def gen():
        rng = _random.Random(seed)

        def index_stream():
            while True:
                order = list(range(n))
                if shuffle:
                    rng.shuffle(order)
                yield from order

        stream = index_stream()
        consume = getattr(dataset, "consume_rng", None)
        for _ in range(start_batches * batch_size):
            idx = next(stream)
            if consume is not None:  # stateful per-access draws (MultiSourceDataset)
                consume(idx)
        batch_index = start_batches
        while True:
            idxs = [next(stream) for _ in range(batch_size)]
            if shard_count == 1:
                yield collator([dataset[i] for i in idxs], batch_index=batch_index)
            else:
                local = batch_size // shard_count
                lo, hi = shard_rank * local, (shard_rank + 1) * local
                samples, rows = [], []
                for row, idx in enumerate(idxs):
                    if lo <= row < hi:
                        samples.append(dataset[idx])
                        rows.append(row)
                    elif consume is not None:
                        consume(idx)
                yield collator(samples, batch_index=batch_index, row_indices=rows)
            batch_index += 1

    depth = (int(_os.environ.get("VGGT_PREFETCH_BATCHES", "2"))
             if prefetch_batches is None else prefetch_batches)
    return prefetch_iter(gen(), depth) if depth > 0 else gen()
