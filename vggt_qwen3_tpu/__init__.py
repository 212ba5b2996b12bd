"""vggt_qwen3_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework.

Rebuilds the capabilities of the VGGT-Qwen3 RoomPlan stack (reference:
``Sycamorers/vggt-qwen3``) as a brand-new TPU-first design:

- ``models/``  : Qwen3 decoder, VGGT-1B aggregator, Perceiver projector, geometry
  head, and the composed VLM — all pure-functional JAX (param pytrees + apply fns).
- ``ops/``     : Pallas TPU kernels (flash attention, decode attention over a paged
  KV cache, fused RMSNorm/SwiGLU) and XLA-fused image preprocessing.
- ``parallel/``: device mesh construction and sharding-spec registry (pjit
  NamedSharding over ``dp``/``fsdp``/``tp`` axes; ICI collectives emitted by XLA).
- ``train/``   : SFT trainer (two-group AdamW + cosine warmup, grad accumulation,
  frozen-vision stop-gradient, sharded optimizer state, Orbax checkpoints).
- ``data/``    : multi-source mixed-ratio dataset, collator, tokenizer adapters.
- ``inference/``: prefill/decode engine with KV cache, QA + ARKit CLIs.
- ``evals/``   : EM / partial-match / 3D-IoU metrics and the baseline eval driver.
"""

__version__ = "0.1.0"
