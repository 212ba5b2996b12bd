"""vggt_qwen3_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework.

Rebuilds the capabilities of the VGGT-Qwen3 RoomPlan stack (reference:
``Sycamorers/vggt-qwen3``) as a brand-new TPU-first design:

- ``models/``  : Qwen3 decoder, VGGT-1B aggregator, Perceiver projector, geometry
  head, and the composed VLM — all pure-functional JAX (param pytrees + apply fns).
- ``ops/``     : Pallas flash-attention kernels (fwd + bwd), quantized-matmul /
  quantized-KV attention paths (XLA-fused where XLA wins — see BASELINE.md for
  the measured kernel-vs-XLA findings), and XLA-fused image preprocessing.
- ``parallel/``: device mesh construction and sharding-spec registry (pjit
  NamedSharding over ``dp``/``fsdp``/``tp``/``pp`` axes; ICI collectives
  emitted by XLA), plus a GPipe pipeline schedule over ``pp`` (shard_map +
  ppermute, ``parallel/pipeline.py``).
- ``train/``   : SFT trainer (two-group AdamW + cosine warmup, grad accumulation,
  frozen-vision stop-gradient, sharded optimizer state, Orbax checkpoints).
- ``data/``    : multi-source mixed-ratio dataset, collator, tokenizer adapters.
- ``inference/``: prefill/decode engine with KV cache, QA + ARKit CLIs.
- ``evals/``   : EM / partial-match / 3D-IoU metrics and the baseline eval driver.
"""

__version__ = "0.4.0"


def _honor_jax_platforms_env() -> None:
    """Make ``JAX_PLATFORMS`` behave as documented on this backend.

    The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so subprocesses
    launched with ``JAX_PLATFORMS=cpu`` (tests, preflight, CI) still grab the
    TPU tunnel. Enforce the requested platform via ``jax.config`` here — this
    runs at package import, before any CLI touches a device. No-op when the
    env var is unset or a backend is already initialized.
    """
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:
        pass  # backend already initialized; the caller owns platform choice


_honor_jax_platforms_env()
del _honor_jax_platforms_env
