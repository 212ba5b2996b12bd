"""Block-wise 8-bit Adam/AdamW moments (optax transformation).

The reference's environment ships ``bitsandbytes`` (``env/environment.yml``)
for exactly this: Adam's mu/nu at full precision cost 2× the trainable
parameters — for the stage-1 trainable set (Perceiver projector ~1.2B params
+ geom head + LoRA adapters) that is ~4.9 GB bf16 / 9.8 GB f32, which does
not fit a 16 GB chip next to the model weights. Block-wise int8 moments
(Dettmers et al., "8-bit Optimizers via Block-wise Quantization") store each
moment as int8 with one f32 absmax scale per 256-element block: ~2.5 GB for
the same set, with per-block dynamics isolating outliers.

TPU-first shape: the quantize/dequantize are pure ``jnp`` reshapes +
reductions that XLA fuses into the update arithmetic — no custom kernel
needed (the op is HBM-bound; int8 moments *halve the update's HBM traffic*
too, so the optimizer step gets faster, not just smaller). The update math
runs in f32 on dequantized moments, then re-quantizes; ``nu`` (second
moment, non-negative) uses unsigned-style scaling over [0, absmax] for an
extra bit of precision, as bitsandbytes does.

Large leaves stream through ``lax.map`` in chunks of ``CHUNK_BLOCKS``
blocks: dequantizing a whole 400M-param leaf materializes ~1.5 GB of f32
per intermediate (mu, nu, step), and XLA keeps several alive at once — the
measured stage-1 update peaked 6 GB of f32 temps + 1.6 GB fragmentation and
OOMed a 16 GB chip that otherwise fit (outputs/bench_r4/train.log). Blocks
are independent, so chunking is bit-exact; the op is HBM-bound, so a
sequential stream costs nothing — it is the access pattern the hardware
executes anyway.

Drop-in: ``scale_by_adam8bit`` replaces ``optax.scale_by_adam``;
:func:`adamw8bit` mirrors ``optax.adamw``'s signature subset used here.
Quality: trajectory drift vs exact AdamW is gated in
``tests/test_adam8bit.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256
# Per-lax.map-iteration update width: 65536 blocks = 16.7M elements keeps
# every f32 intermediate ≤ 64 MB while still saturating HBM bandwidth.
CHUNK_BLOCKS = 65536


class Adam8bitState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    mu_q: object  # pytree of {"q": int8 [n_blocks, BLOCK], "s": f32 [n_blocks, 1]}
    nu_q: object


def _pad_len(n: int) -> int:
    return (-n) % BLOCK


def _quantize_signed(x: jnp.ndarray):
    """f32 [...] → int8 blocks with per-block absmax scales (symmetric)."""
    flat = x.reshape(-1)
    pad = _pad_len(flat.shape[0])
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    blocks = flat.reshape(-1, BLOCK)
    s = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True) / 127.0
    safe = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def _dequantize_signed(qs, shape) -> jnp.ndarray:
    flat = (qs["q"].astype(jnp.float32) * qs["s"]).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


def _quantize_unsigned(x: jnp.ndarray):
    """Non-negative f32 → uint8-style blocks (int8 storing 0..255 − 128)."""
    flat = x.reshape(-1)
    pad = _pad_len(flat.shape[0])
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    blocks = flat.reshape(-1, BLOCK)
    s = jnp.max(blocks, axis=-1, keepdims=True) / 255.0
    safe = jnp.maximum(s, 1e-12)
    q = (jnp.clip(jnp.round(blocks / safe), 0, 255) - 128).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def _dequantize_unsigned(qs, shape) -> jnp.ndarray:
    flat = ((qs["q"].astype(jnp.float32) + 128.0) * qs["s"]).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


def scale_by_adam8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    chunk_blocks: int = CHUNK_BLOCKS,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with block-wise int8 moment storage.

    ``chunk_blocks`` bounds the f32 working set: leaves larger than
    ``chunk_blocks×BLOCK`` elements update via ``lax.map`` over chunks
    (bit-exact — blocks are independent)."""

    def init_fn(params):
        def zeros_like_q(p, signed):
            n_blocks = -(-p.size // BLOCK)
            return {
                "q": jnp.full((n_blocks, BLOCK), -128 if not signed else 0, jnp.int8),
                "s": jnp.zeros((n_blocks, 1), jnp.float32),
            }

        mu = jax.tree.map(lambda p: zeros_like_q(p, True), params)
        nu = jax.tree.map(lambda p: zeros_like_q(p, False), params)
        return Adam8bitState(count=jnp.zeros((), jnp.int32), mu_q=mu, nu_q=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def chunk_update(gb, mqq, mqs, nqq, nqs):
            # gb [k, BLOCK] in grad dtype; all intermediates are k×BLOCK f32
            g32 = gb.astype(jnp.float32)
            mu = mqq.astype(jnp.float32) * mqs
            nu = (nqq.astype(jnp.float32) + 128.0) * nqs
            mu = b1 * mu + (1.0 - b1) * g32
            nu = b2 * nu + (1.0 - b2) * g32 * g32
            step = ((mu / bc1) / (jnp.sqrt(nu / bc2) + eps)).astype(gb.dtype)
            ms = jnp.max(jnp.abs(mu), axis=-1, keepdims=True) / 127.0
            mq = jnp.clip(jnp.round(mu / jnp.maximum(ms, 1e-12)), -127, 127)
            ns = jnp.max(nu, axis=-1, keepdims=True) / 255.0
            nq = jnp.clip(jnp.round(nu / jnp.maximum(ns, 1e-12)), 0, 255) - 128
            return (step, mq.astype(jnp.int8), ms.astype(jnp.float32),
                    nq.astype(jnp.int8), ns.astype(jnp.float32))

        def leaf(g, mq, nq):
            n = g.size
            nb = -(-n // BLOCK)
            flat = g.reshape(-1)
            if nb * BLOCK != n:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((nb * BLOCK - n,), flat.dtype)]
                )
            gb = flat.reshape(nb, BLOCK)
            if nb <= chunk_blocks:
                step_b, mq2, ms, nq2, ns = chunk_update(
                    gb, mq["q"], mq["s"], nq["q"], nq["s"]
                )
            else:
                nc = -(-nb // chunk_blocks)
                bpad = nc * chunk_blocks - nb

                def stack(x, fill):
                    # pad blocks dequantize to 0 with zero grads → all-zero
                    # outputs, sliced off below; real big leaves are
                    # chunk-aligned so this is a pure reshape for them
                    if bpad:
                        x = jnp.concatenate(
                            [x, jnp.full((bpad,) + x.shape[1:], fill, x.dtype)]
                        )
                    return x.reshape(nc, chunk_blocks, *x.shape[1:])

                step_b, mq2, ms, nq2, ns = jax.lax.map(
                    lambda t: chunk_update(*t),
                    (stack(gb, 0), stack(mq["q"], 0), stack(mq["s"], 0),
                     stack(nq["q"], -128), stack(nq["s"], 0)),
                )

                def unstack(x):
                    return x.reshape(nc * chunk_blocks, *x.shape[2:])[:nb]

                step_b, mq2, ms, nq2, ns = (
                    unstack(x) for x in (step_b, mq2, ms, nq2, ns)
                )
            step = step_b.reshape(-1)[:n].reshape(g.shape)
            return step, {"q": mq2, "s": ms}, {"q": nq2, "s": ns}

        flat_u, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu_q)
        flat_n = treedef.flatten_up_to(state.nu_q)
        outs = [leaf(g, m, nq) for g, m, nq in zip(flat_u, flat_m, flat_n)]
        steps = treedef.unflatten([o[0] for o in outs])
        mu_q = treedef.unflatten([o[1] for o in outs])
        nu_q = treedef.unflatten([o[2] for o in outs])
        return steps, Adam8bitState(count=count, mu_q=mu_q, nu_q=nu_q)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask: Optional[object] = None,
    chunk_blocks: int = CHUNK_BLOCKS,
) -> optax.GradientTransformation:
    """AdamW with 8-bit moments (optax.adamw signature subset)."""
    chain = [scale_by_adam8bit(b1=b1, b2=b2, eps=eps, chunk_blocks=chunk_blocks)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
