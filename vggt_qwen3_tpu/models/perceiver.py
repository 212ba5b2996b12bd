"""Perceiver resampler: variable-length vision tokens → fixed latent set.

Re-implements the reference projector (``src/models/projector_perceiver.py:30-82``)
with its *exact* — and unusual — post-LN residual order (``:44-50``):

    latents = norm1(latents + attn(latents ⟵ context))
    latents = norm2(latents + mlp(latents))

i.e. both LayerNorms wrap the residual sum (post-LN), attention is
cross-attention with query = learned latents, key/value = projected context,
and the MLP is Linear → exact (erf) GELU → Linear. Structure per the reference
config (``configs/perceiver_small.yaml``): 128 latents × dim 4096, 8 heads,
6 layers, FFN 16384.

TPU-first: per-layer weights are stacked and the 6 layers run under one
``lax.scan``; attention uses the shared GQA kernel (here NH == NKV). Dropout
(reference 0.1 at train time) is taken as an explicit rng + rate so the module
stays pure; inference passes ``rng=None`` (eval mode, matching the published
numbers which were produced with dropout disabled).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import PerceiverConfig
from ..ops.attention import mha
from ..ops.norms import layer_norm

Params = Dict[str, jnp.ndarray]


def init_params(
    rng: jax.Array, cfg: PerceiverConfig, in_dim: int, out_dim: int, dtype: str = "float32"
) -> Params:
    """Xavier-uniform linears / zero biases / latents ~ N(0, 0.02²) — mirroring
    the reference init (``projector_perceiver.py:13-17,58-59``)."""
    dt = jnp.dtype(dtype)
    D, F, L, N = cfg.latent_dim, cfg.ffn_dim, cfg.num_layers, cfg.num_latents
    ks = jax.random.split(rng, 10)

    def xavier(key, shape):
        fan_in, fan_out = shape[-2], shape[-1]
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, jnp.float32, -limit, limit).astype(dt)

    return {
        "latents": (jax.random.normal(ks[0], (N, D), jnp.float32) * 0.02).astype(dt),
        "in_proj_w": xavier(ks[1], (in_dim, D)),
        "in_proj_b": jnp.zeros((D,), dt),
        "layers": {
            "wq": xavier(ks[2], (L, D, D)),
            "wk": xavier(ks[3], (L, D, D)),
            "wv": xavier(ks[4], (L, D, D)),
            "wo": xavier(ks[5], (L, D, D)),
            "bq": jnp.zeros((L, D), dt),
            "bk": jnp.zeros((L, D), dt),
            "bv": jnp.zeros((L, D), dt),
            "bo": jnp.zeros((L, D), dt),
            "ln1_w": jnp.ones((L, D), dt),
            "ln1_b": jnp.zeros((L, D), dt),
            "ln2_w": jnp.ones((L, D), dt),
            "ln2_b": jnp.zeros((L, D), dt),
            "mlp_w1": xavier(ks[6], (L, D, F)),
            "mlp_b1": jnp.zeros((L, F), dt),
            "mlp_w2": xavier(ks[7], (L, F, D)),
            "mlp_b2": jnp.zeros((L, D), dt),
        },
        "out_proj_w": xavier(ks[8], (D, out_dim)),
        "out_proj_b": jnp.zeros((out_dim,), dt),
    }


def apply(
    params: Params,
    cfg: PerceiverConfig,
    tokens: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    act_constraint=None,
) -> jnp.ndarray:
    """Resample ``tokens`` [B, T, in_dim] → [B, num_latents, out_dim].

    ``rng`` enables dropout (rate ``cfg.dropout``) for training; ``None`` = eval.
    ``act_constraint`` (optional ``x → x``) pins the batch sharding of the
    internal activations under pjit: the latent stream originates from a
    *replicated* broadcast of ``params["latents"]``, so without a constraint
    the SPMD partitioner keeps the whole perceiver batch-replicated — then the
    backward demands replicated cotangents from the batch-sharded splice and
    falls into involuntary full rematerialization (MULTICHIP_r02 warnings).
    """
    B = tokens.shape[0]
    D, H = cfg.latent_dim, cfg.num_heads
    hd = D // H
    constrain = act_constraint or (lambda x: x)

    context = constrain(tokens @ params["in_proj_w"] + params["in_proj_b"])  # [B, T, D]
    latents = jnp.broadcast_to(params["latents"][None], (B,) + params["latents"].shape)
    latents = constrain(latents.astype(context.dtype))

    train = rng is not None and cfg.dropout > 0.0

    def dropout(x, key):
        if not train:
            return x
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    # 3 dropout sites per layer (attn-out, post-GELU, mlp-out), matching the
    # reference's Dropout placements (projector_perceiver.py:34-49).
    layer_rngs = jax.random.split(
        rng if train else jax.random.PRNGKey(0), (cfg.num_layers, 3)
    )

    def body(lat, xs):
        lp, lrng = xs
        q = (lat @ lp["wq"] + lp["bq"]).reshape(B, -1, H, hd)
        k = (context @ lp["wk"] + lp["bk"]).reshape(B, -1, H, hd)
        v = (context @ lp["wv"] + lp["bv"]).reshape(B, -1, H, hd)
        attn = mha(q, k, v).reshape(B, -1, D)
        attn = attn @ lp["wo"] + lp["bo"]
        lat = layer_norm(lat + dropout(attn, lrng[0]), lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        h = lat @ lp["mlp_w1"] + lp["mlp_b1"]
        h = dropout(jax.nn.gelu(h, approximate=False), lrng[1])  # erf GELU (torch default)
        h = h @ lp["mlp_w2"] + lp["mlp_b2"]
        lat = layer_norm(lat + dropout(h, lrng[2]), lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        return lat, None

    latents, _ = jax.lax.scan(body, latents, (params["layers"], layer_rngs))
    return latents @ params["out_proj_w"] + params["out_proj_b"]


def convert_torch_state_dict(sd, cfg: PerceiverConfig, dtype: str = "float32") -> Params:
    """Convert a reference ``PerceiverProjector.state_dict()`` to our layout.

    torch ``nn.MultiheadAttention`` packs QKV as ``in_proj_weight`` [3D, D];
    we split and transpose into per-projection [D, D] matrices.
    """
    import numpy as np

    def t(x):
        return np.asarray(x.detach().to_dense().float().cpu().numpy() if hasattr(x, "detach") else x)

    dt = jnp.dtype(dtype)
    D, L = cfg.latent_dim, cfg.num_layers
    stacked = {k: [] for k in (
        "wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo",
        "ln1_w", "ln1_b", "ln2_w", "ln2_b", "mlp_w1", "mlp_b1", "mlp_w2", "mlp_b2",
    )}
    for i in range(L):
        p = f"layers.{i}"
        w = t(sd[f"{p}.self_attn.in_proj_weight"])  # [3D, D]
        b = t(sd[f"{p}.self_attn.in_proj_bias"])
        stacked["wq"].append(w[:D].T)
        stacked["wk"].append(w[D : 2 * D].T)
        stacked["wv"].append(w[2 * D :].T)
        stacked["bq"].append(b[:D])
        stacked["bk"].append(b[D : 2 * D])
        stacked["bv"].append(b[2 * D :])
        stacked["wo"].append(t(sd[f"{p}.self_attn.out_proj.weight"]).T)
        stacked["bo"].append(t(sd[f"{p}.self_attn.out_proj.bias"]))
        stacked["ln1_w"].append(t(sd[f"{p}.norm1.weight"]))
        stacked["ln1_b"].append(t(sd[f"{p}.norm1.bias"]))
        stacked["ln2_w"].append(t(sd[f"{p}.norm2.weight"]))
        stacked["ln2_b"].append(t(sd[f"{p}.norm2.bias"]))
        stacked["mlp_w1"].append(t(sd[f"{p}.mlp.0.weight"]).T)
        stacked["mlp_b1"].append(t(sd[f"{p}.mlp.0.bias"]))
        stacked["mlp_w2"].append(t(sd[f"{p}.mlp.3.weight"]).T)
        stacked["mlp_b2"].append(t(sd[f"{p}.mlp.3.bias"]))

    return {
        "latents": jnp.asarray(t(sd["latents"]), dt),
        "in_proj_w": jnp.asarray(t(sd["in_proj.weight"]).T, dt),
        "in_proj_b": jnp.asarray(t(sd["in_proj.bias"]), dt),
        "layers": {k: jnp.asarray(np.stack(v), dt) for k, v in stacked.items()},
        "out_proj_w": jnp.asarray(t(sd["out_proj.weight"]).T, dt),
        "out_proj_b": jnp.asarray(t(sd["out_proj.bias"]), dt),
    }
