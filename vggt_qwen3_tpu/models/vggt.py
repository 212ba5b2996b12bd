"""VGGT-1B aggregator in pure-functional JAX.

The reference consumes VGGT only through
``model.aggregator(images) -> (aggregated_tokens_list, patch_start_idx)`` with
``images`` [B, S, 3, H, W] in [0, 1], taking the last list element whose
feature dim is 2048 = 2 × embed_dim (``src/models/vggt_qwen3_vlm.py:108-109,
144-156``). Internals follow the public VGGT architecture:

1. images are normalized with the ImageNet mean/std **inside** the aggregator
   (this is why the reference transform deliberately skips normalization —
   ``collate_multiview.py:17``),
2. a DINOv2 ViT-L/14 backbone embeds each frame into patch tokens (dim 1024;
   learned pos-embed bicubically resized when H≠518),
3. per frame, a camera token and ``num_register_tokens`` register tokens are
   prepended — with distinct embeddings for the first frame vs. the rest (the
   first frame anchors the world coordinate system) — so
   ``patch_start_idx = 1 + num_register_tokens = 5``,
4. ``num_layers`` pairs of **frame-wise** (within-frame, [B·S, T, C]) and
   **global** (cross-frame, [B, S·T, C]) self-attention blocks alternate; patch
   q/k get 2D axial RoPE (freq 100), special tokens are unrotated,
5. each pair's output is the channel-concat of the frame-block and
   global-block outputs → dim 2048.

TPU-first: frame/global attention are plain batched flash-attention shapes
(no masks, fixed lengths) — the Pallas kernels in ``ops/flash_attention``
slot straight in; blocks are stacked and scanned.

Weight fidelity: the ``vggt_1B_commercial.pt`` checkpoint is not present in
this environment. ``convert_torch_state_dict`` maps the public VGGT/DINOv2
key names, and the whole stack (converter + forward) is validated against a
from-scratch torch oracle implementing the public semantics
(``tests/test_vggt_oracle.py``) — qkv packing, LN order, LayerScale, croco
rotate-half 2D rope with 1-based coords, DINOv2 pos-embed interpolation
(torch-bicubic a=−0.75, scale-factor offset), first-frame token selection.
Re-validate key-by-key when weights arrive (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VGGTConfig
from ..ops import quant
from ..ops.attention import attend
from ..ops.norms import layer_norm
from ..ops.rope2d import apply_rope2d, rope2d_cos_sin

Params = Dict[str, jnp.ndarray]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_block_stack(rng, L, E, mlp_ratio, ls_init, dt):
    F = int(E * mlp_ratio)
    ks = jax.random.split(rng, 6)

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dt)

    return {
        "ln1_w": jnp.ones((L, E), dt),
        "ln1_b": jnp.zeros((L, E), dt),
        "qkv_w": normal(ks[0], (L, E, 3 * E)),
        "qkv_b": jnp.zeros((L, 3 * E), dt),
        "proj_w": normal(ks[1], (L, E, E)),
        "proj_b": jnp.zeros((L, E), dt),
        "ls1": jnp.full((L, E), ls_init, dt),
        "ln2_w": jnp.ones((L, E), dt),
        "ln2_b": jnp.zeros((L, E), dt),
        "mlp_w1": normal(ks[2], (L, E, F)),
        "mlp_b1": jnp.zeros((L, F), dt),
        "mlp_w2": normal(ks[3], (L, F, E)),
        "mlp_b2": jnp.zeros((L, E), dt),
        "ls2": jnp.full((L, E), ls_init, dt),
    }


def init_params(rng: jax.Array, cfg: VGGTConfig, dtype: Optional[str] = None) -> Params:
    dt = jnp.dtype(dtype or cfg.dtype)
    E, R, P = cfg.embed_dim, cfg.num_register_tokens, cfg.patch_size
    n_side = cfg.img_size // P
    ks = jax.random.split(rng, 8)

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dt)

    return {
        "patch": {
            "proj_w": normal(ks[0], (P, P, 3, E)),
            "proj_b": jnp.zeros((E,), dt),
            "cls": normal(ks[1], (E,)),
            "reg": normal(ks[2], (R, E)),
            "pos": normal(ks[3], (1 + n_side * n_side, E)),  # cls + patches
            "blocks": _init_block_stack(ks[4], cfg.patch_depth, E, cfg.mlp_ratio, cfg.patch_ls_init, dt),
            "norm_w": jnp.ones((E,), dt),
            "norm_b": jnp.zeros((E,), dt),
        },
        # index 0 = first frame, 1 = other frames (public VGGT convention)
        "camera_token": normal(ks[5], (2, 1, E)),
        "register_token": normal(ks[6], (2, R, E)),
        "frame_blocks": _init_block_stack(
            jax.random.fold_in(ks[7], 0), cfg.num_layers, E, cfg.mlp_ratio, cfg.agg_ls_init, dt
        ),
        "global_blocks": _init_block_stack(
            jax.random.fold_in(ks[7], 1), cfg.num_layers, E, cfg.mlp_ratio, cfg.agg_ls_init, dt
        ),
    }


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _vit_block(x, bp, num_heads, eps, *, cos=None, sin=None, rot_mask=None, attend_fn=None):
    """Pre-LN ViT block with LayerScale; optional 2D rope on q/k.

    ``attend_fn`` overrides the attention primitive (default: flash/XLA via
    :func:`ops.attention.attend`) — the ring-attention hook for sequence-
    sharded >16-view global attention."""
    B, T, E = x.shape
    hd = E // num_heads
    h = layer_norm(x, bp["ln1_w"], bp["ln1_b"], eps)
    # projections route through quant.linear: dense bf16 or int8 dicts
    # (frozen-tower serving quantization — see vlm.quantize_vision)
    qkv = quant.linear(h, bp["qkv_w"]) + bp["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, num_heads, hd)
    k = k.reshape(B, T, num_heads, hd)
    v = v.reshape(B, T, num_heads, hd)
    if cos is not None:
        q = apply_rope2d(q, cos, sin, rot_mask)
        k = apply_rope2d(k, cos, sin, rot_mask)
    # dense non-causal attention → flash on TPU (frame & global blocks)
    attn = (attend_fn or attend)(q, k, v).reshape(B, T, E)
    attn = quant.linear(attn, bp["proj_w"]) + bp["proj_b"]
    x = x + bp["ls1"] * attn
    h = layer_norm(x, bp["ln2_w"], bp["ln2_b"], eps)
    h = jax.nn.gelu(quant.linear(h, bp["mlp_w1"]) + bp["mlp_b1"], approximate=False)
    h = quant.linear(h, bp["mlp_w2"]) + bp["mlp_b2"]
    return x + bp["ls2"] * h


def _torch_bicubic_weights(n_in: int, n_out: int, scale: Optional[float]) -> "jnp.ndarray":
    """Row-resize weight matrix [n_out, n_in] matching torch
    ``F.interpolate(mode="bicubic", align_corners=False, antialias=False)``:
    cubic-convolution kernel a = −0.75, half-pixel centers, edge-clamped
    taps. ``scale`` given → scale_factor-mode source mapping (DINOv2 passes
    ``(w0 + interpolate_offset) / M``); None → size mode."""
    import numpy as np

    a = -0.75

    def kernel(t):
        t = abs(t)
        if t <= 1.0:
            return (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0
        if t < 2.0:
            return a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a
        return 0.0

    W = np.zeros((n_out, n_in), np.float64)
    inv_scale = (n_in / n_out) if scale is None else (1.0 / scale)
    for i in range(n_out):
        src = (i + 0.5) * inv_scale - 0.5
        base = int(np.floor(src))
        t = src - base
        for tap, off in enumerate((-1, 0, 1, 2)):
            w = kernel(off - t)
            j = min(max(base + off, 0), n_in - 1)
            W[i, j] += w
    return jnp.asarray(W, jnp.float32)


def _torch_bicubic_resize(
    grid: jnp.ndarray, hw: Tuple[int, int], offset: float
) -> jnp.ndarray:
    """[M1, M2, D] → [h, w, D] with torch-bicubic parity (two MXU matmuls —
    jax.image.resize uses the Keys a=−0.5 kernel + antialias and does NOT
    match torch, so the resize is explicit weight matrices instead)."""
    M1, M2, D = grid.shape
    h, w = hw
    sy = (h + offset) / M1 if offset else None
    sx = (w + offset) / M2 if offset else None
    Wy = _torch_bicubic_weights(M1, h, sy)
    Wx = _torch_bicubic_weights(M2, w, sx)
    g = grid.astype(jnp.float32)
    g = jnp.einsum("hm,mnd->hnd", Wy, g)
    g = jnp.einsum("wn,hnd->hwd", Wx, g)
    return g


def _patch_backbone(params: Params, cfg: VGGTConfig, frames: jnp.ndarray) -> jnp.ndarray:
    """DINOv2-style backbone: frames [N, 3, H, W] → patch tokens [N, P², E]."""
    pp = params["patch"]
    N, _, H, W = frames.shape
    P = cfg.patch_size
    hp, wp = H // P, W // P

    # conv patch-embed as reshape + matmul (XLA maps this onto the MXU)
    x = frames.reshape(N, 3, hp, P, wp, P)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # [N, hp, wp, P, P, 3]
    x = x.reshape(N, hp * wp, P * P * 3)
    w = pp["proj_w"].transpose(0, 1, 2, 3).reshape(P * P * 3, -1)  # [(P,P,3) flat, E]
    x = x @ w + pp["proj_b"]  # [N, hp*wp, E]

    # pos embed (cls + grid), bicubic-resized to the actual grid
    pos = pp["pos"]
    n_side = cfg.img_size // P
    cls_pos, grid_pos = pos[:1], pos[1:]
    if (hp, wp) != (n_side, n_side):
        grid = grid_pos.reshape(n_side, n_side, -1)
        grid = _torch_bicubic_resize(grid, (hp, wp), cfg.interpolate_offset)
        grid_pos = grid.reshape(hp * wp, -1).astype(pos.dtype)
    x = x + grid_pos[None]

    cls = (pp["cls"] + cls_pos[0])[None, None].astype(x.dtype)
    cls = jnp.broadcast_to(cls, (N, 1, x.shape[-1]))
    reg = jnp.broadcast_to(pp["reg"][None], (N,) + pp["reg"].shape).astype(x.dtype)
    x = jnp.concatenate([cls, reg, x], axis=1)

    eps = cfg.layer_norm_eps

    @jax.checkpoint
    def body(h, bp):
        return _vit_block(h, bp, cfg.num_heads, eps), None

    x, _ = jax.lax.scan(body, x, pp["blocks"])
    x = layer_norm(x, pp["norm_w"], pp["norm_b"], eps)
    return x[:, 1 + cfg.num_register_tokens :]  # x_norm_patchtokens


# ---------------------------------------------------------------------------
# Aggregator
# ---------------------------------------------------------------------------


def aggregator(
    params: Params,
    cfg: VGGTConfig,
    images: jnp.ndarray,
    *,
    return_all_layers: bool = False,
    ring_mesh=None,
    ring_axis: Optional[str] = None,
) -> Tuple[List[jnp.ndarray], int]:
    """VGGT aggregator forward.

    Args:
        images: [B, S, 3, H, W], values in [0, 1].
        return_all_layers: emit every pair's concat output (the reference's
            downstream heads want intermediate layers; the VLM uses only the
            last — ``vggt_qwen3_vlm.py:148``). Default keeps just the last to
            bound memory; the returned list's ``[-1]`` contract is identical.
        ring_mesh/ring_axis: when set, global (cross-view) attention runs as
            ring attention with the S·T sequence sharded over that mesh axis
            (ops/ring_attention.py; SURVEY §5.7 >16-view scale-out). S·T must
            divide the axis size.
    Returns:
        (aggregated_tokens_list — each [B, S, T, 2·E] with T = patch_start_idx
         + num_patches — , patch_start_idx)
    """
    B, S, C, H, W = images.shape
    dt = params["camera_token"].dtype
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 1, 3, 1, 1)
    frames = ((images.astype(jnp.float32) - mean) / std).astype(dt)
    frames = frames.reshape(B * S, C, H, W)

    patches = _patch_backbone(params, cfg, frames)  # [B*S, Np, E]
    Np = patches.shape[1]
    E = cfg.embed_dim
    R = cfg.num_register_tokens
    psi = cfg.patch_start_idx

    # camera/register tokens: distinct embeddings for frame 0 vs the rest
    # (embedding index 0 = first frame, 1 = other frames — init_params and
    # the checkpoint converter store them in that order)
    token_idx = (jnp.arange(S) != 0).astype(jnp.int32)  # frame 0 → 0, rest → 1
    cam = params["camera_token"][token_idx]  # [S, 1, E]
    reg = params["register_token"][token_idx]  # [S, R, E]
    cam = jnp.broadcast_to(cam[None], (B, S, 1, E)).reshape(B * S, 1, E)
    reg = jnp.broadcast_to(reg[None], (B, S, R, E)).reshape(B * S, R, E)
    tokens = jnp.concatenate([cam.astype(dt), reg.astype(dt), patches], axis=1)
    T = psi + Np

    # 2D rope tables: patch tokens carry 1-BASED grid coords (the public
    # aggregator shifts the grid by +1 and gives specials position (0,0) —
    # the shift changes special↔patch relative angles, so it must match);
    # specials pass through unrotated (≡ rotation by angle 0)
    hp = H // cfg.patch_size
    wp = W // cfg.patch_size
    ys = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).reshape(-1) + 1
    xs = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).reshape(-1) + 1
    coords = jnp.stack([ys, xs], axis=-1)  # [Np, 2]
    coords = jnp.concatenate([jnp.zeros((psi, 2), jnp.int32), coords], axis=0)  # [T, 2]
    head_dim = E // cfg.num_heads
    cos_f, sin_f = rope2d_cos_sin(coords[None], head_dim, cfg.rope_freq)  # [1, T, hd/2]

    cos_frame = jnp.broadcast_to(cos_f, (B * S,) + cos_f.shape[1:])
    sin_frame = jnp.broadcast_to(sin_f, (B * S,) + sin_f.shape[1:])
    # specials sit at coords (0, 0) → angle 0 → the rotation is exactly the
    # identity on them, so no rot_mask is needed (apply_rope2d docstring)
    mask_frame = None

    cos_g = jnp.tile(cos_f, (1, S, 1))
    sin_g = jnp.tile(sin_f, (1, S, 1))
    cos_global = jnp.broadcast_to(cos_g, (B,) + cos_g.shape[1:])
    sin_global = jnp.broadcast_to(sin_g, (B,) + sin_g.shape[1:])
    mask_global = None

    eps = cfg.layer_norm_eps

    global_attend = None
    if ring_mesh is not None and ring_axis is not None:
        from ..ops.ring_attention import ring_attention_sharded

        def global_attend(q, k, v):
            return ring_attention_sharded(q, k, v, ring_mesh, axis_name=ring_axis)

    @jax.checkpoint
    def pair(x, bps):
        fbp, gbp = bps
        x = _vit_block(x, fbp, cfg.num_heads, eps, cos=cos_frame, sin=sin_frame, rot_mask=mask_frame)
        frame_out = x
        xg = x.reshape(B, S * T, E)
        xg = _vit_block(xg, gbp, cfg.num_heads, eps, cos=cos_global, sin=sin_global,
                        rot_mask=mask_global, attend_fn=global_attend)
        x = xg.reshape(B * S, T, E)
        concat = jnp.concatenate([frame_out, x], axis=-1)  # [B*S, T, 2E]
        return x, concat

    if return_all_layers:
        x = tokens
        _, concats = jax.lax.scan(
            lambda h, bps: pair(h, bps), x, (params["frame_blocks"], params["global_blocks"])
        )
        outs = [concats[i].reshape(B, S, T, 2 * E) for i in range(cfg.num_layers)]
        return outs, psi

    def body(h, bps):
        h, concat = pair(h, bps)
        return h, None

    # run all pairs, recompute the last pair's concat from the final carries:
    # cheaper: scan all but the last pair, then run the last pair eagerly.
    nb = cfg.num_layers
    head = jax.tree.map(lambda a: a[: nb - 1], params["frame_blocks"])
    headg = jax.tree.map(lambda a: a[: nb - 1], params["global_blocks"])
    x, _ = jax.lax.scan(body, tokens, (head, headg))
    last_f = jax.tree.map(lambda a: a[nb - 1], params["frame_blocks"])
    last_g = jax.tree.map(lambda a: a[nb - 1], params["global_blocks"])
    _, concat = pair(x, (last_f, last_g))
    return [concat.reshape(B, S, T, 2 * E)], psi


# ---------------------------------------------------------------------------
# Torch-checkpoint converter (public VGGT/DINOv2 key map)
# ---------------------------------------------------------------------------


def _cvt_block_stack(get, prefix: str, L: int, dt) -> Dict[str, jnp.ndarray]:
    import numpy as np

    keys = {
        "ln1_w": "norm1.weight", "ln1_b": "norm1.bias",
        "qkv_w": "attn.qkv.weight", "qkv_b": "attn.qkv.bias",
        "proj_w": "attn.proj.weight", "proj_b": "attn.proj.bias",
        "ls1": "ls1.gamma",
        "ln2_w": "norm2.weight", "ln2_b": "norm2.bias",
        "mlp_w1": "mlp.fc1.weight", "mlp_b1": "mlp.fc1.bias",
        "mlp_w2": "mlp.fc2.weight", "mlp_b2": "mlp.fc2.bias",
        "ls2": "ls2.gamma",
    }
    transpose = {"qkv_w", "proj_w", "mlp_w1", "mlp_w2"}  # torch [out,in] → ours [in,out]
    out = {}
    for ours, theirs in keys.items():
        vals = []
        for i in range(L):
            v = get(f"{prefix}.{i}.{theirs}")
            if ours in transpose:
                v = v.T
            vals.append(v)
        out[ours] = jnp.asarray(np.stack(vals), dt)
    return out


def convert_torch_state_dict(sd, cfg: VGGTConfig, dtype: Optional[str] = None) -> Params:
    """Map public-VGGT checkpoint keys (``aggregator.*``) into our layout.

    Key families (to be re-validated against ``vggt_1B_commercial.pt``):
    ``aggregator.patch_embed.{patch_embed.proj,cls_token,register_tokens,
    pos_embed,blocks.N.*,norm}`` (DINOv2) and
    ``aggregator.{camera_token,register_token,frame_blocks.N.*,
    global_blocks.N.*}``.
    """
    import numpy as np

    dt = jnp.dtype(dtype or cfg.dtype)

    def to_np(x):
        return np.asarray(x.detach().float().cpu().numpy() if hasattr(x, "detach") else x)

    def get(name: str) -> np.ndarray:
        for cand in (name, f"aggregator.{name}", f"model.{name}"):
            if cand in sd:
                return to_np(sd[cand])
        raise KeyError(name)

    E = cfg.embed_dim
    proj_w = get("patch_embed.patch_embed.proj.weight")  # [E, 3, P, P]
    params: Params = {
        "patch": {
            "proj_w": jnp.asarray(proj_w.transpose(2, 3, 1, 0), dt),  # [P, P, 3, E]
            "proj_b": jnp.asarray(get("patch_embed.patch_embed.proj.bias"), dt),
            "cls": jnp.asarray(get("patch_embed.cls_token").reshape(E), dt),
            "reg": jnp.asarray(
                get("patch_embed.register_tokens").reshape(cfg.num_register_tokens, E), dt
            ),
            "pos": jnp.asarray(get("patch_embed.pos_embed").reshape(-1, E), dt),
            "blocks": _cvt_block_stack(get, "patch_embed.blocks", cfg.patch_depth, dt),
            "norm_w": jnp.asarray(get("patch_embed.norm.weight"), dt),
            "norm_b": jnp.asarray(get("patch_embed.norm.bias"), dt),
        },
        "camera_token": jnp.asarray(get("camera_token").reshape(2, 1, E), dt),
        "register_token": jnp.asarray(
            get("register_token").reshape(2, cfg.num_register_tokens, E), dt
        ),
        "frame_blocks": _cvt_block_stack(get, "frame_blocks", cfg.num_layers, dt),
        "global_blocks": _cvt_block_stack(get, "global_blocks", cfg.num_layers, dt),
    }
    return params
