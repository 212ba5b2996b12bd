"""VGGT numerical-fidelity oracle (VERDICT r1 weak item 7).

A from-scratch torch implementation of the public VGGT aggregator semantics
— DINOv2 backbone (cls + 4 registers, LayerScale, exact GELU, pos-embed
bicubic interpolation with DINOv2's scale-factor offset), croco-style 2D
RoPE (axial halves, rotate-half pairing, freq 100, 1-based patch coords,
specials at (0,0)), camera/register tokens with distinct first-frame
embeddings, alternating frame/global blocks with channel-concat outputs —
whose ``state_dict()`` uses the public checkpoint key names
(``patch_embed.patch_embed.proj``, ``patch_embed.blocks.N.*``,
``camera_token``, ``frame_blocks.N.*`` …).

``models/vggt.convert_torch_state_dict`` maps those keys into the JAX
layout; the JAX aggregator must then reproduce the torch forward to fp32
tolerance. This pins every convention the converter + forward depend on
(qkv packing, LN order, LayerScale placement, rope pairing, token order,
first-frame token selection, pos-embed resize kernel) so weights day is a
key-audit, not a numerics hunt.

NOT copied from anywhere: written against the public architecture as
documented (croco RoPE2D formula, DINOv2 interpolate_pos_encoding
semantics); the residual weights-day risk is any silent divergence between
this understanding and ``vggt_1B_commercial.pt`` — see SURVEY.md §7.3 item 1.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import VGGTConfig
from vggt_qwen3_tpu.models import vggt as jvggt

torch.manual_seed(0)

E, HEADS, R, P = 32, 2, 4, 14
CFG = VGGTConfig(
    img_size=28, patch_size=P, embed_dim=E, num_layers=2, num_heads=HEADS,
    num_register_tokens=R, patch_depth=2, dtype="float32",
)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def rope2d_torch(tokens: torch.Tensor, pos: torch.Tensor, base: float = 100.0) -> torch.Tensor:
    """croco RoPE2D: tokens [B, H, T, D], pos [B, T, 2] (y, x)."""

    def rope1d(t, pos1d):
        D = t.shape[-1]
        inv = 1.0 / (base ** (torch.arange(0, D, 2).float() / D))
        freqs = pos1d.float()[..., None] * inv  # [B, T, D/2]
        emb = torch.cat([freqs, freqs], dim=-1)[:, None]  # [B, 1, T, D]
        x1, x2 = t.chunk(2, dim=-1)
        rot = torch.cat([-x2, x1], dim=-1)
        return t * emb.cos() + rot * emb.sin()

    ty, tx = tokens.chunk(2, dim=-1)
    return torch.cat([rope1d(ty, pos[..., 0]), rope1d(tx, pos[..., 1])], dim=-1)


class LayerScale(nn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x, pos=None):
        B, T, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x).reshape(B, T, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, T, hd]
        if pos is not None:
            q = rope2d_torch(q, pos)
            k = rope2d_torch(k, pos)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        out = attn.softmax(dim=-1) @ v
        return self.proj(out.transpose(1, 2).reshape(B, T, C))


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, ls_init):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.ls1 = LayerScale(dim, ls_init)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim, ls_init)

    def forward(self, x, pos=None):
        x = x + self.ls1(self.attn(self.norm1(x), pos))
        return x + self.ls2(self.mlp(self.norm2(x)))


class PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Conv2d(3, E, kernel_size=P, stride=P)


class DinoBackbone(nn.Module):
    """DINOv2-with-registers forward, as vendored by VGGT."""

    def __init__(self):
        super().__init__()
        n = CFG.img_size // P
        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, E) * 0.02)
        self.register_tokens = nn.Parameter(torch.randn(1, R, E) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + n * n, E) * 0.02)
        self.blocks = nn.ModuleList(
            Block(E, HEADS, CFG.mlp_ratio, CFG.patch_ls_init) for _ in range(CFG.patch_depth)
        )
        self.norm = nn.LayerNorm(E, eps=1e-6)

    def interpolate_pos_encoding(self, npatch, h, w):
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed
        class_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:]
        M = int(math.sqrt(N))
        w0, h0 = w // P, h // P
        kwargs = {}
        if CFG.interpolate_offset:
            kwargs["scale_factor"] = ((h0 + CFG.interpolate_offset) / M,
                                      (w0 + CFG.interpolate_offset) / M)
            kwargs["recompute_scale_factor"] = False
        else:
            kwargs["size"] = (h0, w0)
        patch_pos = F.interpolate(
            patch_pos.reshape(1, M, M, E).permute(0, 3, 1, 2),
            mode="bicubic", antialias=False, align_corners=False, **kwargs,
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, -1, E)
        return torch.cat([class_pos, patch_pos], dim=1)

    def forward(self, frames):  # [N, 3, H, W] (already normalized)
        Nf, _, H, W = frames.shape
        x = self.patch_embed.proj(frames).flatten(2).transpose(1, 2)  # [N, Np, E]
        x = torch.cat([self.cls_token.expand(Nf, -1, -1), x], dim=1)
        x = x + self.interpolate_pos_encoding(x.shape[1] - 1, H, W)
        x = torch.cat(
            [x[:, :1], self.register_tokens.expand(Nf, -1, -1), x[:, 1:]], dim=1
        )
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1 + R :]  # x_norm_patchtokens


class Aggregator(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = DinoBackbone()
        self.camera_token = nn.Parameter(torch.randn(1, 2, 1, E) * 0.02)
        self.register_token = nn.Parameter(torch.randn(1, 2, R, E) * 0.02)
        self.frame_blocks = nn.ModuleList(
            Block(E, HEADS, CFG.mlp_ratio, CFG.agg_ls_init) for _ in range(CFG.num_layers)
        )
        self.global_blocks = nn.ModuleList(
            Block(E, HEADS, CFG.mlp_ratio, CFG.agg_ls_init) for _ in range(CFG.num_layers)
        )

    def forward(self, images):  # [B, S, 3, H, W] in [0, 1]
        B, S, C, H, W = images.shape
        mean = torch.tensor(jvggt.IMAGENET_MEAN).view(1, 1, 3, 1, 1)
        std = torch.tensor(jvggt.IMAGENET_STD).view(1, 1, 3, 1, 1)
        frames = ((images - mean) / std).reshape(B * S, C, H, W)
        patches = self.patch_embed(frames)  # [B*S, Np, E]
        Np = patches.shape[1]

        # first frame takes embedding 0, the rest embedding 1
        def expand(tok):  # [1, 2, n, E] → [B*S, n, E]
            n = tok.shape[2]
            first = tok[:, 0].expand(B, -1, -1).reshape(B, 1, n, E)
            if S == 1:
                return first.reshape(B, n, E)
            rest = tok[:, 1].expand(B, S - 1, -1, -1).reshape(B, S - 1, n, E)
            return torch.cat([first, rest], dim=1).reshape(B * S, n, E)

        tokens = torch.cat([expand(self.camera_token), expand(self.register_token), patches], dim=1)
        T = tokens.shape[1]
        psi = 1 + R

        # 1-based patch grid positions; specials at (0, 0)
        hp, wp = H // P, W // P
        ys, xs = torch.meshgrid(torch.arange(hp), torch.arange(wp), indexing="ij")
        ppos = torch.stack([ys.reshape(-1), xs.reshape(-1)], dim=-1) + 1  # [Np, 2]
        pos = torch.cat([torch.zeros(psi, 2, dtype=torch.long), ppos], dim=0)  # [T, 2]
        pos_frame = pos[None].expand(B * S, -1, -1)
        pos_global = pos[None].expand(S, -1, -1).reshape(1, S * T, 2).expand(B, -1, -1)

        outs = []
        x = tokens
        for fblk, gblk in zip(self.frame_blocks, self.global_blocks):
            x = fblk(x, pos_frame)
            frame_out = x
            xg = gblk(x.reshape(B, S * T, E), pos_global)
            x = xg.reshape(B * S, T, E)
            outs.append(torch.cat([frame_out, x], dim=-1).reshape(B, S, T, 2 * E))
        return outs, psi


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    return Aggregator().eval().float()


def _compare(oracle, images_np, cfg, atol):
    with torch.no_grad():
        ref_list, ref_psi = oracle(torch.from_numpy(images_np))
    params = jvggt.convert_torch_state_dict(oracle.state_dict(), cfg, dtype="float32")
    out_list, psi = jvggt.aggregator(
        params, cfg, jnp.asarray(images_np), return_all_layers=True
    )
    assert psi == ref_psi == 5
    assert len(out_list) == len(ref_list) == cfg.num_layers
    for i, (ref, out) in enumerate(zip(ref_list, out_list)):
        r = ref.numpy()
        o = np.asarray(out, np.float32)
        assert o.shape == r.shape, (o.shape, r.shape)
        err = np.abs(o - r).max()
        assert err < atol, f"layer {i}: max abs err {err}"


def test_aggregator_matches_torch_oracle_native_size(oracle):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (2, 3, 3, 28, 28)).astype(np.float32)  # B=2, S=3
    _compare(oracle, images, CFG, atol=2e-4)


def test_aggregator_matches_torch_oracle_interpolated_pos(oracle):
    """Non-native input (42² → 3×3 grid vs native 2×2) exercises the
    scale-factor-mode torch-bicubic pos-embed interpolation."""
    rng = np.random.default_rng(1)
    images = rng.uniform(0, 1, (1, 2, 3, 42, 42)).astype(np.float32)
    _compare(oracle, images, CFG, atol=2e-4)


def test_aggregator_oracle_single_view(oracle):
    """S=1: every token uses the first-frame camera/register embeddings."""
    rng = np.random.default_rng(2)
    images = rng.uniform(0, 1, (1, 1, 3, 28, 28)).astype(np.float32)
    _compare(oracle, images, CFG, atol=2e-4)


def test_rope2d_matches_croco_formula():
    """Direct unit check of the JAX rope against the croco torch formula."""
    from vggt_qwen3_tpu.ops.rope2d import apply_rope2d, rope2d_cos_sin

    rng = np.random.default_rng(3)
    B, T, H, D = 2, 6, 2, 16
    x = rng.normal(size=(B, T, H, D)).astype(np.float32)
    pos = rng.integers(0, 5, (B, T, 2))
    cos, sin = rope2d_cos_sin(jnp.asarray(pos), D, 100.0)
    ours = apply_rope2d(
        jnp.asarray(x), cos, sin, jnp.ones((B, T), bool)
    )
    theirs = rope2d_torch(
        torch.from_numpy(x).permute(0, 2, 1, 3), torch.from_numpy(pos)
    ).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
