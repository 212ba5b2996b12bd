"""VGGT aggregator: contract, shapes, first-frame asymmetry, pos-embed
interpolation, and converter key-mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import VGGT_TINY, VGGTConfig
from vggt_qwen3_tpu.models import vggt


@pytest.fixture(scope="module")
def setup():
    cfg = VGGT_TINY
    params = vggt.init_params(jax.random.PRNGKey(0), cfg, dtype="float32")
    return cfg, params


def test_tuple_contract_and_shapes(setup):
    """Reference consumes (tokens_list, patch_start_idx); last element
    [B, S, T, 2E] (vggt_qwen3_vlm.py:144-156)."""
    cfg, params = setup
    B, S = 2, 3
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, S, 3, 56, 56)), jnp.float32)
    tokens_list, psi = vggt.aggregator(params, cfg, imgs)
    assert isinstance(tokens_list, list) and psi == 5
    agg = tokens_list[-1]
    n_patches = (56 // 14) ** 2
    assert agg.shape == (B, S, psi + n_patches, 2 * cfg.embed_dim)
    assert bool(jnp.isfinite(agg).all())


def test_first_frame_tokens_differ(setup):
    """Identical images in slots 0 and 1 must produce different outputs —
    the first frame carries distinct camera/register embeddings."""
    cfg, params = setup
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 1, 3, 56, 56)), jnp.float32)
    imgs = jnp.concatenate([img, img], axis=1)  # same image twice
    (agg,), _ = vggt.aggregator(params, cfg, imgs)
    assert not np.allclose(np.asarray(agg[:, 0]), np.asarray(agg[:, 1]))


def test_pos_embed_interpolation_nonnative_size(setup):
    """448-px inputs into an img_size=518 model must work via pos-embed
    resize (the reference feeds 448² into VGGT(518) — stage configs)."""
    cfg, params = setup
    imgs = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 2, 3, 42, 42)), jnp.float32)
    (agg,), psi = vggt.aggregator(params, cfg, imgs)
    assert agg.shape == (1, 2, psi + 9, 2 * cfg.embed_dim)
    assert bool(jnp.isfinite(agg).all())


def test_return_all_layers(setup):
    cfg, params = setup
    imgs = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 2, 3, 56, 56)), jnp.float32)
    outs, _ = vggt.aggregator(params, cfg, imgs, return_all_layers=True)
    assert len(outs) == cfg.num_layers
    last_only, _ = vggt.aggregator(params, cfg, imgs)
    np.testing.assert_allclose(
        np.asarray(outs[-1]), np.asarray(last_only[-1]), atol=1e-5, rtol=1e-5
    )


def test_converter_key_mapping():
    """Synthetic public-VGGT state dict converts with correct placements."""
    cfg = VGGT_TINY
    E, P, R = cfg.embed_dim, cfg.patch_size, cfg.num_register_tokens
    n = cfg.img_size // P
    rng = np.random.default_rng(4)
    sd = {}
    sd["aggregator.patch_embed.patch_embed.proj.weight"] = rng.normal(size=(E, 3, P, P)).astype(np.float32)
    sd["aggregator.patch_embed.patch_embed.proj.bias"] = rng.normal(size=(E,)).astype(np.float32)
    sd["aggregator.patch_embed.cls_token"] = rng.normal(size=(1, 1, E)).astype(np.float32)
    sd["aggregator.patch_embed.register_tokens"] = rng.normal(size=(1, R, E)).astype(np.float32)
    sd["aggregator.patch_embed.pos_embed"] = rng.normal(size=(1, 1 + n * n, E)).astype(np.float32)
    sd["aggregator.patch_embed.norm.weight"] = np.ones(E, np.float32)
    sd["aggregator.patch_embed.norm.bias"] = np.zeros(E, np.float32)
    sd["aggregator.camera_token"] = rng.normal(size=(1, 2, 1, E)).astype(np.float32)
    sd["aggregator.register_token"] = rng.normal(size=(1, 2, R, E)).astype(np.float32)
    for fam, L in (("patch_embed.blocks", cfg.patch_depth), ("frame_blocks", cfg.num_layers), ("global_blocks", cfg.num_layers)):
        for i in range(L):
            p = f"aggregator.{fam}.{i}"
            sd[f"{p}.norm1.weight"] = np.ones(E, np.float32)
            sd[f"{p}.norm1.bias"] = np.zeros(E, np.float32)
            sd[f"{p}.attn.qkv.weight"] = rng.normal(size=(3 * E, E)).astype(np.float32)
            sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * E, np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.normal(size=(E, E)).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = np.zeros(E, np.float32)
            sd[f"{p}.ls1.gamma"] = np.full(E, 0.01, np.float32)
            sd[f"{p}.norm2.weight"] = np.ones(E, np.float32)
            sd[f"{p}.norm2.bias"] = np.zeros(E, np.float32)
            F = int(E * cfg.mlp_ratio)
            sd[f"{p}.mlp.fc1.weight"] = rng.normal(size=(F, E)).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = np.zeros(F, np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.normal(size=(E, F)).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = np.zeros(E, np.float32)
            sd[f"{p}.ls2.gamma"] = np.full(E, 0.01, np.float32)

    params = vggt.convert_torch_state_dict(sd, cfg, dtype="float32")
    # placement spot-checks
    np.testing.assert_array_equal(
        np.asarray(params["frame_blocks"]["qkv_w"][0]),
        sd["aggregator.frame_blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["patch"]["proj_w"]),
        sd["aggregator.patch_embed.patch_embed.proj.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(params["camera_token"]), sd["aggregator.camera_token"].reshape(2, 1, E)
    )
    # converted params run
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 56, 56)), jnp.float32)
    (agg,), psi = vggt.aggregator(params, cfg, imgs)
    assert agg.shape[-1] == 2 * E and psi == 5
    assert bool(jnp.isfinite(agg).all())
