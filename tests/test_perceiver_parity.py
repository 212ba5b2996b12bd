"""Perceiver projector + geometry head parity vs a torch oracle.

The oracle reconstructs the reference's documented semantics
(``projector_perceiver.py:30-82``: cross-attn MHA + post-LN residual order +
erf-GELU MLP) using stock torch modules, then our converter maps its state
dict into the JAX layout — exercising the exact path a real reference
checkpoint would take.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

from vggt_qwen3_tpu.config import PerceiverConfig
from vggt_qwen3_tpu.models import geom as geom_head
from vggt_qwen3_tpu.models import perceiver


class TorchPerceiverOracle(nn.Module):
    """Reference-faithful oracle: MHA(latents ⟵ ctx) → +res → LN → MLP → +res → LN."""

    def __init__(self, cfg: PerceiverConfig, in_dim: int, out_dim: int):
        super().__init__()
        D = cfg.latent_dim
        self.latents = nn.Parameter(torch.randn(cfg.num_latents, D) * 0.02)
        self.in_proj = nn.Linear(in_dim, D)
        self.layers = nn.ModuleList()
        for _ in range(cfg.num_layers):
            layer = nn.Module()
            layer.self_attn = nn.MultiheadAttention(D, cfg.num_heads, dropout=0.0, batch_first=True)
            layer.mlp = nn.Sequential(
                nn.Linear(D, cfg.ffn_dim), nn.GELU(), nn.Dropout(0.0), nn.Linear(cfg.ffn_dim, D)
            )
            layer.norm1 = nn.LayerNorm(D)
            layer.norm2 = nn.LayerNorm(D)
            self.layers.append(layer)
        self.out_proj = nn.Linear(D, out_dim)

    def forward(self, tokens):
        ctx = self.in_proj(tokens)
        lat = self.latents.unsqueeze(0).expand(tokens.size(0), -1, -1)
        for layer in self.layers:
            attn, _ = layer.self_attn(lat, ctx, ctx)
            lat = layer.norm1(lat + attn)
            lat = layer.norm2(lat + layer.mlp(lat))
        return self.out_proj(lat)


@pytest.fixture(scope="module")
def cfg():
    return PerceiverConfig(latent_dim=64, num_latents=16, num_heads=4, num_layers=3, ffn_dim=128, dropout=0.0)


def test_perceiver_parity_via_converter(cfg):
    torch.manual_seed(0)
    oracle = TorchPerceiverOracle(cfg, in_dim=48, out_dim=32).eval()
    params = perceiver.convert_torch_state_dict(oracle.state_dict(), cfg, dtype="float32")

    rng = np.random.default_rng(0)
    tokens = rng.normal(size=(2, 21, 48)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(tokens)).numpy()
    ours = perceiver.apply(params, cfg, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=3e-5)


def test_perceiver_variable_context_length(cfg):
    """Resampler must accept any T (VGGT token count varies with views)."""
    torch.manual_seed(1)
    oracle = TorchPerceiverOracle(cfg, in_dim=48, out_dim=32).eval()
    params = perceiver.convert_torch_state_dict(oracle.state_dict(), cfg, dtype="float32")
    for T in (1, 7, 130):
        tokens = np.random.default_rng(T).normal(size=(1, T, 48)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.tensor(tokens)).numpy()
        ours = perceiver.apply(params, cfg, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=3e-5)
        assert ours.shape == (1, cfg.num_latents, 32)


def test_perceiver_dropout_train_path(cfg):
    import jax

    dcfg = PerceiverConfig(latent_dim=64, num_latents=16, num_heads=4, num_layers=3, ffn_dim=128, dropout=0.5)
    params = perceiver.init_params(jax.random.PRNGKey(0), dcfg, in_dim=48, out_dim=32)
    tokens = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 48)), jnp.float32)
    eval_out = perceiver.apply(params, dcfg, tokens)
    train_out = perceiver.apply(params, dcfg, tokens, rng=jax.random.PRNGKey(1))
    train_out2 = perceiver.apply(params, dcfg, tokens, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    np.testing.assert_array_equal(np.asarray(train_out), np.asarray(train_out2))


def test_geom_head_parity_and_semantics():
    torch.manual_seed(2)
    hidden = 40
    oracle = nn.Sequential(nn.Linear(37, hidden), nn.SiLU(), nn.Linear(hidden, hidden)).eval()
    params = geom_head.convert_torch_state_dict(oracle.state_dict(), dtype="float32")

    rng = np.random.default_rng(3)
    B, V = 2, 4
    geom = {
        "R": rng.normal(size=(B, V, 9)).astype(np.float32),
        "t": rng.normal(size=(B, V, 3)).astype(np.float32),
        "K": rng.normal(size=(B, V, 9)).astype(np.float32),
        "depth_hist": rng.normal(size=(B, V, 16)).astype(np.float32),
    }
    feats = np.concatenate([geom["R"], geom["t"], geom["K"], geom["depth_hist"]], -1)
    with torch.no_grad():
        ref = oracle(torch.tensor(feats).mean(1)).numpy()  # [B, hidden]

    out = geom_head.apply(params, {k: jnp.asarray(v) for k, v in geom.items()}, geom_tokens=8)
    assert out.shape == (B, 8, hidden)
    for tok in range(8):  # broadcast to all geom token slots
        np.testing.assert_allclose(np.asarray(out[:, tok]), ref, atol=1e-5, rtol=1e-5)

    # disabled paths return None (vggt_qwen3_vlm.py:165-166)
    assert geom_head.apply(params, None, 8) is None
    assert geom_head.apply(params, {k: jnp.asarray(v) for k, v in geom.items()}, 0) is None

    # missing keys zero-fill
    partial = {"t": jnp.asarray(geom["t"])}
    out2 = geom_head.apply(params, partial, geom_tokens=2)
    assert out2.shape == (B, 2, hidden)
