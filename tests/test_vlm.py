"""End-to-end VLM composition parity: mock vision + Perceiver + Qwen3.

Oracle assembles the same pipeline from torch parts (HF Qwen3 + the torch
Perceiver oracle) with the reference's overwrite/expand splice semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import Qwen3Config as HFQwen3Config
from transformers.models.qwen3.modeling_qwen3 import Qwen3ForCausalLM

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import PerceiverConfig, VLMConfig
from vggt_qwen3_tpu.models import perceiver, qwen3, vlm
from vggt_qwen3_tpu.models.convert_qwen3 import config_from_hf, convert_state_dict

from test_perceiver_parity import TorchPerceiverOracle

IMG_ID = 500  # pretend <image> token id inside the tiny vocab


@pytest.fixture(scope="module")
def setup():
    hf_cfg = HFQwen3Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, rope_theta=10_000.0, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    text_cfg = config_from_hf(hf_cfg)

    pcfg = PerceiverConfig(latent_dim=64, num_latents=8, num_heads=4, num_layers=2, ffn_dim=96, dropout=0.0)
    cfg = VLMConfig(
        text=text_cfg, vision=None, projector=pcfg,
        num_vis_tokens=8, geom_tokens=0, vision_backbone="mock",
        mock_vision_dim=32, dtype="float32",
    )
    torch.manual_seed(1)
    proj_oracle = TorchPerceiverOracle(pcfg, in_dim=32, out_dim=64).eval()

    params = {
        "text": convert_state_dict(hf_model.state_dict(), text_cfg, dtype="float32"),
        "projector": perceiver.convert_torch_state_dict(proj_oracle.state_dict(), pcfg, dtype="float32"),
        "geom": __import__("vggt_qwen3_tpu.models.geom", fromlist=["init_params"]).init_params(
            jax.random.PRNGKey(0), 64, dtype="float32"
        ),
    }
    return hf_model, proj_oracle, cfg, params


def _torch_vis(proj_oracle, B, num_vis, mock_dim):
    with torch.no_grad():
        return proj_oracle(torch.zeros(B, num_vis, mock_dim))


def test_train_loss_parity_overwrite_splice(setup):
    hf_model, proj_oracle, cfg, params = setup
    rng = np.random.default_rng(0)
    B, T = 2, 24
    ids = rng.integers(1, 400, size=(B, T))
    ids[0, 5] = IMG_ID
    ids[1, 2] = IMG_ID
    mask = np.ones((B, T), np.int64)
    labels = ids.copy()
    labels[:, :8] = -100  # prompt masked

    vis = _torch_vis(proj_oracle, B, cfg.num_vis_tokens, cfg.mock_vision_dim)
    with torch.no_grad():
        embeds = hf_model.get_input_embeddings()(torch.tensor(ids))
        for b in range(B):
            pos = int(np.where(ids[b] == IMG_ID)[0][0])
            span = vis[b]
            n = min(span.shape[0], T - pos)
            embeds[b, pos : pos + n] = span[:n]
        ref_loss = hf_model(
            inputs_embeds=embeds,
            attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels),
        ).loss.item()

    images = jnp.zeros((B, 1, 3, 28, 28), jnp.float32)
    loss = vlm.train_forward(
        params, cfg, images=images, geom_token=None,
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        labels=jnp.asarray(labels), image_token_id=IMG_ID,
    )
    np.testing.assert_allclose(float(loss), ref_loss, atol=1e-4, rtol=1e-4)


def test_splice_expand_matches_oracle(setup):
    hf_model, proj_oracle, cfg, params = setup
    rng = np.random.default_rng(1)
    B, T, F = 1, 10, cfg.num_vis_tokens
    ids = rng.integers(1, 400, size=(B, T))
    ids[0, 4] = IMG_ID
    mask = np.ones((B, T), np.int64)

    vis = _torch_vis(proj_oracle, B, F, cfg.mock_vision_dim).numpy()
    embeds = np.asarray(qwen3.embed_tokens(params["text"], jnp.asarray(ids)))

    out_e, out_m = vlm.splice_expand(
        jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(ids), jnp.asarray(vis), IMG_ID
    )
    # numpy oracle: prefix + vis + suffix (qa_inference.py:133-144)
    ref_e = np.concatenate([embeds[:, :4], vis, embeds[:, 5:]], axis=1)
    ref_m = np.concatenate([mask[:, :4], np.ones((B, F)), mask[:, 5:]], axis=1)
    np.testing.assert_allclose(np.asarray(out_e), ref_e, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_m), ref_m)


def test_splice_expand_no_image_passthrough(setup):
    _, _, cfg, params = setup
    ids = np.full((1, 6), 7)
    mask = np.ones((1, 6), np.int64)
    embeds = np.asarray(qwen3.embed_tokens(params["text"], jnp.asarray(ids)))
    vis = np.zeros((1, cfg.num_vis_tokens, 64), np.float32)
    out_e, out_m = vlm.splice_expand(
        jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(ids), jnp.asarray(vis), IMG_ID
    )
    np.testing.assert_allclose(np.asarray(out_e[:, :6]), embeds, atol=1e-6)
    assert np.asarray(out_m)[:, :6].tolist() == mask.tolist()
    assert (np.asarray(out_m)[:, 6:] == 0).all()


def test_geom_tokens_prepend(setup):
    """geom features concat BEFORE vis tokens (vggt_qwen3_vlm.py:189)."""
    hf_model, proj_oracle, cfg, params = setup
    from dataclasses import replace

    gcfg = replace(cfg, geom_tokens=2)
    rng = np.random.default_rng(2)
    B, T = 1, 20
    ids = rng.integers(1, 400, size=(B, T))
    ids[0, 3] = IMG_ID
    labels = ids.copy()
    geom = {
        "R": jnp.asarray(rng.normal(size=(B, 2, 9)), jnp.float32),
        "t": jnp.asarray(rng.normal(size=(B, 2, 3)), jnp.float32),
        "K": jnp.asarray(rng.normal(size=(B, 2, 9)), jnp.float32),
        "depth_hist": jnp.asarray(rng.normal(size=(B, 2, 16)), jnp.float32),
    }
    images = jnp.zeros((B, 2, 3, 28, 28), jnp.float32)
    loss = vlm.train_forward(
        params, gcfg, images=images, geom_token=geom,
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((B, T), jnp.int32),
        labels=jnp.asarray(labels), image_token_id=IMG_ID,
    )
    assert np.isfinite(float(loss))
    # vs no geom: loss must differ (geom embeddings land in the splice span)
    loss2 = vlm.train_forward(
        params, gcfg, images=images, geom_token=None,
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((B, T), jnp.int32),
        labels=jnp.asarray(labels), image_token_id=IMG_ID,
    )
    assert float(loss) != float(loss2)
